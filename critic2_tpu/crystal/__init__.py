from .crystal import Crystal
from .seed import CrystalSeed

__all__ = ["Crystal", "CrystalSeed"]
