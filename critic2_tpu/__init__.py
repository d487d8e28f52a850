"""critic2-tpu: TPU-native real-space scalar-field analysis.

A brand-new JAX/XLA/Pallas framework with the capabilities of critic2
(reference: QTAIM critical-point search, Bader/YT basin integration, NCI
plots, crystallographic tooling), designed TPU-first: batched device kernels
for field evaluation, Newton/ODE batches, and grid sweeps, with host-side
I/O, symmetry and orchestration.

Double precision is enabled at import time: the 1e-6 e basin-charge parity
target is unreachable with f32 accumulation (see SURVEY.md §7).
"""
from . import config as _config  # noqa: F401  (enables x64 before anything else)

__version__ = "0.1.0"

from .crystal.crystal import Crystal  # noqa: E402
from .system import System  # noqa: E402

__all__ = ["Crystal", "System", "__version__"]
