"""The System: one crystal + scalar fields + property registry.

Role of the reference systemmod (src/systemmod.f90): hold a Crystal and a
set of loaded fields, track the reference field, evaluate expressions over
fields, and provide the driver-facing entry points (load_field, propty,
addcp).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np


@dataclass
class System:
    crystal: object = None
    fields: dict = dfield(default_factory=dict)   # id (int|str) -> Field
    iref: int | None = None                        # reference field id
    aliases: dict = dfield(default_factory=dict)
    vars: dict = dfield(default_factory=dict)      # expression variables
    pointprops: list = dfield(default_factory=list)
    integrables: list = dfield(default_factory=list)

    @classmethod
    def from_structure(cls, path_or_crystal, **kw):
        from .crystal.seed import read_structure
        from .crystal.crystal import Crystal

        if isinstance(path_or_crystal, Crystal):
            c = path_or_crystal
        else:
            c = read_structure(path_or_crystal, **kw)
        s = cls(crystal=c)
        s._load_promolecular_f0()
        return s

    def _load_promolecular_f0(self):
        from .fields.field import Field

        self.fields[0] = Field.promolecular(self.crystal, name="rho0")

    def load_field(self, source, fid=None, name=None, **kw):
        """Load a field from a file path or an existing Field object."""
        from .fields.field import Field

        if fid is None:
            fid = max([k for k in self.fields if isinstance(k, int)], default=0) + 1
        if isinstance(source, Field):
            f = source
        else:
            f = Field.from_file(self.crystal, source, **kw)
        if name:
            f.name = name
            self.aliases[name] = fid
        self.fields[fid] = f
        if self.iref is None or self.iref == 0:
            self.iref = fid
        return fid

    @property
    def ref(self):
        """The reference field (field 0 if nothing else is loaded)."""
        return self.fields[self.iref if self.iref is not None else 0]

    def resolve_fid(self, fid):
        """Resolve a field reference: int id, alias name, or numeric str."""
        if isinstance(fid, str):
            if fid in self.aliases:
                return self.aliases[fid]
            if fid.isdigit():
                return int(fid)
            raise KeyError(f"unknown field {fid!r}")
        return fid

    def field(self, fid):
        return self.fields[self.resolve_fid(fid)]

    def set_reference(self, fid):
        self.iref = self.resolve_fid(fid)

    def unload_field(self, fid):
        fid = self.resolve_fid(fid)
        del self.fields[fid]
        self.aliases = {k: v for k, v in self.aliases.items() if v != fid}
        if self.iref == fid:
            self.iref = max((k for k in self.fields if isinstance(k, int)
                             and k != 0), default=None)

    # ------------------------------------------------------------------
    # expressions (reference systemmod eval, src/systemmod.f90:196)
    # ------------------------------------------------------------------
    def eval_expr(self, expr: str, points_cart):
        from .arithmetic import eval_expr

        return eval_expr(expr, self, points_cart)

    def load_field_expr(self, expr: str, fid=None, name=None,
                        shape=None, ghost: bool = False):
        """LOAD AS "expr": rasterize on a grid (default: reference grid
        size or `shape`), or keep as a ghost field when ghost=True
        (reference ifformat_as / ifformat_ghost, src/param.F90:132-165)."""
        from .arithmetic import compile_expr
        from .fields.field import Field

        if ghost:
            f = Field.ghost(self.crystal, compile_expr(expr, self),
                            name=name or expr)
            return self.load_field(f, fid=fid, name=name)
        if shape is None:
            ref = self.fields.get(self.iref) if self.iref else None
            shape = tuple(ref.grid.n) if (ref is not None and
                                          ref.type == "grid") else (64, 64, 64)
        import jax.numpy as jnp
        import numpy as np

        from .fields.grid3 import Grid3

        fn = compile_expr(expr, self)
        n1, n2, n3 = shape
        i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                              indexing="ij")
        xf = np.stack([i.ravel() / n1, j.ravel() / n2, k.ravel() / n3])
        xc = np.asarray(self.crystal.m_x2c) @ xf
        out = np.empty(xc.shape[1])
        block = 1 << 16
        for lo in range(0, xc.shape[1], block):
            chunk = jnp.asarray(xc[:, lo:lo + block])
            out[lo:lo + chunk.shape[1]] = np.asarray(fn(chunk))
        from .fields.field import Field

        f = Field.from_grid(self.crystal, Grid3(jnp.asarray(
            out.reshape(shape))), name=name or expr)
        return self.load_field(f, fid=fid, name=name)
