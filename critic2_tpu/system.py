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

    def field(self, fid):
        if isinstance(fid, str) and fid in self.aliases:
            fid = self.aliases[fid]
        return self.fields[fid]
