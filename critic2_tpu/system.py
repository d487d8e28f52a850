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

    @classmethod
    def from_wavefunction(cls, wfn, border: float = 10.0, name: str = ""):
        """System around an in-memory Wavefunction (no file): embeds
        the molecule in a border-padded cell (reference molx0/molborder
        semantics) and loads the wfn as field 1 / reference.  Used by
        synthetic large-molecule assemblies (Wavefunction.tile)."""
        import copy

        from .crystal.seed import CrystalSeed
        from .crystal.crystal import Species
        from .fields.field import Field
        from . import param

        zs = np.asarray(wfn.atz, dtype=int)
        uniq = sorted(set(int(z) for z in zs))
        spmap = {z: i for i, z in enumerate(uniq)}
        seed = CrystalSeed(
            x_frac=np.asarray(wfn.atpos, float),    # cartesian for mols
            species_of=np.array([spmap[int(z)] for z in zs]),
            species=[Species(param.ELEMENTS[z] if z < len(param.ELEMENTS)
                             else f"Z{z}", z) for z in uniq],
            ismolecule=True, border=border, name=name or wfn.source)
        c = seed.to_crystal()
        s = cls.from_structure(c)
        w = copy.copy(wfn)
        w.atpos = np.asarray(wfn.atpos) - np.asarray(c.molx0)
        w._dev = {}
        w._screen_cache = {}
        s.load_field(Field(crystal=c, type="wfn", wfn=w,
                           name=name or "wfn"))
        s.iref = 1
        return s

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

    def identify_fragment_from_xyz(self, path: str):
        """Atom indices (0-based, cell list) matching the positions in an
        xyz file (angstrom cartesian; reference
        identify_fragment_from_xyz, src/fragmentmod@proc.f90)."""
        from . import param

        idx = []
        with open(path) as fh:
            nat = int(fh.readline().split()[0])
            fh.readline()
            for _ in range(nat):
                t = fh.readline().split()
                xc = np.array([float(v) for v in t[1:4]]) \
                    * param.ANGSTROM_TO_BOHR
                i, _ = self.crystal.identify_atom(
                    xc, icrd=param.ICRD_CART, distmax=1e-2)
                if i < 0:
                    raise ValueError(f"fragment atom not in crystal: {t}")
                idx.append(int(i))
        return np.asarray(idx, dtype=int)

    def load_field_as(self, kind: str, src=None, src2=None, fid=None,
                      name=None, shape=None, isry: bool = False,
                      fragment=None):
        """Computed-field LOADs (reference ifformat_as_* formats,
        src/param.F90:132-165; load_as_fftgrid
        src/fieldmod@proc.f90:560-612):

        kind: 'lap' | 'grad' | 'pot' | 'hxx1' | 'hxx2' | 'hxx3' (FFT
        grids of grid field `src`), 'clm add' | 'clm sub' (grid sum /
        difference of fields src, src2), 'core' (promolecular core
        density grid using the system zpsp), 'promolecular' (promolecular
        density grid, optionally of an xyz-defined fragment), 'copy'
        (duplicate of field src)."""
        import jax.numpy as jnp

        from .fields.field import Field
        from .fields.grid3 import Grid3

        kind = kind.lower()
        m = self.crystal.m_x2c

        def grid_of(fidx):
            f = self.field(fidx)
            if f.type != "grid":
                raise ValueError(f"LOAD AS {kind.upper()} needs a grid field")
            return f.grid

        if kind in ("lap", "grad", "pot", "hxx1", "hxx2", "hxx3"):
            g = grid_of(src)
            if kind == "lap":
                out = g.laplacian(m)
            elif kind == "grad":
                out = g.gradrho(m)
            elif kind == "pot":
                out = g.pot(m, isry=isry)
            else:
                out = g.hxx(m, int(kind[3]) - 1)
            f = Field.from_grid(self.crystal, out,
                                name=name or f"<{kind}:{src}>")
        elif kind in ("clm add", "clm sub"):
            g1, g2 = grid_of(src), grid_of(src2)
            if tuple(g1.n) != tuple(g2.n):
                raise ValueError("CLM fields have different grid sizes")
            sign = 1.0 if kind.endswith("add") else -1.0
            f = Field.from_grid(self.crystal, Grid3(g1.f + sign * g2.f),
                                name=name or f"<{kind}:{src},{src2}>")
        elif kind == "core":
            if not self.crystal_zpsp():
                raise ValueError("LOAD AS CORE requires ZPSP settings")
            f = self._promolecular_grid_field(
                shape, zpsp=self.crystal_zpsp(), name=name or "<core>")
        elif kind == "promolecular":
            frag = None
            if fragment is not None:
                frag = self.identify_fragment_from_xyz(fragment) \
                    if isinstance(fragment, str) else np.asarray(fragment)
            f = self._promolecular_grid_field(
                shape, fragment=frag, name=name or "<promolecular>")
        elif kind == "copy":
            srcf = self.field(src)
            import copy as _copy

            f = _copy.copy(srcf)
            f.name = name or f"<copy:{src}>"
        else:
            raise ValueError(f"unknown LOAD AS kind {kind}")
        return self.load_field(f, fid=fid, name=name)

    def load_field_pi(self, ion_files: dict, fid=None, name=None):
        """aiPI field from {species name or index: .ion file}
        (reference LOAD PI, src/fieldseedmod@proc.f90:86-87,240-255)."""
        from .fields.field import Field
        from .fields.pi import PiField

        pf = PiField.from_files(self.crystal, ion_files)
        f = Field(crystal=self.crystal, type="pi", pi=pf,
                  name=name or "<pi>")
        return self.load_field(f, fid=fid, name=name)

    def crystal_zpsp(self) -> dict:
        """Active pseudopotential charges: system-level ZPSP settings."""
        return getattr(self, "zpsp", None) or {}

    def _promolecular_grid_field(self, shape, zpsp=None, fragment=None,
                                 name=""):
        import jax.numpy as jnp

        from .fields.field import Field
        from .fields.grid3 import Grid3
        from .fields.promol import PromolEnv

        if shape is None:
            ref = self.fields.get(self.iref) if self.iref is not None else None
            shape = tuple(ref.grid.n) if (ref is not None and
                                          ref.type == "grid") else (64, 64, 64)
        env = PromolEnv(self.crystal, zpsp=zpsp, fragment=fragment)
        from .analysis.integration import _rasterize_env

        arr = _rasterize_env(self.crystal, env, shape)
        return Field.from_grid(self.crystal, Grid3(jnp.asarray(arr)),
                               name=name)
