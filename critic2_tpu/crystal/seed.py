"""Structure readers -> CrystalSeed -> Crystal.

Role of the reference's crystalseedmod (src/crystalseedmod.f90): parse
structure files into a seed, then construct the Crystal. Formats in this
module: VASP POSCAR/CONTCAR/CHGCAR headers, Gaussian cube, xyz (molecule),
and format auto-detection (struct_detect_format,
src/crystalseedmod@proc.f90:3113). More readers (CIF, QE, ...) are added in
their own modules as the I/O surface widens.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field as dfield

import numpy as np

from .. import param
from .cell import m_x2c_from_cellpar
from .crystal import Crystal, Species


@dataclass
class CrystalSeed:
    m_x2c: np.ndarray | None = None
    x_frac: np.ndarray | None = None     # fractional atom coords
    species_of: np.ndarray | None = None
    species: list = dfield(default_factory=list)
    ismolecule: bool = False
    name: str = ""
    border: float = 10.0                 # molecule cell border (bohr)
    cubic: bool = False

    def to_crystal(self) -> Crystal:
        if self.ismolecule:
            return _molecule_to_crystal(self)
        return Crystal(
            m_x2c=self.m_x2c,
            x_frac=np.mod(self.x_frac, 1.0),
            species_of=self.species_of,
            species=self.species,
            ismolecule=False,
        )


def _molecule_to_crystal(seed: CrystalSeed) -> Crystal:
    """Embed a molecule in a big empty cell (reference molx0/molborder
    semantics, src/crystalmod.f90:85-88)."""
    cart = np.atleast_2d(np.asarray(seed.x_frac, dtype=float))  # here: cartesian!
    lo = cart.min(axis=0) - seed.border
    hi = cart.max(axis=0) + seed.border
    side = hi - lo
    if seed.cubic:
        side = np.full(3, side.max())
    m = np.diag(side)
    frac = (cart - lo) / side
    c = Crystal(
        m_x2c=m,
        x_frac=frac,
        species_of=seed.species_of,
        species=seed.species,
        ismolecule=True,
        molx0=lo,
    )
    c.molborder = np.maximum(seed.border * 0.5, 0.0) / side
    return c


# ---------------------------------------------------------------------------
# format detection
# ---------------------------------------------------------------------------
def detect_format(path: str) -> str:
    base = os.path.basename(path)
    lower = base.lower()
    ext = os.path.splitext(lower)[1].lstrip(".")
    if lower in ("poscar", "contcar") or lower.startswith(("poscar", "contcar")):
        return "poscar"
    if lower.startswith(("chgcar", "chg", "elfcar", "aeccar")):
        return "vasp-grid"
    if ext in ("cube",):
        return "cube"
    if ext in ("bincube",):
        return "bincube"
    if ext == "xyz":
        return "xyz"
    if ext == "cif":
        return "cif"
    if ext in ("vasp",):
        return "poscar"
    if ext in ("xsf", "axsf"):
        return "xsf"
    if ext in ("wfn", "wfx", "fchk", "fch", "fck", "molden"):
        return "wfn"
    if lower in ("geometry.out",):
        return "elk-geometry"
    if ext in ("in",):
        return "qe-in"
    if ext in ("out", "scf"):
        return "qe-out"
    if ext == "struct":
        return "wien"
    if ext == "gen":
        return "dftb-gen"
    raise ValueError(f"cannot detect structure format of {path}")


def read_structure(path: str, mol: bool | None = None) -> Crystal:
    """Read a structure file, auto-detecting the format."""
    fmt = detect_format(path)
    if fmt in ("poscar", "vasp-grid"):
        return read_poscar(path).to_crystal()
    if fmt == "cube":
        return read_cube_structure(path).to_crystal()
    if fmt == "xyz":
        return read_xyz(path).to_crystal()
    if fmt == "cif":
        from ..io.cif import read_cif
        return read_cif(path).to_crystal()
    if fmt == "xsf":
        return read_xsf_structure(path).to_crystal()
    if fmt == "wfn":
        return read_wfn_structure(path).to_crystal()
    if fmt == "wien":
        return read_wien_structure(path).to_crystal()
    if fmt == "elk-geometry":
        return read_elk_geometry(path).to_crystal()
    raise NotImplementedError(f"structure format {fmt} not implemented yet")


def read_elk_geometry(path: str) -> CrystalSeed:
    """Crystal from an elk GEOMETRY.OUT (reference read_elk,
    src/crystalseedmod@proc.f90 elk branch)."""
    from ..fields.elk import read_geometry

    geo = read_geometry(path)
    spmap, species, spof, xf = {}, [], [], []
    for isp, posl in enumerate(geo["pos_frac"]):
        nm = geo["species"][isp]
        sym = "".join(c for c in nm if c.isalpha())[:2].capitalize()
        z = param.symbol_to_z(sym) or param.symbol_to_z(sym[:1]) or 0
        if isp not in spmap:
            spmap[isp] = len(species)
            species.append(Species(sym, z))
        for p in posl:
            xf.append(np.mod(p, 1.0))
            spof.append(spmap[isp])
    return CrystalSeed(m_x2c=geo["x2c"], x_frac=np.asarray(xf),
                       species_of=np.asarray(spof), species=species,
                       name=path)


def read_wien_structure(path: str) -> CrystalSeed:
    """WIEN2k .struct reader (reference read_wien,
    src/crystalseedmod@proc.f90:1313-1510). The cell frame is br1^T so
    Cartesian coordinates agree with the WienField evaluator; centering
    copies (F/B/C lattices) are expanded into the conventional cell."""
    from ..fields.wien import read_struct

    st = read_struct(path)
    lattic = st["lattic"]
    cen = [np.zeros(3)]
    if lattic[0] == "F":
        cen += [np.array([0.5, 0.5, 0.0]), np.array([0.0, 0.5, 0.5]),
                np.array([0.5, 0.0, 0.5])]
    elif lattic[0] == "B":
        cen += [np.array([0.5, 0.5, 0.5])]
    elif lattic[:3] == "CXY":
        cen += [np.array([0.5, 0.5, 0.0])]
    elif lattic[:3] == "CYZ":
        cen += [np.array([0.0, 0.5, 0.5])]
    elif lattic[:3] == "CXZ":
        cen += [np.array([0.5, 0.0, 0.5])]

    jatom_of = np.concatenate(
        [np.full(st["multw"][j], j) for j in range(st["nat"])])
    spmap, species, spof, xf = {}, [], [], []
    for iat, x in enumerate(st["pos_frac"]):
        z = int(round(st["znuc"][jatom_of[iat]]))
        name = st["names"][jatom_of[iat]] or param.z_to_symbol(z)
        if z not in spmap:
            spmap[z] = len(species)
            species.append(Species(param.z_to_symbol(z) or name, z))
        for cv in cen:
            xf.append(np.mod(x + cv, 1.0))
            spof.append(spmap[z])
    return CrystalSeed(m_x2c=st["br1"].T, x_frac=np.asarray(xf),
                       species_of=np.asarray(spof), species=species,
                       name=path)


def read_wfn_structure(path: str, border: float = 10.0) -> CrystalSeed:
    """Molecule geometry from a wavefunction file (reference MOLECULE
    file.{wfn,wfx,fchk}, src/crystalseedmod.f90 read_mol)."""
    from ..fields.wfn import Wavefunction

    w = Wavefunction.from_file(path)
    spmap, species, spof = {}, [], []
    for z in w.atz:
        z = int(z)
        if z not in spmap:
            spmap[z] = len(species)
            species.append(Species(param.z_to_symbol(z), z))
        spof.append(spmap[z])
    return CrystalSeed(x_frac=np.asarray(w.atpos),
                       species_of=np.asarray(spof), species=species,
                       ismolecule=True, name=path, border=border)


# ---------------------------------------------------------------------------
# VASP POSCAR / CHGCAR header
# ---------------------------------------------------------------------------
def read_poscar(path: str, species_names: list[str] | None = None) -> CrystalSeed:
    """POSCAR/CONTCAR/CHGCAR-header reader (v5+ with symbol line; the
    reference also supports POTCAR-derived species, src/crystalseedmod
    read_vasp)."""
    with open(path) as f:
        lines = f.read().splitlines()
    title = lines[0].strip()
    scale = float(lines[1].split()[0])
    lat = np.array([[float(x) for x in lines[2 + i].split()[:3]] for i in range(3)])
    if scale < 0:  # negative scale = target volume
        vol = abs(np.linalg.det(lat))
        scale = (-scale / vol) ** (1.0 / 3.0)
    lat = lat * scale * param.ANGSTROM_TO_BOHR
    # species symbols line (v5) or direct counts (v4)
    toks = lines[5].split()
    if all(t.isdigit() for t in toks):
        counts = [int(t) for t in toks]
        if species_names is None:
            species_names = [f"X{i}" for i in range(len(counts))]
        iline = 6
    else:
        species_names = toks
        counts = [int(t) for t in lines[6].split()]
        iline = 7
    sel = lines[iline].strip().lower()
    if sel.startswith("s"):  # selective dynamics
        iline += 1
        sel = lines[iline].strip().lower()
    cartesian = sel.startswith(("c", "k"))
    iline += 1
    nat = sum(counts)
    pos = np.array(
        [[float(x) for x in lines[iline + i].split()[:3]] for i in range(nat)]
    )
    if cartesian:
        pos = (pos * scale * param.ANGSTROM_TO_BOHR) @ np.linalg.inv(lat).T
    species = [Species(name=s, z=param.symbol_to_z(s)) for s in species_names]
    species_of = np.concatenate(
        [np.full(c, i, dtype=int) for i, c in enumerate(counts)]
    )
    return CrystalSeed(
        m_x2c=lat.T,  # columns = lattice vectors
        x_frac=pos,
        species_of=species_of,
        species=species,
        name=title,
    )


# ---------------------------------------------------------------------------
# Gaussian cube
# ---------------------------------------------------------------------------
def parse_cube_header(path: str):
    """Returns (x0, voxel_vectors (3,3 columns), n (3,), atoms zs, atom
    cartesians, nval) - all in bohr (cube native units)."""
    with open(path) as f:
        f.readline()
        f.readline()
        toks = f.readline().split()
        nat = int(toks[0])
        x0 = np.array([float(t) for t in toks[1:4]])
        n = np.zeros(3, dtype=int)
        vox = np.zeros((3, 3))
        for i in range(3):
            toks = f.readline().split()
            n[i] = int(toks[0])
            vox[:, i] = [float(t) for t in toks[1:4]]
        ismo = nat < 0
        nat = abs(nat)
        zs = np.zeros(nat, dtype=int)
        pos = np.zeros((nat, 3))
        for i in range(nat):
            toks = f.readline().split()
            zs[i] = int(toks[0])
            pos[i] = [float(t) for t in toks[2:5]]
        offset = f.tell()
    return x0, vox, n, zs, pos, ismo, offset


def read_cube_structure(path: str) -> CrystalSeed:
    x0, vox, n, zs, pos, _, _ = parse_cube_header(path)
    m = vox * n[None, :]  # lattice vectors = voxel vectors * counts (columns)
    frac = (pos - x0) @ np.linalg.inv(m).T
    uniq = sorted(set(zs.tolist()))
    species = [Species(name=param.z_to_symbol(z), z=z) for z in uniq]
    spmap = {z: i for i, z in enumerate(uniq)}
    species_of = np.array([spmap[z] for z in zs], dtype=int)
    return CrystalSeed(
        m_x2c=m, x_frac=frac, species_of=species_of, species=species,
        name=os.path.basename(path),
    )


# ---------------------------------------------------------------------------
# xyz (molecule)
# ---------------------------------------------------------------------------
def read_xyz(path: str, border: float = 10.0, cubic: bool = False) -> CrystalSeed:
    with open(path) as f:
        nat = int(f.readline().split()[0])
        f.readline()
        names, pos = [], []
        for _ in range(nat):
            toks = f.readline().split()
            names.append(toks[0])
            pos.append([float(t) for t in toks[1:4]])
    pos = np.array(pos) * param.ANGSTROM_TO_BOHR
    uniq = []
    for s in names:
        if s not in uniq:
            uniq.append(s)
    species = [Species(name=s, z=param.symbol_to_z(s)) for s in uniq]
    spmap = {s: i for i, s in enumerate(uniq)}
    return CrystalSeed(
        x_frac=pos,  # cartesian; converted by _molecule_to_crystal
        species_of=np.array([spmap[s] for s in names], dtype=int),
        species=species,
        ismolecule=True,
        border=border,
        cubic=cubic,
        name=os.path.basename(path),
    )


# ---------------------------------------------------------------------------
# xsf structure
# ---------------------------------------------------------------------------
def read_xsf_structure(path: str) -> CrystalSeed:
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 0
    lat = None
    names, pos = [], []
    while i < len(lines):
        ln = lines[i].upper()
        if ln.startswith("PRIMVEC"):
            lat = np.array(
                [[float(x) for x in lines[i + 1 + k].split()[:3]] for k in range(3)]
            ) * param.ANGSTROM_TO_BOHR
            i += 4
        elif ln.startswith("PRIMCOORD"):
            nat = int(lines[i + 1].split()[0])
            for k in range(nat):
                toks = lines[i + 2 + k].split()
                names.append(toks[0])
                pos.append([float(t) for t in toks[1:4]])
            i += 2 + nat
        else:
            i += 1
    if lat is None:
        raise ValueError(f"no PRIMVEC in {path}")
    pos = np.array(pos) * param.ANGSTROM_TO_BOHR
    frac = pos @ np.linalg.inv(lat.T).T
    uniq = []
    for s in names:
        if s not in uniq:
            uniq.append(s)
    species = [
        Species(name=str(s), z=param.symbol_to_z(str(s)) if not str(s).isdigit()
                else int(s)) for s in uniq
    ]
    for sp in species:
        if sp.z == 0 and sp.name.isdigit():
            sp.z = int(sp.name)
    spmap = {s: i for i, s in enumerate(uniq)}
    return CrystalSeed(
        m_x2c=lat.T,
        x_frac=frac,
        species_of=np.array([spmap[s] for s in names], dtype=int),
        species=species,
        name=os.path.basename(path),
    )
