"""Structure writers (reference WRITE keyword,
src/crystalmod@proc.f90 write_* family, ~18 formats).

Implemented: xyz, POSCAR/VASP, CIF, XSF, Quantum ESPRESSO pw.x input,
Gaussian gjf, critic2-style .cri, escher-compatible m. All host-side.
"""
from __future__ import annotations

import numpy as np

from .. import param

__all__ = ["write_structure", "write_xyz", "write_poscar", "write_cif",
           "write_xsf", "write_qe_in", "write_gjf", "write_cri"]


def write_structure(crystal, path: str, fmt: str | None = None):
    if fmt is None:
        low = path.lower()
        for ext, f in (("xyz", "xyz"), ("cif", "cif"), ("xsf", "xsf"),
                       ("vasp", "poscar"), ("poscar", "poscar"),
                       ("elk.in", "elk"), ("abin", "abinit"),
                       ("gin", "gulp"), ("gulp", "gulp"),
                       ("lammps", "lammps"), ("gen", "gen"),
                       ("in", "qe"), ("gjf", "gjf"), ("cri", "cri")):
            if low.endswith("." + ext) or low.endswith(ext):
                fmt = f
                break
    if fmt is None:
        raise ValueError(f"cannot infer write format for {path}")
    return {"xyz": write_xyz, "poscar": write_poscar, "cif": write_cif,
            "xsf": write_xsf, "qe": write_qe_in, "gjf": write_gjf,
            "cri": write_cri, "abinit": write_abinit,
            "elk": write_elk_in, "gulp": write_gulp,
            "lammps": write_lammps, "gen": write_dftb_gen,
            }[fmt](crystal, path)


def _names_cart(c):
    names = [c.species[s].name for s in c.species_of]
    cart = np.asarray(c.x_cart)
    if c.ismolecule and c.molx0 is not None:
        cart = cart + np.asarray(c.molx0)
    return names, cart * param.BOHR_TO_ANGSTROM


def write_xyz(c, path: str):
    names, cart = _names_cart(c)
    with open(path, "w") as f:
        f.write(f"{c.ncel}\nwritten by critic2-tpu\n")
        for nm, r in zip(names, cart):
            f.write(f"{nm:<3s} {r[0]:15.9f} {r[1]:15.9f} {r[2]:15.9f}\n")


def write_poscar(c, path: str):
    m = np.asarray(c.m_x2c).T * param.BOHR_TO_ANGSTROM   # rows = vectors
    order = np.argsort(c.species_of, kind="stable")
    counts = {}
    for s in c.species_of:
        counts[s] = counts.get(s, 0) + 1
    uniq = sorted(counts)
    with open(path, "w") as f:
        f.write("written by critic2-tpu\n1.0\n")
        for row in m:
            f.write(f"  {row[0]:18.12f} {row[1]:18.12f} {row[2]:18.12f}\n")
        f.write(" ".join(c.species[s].name for s in uniq) + "\n")
        f.write(" ".join(str(counts[s]) for s in uniq) + "\n")
        f.write("Direct\n")
        for i in order:
            x = c.x_frac[i]
            f.write(f"  {x[0]:18.12f} {x[1]:18.12f} {x[2]:18.12f}\n")


def write_cif(c, path: str):
    aa = np.asarray(c.aa) * param.BOHR_TO_ANGSTROM
    bb = np.asarray(c.bb)
    with open(path, "w") as f:
        f.write("data_critic2_tpu\n")
        for k, v in zip("abc", aa):
            f.write(f"_cell_length_{k} {v:.10f}\n")
        for k, v in zip(("alpha", "beta", "gamma"), bb):
            f.write(f"_cell_angle_{k} {v:.6f}\n")
        f.write("_symmetry_space_group_name_H-M 'P 1'\n")
        f.write("loop_\n_symmetry_equiv_pos_as_xyz\n'x,y,z'\n")
        f.write("loop_\n_atom_site_label\n_atom_site_type_symbol\n"
                "_atom_site_fract_x\n_atom_site_fract_y\n_atom_site_fract_z\n")
        counts = {}
        for i, s in enumerate(c.species_of):
            nm = c.species[s].name
            counts[nm] = counts.get(nm, 0) + 1
            x = c.x_frac[i]
            f.write(f"{nm}{counts[nm]} {nm} {x[0]:.10f} {x[1]:.10f} "
                    f"{x[2]:.10f}\n")


def write_xsf(c, path: str):
    m = np.asarray(c.m_x2c).T * param.BOHR_TO_ANGSTROM
    names, cart = _names_cart(c)
    zs = c.zatoms
    with open(path, "w") as f:
        if c.ismolecule:
            f.write("MOLECULE\nATOMS\n")
            for z, r in zip(zs, cart):
                f.write(f"{z:4d} {r[0]:15.9f} {r[1]:15.9f} {r[2]:15.9f}\n")
            return
        f.write("CRYSTAL\nPRIMVEC\n")
        for row in m:
            f.write(f"  {row[0]:15.9f} {row[1]:15.9f} {row[2]:15.9f}\n")
        f.write(f"PRIMCOORD\n{c.ncel} 1\n")
        for z, r in zip(zs, cart):
            f.write(f"{z:4d} {r[0]:15.9f} {r[1]:15.9f} {r[2]:15.9f}\n")


def write_qe_in(c, path: str):
    m = np.asarray(c.m_x2c).T * param.BOHR_TO_ANGSTROM
    names, cart = _names_cart(c)
    uniq = sorted({c.species[s].name for s in c.species_of})
    with open(path, "w") as f:
        f.write("&control\n calculation='scf'\n/\n&system\n ibrav=0\n"
                f" nat={c.ncel}\n ntyp={len(uniq)}\n/\n&electrons\n/\n")
        f.write("ATOMIC_SPECIES\n")
        for nm in uniq:
            f.write(f"{nm} 1.0 {nm}.UPF\n")
        f.write("CELL_PARAMETERS angstrom\n")
        for row in m:
            f.write(f"  {row[0]:18.12f} {row[1]:18.12f} {row[2]:18.12f}\n")
        f.write("ATOMIC_POSITIONS crystal\n")
        for i, s in enumerate(c.species_of):
            x = c.x_frac[i]
            f.write(f"{c.species[s].name} {x[0]:18.12f} {x[1]:18.12f} "
                    f"{x[2]:18.12f}\n")


def write_gjf(c, path: str):
    names, cart = _names_cart(c)
    with open(path, "w") as f:
        f.write("#p b3lyp sto-3g\n\nwritten by critic2-tpu\n\n0 1\n")
        for nm, r in zip(names, cart):
            f.write(f"{nm} {r[0]:14.8f} {r[1]:14.8f} {r[2]:14.8f}\n")
        f.write("\n")


def write_cri(c, path: str):
    aa = np.asarray(c.aa)
    bb = np.asarray(c.bb)
    with open(path, "w") as f:
        f.write("crystal\n" if not c.ismolecule else "molecule\n")
        f.write(f" cell {aa[0]:.10f} {aa[1]:.10f} {aa[2]:.10f} "
                f"{bb[0]:.6f} {bb[1]:.6f} {bb[2]:.6f}\n")
        for i, s in enumerate(c.species_of):
            x = c.x_frac[i]
            f.write(f" neq {x[0]:.10f} {x[1]:.10f} {x[2]:.10f} "
                    f"{c.species[s].name}\n")
        f.write("endcrystal\n" if not c.ismolecule else "endmolecule\n")


def write_abinit(c, path: str):
    """abinit structure block (reference write_abinit,
    src/crystalmod@proc.f90): acell/angdeg/typat/xred."""
    gpq = np.asarray(c.m_x2c).T @ np.asarray(c.m_x2c)
    aa = np.sqrt(np.diag(gpq))
    bb = [np.degrees(np.arccos(gpq[1, 2] / (aa[1] * aa[2]))),
          np.degrees(np.arccos(gpq[0, 2] / (aa[0] * aa[2]))),
          np.degrees(np.arccos(gpq[0, 1] / (aa[0] * aa[1])))]
    spof = np.asarray(c.species_of)
    with open(path, "w") as fh:
        fh.write("acell " + " ".join(f"{v:.10f}" for v in aa) + "\n")
        fh.write("angdeg " + " ".join(f"{v:.10f}" for v in bb) + "\n")
        fh.write(f"ntypat {len(c.species)}\n")
        fh.write("znucl " + " ".join(str(s.z) for s in c.species) + "\n")
        fh.write(f"natom {c.ncel}\n")
        fh.write("typat " + " ".join(
            f"{(spof == i).sum()}*{i + 1}"
            for i in range(len(c.species))) + "\n")
        fh.write("xred\n")
        order = np.argsort(spof, kind="stable")
        for i in order:
            fh.write("  " + " ".join(f"{v:.10f}"
                                     for v in c.x_frac[i]) + "\n")


def write_elk_in(c, path: str):
    """elk.in structure block (reference write_elk)."""
    spof = np.asarray(c.species_of)
    with open(path, "w") as fh:
        fh.write("tasks\n0\n\nxctype\n20\n\navec\n")
        m = np.asarray(c.m_x2c)
        for i in range(3):
            fh.write("  " + " ".join(f"{v:.10f}" for v in m[:, i]) + "\n")
        fh.write("\nsppath\n'./'\n\natoms\n")
        fh.write(f"  {len(c.species)}\n")
        for i, sp in enumerate(c.species):
            fh.write(f"  '{sp.name}.in'\n")
            idx = np.where(spof == i)[0]
            fh.write(f"  {len(idx)}\n")
            for j in idx:
                fh.write("  " + " ".join(f"{v:.10f}"
                                         for v in c.x_frac[j])
                         + " 0.0 0.0 0.0\n")
        fh.write("\nngridk\n  4 4 4\n\nrgkmax\n  7.0\n")


def write_gulp(c, path: str):
    """GULP input (reference write_gulp): cell + fractional atoms."""
    from ..crystal.cell import cellpar_from_m_x2c

    aa, bb = cellpar_from_m_x2c(c.m_x2c)
    names = [c.species[s].name for s in c.species_of]
    with open(path, "w") as fh:
        fh.write("eem\ncell " + " ".join(
            f"{v * param.BOHR_TO_ANGSTROM:.9f}" for v in aa)
            + " " + " ".join(f"{v:.5f}" for v in bb) + "\n")
        fh.write("fractional\n")
        for n, x in zip(names, np.asarray(c.x_frac)):
            fh.write(f"{n:<5s} " + " ".join(f"{v:.9f}" for v in x) + "\n")


def write_lammps(c, path: str):
    """LAMMPS data file (reference write_lammps; orthogonal cells, as
    in the reference)."""
    m = np.asarray(c.m_x2c)
    if abs(m[0, 1]) > 1e-12 or abs(m[0, 2]) > 1e-12 or \
            abs(m[1, 2]) > 1e-12:
        raise ValueError("write_lammps: non-orthogonal cells not "
                         "implemented (as in the reference)")
    cart = np.asarray(c.x_cart) * param.BOHR_TO_ANGSTROM
    with open(path, "w") as fh:
        fh.write("LAMMPS data file created by critic2-tpu.\n\n")
        fh.write(f"{c.ncel:9d} atoms\n")
        fh.write(f"{len(c.species):9d} atom types\n\n")
        for lo, hi, tag in ((0.0, m[0, 0], "xlo xhi"),
                            (0.0, m[1, 1], "ylo yhi"),
                            (0.0, m[2, 2], "zlo zhi")):
            fh.write(f"{lo:16.9f} {hi * param.BOHR_TO_ANGSTROM:16.9f} "
                     f"{tag}\n")
        fh.write("\nMasses\n\n")
        for i, sp in enumerate(c.species):
            fh.write(f"{i + 1} {param.atomic_mass(sp.z):10.4f}\n")
        fh.write("\nAtoms\n\n")
        for i in range(c.ncel):
            fh.write(f"{i + 1:7d} {int(c.species_of[i]) + 1:4d} "
                     + " ".join(f"{v:15.8f}" for v in cart[i]) + "\n")


def write_dftb_gen(c, path: str):
    """DFTB+ .gen file (S/F lattice formats)."""
    names = [sp.name for sp in c.species]
    with open(path, "w") as fh:
        kind = "C" if c.ismolecule else "F"
        fh.write(f"{c.ncel} {kind}\n")
        fh.write(" ".join(names) + "\n")
        xs = (np.asarray(c.x_cart) * param.BOHR_TO_ANGSTROM
              if c.ismolecule else np.asarray(c.x_frac))
        for i in range(c.ncel):
            fh.write(f"{i + 1:6d} {int(c.species_of[i]) + 1:3d} "
                     + " ".join(f"{v:18.10e}" for v in xs[i]) + "\n")
        if not c.ismolecule:
            fh.write("0.0 0.0 0.0\n")
            m = np.asarray(c.m_x2c) * param.BOHR_TO_ANGSTROM
            for i in range(3):
                fh.write(" ".join(f"{v:18.10e}" for v in m[:, i]) + "\n")
