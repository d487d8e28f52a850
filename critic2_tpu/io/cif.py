"""CIF structure reader (pure Python).

Role of the reference's vendored ciftbx (src/ciftbx/, F77, 10 kLoC) +
read_cif (src/crystalseedmod@proc.f90): parse a CIF data block - cell
parameters, symmetry operations, atom-site loop - and expand the
symmetry-equivalent positions to the full cell.

Host-side I/O by design (SURVEY.md S2.3); handles the CIF subset the
reference's tests exercise: loops, quoted values, semicolon text blocks,
parenthetical uncertainties, symop strings, occupancies.
"""
from __future__ import annotations

import re

import numpy as np

from .. import param
from ..crystal.cell import m_x2c_from_cellpar
from ..crystal.seed import CrystalSeed
from ..crystal.crystal import Species

__all__ = ["read_cif", "parse_symop"]


def _tokenize(text):
    """CIF tokens: tags, values, loop_ markers; handles quotes and
    semicolon text fields."""
    tokens = []
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith(";"):
            # multiline text field
            body = [line[1:]]
            i += 1
            while i < len(lines) and not lines[i].startswith(";"):
                body.append(lines[i])
                i += 1
            tokens.append("\n".join(body))
            i += 1
            continue
        line = line.split("#")[0]
        j = 0
        while j < len(line):
            ch = line[j]
            if ch.isspace():
                j += 1
                continue
            if ch in "'\"":
                k = line.find(ch, j + 1)
                while k != -1 and k + 1 < len(line) and \
                        not line[k + 1].isspace():
                    k = line.find(ch, k + 1)
                if k == -1:
                    k = len(line)
                tokens.append(line[j + 1:k])
                j = k + 1
            else:
                k = j
                while k < len(line) and not line[k].isspace():
                    k += 1
                tokens.append(line[j:k])
                j = k
        i += 1
    return tokens


def _num(s):
    """CIF number with optional (uncertainty)."""
    m = re.match(r"^([-+0-9.eEdD]+)(\(\d+\))?$", s.strip())
    if not m:
        raise ValueError(f"bad CIF number {s!r}")
    return float(m.group(1).replace("D", "E").replace("d", "e"))


def parse_symop(s):
    """'x, y+1/2, -z' -> (rot (3,3), trans (3,))."""
    rot = np.zeros((3, 3))
    trans = np.zeros(3)
    for i, part in enumerate(s.lower().replace(" ", "").split(",")):
        # split into signed terms
        for term in re.findall(r"[+-]?[^+-]+", part):
            sign = -1.0 if term.startswith("-") else 1.0
            t = term.lstrip("+-")
            if t in ("x", "y", "z"):
                rot[i, "xyz".index(t)] += sign
                continue
            m = re.match(r"^(\d+)/(\d+)([xyz])?$", t)
            if m and m.group(3):
                rot[i, "xyz".index(m.group(3))] += \
                    sign * float(m.group(1)) / float(m.group(2))
            elif m:
                trans[i] += sign * float(m.group(1)) / float(m.group(2))
            else:
                m2 = re.match(r"^([0-9.]+)(?:\*?([xyz]))?$", t)
                if m2 and m2.group(2):
                    rot[i, "xyz".index(m2.group(2))] += sign * float(m2.group(1))
                elif m2:
                    trans[i] += sign * float(m2.group(1))
                else:
                    raise ValueError(f"cannot parse symop term {term!r}")
    return rot, trans


def _parse_block(tokens):
    """One data block -> dict of tags and list-of-dict loops."""
    tags = {}
    loops = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        low = t.lower()
        if low.startswith("data_"):
            i += 1
            continue
        if low == "loop_":
            i += 1
            cols = []
            while i < n and tokens[i].startswith("_"):
                cols.append(tokens[i].lower())
                i += 1
            rows = []
            while i < n and not tokens[i].startswith("_") and \
                    tokens[i].lower() not in ("loop_",) and \
                    not tokens[i].lower().startswith("data_"):
                rows.append(tokens[i:i + len(cols)])
                i += len(cols)
            loops.append((cols, [dict(zip(cols, r)) for r in rows
                                 if len(r) == len(cols)]))
            continue
        if t.startswith("_"):
            if i + 1 < n:
                tags[low] = tokens[i + 1]
            i += 2
            continue
        i += 1
    return tags, loops


def read_cif(path: str, block: int = 0) -> CrystalSeed:
    text = open(path, errors="replace").read()
    tokens = _tokenize(text)
    tags, loops = _parse_block(tokens)

    aa = [_num(tags[f"_cell_length_{k}"]) * param.ANGSTROM_TO_BOHR
          for k in "abc"]
    bb = [_num(tags[f"_cell_angle_{k}"]) for k in ("alpha", "beta", "gamma")]
    m = m_x2c_from_cellpar(aa, bb)

    # symmetry operations
    ops = []
    for cols, rows in loops:
        for key in ("_symmetry_equiv_pos_as_xyz",
                    "_space_group_symop_operation_xyz"):
            if key in cols:
                ops = [parse_symop(r[key]) for r in rows]
        if ops:
            break
    if not ops:
        for key in ("_symmetry_equiv_pos_as_xyz",
                    "_space_group_symop_operation_xyz"):
            if key in tags:
                ops = [parse_symop(tags[key])]
    if not ops:
        ops = [(np.eye(3), np.zeros(3))]

    # atom sites
    sites = None
    for cols, rows in loops:
        if "_atom_site_fract_x" in cols:
            sites = rows
            break
    if sites is None:
        raise ValueError(f"no atom sites in {path}")

    species: list[Species] = []
    spmap = {}
    frac, spof = [], []
    for r in sites:
        lbl = r.get("_atom_site_type_symbol") or r.get("_atom_site_label")
        z = param.symbol_to_z(lbl)
        x = np.array([_num(r["_atom_site_fract_x"]),
                      _num(r["_atom_site_fract_y"]),
                      _num(r["_atom_site_fract_z"])])
        key = (lbl.rstrip("0123456789+-"), z)
        if key not in spmap:
            spmap[key] = len(species)
            species.append(Species(key[0], z))
        # expand by symmetry, dedupe
        for rot, tr in ops:
            xx = (rot @ x + tr) % 1.0
            xx[xx > 1 - 1e-6] = 0.0
            dup = False
            for f0 in frac:
                d = xx - f0
                d -= np.rint(d)
                if np.linalg.norm(d @ m.T) < 1e-3:
                    dup = True
                    break
            if not dup:
                frac.append(xx)
                spof.append(spmap[key])

    return CrystalSeed(m_x2c=m, x_frac=np.asarray(frac),
                       species_of=np.asarray(spof), species=species,
                       name=path)
