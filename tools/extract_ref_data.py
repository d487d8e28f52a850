#!/usr/bin/env python
"""Extract physical data tables from the reference critic2 distribution.

Produces ``critic2_tpu/data/element_tables.npz`` (cutoff radii, covalent
radii) and ``critic2_tpu/data/wfc_pbe.npz`` (PBE atomic radial density
tables for 119 elements, adapted from the QE ld1 wfc format).

These are physical *data* (measured/computed constants), not code: the
runtime processing (log-grid construction, occupation truncation, finite
difference derivatives) is reimplemented in critic2_tpu/fields/grid1.py.

Sources in /root/reference:
  - src/global.f90      cutrad table (density 1e-12 cutoff radii, bohr)
  - src/param.F90       atmcov0 table (covalent radii, bohr)
  - dat/wfc/*_pbe.wfc   atomic radial orbital tables (QE ld1 format)
"""
from __future__ import annotations

import io
import os
import re
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "critic2_tpu", "data")


def parse_fortran_array(src: str, name: str, count: int) -> np.ndarray:
    """Parse a fortran parameter array initializer `name(...) = (/ ... /)`."""
    m = re.search(rf"{name}\(maxzat0\)\s*=\s*\(/", src)
    if not m:
        raise RuntimeError(f"table {name} not found")
    tail = src[m.end():]
    end = tail.index("/)")
    body = tail[:end]
    # strip line continuations and comments
    lines = []
    for ln in body.splitlines():
        ln = ln.split("!")[0]
        ln = ln.replace("&", " ")
        lines.append(ln)
    toks = " ".join(lines).replace(",", " ").split()
    vals = []
    for t in toks:
        t = t.lower().replace("d", "e")
        # forms like 37e0, 1.23e+01, 0e0
        vals.append(float(t))
    if len(vals) < count:
        raise RuntimeError(f"table {name}: got {len(vals)} < {count}")
    return np.array(vals[:count], dtype=np.float64)


def parse_wfc(path: str):
    """Parse one QE-ld1-style wfc file: header + radial orbital table."""
    with open(path) as f:
        txt = f.read().split("\n")
    nn = int(txt[0].split()[0])
    # line 1: orbital labels (nn of them); line 2: occupations
    occ = np.array([int(x) for x in txt[2].split()[:nn]], dtype=np.int64)
    xmin, zz, dx, ngrid = txt[3].split()[:4]
    xmin, zz, dx, ngrid = float(xmin), float(zz), float(dx), int(ngrid)
    data = np.loadtxt(io.StringIO("\n".join(txt[4:4 + ngrid])))
    data = np.atleast_2d(data)
    r = data[:, 0].copy()
    wfc = data[:, 1:1 + nn].copy()
    return dict(occ=occ, xmin=xmin, zz=zz, dx=dx, ngrid=ngrid, r=r, wfc=wfc)


def main():
    os.makedirs(OUT, exist_ok=True)

    # --- element scalar tables ---
    with open(os.path.join(REF, "src", "global.f90")) as f:
        g = f.read()
    with open(os.path.join(REF, "src", "param.F90")) as f:
        p = f.read()
    cutrad = parse_fortran_array(g, "cutrad", 118)
    # atmcov0 is tabulated in angstrom and converted to bohr on declaration
    atmcov = parse_fortran_array(p, "atmcov0", 118) / 0.52917720859
    np.savez_compressed(
        os.path.join(OUT, "element_tables.npz"), cutrad=cutrad, atmcov=atmcov
    )
    print(f"element_tables.npz: cutrad[0:3]={cutrad[:3]}, atmcov[0:3]={atmcov[:3]}")

    # --- X-ray atomic scattering factors (Cromer-Mann 4-Gaussian fits +
    # high-angle log-polynomial extension), published International Tables
    # data vendored by the reference in src/param.F90 cscatt/c2scatt ---
    psrc = open(os.path.join(REF, "src", "param.F90")).read()

    def parse_flat(name, expect):
        m = re.search(rf"{name}\([0-9:,]+\)\s*=\s*reshape\(\(/", psrc)
        if not m:
            raise RuntimeError(f"{name} not found")
        tail = psrc[m.end():]
        body = tail[:tail.index("/)")]
        vals = []
        for ln in body.splitlines():
            ln = ln.split("!")[0].replace("&", " ")
            for tok in ln.replace(",", " ").split():
                try:
                    vals.append(float(tok.replace("d", "e").replace("D", "E")))
                except ValueError:
                    pass
        if len(vals) != expect:
            raise RuntimeError(f"{name}: {len(vals)} values, want {expect}")
        return np.asarray(vals)

    cscatt = parse_flat("cscatt", 9 * 94).reshape(94, 9)      # (z, 9)
    c2scatt = parse_flat("c2scatt", 4 * 93).reshape(93, 4)    # (z-2, 4)
    np.savez_compressed(os.path.join(OUT, "scatt.npz"),
                        cscatt=cscatt, c2scatt=c2scatt)
    print(f"scatt.npz: cscatt {cscatt.shape}, c2scatt {c2scatt.shape}")

    # --- XDM free-atom data: polarizabilities (param.F90 alpha_free) and
    # HF free-atom volumes (xdm@proc.f90 frevol0) - published atomic
    # constants vendored by the reference ---
    def parse_flat_src(src, name, expect):
        m = re.search(rf"{name}\([0-9:a-zA-Z,]+\)\s*=\s*\(/", src)
        if not m:
            raise RuntimeError(f"{name} not found")
        tail = src[m.end():]
        body = tail[:tail.index("/)")]
        vals = []
        for ln in body.splitlines():
            ln = ln.split("!")[0].replace("&", " ")
            for tok in ln.replace(",", " ").split():
                try:
                    vals.append(float(tok.replace("d", "e").replace("D", "E")))
                except ValueError:
                    pass
        if len(vals) < expect:
            raise RuntimeError(f"{name}: {len(vals)} values, want >= {expect}")
        return np.asarray(vals[:expect])

    alpha_free = parse_flat_src(psrc, "alpha_free", 103)
    xsrc = open(os.path.join(REF, "src", "xdm@proc.f90")).read()
    frevol0 = parse_flat_src(xsrc, "frevol0", 104)   # index 0..maxzat0
    np.savez_compressed(os.path.join(OUT, "xdm.npz"),
                        alpha_free=alpha_free, frevol0=frevol0)
    print(f"xdm.npz: alpha_free {alpha_free.shape} [H:{alpha_free[0]}], "
          f"frevol0 {frevol0.shape} [H:{frevol0[1]}]")

    # --- atomic radial density tables ---
    # store per-element: r grid params + per-orbital occupations and
    # occ*wfc^2 radial profiles (the only combination the runtime needs).
    wfcdir = os.path.join(REF, "dat", "wfc")
    out = {}
    sizes = 0
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_param", os.path.join(os.path.dirname(__file__), "..", "critic2_tpu", "param.py")
    )
    _param = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_param)

    for z in range(1, 119):
        sym = _param.ELEMENTS[z].lower()
        fname = f"{sym}{'_' * (2 - len(sym))}_pbe.wfc"
        path = os.path.join(wfcdir, fname)
        if not os.path.exists(path):
            continue
        d = parse_wfc(path)
        # rho_orb[k, i] = wfc_k(r_i)^2  (occupations stored separately so the
        # runtime can truncate to z-q electrons for core grids)
        rho_orb = (d["wfc"] ** 2).T.astype(np.float64)
        out[f"z{z:03d}_r"] = d["r"]
        out[f"z{z:03d}_rho_orb"] = rho_orb
        out[f"z{z:03d}_occ"] = d["occ"]
        out[f"z{z:03d}_head"] = np.array([d["xmin"], d["zz"], d["dx"], d["ngrid"]])
        sizes += rho_orb.nbytes + d["r"].nbytes

    np.savez_compressed(os.path.join(OUT, "wfc_pbe.npz"), **out)
    nel = sum(1 for k in out if k.endswith("_r"))
    print(f"wfc_pbe.npz: {nel} elements, {sizes/1e6:.1f} MB raw")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
