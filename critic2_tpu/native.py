"""ctypes bindings for the C++ host kernels (native/critic2_native.cpp).

The native library provides the qhull-equivalent geometry kernels (convex
hull, Wigner-Seitz cell) and the exact sequential Yu-Trinkle sweep for
large-grid cross-checks. Every entry point has a NumPy fallback, so the
library is an accelerator, not a dependency. Build:

    cmake -S native -B native/build -G Ninja && cmake --build native/build

(or `python -m critic2_tpu.native` to build in place with g++).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "hull", "ws_cell", "yt_labels",
           "yt_charges", "tricubic_batch", "omp_threads", "build"]

_LIB = None
_TRIED_BUILD = False
_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "..", "native", "critic2_native.cpp")
_OUT = os.path.join(_HERE, "..", "native", "build", "libcritic2_native.so")


def _load():
    """Load the native library, building from source on first use.

    No binary is shipped in the repo (unreviewable, platform-specific,
    goes stale silently); the single-file g++ build takes ~1 s and is
    retried at most once per process. A stale .so (older than the .cpp)
    is rebuilt.
    """
    global _LIB, _TRIED_BUILD
    if _LIB is not None:
        return _LIB
    stale = (os.path.exists(_OUT) and os.path.exists(_SRC)
             and os.path.getmtime(_OUT) < os.path.getmtime(_SRC))
    if (not os.path.exists(_OUT) or stale) and not _TRIED_BUILD:
        _TRIED_BUILD = True
        try:
            build()
        except Exception:
            return None
    if os.path.exists(_OUT):
        lib = ctypes.CDLL(_OUT)
        lib.c2n_hull.restype = ctypes.c_int
        lib.c2n_ws_cell.restype = ctypes.c_int
        lib.c2n_yt_labels.restype = ctypes.c_int
        lib.c2n_yt_charges.restype = ctypes.c_int
        lib.c2n_tricubic_batch.restype = None
        lib.c2n_nci_sweep.restype = ctypes.c_longlong
        lib.c2n_tricubic_values.restype = None
        lib.c2n_trace_colors.restype = ctypes.c_longlong
        lib.c2n_auto_drain.restype = ctypes.c_int
        lib.c2n_wfn_eval.restype = ctypes.c_longlong
        lib.c2n_wfn_auto_drain.restype = ctypes.c_int
        lib.c2n_omp_threads.restype = ctypes.c_int
        _LIB = lib
        return lib
    return None


def build():
    """Compile the native library from native/critic2_native.cpp."""
    os.makedirs(os.path.dirname(_OUT), exist_ok=True)
    subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                    "-fopenmp", _SRC, "-o", _OUT], check=True)
    global _LIB
    _LIB = None
    return _load() is not None


def available() -> bool:
    return _load() is not None


def hull(points):
    """Convex hull triangles of (n, 3) points (native if available)."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    if lib is not None:
        maxt = 8 * len(pts) + 64
        tris = np.zeros((maxt, 3), dtype=np.int32)
        nt = lib.c2n_hull(
            ctypes.c_int(len(pts)),
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(maxt))
        if nt >= 0:
            return tris[:nt].copy()
    from .analysis.bisect import _hull_faces

    return _hull_faces(pts)


def ws_cell(m_x2c):
    """Wigner-Seitz facets of a lattice: (ineigh (nf,3), areas (nf,),
    verts (nv,3))."""
    lib = _load()
    m = np.ascontiguousarray(np.asarray(m_x2c, dtype=np.float64))
    if lib is not None:
        maxf, maxv = 64, 256
        ineigh = np.zeros((maxf, 3), dtype=np.int32)
        areas = np.zeros(maxf)
        verts = np.zeros((maxv, 3))
        nv = ctypes.c_int(0)
        # column-major 3x3 (columns = lattice vectors)
        mcol = np.ascontiguousarray(m.T.reshape(-1))
        nf = lib.c2n_ws_cell(
            mcol.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ineigh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.byref(nv), ctypes.c_int(maxf), ctypes.c_int(maxv))
        if nf >= 0:
            return ineigh[:nf].copy(), areas[:nf].copy(), \
                verts[:nv.value].copy()
    from .crystal.wscell import wigner_seitz

    ws = wigner_seitz(m)
    return np.asarray(ws.ineighx, dtype=np.int32), \
        np.asarray(ws.areas), np.asarray(ws.vertices)


def yt_labels(rho, offs, wts):
    """Exact sequential Yu-Trinkle labels (native). rho (n1,n2,n3);
    offs (K,3) int; wts (K,). Returns (labels (n1,n2,n3), nattr)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    rho = np.ascontiguousarray(rho, dtype=np.float64)
    n1, n2, n3 = rho.shape
    offs = np.ascontiguousarray(offs, dtype=np.int32)
    wts = np.ascontiguousarray(wts, dtype=np.float64)
    labels = np.zeros(rho.size, dtype=np.int32)
    nattr = lib.c2n_yt_labels(
        ctypes.c_int(n1), ctypes.c_int(n2), ctypes.c_int(n3),
        rho.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(len(offs)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        wts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(1 << 20))
    if nattr < 0:
        raise RuntimeError("native yt sweep failed")
    return labels.reshape(rho.shape), int(nattr)


def yt_charges(rho, offs, wts, field):
    """Exact sequential Yu-Trinkle basin integrals of `field` over the
    basins of `rho` with fractional boundary weights (the reference
    algorithm, src/yt@proc.f90:106-190). Returns (labels, charges)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    rho = np.ascontiguousarray(rho, dtype=np.float64)
    field = np.ascontiguousarray(field, dtype=np.float64)
    n1, n2, n3 = rho.shape
    offs = np.ascontiguousarray(offs, dtype=np.int32)
    wts = np.ascontiguousarray(wts, dtype=np.float64)
    labels = np.zeros(rho.size, dtype=np.int32)
    maxattr = 1 << 20
    charges = np.zeros(maxattr)
    nattr = lib.c2n_yt_charges(
        ctypes.c_int(n1), ctypes.c_int(n2), ctypes.c_int(n3),
        rho.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(len(offs)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        wts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(maxattr),
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        charges.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if nattr < 0:
        raise RuntimeError("native yt sweep failed")
    return labels.reshape(rho.shape), charges[:nattr]


def tricubic_batch(f, xfrac):
    """Host tricubic value/gradient/Hessian for (N, 3) fractional points
    on grid f (n1,n2,n3) — identical math and conventions to the device
    kernel ops/interp.interp_soa; OpenMP across points.  The measured
    CPU-baseline apparatus (reference BENCHMARK keyword workload,
    src/fieldmod@proc.f90:1734-1830) and the independent verifier for CP
    positions.  Returns (y (N,), grad (N,3), hess (N,6) in SYM6)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    f = np.ascontiguousarray(f, dtype=np.float64)
    x = np.ascontiguousarray(xfrac, dtype=np.float64)
    N = len(x)
    y = np.empty(N)
    grad = np.empty((N, 3))
    hess = np.empty((N, 6))
    lib.c2n_tricubic_batch(
        ctypes.c_int(f.shape[0]), ctypes.c_int(f.shape[1]),
        ctypes.c_int(f.shape[2]),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(N),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        grad.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hess.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return y, grad, hess


def nci_sweep(f, m_c2x, rhocut: float = 0.2, dimcut: float = 2.0) -> int:
    """Full NCI-driver CPU stand-in: per grid node, tricubic
    value/grad/Hess + Cartesian rotation + middle Hessian eigenvalue +
    RDG + cutoff test (the reference hot loop src/nci@proc.f90:496-562
    work shape - interp + eig + cutoffs, not interp alone).  Returns
    the dat-selection count."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    f = np.ascontiguousarray(f, dtype=np.float64)
    m = np.ascontiguousarray(m_c2x, dtype=np.float64)
    return int(lib.c2n_nci_sweep(
        ctypes.c_int(f.shape[0]), ctypes.c_int(f.shape[1]),
        ctypes.c_int(f.shape[2]),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(rhocut), ctypes.c_double(dimcut)))


def tricubic_values(f, xfrac):
    """Value-only host tricubic (single core, sequential): the
    cubature-stand-in field read (the reference grd(v,0) path computes
    no derivatives, so CPU denominators must not be charged for
    them)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    f = np.ascontiguousarray(f, dtype=np.float64)
    x = np.ascontiguousarray(xfrac, dtype=np.float64)
    N = len(x)
    y = np.empty(N)
    lib.c2n_tricubic_values(
        ctypes.c_int(f.shape[0]), ctypes.c_int(f.shape[1]),
        ctypes.c_int(f.shape[2]),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(N),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return y


def trace_colors(f, m_x2c, seeds_cart, tgt_cart, tgt_ids, rt,
                 hini: float = 0.3, maxerr: float = 1e-4,
                 gradeps: float = 1e-7, mstep: int = 600):
    """Sequential single-core gradient-path tracer: the CPU-measured
    counterpart of ops/ode.trace_paths for the qtree/flux trace
    workload (reference per-thread adaptive_stepper,
    src/fieldmod@proc.f90:2076-2399, BS23 defaults
    src/global@proc.f90:104-107).  One path at a time on the native
    tricubic; identical capture/step-control semantics to the device
    tracer.  Returns (colors (N,) int, nevals)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    f = np.ascontiguousarray(f, dtype=np.float64)
    minv = np.ascontiguousarray(np.linalg.inv(np.asarray(m_x2c)),
                                dtype=np.float64)
    seeds = np.ascontiguousarray(seeds_cart, dtype=np.float64)
    tgt = np.ascontiguousarray(tgt_cart, dtype=np.float64)
    ids = np.ascontiguousarray(tgt_ids, dtype=np.int32)
    rts = np.ascontiguousarray(np.broadcast_to(rt, (len(tgt),)),
                               dtype=np.float64)
    N = len(seeds)
    cols = np.empty(N, dtype=np.int32)
    nev = lib.c2n_trace_colors(
        ctypes.c_int(f.shape[0]), ctypes.c_int(f.shape[1]),
        ctypes.c_int(f.shape[2]),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        minv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(N),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(len(tgt)),
        tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(hini), ctypes.c_double(maxerr),
        ctypes.c_double(gradeps), ctypes.c_int(mstep),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return cols, int(nev)


def auto_drain(f, m_x2c, seeds_frac, gfnormeps: float = 1e-12,
               cpeps: float = 1e-2, maxit: int = 200,
               maxcp: int = 100000):
    """Sequential full AUTO driver stand-in: one seed at a time, Newton
    to |grad| < gfnormeps, min-image dedup at cpeps against the found
    list, rank/signature classification - the same work the reference
    per-seed loop does (src/autocp@proc.f90:694-723 + newton
    src/fieldmod@proc.f90:1832-1868 + addcp :1876), single core.
    Returns (cps_frac (ncp,3), signatures (ncp,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    f = np.ascontiguousarray(f, dtype=np.float64)
    m = np.ascontiguousarray(m_x2c, dtype=np.float64)
    seeds = np.ascontiguousarray(seeds_frac, dtype=np.float64)
    cps = np.empty((maxcp, 3))
    sig = np.empty(maxcp, dtype=np.int32)
    n = lib.c2n_auto_drain(
        ctypes.c_int(f.shape[0]), ctypes.c_int(f.shape[1]),
        ctypes.c_int(f.shape[2]),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(len(seeds)),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(gfnormeps), ctypes.c_double(cpeps),
        ctypes.c_int(maxit),
        cps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(maxcp))
    return cps[:n], sig[:n]


def _wfn_arrays(w):
    """Primitive/MO arrays of a Wavefunction in the native layout:
    (ctr (P,3), li (P,3) int32, alpha (P), CT (P,M) = cmo^T, occ (M))."""
    from .fields.wfn import _LI

    ctr = np.ascontiguousarray(np.asarray(w.atpos)[w.icenter],
                               dtype=np.float64)
    li = np.ascontiguousarray(np.asarray(_LI[w.itype - 1]),
                              dtype=np.int32)
    alpha = np.ascontiguousarray(w.e, dtype=np.float64)
    CT = np.ascontiguousarray(np.asarray(w.cmo).T, dtype=np.float64)
    occ = np.ascontiguousarray(w.occ, dtype=np.float64)
    return ctr, li, alpha, CT, occ


def wfn_eval_seq(w, pts, nder: int = 2, lncut: float = 27.631):
    """Sequential single-core screened GTO evaluation: the CPU-measured
    counterpart of Wavefunction.rho_eval_screened for the cps_large
    denominator (reference per-point near-primitive evaluation,
    src/wfn_private@proc.F90:2032-2228, screening ball :3075-3145).
    Returns (rho (N,), grad (N,3)|None, hess (N,3,3)|None, nvisit)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    ctr, li, alpha, CT, occ = _wfn_arrays(w)
    P, M = CT.shape
    x = np.ascontiguousarray(pts, dtype=np.float64).reshape(-1, 3)
    N = len(x)
    rho = np.empty(N)
    grad = np.empty((N, 3)) if nder >= 1 else None
    hess = np.empty((N, 3, 3)) if nder >= 2 else None
    dptr = ctypes.POINTER(ctypes.c_double)
    nvisit = lib.c2n_wfn_eval(
        ctypes.c_longlong(P), ctr.ctypes.data_as(dptr),
        li.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        alpha.ctypes.data_as(dptr), ctypes.c_int(M),
        CT.ctypes.data_as(dptr), occ.ctypes.data_as(dptr),
        ctypes.c_longlong(N), x.ctypes.data_as(dptr),
        ctypes.c_int(nder), ctypes.c_double(lncut),
        rho.ctypes.data_as(dptr),
        grad.ctypes.data_as(dptr) if grad is not None else None,
        hess.ctypes.data_as(dptr) if hess is not None else None)
    return rho, grad, hess, int(nvisit)


def wfn_auto_drain(w, seeds_cart, gfnormeps: float = 1e-12,
                   cpeps: float = 1e-2, maxit: int = 200,
                   lncut: float = 27.631, rmax: float | None = None,
                   maxcp: int = 100000):
    """Sequential full AUTO driver on a molecular GTO field: one seed at
    a time, Newton on the screened evaluator, dedup, classification -
    the cps_large CPU denominator (src/autocp@proc.f90:694-723).
    Returns (cps_cart (ncp,3), signatures (ncp,), nevals)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built "
                           "(python -m critic2_tpu.native)")
    ctr, li, alpha, CT, occ = _wfn_arrays(w)
    P, M = CT.shape
    seeds = np.ascontiguousarray(seeds_cart, dtype=np.float64)
    if rmax is None:
        rmax = float(np.linalg.norm(w.atpos, axis=1).max() + 10.0)
    cps = np.empty((maxcp, 3))
    sig = np.empty(maxcp, dtype=np.int32)
    nev = ctypes.c_longlong(0)
    dptr = ctypes.POINTER(ctypes.c_double)
    n = lib.c2n_wfn_auto_drain(
        ctypes.c_longlong(P), ctr.ctypes.data_as(dptr),
        li.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        alpha.ctypes.data_as(dptr), ctypes.c_int(M),
        CT.ctypes.data_as(dptr), occ.ctypes.data_as(dptr),
        ctypes.c_longlong(len(seeds)), seeds.ctypes.data_as(dptr),
        ctypes.c_double(gfnormeps), ctypes.c_double(cpeps),
        ctypes.c_int(maxit), ctypes.c_double(lncut),
        ctypes.c_double(rmax), cps.ctypes.data_as(dptr),
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(maxcp), ctypes.byref(nev))
    return cps[:n], sig[:n], int(nev.value)


def omp_threads() -> int:
    """OpenMP thread count the native kernels run with (1 = serial)."""
    lib = _load()
    return int(lib.c2n_omp_threads()) if lib is not None else 1


if __name__ == "__main__":
    ok = build()
    print("native build:", "ok" if ok else "FAILED")
