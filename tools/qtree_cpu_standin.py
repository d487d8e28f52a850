"""Full sequential qtree driver stand-in: the single-core CPU
denominator for BASELINE config 5 (the reference qtree loop,
src/qtree@proc.f90:33 + subdivide/trace/cubature
src/qtree_tetrawork.f90:36-107; no Fortran compiler exists in this
image, so — like the YT/NCI/tricubic rows in parity_bench.CPU_MEASURED
— the C++ ports in native/critic2_native.cpp stand in for the
reference executable).

Does the SAME work as critic2_tpu.analysis.qtree.qtree_integrate on the
same field, with every device batch replaced by its sequential
single-core native counterpart:

  - gradient-path corner/node coloring -> native.trace_colors (one
    path at a time, BS23 with the reference defaults - the reference's
    per-thread adaptive_stepper);
  - Keast-pair cubature field reads    -> native.tricubic_values
    (value-only: the reference grd(v,0) path computes no derivatives);
  - beta-sphere radial x Lebedev reads -> native.tricubic_values.

The host-side geometry (subdivision, orbit replay, refinement queue)
is shared NumPy - identical work on both sides, and vectorized host
logic only makes this denominator SMALLER (conservative against the
TPU ratio).  Usage: JAX_PLATFORMS=cpu python tools/qtree_cpu_standin.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def qtree_cpu(grid_f, crystal, maxl: int = 4, minl: int = 4,
              sphfactor: float = 0.9, keastnum: int = 7,
              keastlow: int = 4, cub_abs: float = 1e-7,
              cub_rel: float = 1e-6, maxrefine: int = 8,
              max_queue: int = 1 << 16, origin_atom: int = 0):
    """Sequential qtree basin populations on the tricubic interpolant of
    grid_f.  Returns (pops (nat,), vols (nat,), ntraced, nevals)."""
    from critic2_tpu import native
    from critic2_tpu.analysis.qtree import (_ws_tetrahedra, _site_ops,
                                            _reduce_tets, _subdivide,
                                            _tet_volume)
    from critic2_tpu.ops.quadrature import keast_points
    from critic2_tpu.ops.lebedev import lebedev

    if not native.available():
        native.build()
    c = crystal
    g = np.ascontiguousarray(grid_f, dtype=np.float64)
    m = np.asarray(c.m_x2c)
    minv = np.linalg.inv(m)
    iat = origin_atom
    x0 = np.asarray(c.x_cart[iat])
    nat = c.ncel

    tets0 = _ws_tetrahedra(c)
    ops = _site_ops(c, iat)
    reps, orbit_perms = _reduce_tets(tets0, ops)
    tets = reps + x0[None, None, :]
    gidx = np.arange(len(tets))

    pos = np.asarray(c.x_frac)
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)])
    imgs = (pos[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    tgt = c.x2c(imgs)
    tgt_ids = np.tile(np.arange(nat), len(shifts))

    # frozen beta spheres (the bench kw: sphfactor=0.9)
    allpos = np.asarray(c.x_frac)
    sphrad = np.empty(nat)
    for i in range(nat):
        d = c.distance(np.delete(allpos, i, axis=0), allpos[i])
        dmin = float(np.min(d)) if np.size(d) else float(np.min(c.aa))
        sphrad[i] = sphfactor * 0.5 * dmin
    rt = sphrad[tgt_ids]

    nev = 0
    ntraced = 0
    cache: dict = {}

    def values_at(pts_cart):
        nonlocal nev
        nev += len(pts_cart)
        xf = pts_cart @ minv.T
        return native.tricubic_values(g, xf)

    def inside_spheres(pts_cart):
        d2 = ((pts_cart[:, None, :] - tgt[None, :, :]) ** 2).sum(2)
        k = d2.argmin(1)
        return d2.min(1) <= rt[k] ** 2, k

    def colors_of(pts_cart, seeds=None):
        # cache keyed on the RAW point, traces start at `seeds` (the
        # centroid nudge): identical corner-sharing semantics as the
        # device driver (analysis/qtree.colors_of)
        nonlocal ntraced, nev
        if seeds is None:
            seeds = pts_cart
        keys = [tuple(np.round(p, 8)) for p in pts_cart]
        ins, kb = inside_spheres(pts_cart)
        for i in np.nonzero(ins)[0]:
            cache.setdefault(keys[i], int(tgt_ids[kb[i]]))
        need, seen = [], set()
        for i, k in enumerate(keys):
            if k not in cache and k not in seen:
                seen.add(k)
                need.append(i)
        if need:
            cols, ne = native.trace_colors(
                g, m, seeds[need], tgt, tgt_ids, rt, mstep=600)
            nev += ne
            ntraced += len(need)
            for i, idx in enumerate(need):
                cache[keys[idx]] = int(cols[i])
        return np.array([cache[k] for k in keys])

    pops = np.zeros(nat + 1)
    vols = np.zeros(nat + 1)

    def accumulate(contrib, volc, col, grp):
        colb = np.where(col < 0, nat, col)
        for gq in np.unique(grp):
            sel = grp == gq
            for perm in orbit_perms[gq]:
                np.add.at(pops, perm[colb[sel]], contrib[sel])
                np.add.at(vols, perm[colb[sel]], volc[sel])

    def keast_contrib(tets_, rule):
        qpts, qw = keast_points(tets_, rule)
        fv = values_at(qpts.reshape(-1, 3)).reshape(qw.shape)
        ins, _ = inside_spheres(qpts.reshape(-1, 3))
        outs = np.where(ins, 0.0, 1.0).reshape(qw.shape)
        return (fv * outs * qw).sum(1), (outs * qw).sum(1)

    def retire(tets_, col, grp):
        cur_t, cur_c, cur_g = tets_, col, grp
        depth = 0
        while len(cur_t):
            hi, volhi = keast_contrib(cur_t, keastnum)
            lo, _ = keast_contrib(cur_t, keastlow)
            err = np.abs(hi - lo)
            ok = (err <= cub_abs) | (err <= cub_rel * np.abs(hi))
            if depth >= 3:
                co_in, _ = inside_spheres(cur_t.reshape(-1, 3))
                co = np.where(co_in, 0.0, 1.0).reshape(-1, 4)
                crossing = (co.min(1) == 0.0) & (co.max(1) == 1.0)
                ok = ok | crossing
            if depth >= maxrefine:
                ok = np.ones(len(cur_t), dtype=bool)
            elif (~ok).sum() * 8 > max_queue:
                worst = np.argsort(err)[-(max_queue // 8):]
                keep_bad = np.zeros(len(cur_t), dtype=bool)
                keep_bad[worst] = True
                ok = ok | ~keep_bad
            accumulate(hi[ok], volhi[ok], cur_c[ok], cur_g[ok])
            bad = ~ok
            cur_t = _subdivide(cur_t[bad])
            cur_c = np.repeat(cur_c[bad], 8)
            cur_g = np.repeat(cur_g[bad], 8)
            depth += 1

    minl_eff = min(minl, maxl)
    level = 0
    while True:
        if level < minl_eff:
            tets = _subdivide(tets)
            gidx = np.repeat(gidx, 8)
            level += 1
            continue
        centers = tets.mean(axis=1, keepdims=True)
        seeds = tets + 1e-3 * (centers - tets)
        cols = colors_of(tets.reshape(-1, 3),
                         seeds.reshape(-1, 3)).reshape(-1, 4)
        uniform = (cols == cols[:, :1]).all(axis=1)
        retire(tets[uniform], cols[uniform, 0], gidx[uniform])
        tets = tets[~uniform]
        gidx = gidx[~uniform]
        if len(tets) == 0 or level >= maxl:
            if len(tets):
                qpts, qw = keast_points(tets, keastnum)
                fv = values_at(qpts.reshape(-1, 3)).reshape(qw.shape)
                ins, _ = inside_spheres(qpts.reshape(-1, 3))
                outs = np.where(ins, 0.0, 1.0).reshape(qw.shape)
                ncols = colors_of(qpts.reshape(-1, 3)).reshape(qw.shape)
                if (ncols < 0).any():
                    cen = tets.mean(axis=1, keepdims=True)
                    ccols = colors_of(
                        tets.reshape(-1, 3),
                        (tets + 1e-3 * (cen - tets)).reshape(-1, 3)
                    ).reshape(-1, 4)
                    d = np.linalg.norm(qpts[:, :, None, :]
                                       - tets[:, None, :, :], axis=3)
                    near = np.take_along_axis(
                        np.broadcast_to(ccols[:, None, :], d.shape)
                        .reshape(-1, 4),
                        d.argmin(axis=2).reshape(-1, 1), axis=1
                    ).reshape(qw.shape)
                    ncols = np.where(ncols < 0, near, ncols)
                for col in np.unique(ncols):
                    msk = (ncols == col) * outs
                    accumulate((fv * qw * msk).sum(1), (qw * msk).sum(1),
                               np.full(len(tets), col, dtype=int), gidx)
            break
        tets = _subdivide(tets)
        gidx = np.repeat(gidx, 8)
        level += 1

    # beta-sphere interiors: Gauss-Legendre radial x Lebedev angular
    sph, wang = lebedev(170)
    xg, wg = np.polynomial.legendre.leggauss(64)
    for a in range(nat):
        R = sphrad[a]
        r = 0.5 * R * (xg + 1.0)
        wr = 0.5 * R * wg * 4.0 * np.pi * r * r
        pts = (np.asarray(c.x_cart[a])[None, None, :]
               + r[:, None, None] * sph[None, :, :]).reshape(-1, 3)
        fv = values_at(pts).reshape(len(r), len(sph))
        pops[a] += float((fv @ wang) @ wr)
        vols[a] += 4.0 / 3.0 * np.pi * R ** 3

    orb = np.asarray(c.spacegroup.orbit_of)
    for o in np.unique(orb):
        sel = np.nonzero(orb == o)[0]
        pops[sel] = pops[sel].mean()
        vols[sel] = vols[sel].mean()
    return pops[:nat], vols[:nat], ntraced, nev


def main():
    from parity_bench import _nacl_system

    s, g = _nacl_system((256, 256, 256), cache=True)
    t0 = time.perf_counter()
    pops, vols, ntraced, nev = qtree_cpu(np.asarray(g), s.crystal,
                                         maxl=4, sphfactor=0.9)
    wall = time.perf_counter() - t0
    print(f"qtree_cpu wall {wall:.2f} s  ntraced={ntraced} nev={nev}")
    print("pops:", np.round(pops, 6))
    print("vols:", np.round(vols, 6))


if __name__ == "__main__":
    main()
