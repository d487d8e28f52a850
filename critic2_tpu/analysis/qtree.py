"""QTREE: basin integration by gradient-path coloring of a tetrahedral
partition of the Wigner-Seitz cell.

Role of the reference qtree family (src/qtree*.f90, ~5 kLoC): partition
the WS cell into tetrahedra, recursively subdivide to level maxl, assign
each node to a basin by tracing its gradient path (termination colors),
and integrate properties by corner sums / Keast rules inside uniformly
colored tetrahedra, with beta spheres around nuclei.

TPU reformulation: the recursion becomes LEVELS of batched work - at
each level every active (mixed-color) tetrahedron subdivides 8-fold, all
new node colors resolve in ONE batched gradient-path trace, and uniform
tetrahedra retire their volume/property contributions as weighted
reductions. Host keeps only the active-set bookkeeping.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.ode import trace_paths

__all__ = ["qtree_integrate", "QtreeResult"]


def _ws_tetrahedra(crystal):
    """Tetrahedralize the WS cell: origin + fan triangles of each facet
    (reference c%getiws, src/crystalmod.f90:176)."""
    ws = crystal.ws
    tets = []
    for face in ws.faces:
        v = ws.vertices[face]
        c = v.mean(axis=0)
        for t in range(len(v)):
            a, b = v[t], v[(t + 1) % len(v)]
            tets.append(np.stack([np.zeros(3), c, a, b]))
    return np.asarray(tets)          # (T, 4, 3) Cartesian around origin


def _subdivide(tets):
    """8-fold subdivision of tetrahedra (T,4,3) -> (8T,4,3)."""
    a, b, c, d = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
    ab = 0.5 * (a + b); ac = 0.5 * (a + c); ad = 0.5 * (a + d)
    bc = 0.5 * (b + c); bd = 0.5 * (b + d); cd = 0.5 * (c + d)
    subs = [
        (a, ab, ac, ad), (ab, b, bc, bd), (ac, bc, c, cd), (ad, bd, cd, d),
        (ab, ac, ad, bd), (ab, ac, bc, bd), (ac, ad, bd, cd),
        (ac, bc, bd, cd),
    ]
    return np.concatenate([np.stack(s, axis=1) for s in subs])


def _tet_volume(tets):
    e1 = tets[:, 1] - tets[:, 0]
    e2 = tets[:, 2] - tets[:, 0]
    e3 = tets[:, 3] - tets[:, 0]
    return np.abs(np.einsum("ti,ti->t", np.cross(e1, e2), e3)) / 6.0


@dataclass
class QtreeResult:
    names: list
    pops: np.ndarray
    volumes: np.ndarray
    nlevels: int
    ntraced: int

    def table(self):
        lines = ["# i  atom       volume            pop"]
        for q, (nm, v, p) in enumerate(
                zip(self.names, self.volumes, self.pops), 1):
            lines.append(f"{q:4d}  {nm:>4s}  {v:14.8f}  {p:14.8f}")
        return "\n".join(lines)


def qtree_integrate(system, maxl: int = 3, origin_atom: int | None = None,
                    block: int = 1 << 14, integ: str = "corner",
                    keastnum: int = 7,
                    sphfactor: float = 0.0) -> QtreeResult:
    """Basin populations/volumes of the reference field by qtree coloring.

    The WS cell is centered on an atom (default: atom 0, as the reference
    centers on ws_origin); colors come from batched uphill traces to the
    nuclei.

    integ: "corner" (corner-sum, reference integ_corner_sum,
    src/qtree_tetrawork.f90:107) or "keast" (Keast rule `keastnum` inside
    uniformly-colored tetrahedra, reference INTEG_MODE KEASTNUM,
    src/qtree@proc.f90:46-47 via ops/quadrature.keast_points).
    sphfactor > 0 pre-colors tetrahedron corners inside the beta sphere
    of each atom (radius = sphfactor * half nearest-neighbor distance,
    reference paint_inside_spheres) - saves gradient traces near nuclei.
    """
    c = system.crystal
    f = system.ref
    fn = f.eval_fn(nder=2)
    iat = 0 if origin_atom is None else origin_atom
    x0 = np.asarray(c.x_cart[iat])

    tets0 = _ws_tetrahedra(c) + x0[None, None, :]

    # targets: nuclei images
    pos = np.asarray(c.x_frac)
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)])
    imgs = (pos[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    tgt = c.x2c(imgs)
    tgt_ids = np.tile(np.arange(c.ncel), len(shifts))
    tgtj = jnp.asarray(tgt)
    rtj = jnp.full(len(tgt), 0.2)

    color_cache: dict = {}
    ntraced = 0

    # beta spheres: radius per cell atom (reference AUTOSPH/SPHFACTOR)
    sphrad = None
    if sphfactor > 0:
        allpos = np.asarray(c.x_frac)
        sphrad = np.empty(c.ncel)
        for i in range(c.ncel):
            d = c.distance(np.delete(allpos, i, axis=0), allpos[i])
            dmin = float(np.min(d)) if np.size(d) else float(np.min(c.aa))
            sphrad[i] = sphfactor * 0.5 * dmin

    def colors_of(points):
        """Basin color per point. Gradient-zero finishers (saddles,
        nuclei - the reference nudges tet corners for the same reason,
        src/qtree_gpaths) classify by final-position proximity."""
        nonlocal ntraced
        keys = [tuple(np.round(p, 8)) for p in points]
        if sphrad is not None:
            # paint corners inside beta spheres without tracing
            d = np.linalg.norm(points[:, None, :] - tgt[None, :, :], axis=2)
            kb = d.argmin(axis=1)
            inside = d[np.arange(len(points)), kb] <= sphrad[tgt_ids[kb]]
            for i in np.nonzero(inside)[0]:
                color_cache.setdefault(keys[i], int(tgt_ids[kb[i]]))
        need = [i for i, k in enumerate(keys) if k not in color_cache]
        if need:
            pts = points[need]
            cols = np.empty(len(pts), dtype=int)
            for lo in range(0, len(pts), block):
                sl = slice(lo, lo + block)
                xf, status, termid, _, _ = trace_paths(
                    fn, jnp.asarray(pts[sl]), iup=1, targets=tgtj,
                    rterm=rtj, mstep=600)
                st = np.asarray(status)
                ti = np.asarray(termid)
                cc = np.where((st == 0) & (ti >= 0),
                              tgt_ids[np.clip(ti, 0, len(tgt_ids) - 1)], -1)
                # gradient-zero finishers: nearest target within 0.5 bohr
                gz = cc < 0
                if gz.any():
                    xg = np.asarray(xf)[gz]
                    d = np.linalg.norm(xg[:, None, :] - tgt[None, :, :],
                                       axis=2)
                    kbest = d.argmin(axis=1)
                    ok = d[np.arange(len(xg)), kbest] < 0.5
                    cc[np.nonzero(gz)[0][ok]] = tgt_ids[kbest[ok]]
                cols[sl] = cc
            ntraced += len(pts)
            for i, idx in enumerate(need):
                color_cache[keys[idx]] = cols[i]
        return np.array([color_cache[k] for k in keys])

    nat = c.ncel
    pops = np.zeros(nat + 1)
    vols = np.zeros(nat + 1)

    def retire(tets, cols4):
        """Integrate uniform tetrahedra: corner-sum rule (reference
        integ_corner_sum, src/qtree_tetrawork.f90:107) or a Keast rule
        (reference integ mode 11+keastnum)."""
        vol = _tet_volume(tets)
        col = cols4[:, 0]
        if integ == "keast" and len(tets):
            from ..ops.quadrature import keast_points

            qpts, qw = keast_points(tets, keastnum)
            fv = np.asarray(fn(jnp.asarray(
                qpts.reshape(-1, 3).T))[0]).reshape(qw.shape)
            contrib = (fv * qw).sum(axis=1)
        else:
            fv = np.asarray(fn(jnp.asarray(
                tets.reshape(-1, 3).T))[0]).reshape(-1, 4)
            contrib = vol * fv.mean(axis=1)
        for b in range(-1, nat):
            sel = col == b
            pops[b] += contrib[sel].sum()
            vols[b] += vol[sel].sum()

    tets = tets0
    level = 0
    while True:
        # nudge corners toward the centroid: level-0 corners sit exactly
        # on symmetry points with zero gradient
        centers = tets.mean(axis=1, keepdims=True)
        seeds = tets + 1e-3 * (centers - tets)
        verts = seeds.reshape(-1, 3)
        cols = colors_of(verts).reshape(-1, 4)
        uniform = (cols == cols[:, :1]).all(axis=1)
        retire(tets[uniform], cols[uniform])
        tets = tets[~uniform]
        if len(tets) == 0 or level >= maxl:
            if len(tets):
                # deepest level: split mixed tetrahedra among corner colors
                vol = _tet_volume(tets)
                fv = np.asarray(fn(jnp.asarray(
                    tets.reshape(-1, 3).T))[0]).reshape(-1, 4)
                cen = tets.mean(axis=1, keepdims=True)
                ccols = colors_of((tets + 1e-3 * (cen - tets))
                                  .reshape(-1, 3)).reshape(-1, 4)
                for corner in range(4):
                    cb = ccols[:, corner]
                    for b in range(-1, nat):
                        sel = cb == b
                        pops[b] += (0.25 * vol[sel] * fv[sel, corner]).sum()
                        vols[b] += 0.25 * vol[sel].sum()
            break
        tets = _subdivide(tets)
        level += 1

    names = [c.species[c.species_of[q]].name for q in range(nat)]
    return QtreeResult(names=names, pops=pops[:nat], volumes=vols[:nat],
                       nlevels=level, ntraced=ntraced)
