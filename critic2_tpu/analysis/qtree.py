"""QTREE: basin integration by gradient-path coloring of a tetrahedral
partition of the Wigner-Seitz cell.

Role of the reference qtree family (src/qtree*.f90, ~5 kLoC): partition
the WS cell into the symmetry-irreducible tetrahedra (c%getiws,
src/crystalmod.f90:176), recursively subdivide to level maxl, assign
each node to a basin by tracing its gradient path (termination colors),
and integrate properties inside uniformly colored tetrahedra by corner
sums, Keast rules, or adaptive CUBPACK cubature
(src/qtree_tetrawork.f90:36-107), with beta spheres around nuclei.

TPU reformulation:
- the recursion becomes LEVELS of batched work - at each level every
  active (mixed-color) tetrahedron subdivides 8-fold and all new node
  colors resolve in batched gradient-path traces (ops/ode, fixed-size
  padded batches so the device program compiles once);
- the symmetry reduction keeps one representative per orbit of the
  origin atom's site point group and replays each retired contribution
  through the orbit's atom permutations (the role of getiws +
  tetrahedron multiplicities);
- CUBPACK's adaptive error control becomes a host refinement queue:
  each uniform tetrahedron is integrated with a Keast rule pair
  (high/low order); those with |hi - lo| above tolerance subdivide and
  re-enter the queue, all evaluations batched on device
  (src/qtree_tetrawork.f90:68 integ_inner_cubpack role);
- beta spheres (auto radii verified by surface traces) integrate by
  Gauss-Legendre radial x Lebedev angular quadrature, and the
  tetrahedral cubature masks sphere interiors - the nuclear cusp never
  reaches the Keast rules (reference sphere-integration flow);
- charges are reported per symmetry orbit, like the reference's
  inequivalent-atom output.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

import jax

from ..ops.ode import trace_paths

__all__ = ["qtree_integrate", "QtreeResult"]


@jax.jit
def _sphere_mask_dev(ptsT, tgtT, rads):
    """(inside_any (N,) bool, kmin (N,) i32, dmin (N,)) vs the 27-cell
    target images.  Device-side: the host numpy version of this N x 108
    distance reduction was 75% of the qtree wall at 256^3 (profiled:
    112 s of 152 on the 1-core host)."""
    d2 = ((ptsT[:, :, None] - tgtT[:, None, :]) ** 2).sum(0)    # (N, K)
    k = jnp.argmin(d2, axis=1).astype(jnp.int32)
    dmin2 = jnp.take_along_axis(d2, k[:, None], axis=1)[:, 0]
    inside = (d2 <= (rads[None, :] ** 2)).any(axis=1)
    return inside, k, jnp.sqrt(dmin2)


@jax.jit
def _masked_keast_reduce(fv, outs, qw):
    """((fv*outs*qw).sum(1), (outs*qw).sum(1)) on device."""
    return (fv * outs * qw).sum(axis=1), (outs * qw).sum(axis=1)


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
    """8-fold subdivision of tetrahedra (T,4,3) -> (8T,4,3).

    PARENT-MAJOR order: children of parent i occupy rows 8i..8i+7, so
    per-parent payloads (colors, orbit-group ids) carry over with
    np.repeat(x, 8).  (A type-major concatenation here once scrambled
    the refinement queue's colors across parents - 9.8 e of a 31.6-e
    cell tagged with other basins' colors.)"""
    a, b, c, d = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
    ab = 0.5 * (a + b); ac = 0.5 * (a + c); ad = 0.5 * (a + d)
    bc = 0.5 * (b + c); bd = 0.5 * (b + d); cd = 0.5 * (c + d)
    subs = [
        (a, ab, ac, ad), (ab, b, bc, bd), (ac, bc, c, cd), (ad, bd, cd, d),
        (ab, ac, ad, bd), (ab, ac, bc, bd), (ac, ad, bd, cd),
        (ac, bc, bd, cd),
    ]
    kids = np.stack([np.stack(s, axis=1) for s in subs], axis=1)
    return kids.reshape(-1, 4, 3)


def _tet_volume(tets):
    e1 = tets[:, 1] - tets[:, 0]
    e2 = tets[:, 2] - tets[:, 0]
    e3 = tets[:, 3] - tets[:, 0]
    return np.abs(np.einsum("ti,ti->t", np.cross(e1, e2), e3)) / 6.0


def _site_ops(crystal, iat, tol=1e-6):
    """Site point group of cell atom iat: list of (R_cart (3,3),
    atom_perm (ncel+1,)) for every space-group op that fixes the site.
    atom_perm maps a basin color to the color of the symmetry image;
    the trailing entry keeps the unresolved color (-1) fixed."""
    sg = crystal.spacegroup
    m = np.asarray(crystal.m_x2c)
    minv = np.linalg.inv(m)
    xf = np.asarray(crystal.x_frac)
    n = len(xf)
    ops = []
    for R, t in zip(np.asarray(sg.rotations), np.asarray(sg.translations)):
        d = R @ xf[iat] + t - xf[iat]
        d -= np.round(d)
        if np.linalg.norm(m @ d) > 1e-4:
            continue
        # atom permutation under the op: atom j's image coincides with
        # atom perm[j] (mod lattice)
        img = (xf @ R.T + t[None, :])
        perm = np.empty(n + 1, dtype=int)
        for j in range(n):
            dd = xf - img[j]
            dd -= np.round(dd)
            perm[j] = int(np.argmin(np.linalg.norm(dd @ m.T, axis=1)))
        perm[n] = n                                  # the -1 bucket
        ops.append((m @ R @ minv, perm))
    return ops


def _reduce_tets(tets, ops, tol=1e-5):
    """Group the (origin-relative) tetrahedra into orbits of the site
    point group.  Returns (rep_tets (G,4,3), orbit_perms: list of lists
    of atom permutations - one per distinct orbit member)."""
    def key(T):
        v = np.round(T / tol).astype(np.int64)
        return tuple(sorted(map(tuple, v)))

    canon = {}
    for idx, T in enumerate(tets):
        k = min(key((Rc @ T.T).T) for Rc, _ in ops)
        canon.setdefault(k, []).append(idx)

    reps, orbit_perms = [], []
    for k, members in canon.items():
        T = tets[members[0]]
        reps.append(T)
        seen = {}
        for Rc, perm in ops:
            kk = key((Rc @ T.T).T)
            if kk not in seen:
                seen[kk] = perm
        orbit_perms.append(list(seen.values()))
    return np.asarray(reps), orbit_perms


@dataclass
class QtreeResult:
    names: list
    pops: np.ndarray
    volumes: np.ndarray
    nlevels: int
    ntraced: int
    nrefined: int = 0

    def table(self):
        lines = ["# i  atom       volume            pop"]
        for q, (nm, v, p) in enumerate(
                zip(self.names, self.volumes, self.pops), 1):
            lines.append(f"{q:4d}  {nm:>4s}  {v:14.8f}  {p:14.8f}")
        return "\n".join(lines)


def qtree_integrate(system, maxl: int = 3, minl: int = 4,
                    origin_atom: int | None = None,
                    block: int = 1 << 13, field_block: int = 1 << 16,
                    integ: str = "keast",
                    keastnum: int = 7, keastlow: int = 4,
                    cub_abs: float = 1e-7, cub_rel: float = 1e-6,
                    maxrefine: int = 8, max_queue: int = 1 << 16,
                    usesym: bool = True, precision: str = "f64",
                    sphfactor: float | None = None) -> QtreeResult:
    """Basin populations/volumes of the reference field by qtree coloring.

    The WS cell is centered on an atom (default: atom 0, the reference
    ws_origin); colors come from batched uphill traces to the nuclei.

    minl: minimum subdivision level BEFORE the 4-corner uniformity test
    is trusted (reference minl, default 4, src/global@proc.f90:148; the
    reference makes maxl <= minl a fatal error,
    src/qtree_basic@proc.f90:167 - here minl clamps to maxl instead so
    shallow runs stay usable).  Without it a coarse tetrahedron whose 4
    corners all trace to one basin can straddle the interatomic surface
    and swallow another basin's nuclear region wholesale: on a
    symmetric two-Gaussian test crystal, trusting level-1 uniformity
    misassigned 7.5 e of 31.6.  Levels < minl always subdivide (and
    skip the corner traces entirely - their corners recur at minl).

    integ: "keast" (adaptive Keast-pair cubature with host refinement,
    the CUBPACK role - rules `keastnum`/`keastlow`, tolerances
    cub_abs/cub_rel per tetrahedron, reference CUB_ABS/CUB_REL
    settings) or "corner" (plain corner-sum, reference
    integ_corner_sum, src/qtree_tetrawork.f90:107).
    usesym reduces the tetrahedra to site-point-group orbit
    representatives (reference getiws) and replays contributions
    through the orbit atom permutations.
    Beta spheres (reference: always on - initial radius rnn/2 shrunk
    until verified, src/qtree@proc.f90:770,816): sphfactor=None (the
    default) starts each atom at 0.8 * rnn/2 and shrinks by 25% until
    every surface gradient path terminates at its own nucleus;
    sphfactor > 0 freezes radius = sphfactor * rnn/2 (reference frozen
    branch, :807); sphfactor = 0 disables spheres. Sphere interiors
    integrate by radial quadrature, tetrahedra only the exterior.
    """
    c = system.crystal
    f = system.ref
    # Color-trace precision (the trace wall dominates the qtree leg;
    # the v5e f32 row-gather interp is 5.6x the emulated-f64 rate):
    #   "f64" (default): reference-exact traces.  The round-4 artifact
    #     measured "mixed" at 56.8 s / 2.1e-4 e exact-half deviation vs
    #     f64's 20.7 s / 3.5e-6 e at 256^3 maxl=4 - mixed lost on BOTH
    #     axes there (the f64 retrace volume ate the f32 eval saving),
    #     so f64 stays the default until mixed beats it on wall while
    #     holding the 2e-5-e exact-half bar.
    #   "mixed" (opt-in): f32 FIELD EVALS + f64 integrator state, with
    #     an f64 RETRACE of lanes that fail to RESOLVE (f32 gmod noise
    #     in flat regions can false-trigger the gradient-zero stop).
    #     CAVEAT: lanes that resolve to the WRONG basin under f32 noise
    #     near a separatrix are silently kept - the retrace only sees
    #     unresolved lanes, so mixed's coloring error is bounded by the
    #     separatrix-adjacent volume, NOT by the retrace.  Validate
    #     against an exact-answer case before trusting mixed charges.
    #   "f32": everything f32 including step control.  NOT recommended:
    #     measured at 256^3/maxl=4, |grad| under the f32 noise floor
    #     jitters the BS23 error control - 86302 traces vs 66907 at
    #     f64, 3x the wall, and a 0.03-e charge shift.
    fn = None
    if (precision in ("f32", "mixed") and f.type == "grid"
            and f.grid.mode in ("tricubic", "trilinear")):
        # cache keyed on the Grid3 OBJECT identity: if the field's grid
        # is later replaced, a stale f32 shadow must not be traced
        cache = getattr(f, "_qtree_trace_fn", None)
        if cache is not None and cache.get("_grid_id") != id(f.grid):
            cache = None
        fn = cache.get(precision) if cache is not None else None
        if fn is None:
            from ..fields.field import Field
            from ..fields.grid3 import Grid3

            f32fld = Field.from_grid(
                c, Grid3(jnp.asarray(f.grid.f, jnp.float32),
                         mode=f.grid.mode), name="_qtree_trace32")
            fn = f32fld.eval_fn(nder=1)
            if precision == "mixed":
                raw32 = fn._c2t_raw
                consts32 = fn._c2t_consts

                def mixed_raw(consts, xT):
                    fv, gf, h6 = raw32(consts, xT.astype(jnp.float32))
                    return (fv.astype(jnp.float64),
                            gf.astype(jnp.float64),
                            None if h6 is None
                            else h6.astype(jnp.float64))

                def mfn(xT):
                    return mixed_raw(consts32, xT)

                mfn._c2t_raw = mixed_raw
                mfn._c2t_consts = consts32
                mfn._c2t_loop = fn._c2t_loop
                fn = mfn
            try:      # cache: jit keys on the raw fn's identity
                if (not hasattr(f, "_qtree_trace_fn")
                        or f._qtree_trace_fn.get("_grid_id")
                        != id(f.grid)):
                    f._qtree_trace_fn = {"_grid_id": id(f.grid)}
                f._qtree_trace_fn[precision] = fn
            except Exception:
                pass
    fn64 = f.eval_fn(nder=1)    # traces use the gradient only
    if fn is None:
        fn = fn64
    fnv = f.eval_fn(nder=0)     # cubature uses values only
    iat = 0 if origin_atom is None else origin_atom
    x0 = np.asarray(c.x_cart[iat])
    nat = c.ncel

    tets0 = _ws_tetrahedra(c)                     # origin-relative
    if usesym and not c.ismolecule:
        ops = _site_ops(c, iat)
        reps, orbit_perms = _reduce_tets(tets0, ops)
    else:
        reps = tets0
        orbit_perms = [[np.arange(nat + 1)]] * len(tets0)
    tets = reps + x0[None, None, :]
    gidx = np.arange(len(tets))                   # orbit-group index

    # targets: nuclei images
    pos = np.asarray(c.x_frac)
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)])
    imgs = (pos[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    tgt = c.x2c(imgs)
    tgt_ids = np.tile(np.arange(nat), len(shifts))
    tgtj = jnp.asarray(tgt)

    color_cache: dict = {}
    ntraced = 0

    # beta spheres: radius per cell atom (reference AUTOSPH/SPHFACTOR)
    sphrad = None
    if sphfactor is None or sphfactor > 0:
        allpos = np.asarray(c.x_frac)
        sphrad = np.empty(nat)
        for i in range(nat):
            d = c.distance(np.delete(allpos, i, axis=0), allpos[i])
            dmin = float(np.min(d)) if np.size(d) else float(np.min(c.aa))
            sphrad[i] = (sphfactor if sphfactor else 0.8) * 0.5 * dmin

    def _traced_colors(pts, rt):
        """Pow-2-bucketed batched traces -> colors.  Bucketing bounds
        the set of compiled device programs (variable batch shapes
        would recompile the unrolled ODE chunk every level) without
        paying a full `block`-lane eval for a 50-point batch.
        (gradeps stays at the production 1e-7: a looser gradient floor
        retires traces mid-path in genuinely-flat low-density regions
        of smooth fields, dropping their charge into the unresolved
        bucket - measured 2e-4-e-class losses on a two-Gaussian
        crystal at 1e-5.)"""
        npts = len(pts)
        nb = min(block, max(256, 1 << int(np.ceil(np.log2(max(npts, 1))))))
        pad = (-npts) % nb
        if pad:
            pts = np.concatenate([pts, np.repeat(pts[-1:], pad, axis=0)])

        def _one_pass(pp, fnx):
            xf_, status, termid, _, _ = trace_paths(
                fnx, jnp.asarray(pp), iup=1, targets=tgtj,
                rterm=rt, mstep=600)
            st = np.asarray(status)
            ti = np.asarray(termid)
            cc = np.where((st == 0) & (ti >= 0),
                          tgt_ids[np.clip(ti, 0, len(tgt_ids) - 1)], -1)
            # gradient-zero finishers (saddles/nuclei): classify by
            # final-position proximity (the reference nudges corners
            # for the same reason, src/qtree_gpaths)
            gz = cc < 0
            if gz.any():
                xg = np.asarray(xf_)[gz]
                d = np.linalg.norm(xg[:, None, :] - tgt[None, :, :],
                                   axis=2)
                kbest = d.argmin(axis=1)
                okm = d[np.arange(len(xg)), kbest] < 0.5
                cc[np.nonzero(gz)[0][okm]] = tgt_ids[kbest[okm]]
            return cc

        cols = np.empty(len(pts), dtype=int)
        for lo in range(0, len(pts), nb):
            sl = slice(lo, lo + nb)
            cols[sl] = _one_pass(pts[sl], fn)
        if fn is not fn64:
            # mixed/f32 primary pass: lanes that failed to resolve (f32
            # gmod noise can false-trigger the gradient-zero stop in
            # flat regions) retrace from their seeds at full f64
            bad = np.nonzero(cols < 0)[0]
            if len(bad):
                nb2 = min(block, max(256, 1 << int(
                    np.ceil(np.log2(len(bad))))))
                pp = pts[bad]
                pad2 = (-len(pp)) % nb2
                if pad2:
                    pp = np.concatenate(
                        [pp, np.repeat(pp[-1:], pad2, axis=0)])
                cc2 = np.empty(len(pp), dtype=int)
                for lo in range(0, len(pp), nb2):
                    cc2[lo:lo + nb2] = _one_pass(pp[lo:lo + nb2], fn64)
                cols[bad] = cc2[:len(bad)]
        return cols[:npts]

    # beta-sphere verification (reference find_beta / tetrahedral-grid
    # branch, src/qtree@proc.f90:816,963): shrink each auto radius
    # until every surface gradient path terminates at its own nucleus
    if sphfactor is None and sphrad is not None:
        from ..ops.lebedev import lebedev

        dirs, _ = lebedev(26)
        rt_small = jnp.full(len(tgt), 0.2)
        xc_at = np.asarray(c.x_cart)
        for _ in range(5):
            pts = (xc_at[:, None, :]
                   + sphrad[:, None, None] * dirs[None, :, :]).reshape(-1, 3)
            cols = _traced_colors(pts, rt_small).reshape(nat, len(dirs))
            ntraced += pts.shape[0]
            bad = (cols != np.arange(nat)[:, None]).any(axis=1)
            if not bad.any():
                break
            sphrad[bad] *= 0.75

    # traces terminate at the beta-sphere surface when spheres are
    # active (a gradient path entering the sphere of atom a must end at
    # a - the reference's qtree_gpaths use of beta spheres); else at
    # the reference's default 0.2-bohr capture radius
    rtj = (jnp.asarray(sphrad[tgt_ids]) if sphrad is not None
           else jnp.full(len(tgt), 0.2))

    def colors_of(points, seeds=None):
        """Basin color per point, cached by (ROUNDED RAW position,
        nudge-direction OCTANT) - a corner shared by several tetrahedra
        on the same side of a separatrix is traced ONCE (the
        reference's color_allocate stores one color per grid point,
        src/qtree_basic.f90; per-tet re-traces of shared corners were
        ~4x the necessary trace load).  `seeds` optionally supplies
        per-point trace START positions (the callers' centroid nudge,
        which unsticks zero-gradient symmetry corners).  The octant of
        seed-point joins the key because a corner lying exactly ON a
        separatrix takes the basin of its nudge side: keying on the
        raw position alone let the FIRST tet's nudge win and tets on
        the other side of the plane inherited the wrong color
        (measured on the exact-half two-Gaussian case at maxl=5:
        5.4e-5 e systematic bias vs 7.0e-6 e with octant keys - the
        r3 pre-cache level - for ~35% more traces, still ~3x fewer
        than per-tet re-tracing)."""
        nonlocal ntraced
        if seeds is None:
            seeds = points
            keys = [tuple(np.round(p, 8)) for p in points]
        else:
            dirs = np.sign(np.round(np.asarray(seeds) - np.asarray(points),
                                    9)).astype(np.int8)
            keys = [tuple(np.round(p, 8)) + tuple(d)
                    for p, d in zip(points, dirs)]
        if sphrad is not None:
            # inside-any-sphere check on device (beta spheres are
            # disjoint, so "inside any" == "inside the nearest")
            ins_d, km_d, _ = _sphere_info_dev(points)
            inside = np.asarray(ins_d)
            kb = np.asarray(km_d)
            for i in np.nonzero(inside)[0]:
                color_cache.setdefault(keys[i], int(tgt_ids[kb[i]]))
        need, seen = [], set()
        for i, k in enumerate(keys):
            if k not in color_cache and k not in seen:
                seen.add(k)
                need.append(i)
        if need:
            cols = _traced_colors(seeds[need], rtj)
            ntraced += len(need)
            for i, idx in enumerate(need):
                color_cache[keys[idx]] = cols[i]
        return np.array([color_cache[k] for k in keys])

    pops = np.zeros(nat + 1)
    vols = np.zeros(nat + 1)
    nrefined = 0

    def _field_at_dev(pts_flat):
        """Batched field values with shape-stable padded evals,
        DEVICE-resident output (host transfers happen only after the
        per-tet reduction).

        field_block > block: value-only evals are cheaper than the
        3-derivative traces, and the cubature queue is otherwise
        dispatch-latency-bound (hundreds of 8k chunks per level)."""
        npts = len(pts_flat)
        fb = field_block
        pad = (-npts) % fb if npts > fb else fb - npts
        p = (np.concatenate([pts_flat, np.repeat(pts_flat[-1:], pad,
                                                 axis=0)])
             if pad else pts_flat)
        outs = [fnv(jnp.asarray(p[lo:lo + fb].T))[0]
                for lo in range(0, len(p), fb)]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return out[:npts]

    def _field_at(pts_flat):
        return np.asarray(_field_at_dev(pts_flat))

    tgtT_j = jnp.asarray(tgt.T)
    rads_j = (jnp.asarray(sphrad[tgt_ids]) if sphrad is not None
              else jnp.zeros(len(tgt)))

    def _sphere_info_dev(pts):
        """Device (inside_any, kmin, dmin) in shape-stable chunks.
        The host numpy version of this N x 108 distance reduction was
        75% of the 256^3 qtree wall (profiled: 112 s of 152 on the
        1-core host)."""
        npts = len(pts)
        fb = field_block
        pad = (-npts) % fb if npts > fb else fb - npts
        p = (np.concatenate([pts, np.repeat(pts[-1:], pad, axis=0)])
             if pad else pts)
        parts = [_sphere_mask_dev(jnp.asarray(p[lo:lo + fb].T),
                                  tgtT_j, rads_j)
                 for lo in range(0, len(p), fb)]
        if len(parts) == 1:
            ins, km, dm = parts[0]
        else:
            ins = jnp.concatenate([q[0] for q in parts])
            km = jnp.concatenate([q[1] for q in parts])
            dm = jnp.concatenate([q[2] for q in parts])
        return ins[:npts], km[:npts], dm[:npts]

    def _outside_spheres(pts):
        """1.0 where the point lies outside every atom's beta sphere
        (min-image via the 27-cell target images), else 0.0 - device
        compute, numpy result."""
        ins, _, _ = _sphere_info_dev(pts)
        return np.where(np.asarray(ins), 0.0, 1.0)

    def _keast_contrib(tets_, rule):
        """Keast-rule (integral, volume) per tetrahedron. With beta
        spheres active, sphere interiors are excluded from the cubature
        (the reference integrates them by radial quadrature instead -
        qtree sphere integration, src/qtree@proc.f90 beta-sphere flow);
        the volume is then the same rule applied to the exterior
        indicator, so pops and vols stay consistent.

        Tet count padded to pow-2 (zero weights): the per-tet reduce
        then compiles once per (rule, bucket) instead of per queue
        depth, and only (T,) sums cross the host link."""
        from ..ops.quadrature import keast_points

        qpts, qw = keast_points(tets_, rule)
        T, nq = qw.shape
        Tp = 1 << int(np.ceil(np.log2(max(T, 256))))
        if Tp != T:
            qpts = np.concatenate([qpts, np.zeros((Tp - T, nq, 3))])
            qw = np.concatenate([qw, np.zeros((Tp - T, nq))])
        fv = _field_at_dev(qpts.reshape(-1, 3)).reshape(Tp, nq)
        qwj = jnp.asarray(qw)
        if sphrad is not None:
            ins, _, _ = _sphere_info_dev(qpts.reshape(-1, 3))
            outs = jnp.where(ins, 0.0, 1.0).reshape(Tp, nq)
        else:
            outs = jnp.ones((Tp, nq))
        c, v = _masked_keast_reduce(fv, outs, qwj)
        return np.asarray(c)[:T], np.asarray(v)[:T]

    def _sphere_integrals(nrad: int = 64, nang: int = 170):
        """Beta-sphere interiors by Gauss-Legendre radial x Lebedev
        angular quadrature - the nuclear cusp never reaches the
        tetrahedral cubature (reference sphere integration role)."""
        from ..ops.lebedev import lebedev

        sph, wang = lebedev(nang)          # wang sums to 1
        xg, wg = np.polynomial.legendre.leggauss(nrad)
        for a in range(nat):
            R = sphrad[a]
            r = 0.5 * R * (xg + 1.0)
            wr = 0.5 * R * wg * 4.0 * np.pi * r * r
            pts = (np.asarray(c.x_cart[a])[None, None, :]
                   + r[:, None, None] * sph[None, :, :]).reshape(-1, 3)
            fv = _field_at(pts).reshape(nrad, len(sph))
            pops[a] += float((fv @ wang) @ wr)
            vols[a] += 4.0 / 3.0 * np.pi * R ** 3

    def accumulate(contrib, volc, col, grp):
        """Retire contributions, replaying each through its orbit's
        atom permutations (the getiws multiplicity role)."""
        colb = np.where(col < 0, nat, col)
        for g in np.unique(grp):
            sel = grp == g
            for perm in orbit_perms[g]:
                np.add.at(pops, perm[colb[sel]], contrib[sel])
                np.add.at(vols, perm[colb[sel]], volc[sel])

    def retire(tets_, col, grp):
        """Integrate uniformly colored tetrahedra."""
        nonlocal nrefined
        if len(tets_) == 0:
            return
        if integ == "corner":
            vol = _tet_volume(tets_)
            fv = _field_at(tets_.reshape(-1, 3)).reshape(-1, 4)
            accumulate(vol * fv.mean(axis=1), vol, col, grp)
            return
        # adaptive Keast-pair refinement queue (CUBPACK role). The
        # queue is error-budgeted: nuclear-cusp tetrahedra would
        # otherwise subdivide 8-fold to maxrefine (8^maxrefine blowup,
        # the CUBPACK MAXPTS role) - when a depth exceeds max_queue
        # candidates only the worst-error max_queue/8 refine further
        # and the rest retire with the high-order estimate.
        cur_t, cur_c, cur_g = tets_, col, grp
        depth = 0
        while len(cur_t):
            hi, volhi = _keast_contrib(cur_t, keastnum)
            lo, _ = _keast_contrib(cur_t, keastlow)
            err = np.abs(hi - lo)
            ok = (err <= cub_abs) | (err <= cub_rel * np.abs(hi))
            if sphrad is not None and depth >= 3:
                # sphere-boundary discontinuity: the Keast pair keeps
                # disagreeing on tets crossing a beta-sphere surface no
                # matter how deep; 3 halvings localize the shell, then
                # the masked high-order estimate retires (the residual
                # is O(h^4) of the shell volume)
                co = _outside_spheres(cur_t.reshape(-1, 3)).reshape(-1, 4)
                crossing = (co.min(axis=1) == 0.0) & (co.max(axis=1) == 1.0)
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
            nrefined += int(bad.sum())
            cur_t = _subdivide(cur_t[bad])
            cur_c = np.repeat(cur_c[bad], 8)
            cur_g = np.repeat(cur_g[bad], 8)
            depth += 1

    minl_eff = min(minl, maxl)
    level = 0
    while True:
        if level < minl_eff:
            # below minl the uniformity test is never consulted - no
            # traces needed here, every corner recurs at level minl
            tets = _subdivide(tets)
            gidx = np.repeat(gidx, 8)
            level += 1
            continue
        # trace seeds are nudged toward the centroid (corners on exact
        # symmetry points have zero gradient), but the color CACHE is
        # keyed on the raw corner so tets sharing a vertex share one
        # trace
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
                # deepest level: split the mixed (separatrix-crossing)
                # tetrahedra by TRACING the color of every Keast node -
                # the rule then integrates the exactly-masked field, so
                # the residual is pure quadrature error on the
                # indicator (the reference's gradient-path point
                # assignment inside boundary tets,
                # src/qtree_tetrawork.f90 paint/color flow)
                from ..ops.quadrature import keast_points

                qpts, qw = keast_points(tets, keastnum)
                fv = _field_at(qpts.reshape(-1, 3)).reshape(qw.shape)
                if sphrad is not None and integ != "corner":
                    outs = _outside_spheres(
                        qpts.reshape(-1, 3)).reshape(qw.shape)
                else:
                    outs = np.ones_like(fv)
                ncols = colors_of(qpts.reshape(-1, 3)).reshape(qw.shape)
                if (ncols < 0).any():
                    # unresolved nodes (paths that died at a CP/ridge):
                    # inherit the nearest corner's color rather than
                    # dropping their volume (the reference inherits
                    # neighbor colors for failed terms)
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
                    m = (ncols == col) * outs
                    accumulate((fv * qw * m).sum(axis=1),
                               (qw * m).sum(axis=1),
                               np.full(len(tets), col, dtype=int), gidx)
            break
        tets = _subdivide(tets)
        gidx = np.repeat(gidx, 8)
        level += 1

    if sphrad is not None and integ != "corner":
        _sphere_integrals()

    if usesym and not c.ismolecule:
        # report per symmetry orbit: equivalent atoms share one basin
        # charge (the reference integrates and prints nneq atoms,
        # src/qtree@proc.f90 - the per-cell scatter is pure
        # discretization noise between equivalent regions)
        orb = np.asarray(c.spacegroup.orbit_of)
        for o in np.unique(orb):
            sel = np.nonzero(orb == o)[0]
            pops[sel] = pops[sel].mean()
            vols[sel] = vols[sel].mean()

    names = [c.species[c.species_of[q]].name for q in range(nat)]
    return QtreeResult(names=names, pops=pops[:nat], volumes=vols[:nat],
                       nlevels=level, ntraced=ntraced, nrefined=nrefined)
