"""Molecular integration meshes (Becke and Franchini weights).

Role of the reference meshmod (src/meshmod@proc.f90:78-231): per-atom
radial x angular product grids with Becke's fuzzy-cell partition weights
(JCP 88, 2547), radial maps rmesh_postg (r = rmid q/(1-q), rmid =
Z^(-1/3)) and rmesh_franchini, size tables z2nr/z2nang per quality level.

The angular factor uses the reference's own Lebedev-Laikov rules
(ops/lebedev, tables extracted from src/tools_math@lebedev.f90); the
Gauss-Legendre x uniform-phi product sphere remains available (the
gauleg_mquad alternative, src/integration@proc.f90:383). Node counts are
chosen to match or exceed the Lebedev degree of each quality level, so
integrals converge at least as fast; Lebedev tables can drop in later as
pure data.

The Becke partition weight triple loop (reference :160-190) vectorizes to
one device program over (points, atoms, atoms).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Mesh", "becke_mesh", "franchini_mesh", "z2nr", "z2nang",
           "product_sphere"]

# Franchini zeta per element (J. Comput. Chem. 34 (2013) 1819 SI),
# as used by the reference rmesh_franchini
_FR_ZETA = np.array([
    0.8, 0.9, 1.8, 1.4, 1.3, 1.1, 0.9, 0.9, 0.9, 0.9,
    1.4, 1.3, 1.3, 1.2, 1.1, 1.0, 1.0, 1.0, 1.5, 1.4,
    1.3, 1.2, 1.2, 1.2, 1.2, 1.2, 1.2, 1.1, 1.1, 1.1,
    1.1, 1.0, 0.9, 0.9, 0.9, 0.9, 1.4, 1.4, 1.1, 1.3,
    1.0, 1.2, 0.9, 0.9, 0.9, 1.0, 0.9, 1.0, 1.0, 1.3,
    1.2, 1.2, 0.9, 1.0, 1.7, 1.5, 1.5, 1.3, 1.3, 1.4,
    1.8, 1.4, 1.2, 1.3, 1.3, 1.4, 1.1, 1.1, 1.2, 1.6,
    1.4, 1.3, 1.2, 1.0, 1.0, 0.9, 1.3, 1.2, 1.2, 1.0,
    1.2, 1.2, 1.1, 1.2, 1.1, 2.1, 2.2, 1.8, 1.7, 1.3,
    1.4, 1.2, 1.2, 1.3, 1.4, 1.4, 1.7, 1.9, 1.9, 2.0,
    2.0, 1.6, 2.0])

_LVL = {"small": 1, "normal": 2, "good": 3, "vgood": 4, "amazing": 5,
        "ultra": 6}  # ultra: beyond the reference's 5 levels
                     # (src/meshmod@proc.f90 z2nr/z2nang stop at
                     # "amazing"); used by the parity harness to push
                     # mesh NELEC error under the 1e-6 basin-charge bar


def z2nr(z: int, lvl: int = 3) -> int:
    """Radial node count (reference z2nr)."""
    nr = 15
    for thr, val in ((2, 20), (10, 25), (18, 35), (36, 60), (54, 85),
                     (86, 110)):
        if z > thr:
            nr = val
    fac = {1: 2.37, 2: 3.08, 3: 3.42, 4: 4.27, 5: 6.72,
           6: 10.1}[lvl]
    return int(np.ceil(nr * fac))


def z2nang(z: int, lvl: int = 3) -> int:
    """Angular node-count target (reference z2nang; Lebedev sizes)."""
    return {1: 110, 2: 194, 3: 302, 4: 590, 5: 770, 6: 1202}[lvl]


def _lebedev_degree(nang: int) -> int:
    """Polynomial degree of the Lebedev rule of size ~nang."""
    table = {110: 17, 194: 23, 302: 29, 590: 41, 770: 47, 1202: 59}
    return table.get(nang, int(np.sqrt(3 * nang)))


def product_sphere(degree: int):
    """Gauss-Legendre(cos theta) x uniform(phi) sphere rule exact to the
    given polynomial degree; weights sum to 1."""
    nt = (degree + 1) // 2 + 1
    np_phi = degree + 1
    xt, wt = np.polynomial.legendre.leggauss(nt)
    phi = 2 * np.pi * (np.arange(np_phi) + 0.5) / np_phi
    ct = xt[:, None]
    st = np.sqrt(1 - ct ** 2)
    x = (st * np.cos(phi)[None, :]).ravel()
    y = (st * np.sin(phi)[None, :]).ravel()
    z = np.broadcast_to(ct, (nt, np_phi)).ravel()
    w = np.broadcast_to(wt[:, None] / (2 * np_phi), (nt, np_phi)).ravel()
    return np.stack([x, y, z], axis=1), w


def rmesh_postg(n: int, z: int):
    """Radial nodes/weights (reference rmesh_postg): r = rmid q/(1-q)
    on a uniform q in (0,1); weights include 4 pi r^2 dr/dq."""
    rmid = 1.0 / z ** (1.0 / 3.0)
    h = 1.0 / (n + 1)
    q = h * np.arange(1, n + 1)
    r = rmid * q / (1.0 - q)
    w = 4.0 * np.pi * h * r ** 2 * rmid / (1.0 - q) ** 2
    return r, w


@dataclass
class Mesh:
    x: np.ndarray       # (n, 3) Cartesian bohr
    w: np.ndarray       # (n,) quadrature weights (include Becke partition)

    @property
    def n(self):
        return len(self.w)

    def integrate(self, values) -> float:
        return float(np.asarray(values) @ self.w)


def _becke_weights(points, atpos):
    """Becke fuzzy-cell weight of each point w.r.t. its parent atom is
    computed by the caller; this returns the full (N, nat) cell weights.

    The distances are formed in the input dtype (f64 positions), the
    mu/polynomial/product stage in the dtype of `points` after cast by
    the caller; outputs keep that dtype."""
    d = jnp.linalg.norm(points[:, None, :] - atpos[None, :, :], axis=-1)
    rr = jnp.linalg.norm(atpos[:, None, :] - atpos[None, :, :], axis=-1)
    rr = jnp.where(rr < 1e-14, 1.0, rr)
    mu = (d[:, :, None] - d[:, None, :]) / rr[None, :, :]
    f = mu
    for _ in range(4):
        f = 1.5 * f - 0.5 * f ** 3
    s = 0.5 * (1.0 - f)
    nat = atpos.shape[0]
    s = jnp.where(jnp.eye(nat, dtype=bool)[None, :, :], 1.0, s)
    P = jnp.prod(s, axis=2)                    # (N, nat) cell products
    return P / P.sum(axis=1, keepdims=True)


# module-level jits: fresh per-call closures/wraps would retrace (and
# re-deserialize from the persistent compile cache) on every call
_becke_weights_jit = jax.jit(_becke_weights)


def _becke_weights_knn(points, atpos, nbr):
    """Becke cell weights restricted to each point's nbr (N, k) atom
    set; returns (N, k) weights aligned with nbr.  The caller selects
    nbr by the switching argument mu (see _becke_parent_weights_knn):
    an atom excluded at mu <= -MU_CUT has s -> 1 within ~3e-11 (the
    4-iteration Becke polynomial converges as e' = 1.5 e^2 near
    mu = -1), so truncating the product changes the partition by
    < nat * 3e-11.  This bounds the cost at O(N k^2) instead of
    O(N nat^2) - the difference between 5.7e10 and 8.3e12 ops on a
    768-atom assembly (the cps_large scale)."""
    ap = atpos[nbr]                                     # (N, k, 3)
    d = jnp.linalg.norm(points[:, None, :] - ap, axis=-1)   # (N, k)
    rr = jnp.linalg.norm(ap[:, :, None, :] - ap[:, None, :, :], axis=-1)
    rr = jnp.where(rr < 1e-14, 1.0, rr)
    mu = (d[:, :, None] - d[:, None, :]) / rr
    f = mu
    for _ in range(4):
        f = 1.5 * f - 0.5 * f ** 3
    s = 0.5 * (1.0 - f)
    k = nbr.shape[1]
    s = jnp.where(jnp.eye(k, dtype=bool)[None, :, :], 1.0, s)
    P = jnp.prod(s, axis=2)
    return P / P.sum(axis=1, keepdims=True)


_becke_weights_knn_jit = jax.jit(_becke_weights_knn)


def _becke_weights_chunked(x, atpos, dtype=np.float64,
                           block: int | None = None,
                           mu_budget_bytes: int = 1 << 30) -> np.ndarray:
    """Becke cell weights (N, nat), chunked so the (N, nat, nat) mu
    tensor stays bounded (an ultra benzene mesh is 2.5M x 12 x 12 f64 =
    2.9 GB per temporary in one program).  The chunk scales with the
    ATOM COUNT: a fixed block that is fine for benzene allocates
    block x nat^2 = 2.5 TB at a 768-atom assembly (the cps_large
    scale), so the default bounds the mu temporary at ~1 GB.
    dtype=f32 is the fast-build path: the weight eval is memory-bound
    on the (N, nat, nat) mu tensor and the v5e emulates f64 vector ops
    ~10x slower, while the per-point f32 relative weight error (~1e-7,
    random sign) cancels in quadrature sums - measured 3.4e-8 e on the
    2.55M-point benzene ultra-mesh NELEC (f32 weights x f64 rho vs
    all-f64)."""
    atj = jnp.asarray(np.asarray(atpos, dtype))
    n = len(x)
    if block is None:
        nat = int(atj.shape[0])
        per_pt = max(1, nat * nat * np.dtype(dtype).itemsize)
        block = 1 << max(10, min(19, int(np.log2(
            max(1, mu_budget_bytes // per_pt)))))
    out = np.empty((n, atj.shape[0]), dtype)
    if n <= block:
        return np.asarray(_becke_weights_jit(
            jnp.asarray(np.asarray(x, dtype)), atj))
    # fixed-shape chunks (pad the tail): one compiled program per
    # (block, nat, dtype) regardless of mesh size
    for lo in range(0, n, block):
        chunk = np.asarray(x[lo:lo + block], dtype)
        m = len(chunk)
        if m < block:
            chunk = np.concatenate(
                [chunk, np.broadcast_to(chunk[:1], (block - m, 3))])
        out[lo:lo + m] = np.asarray(
            _becke_weights_jit(jnp.asarray(chunk), atj))[:m]
    return out


@jax.jit
def _franchini_weights(x, vp0, pos_env, fscal):
    d = jnp.linalg.norm(x[:, None, :] - pos_env[None, :, :], axis=-1)
    vp = fscal[None, :] * jnp.exp(-2.0 * d) \
        / jnp.maximum(d, 1e-10) ** 3
    vpsum = jnp.maximum(vp.sum(1), vp0)
    return vp0 / jnp.maximum(vpsum, 1e-40)


def rmesh_franchini(n: int, z: int):
    """Franchini radial map (reference rmesh_franchini):
    r = zeta/ln2 (1+q) ln(2/(1-q)) on Gauss-Legendre q in (-1,1)."""
    zeta = _FR_ZETA[min(max(z, 1), len(_FR_ZETA)) - 1]
    q, w = np.polynomial.legendre.leggauss(n)
    log2 = np.log(2.0)
    r = zeta / log2 * (1.0 + q) * np.log(2.0 / (1.0 - q))
    wr = (4.0 * np.pi * r ** 2 * w * zeta / log2
          * (np.log(2.0 / (1.0 - q)) + (1.0 + q) / (1.0 - q)))
    return r, wr


def franchini_mesh(crystal, lvl="good", rthres: float = 12.0) -> Mesh:
    """Periodic molecular-style mesh with Franchini weights (reference
    genmesh_franchini, src/meshmod@proc.f90:231-370): per-atom radial x
    angular nodes, cell weight vp = fscal exp(-2r)/r^3 normalized by the
    max over the promolecular-style sum within rthres; fscal = 0.3 for H.
    Works for crystals (the Becke weights need a double atom sum)."""
    if isinstance(lvl, str):
        lvl = _LVL[lvl]
    c = crystal
    zs = np.asarray(c.zatoms)
    # atom images within rthres of the cell for the weight denominators
    pos_env, spc_env, _ = c.atomic_environment(rthres) \
        if not c.ismolecule else (np.asarray(c.x_cart),
                                  np.asarray(c.species_of),
                                  np.arange(c.ncel))
    z_env = np.array([c.species[s].z for s in spc_env], dtype=float)
    fscal_env = np.where(z_env == 1, 0.3, 1.0)
    pos_env_j = jnp.asarray(pos_env)
    fscal_j = jnp.asarray(fscal_env)

    def weights(x, vp0):
        return _franchini_weights(x, vp0, pos_env_j, fscal_j)

    xs, ws = [], []
    atpos = np.asarray(c.x_cart)
    for i, z in enumerate(zs):
        if z < 1:
            continue
        nr = z2nr(int(z), lvl)
        from ..ops.lebedev import lebedev

        sph, wang = lebedev(z2nang(int(z), lvl))
        r, wr = rmesh_franchini(nr, int(z))
        fscal = 0.3 if z == 1 else 1.0
        pts = atpos[i][None, None, :] + r[:, None, None] * sph[None, :, :]
        pts = pts.reshape(-1, 3)
        vp0 = fscal * np.exp(-2.0 * r) / np.maximum(r, 1e-10) ** 3
        vp0 = np.repeat(vp0, len(sph))
        wgt = np.asarray(weights(jnp.asarray(pts), jnp.asarray(vp0)))
        wtot = (wr[:, None] * wang[None, :]).ravel() * wgt
        xs.append(pts)
        ws.append(wtot)
    return Mesh(x=np.concatenate(xs), w=np.concatenate(ws))


def becke_mesh(crystal, lvl="good", weights_dtype=np.float64) -> Mesh:
    """Generate the Becke molecular mesh (reference genmesh_becke).

    Cached per (crystal, lvl, weights dtype): drivers re-integrate
    several properties over the same mesh.  weights_dtype=np.float32
    is the fast-build path (the ultra mesh of benzene costs ~17 s of
    f64 Becke-weight evaluation on the v5e vs ~2 s in f32) with a
    measured 3.4e-8 e quadrature effect - see _becke_weights_chunked;
    production integrals pair it with an all-f64 density sweep."""
    if isinstance(lvl, str):
        lvl = _LVL[lvl]
    key = (lvl, np.dtype(weights_dtype).name)
    cache = getattr(crystal, "_becke_mesh_cache", None)
    if cache is None:
        cache = {}
        try:
            crystal._becke_mesh_cache = cache
        except Exception:       # frozen dataclass: skip caching
            cache = None
    if cache is not None and key in cache:
        return cache[key]
    m = None
    disk = None
    if len(np.asarray(crystal.x_cart)) >= _KNN_NAT_MIN or lvl >= 5:
        # disk cache for LARGE meshes: the KNN weight build of a
        # 14M-point 768-atom mesh costs ~10 min of device dispatches
        # per process, and even the benzene ultra mesh (2.55M points)
        # costs ~15 s of weight evaluation + point generation; keyed
        # by a hash of (positions, Z, lvl, dtype)
        import hashlib
        import os
        import tempfile

        hsh = hashlib.sha256()
        hsh.update(np.round(np.asarray(crystal.x_cart), 9).tobytes())
        hsh.update(np.asarray(crystal.zatoms).tobytes())
        hsh.update(f"{lvl}:{np.dtype(weights_dtype).name}".encode())
        disk = os.path.join(tempfile.gettempdir(),
                            f"critic2_becke_{hsh.hexdigest()[:16]}.npz")
        if os.path.exists(disk):
            try:
                dat = np.load(disk)
                m = Mesh(x=dat["x"], w=dat["w"])
            except Exception:
                m = None
    if m is None:
        m = _becke_mesh_build(crystal, lvl, weights_dtype)
        if disk is not None:
            try:
                np.savez(disk + ".tmp.npz", x=m.x, w=m.w)
                os.replace(disk + ".tmp.npz", disk)
            except Exception:
                pass
    if cache is not None:
        cache[key] = m
    return m


def _becke_mesh_points(crystal, lvl: int):
    """The radial x Lebedev product points of the Becke mesh (no
    partition weights): (x (N,3), wraw (N,), parent (N,) atom ids)."""
    atpos = np.asarray(crystal.x_cart)
    zs = np.asarray(crystal.zatoms)
    xs, ws, parents = [], [], []
    for i, z in enumerate(zs):
        if z < 1:
            continue
        nr = z2nr(int(z), lvl)
        from ..ops.lebedev import lebedev

        sph, wang = lebedev(z2nang(int(z), lvl))
        r, wr = rmesh_postg(nr, int(z))
        pts = atpos[i][None, None, :] + r[:, None, None] * sph[None, :, :]
        wt = wr[:, None] * wang[None, :]
        xs.append(pts.reshape(-1, 3))
        ws.append(wt.ravel())
        parents.append(np.full(wt.size, i))
    return np.concatenate(xs), np.concatenate(ws), np.concatenate(parents)


@jax.jit
def _knn_parent_weight(points, atpos, nbr, ppos):
    bw = _becke_weights_knn(points, atpos, nbr)
    return bw[jnp.arange(bw.shape[0]), ppos]


from functools import partial as _partial  # noqa: E402


@jax.jit
def _mu_need_counts(points, atposf, rr, par, mu_cut):
    """Per-point count of atoms with switching argument mu > -mu_cut
    (device; the host version of this (B, nat) reduction was the wall
    of the 14M-point 768-atom mesh build)."""
    d = jnp.linalg.norm(points[:, None, :] - atposf[None, :, :], axis=2)
    dp = jnp.take_along_axis(d, par[:, None], axis=1)[:, 0]
    rrp = rr[par]
    mu = (dp[:, None] - d) / jnp.where(rrp < 1e-14, 1.0, rrp)
    mu = mu.at[jnp.arange(points.shape[0]), par].set(jnp.inf)
    return (mu > -mu_cut).sum(axis=1).astype(jnp.int32)


@_partial(jax.jit, static_argnames=("K",))
def _knn_parent_weight_fused(points64, pointsw, atposf, atposw, rr, par,
                             K):
    """mu-threshold neighbor selection (top-K by mu, ON DEVICE) fused
    with the Becke parent-weight evaluation.  points64/atposf carry the
    f64 geometry for the mu ranking; pointsw/atposw carry the weight
    dtype (f32 fast-build or f64)."""
    B = points64.shape[0]
    d = jnp.linalg.norm(points64[:, None, :] - atposf[None, :, :],
                        axis=2)
    dp = jnp.take_along_axis(d, par[:, None], axis=1)[:, 0]
    rrp = rr[par]
    mu = (dp[:, None] - d) / jnp.where(rrp < 1e-14, 1.0, rrp)
    mu = mu.at[jnp.arange(B), par].set(jnp.inf)
    nat = atposf.shape[0]
    if K >= nat:
        nbr = jnp.broadcast_to(jnp.arange(nat, dtype=jnp.int32),
                               (B, nat))
    else:
        _, nbr = jax.lax.top_k(mu, K)
        nbr = nbr.astype(jnp.int32)
    ppos = jnp.argmax(nbr == par[:, None], axis=1)
    bw = _becke_weights_knn(pointsw, atposw, nbr)
    return bw[jnp.arange(B), ppos]


_MU_CUT = 0.85    # atoms with switching argument mu_pj <= -_MU_CUT are
                  # excluded from a point's Becke product: near mu = -1
                  # the 4x-iterated polynomial converges as e' = 1.5e^2
                  # (e = 1+mu), so e = 0.15 -> |1 - s| ~ 3e-11 per
                  # excluded atom - a provable per-point bound, unlike
                  # a fixed k-nearest cut (whose worst-case error in a
                  # packed cluster measured 1e-4 at interior points)


def _becke_parent_weights_knn(x, atpos, parent, dtype=np.float64,
                              block: int = 1 << 14,
                              mu_cut: float = _MU_CUT) -> np.ndarray:
    """Parent-atom Becke weight per mesh point via the mu-threshold
    neighbor truncation (used above _KNN_NAT_MIN atoms; see
    _becke_weights_knn).  Each point keeps the atoms with switching
    argument mu_pj > -mu_cut (the parent has mu = +inf); points are
    sorted by their required neighbor count and processed in blocks
    whose K is the block max quantized to 8 * 2^m, so the compiled
    shape count stays logarithmic while interior points (small K,
    most of the quadrature mass) stay O(K^2) cheap.  Far radial-shell
    points see every atom as equidistant and fall back to K = nat -
    there the truncation is empty, i.e. exact.

    The (B, nat) mu tensors and the top-K neighbor selection run ON
    DEVICE (_mu_need_counts / _knn_parent_weight_fused): the original
    host-NumPy version spent ~1 GB of memory traffic per 16k block and
    took the better part of an hour over the 14M-point 768-atom cps
    mesh; the host now only sorts and scatters."""
    nat = len(atpos)
    atposf = np.asarray(atpos, float)
    rr = np.linalg.norm(atposf[:, None, :] - atposf[None, :, :], axis=2)
    n = len(x)
    xf = np.asarray(x, float)
    atj64 = jnp.asarray(atposf)
    atj = jnp.asarray(np.asarray(atpos, dtype))
    rrj = jnp.asarray(rr)
    parj = np.asarray(parent, np.int32)

    def padded(arr, m):
        if m == block:
            return arr
        return np.concatenate(
            [arr, np.broadcast_to(arr[:1], (block - m,) + arr.shape[1:])])

    need = np.empty(n, dtype=np.int32)
    for lo in range(0, n, block):
        idx = np.arange(lo, min(lo + block, n))
        m = len(idx)
        need[idx] = np.asarray(_mu_need_counts(
            jnp.asarray(padded(xf[idx], m)), atj64, rrj,
            jnp.asarray(padded(parj[idx], m)), mu_cut))[:m]
    order = np.argsort(need, kind="stable")
    out = np.empty(n, dtype)
    # the Becke product needs a (B, K, K) pair tensor per block; bound
    # it at ~1.5 GB by shrinking the block as K grows (at K = 512 a
    # 16384-point block planned a 16 GB temporary and the v5e refused
    # to compile).  Distinct (B, K) compile shapes stay bounded: one
    # per K quantization level.
    pair_budget = 1.5e9
    isz = np.dtype(dtype).itemsize
    lo = 0
    while lo < n:
        # fixed point: K is the block max's quantized level, bK the
        # largest pow-2 block whose (bK, K, K) tensor fits the budget.
        # Shrinking bK drops the highest-need points (the order is
        # need-ascending), so K never grows across iterations and the
        # loop terminates.
        bK = block
        while True:
            idx = order[lo:lo + bK]
            kmax = int(need[idx].max())
            K = nat if kmax > nat // 2 else min(
                nat, 8 << max(0, int(np.ceil(np.log2(max(1, kmax) / 8)))))
            bK_ok = min(block, max(256, 1 << int(np.floor(np.log2(
                max(256.0, pair_budget / (K * K * isz)))))))
            if bK <= bK_ok:
                break
            bK = bK_ok
        m = len(idx)

        def padb(arr):
            if m == bK:
                return arr
            return np.concatenate(
                [arr, np.broadcast_to(arr[:1], (bK - m,) + arr.shape[1:])])

        p64 = jnp.asarray(padb(xf[idx]))
        pw_ = jnp.asarray(padb(np.asarray(xf[idx], dtype)))
        pj = jnp.asarray(padb(parj[idx]))
        if n > (1 << 22) and lo % (1 << 22) < bK:
            import sys
            print(f"[becke_knn] {lo}/{n} (B={bK}, K={K})",
                  file=sys.stderr, flush=True)
        out[idx] = np.asarray(_knn_parent_weight_fused(
            p64, pw_, atj64, atj, rrj, pj, int(K)))[:m]
        lo += bK
    return out


_KNN_NAT_MIN = 65       # above this, the O(N nat^2) dense Becke path
                        # is replaced by the k-nearest truncation


def _becke_mesh_build(crystal, lvl: int, weights_dtype=np.float64) -> Mesh:
    x, wraw, parent = _becke_mesh_points(crystal, lvl)
    atpos = np.asarray(crystal.x_cart)
    if len(atpos) >= _KNN_NAT_MIN:
        wpar = _becke_parent_weights_knn(x, atpos, parent,
                                         dtype=weights_dtype)
    else:
        bw = _becke_weights_chunked(x, atpos, dtype=weights_dtype)
        wpar = bw[np.arange(len(x)), parent]
    w = wraw * wpar
    return Mesh(x=x, w=w)
