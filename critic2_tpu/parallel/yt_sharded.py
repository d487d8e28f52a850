"""Sharded Yu-Trinkle integration: the sorted sweep as a slab-parallel
fixpoint with halo exchange.

Role: the reference YT sweep is strictly sequential in descending-rho
order (src/yt@proc.f90:106-190); SURVEY section 5.8 names its sharded
counterpart as the hard first-class feature. The key observation: the
sorted sweep is just one solution order for the linear recurrence

    w_i(b) = sum_k chi_ik w_k(b),   chi_ik ~ A_k (rho_k - rho_i)/l_k

over UPHILL Wigner-Seitz facet neighbors k of i - an acyclic system
(dependencies strictly increase rho, with the reference's stable-rank
tie-break). Any fixpoint iteration converges to the same weights in at
most longest-uphill-chain steps. Here every shard holds its slab of the
NORMALIZED flux tensors chi (computed once, identical semantics to the
single-device analysis/yt._flux_tensors: plateau points attach their
whole weight to the single lexicographically-best (max rho, min index)
uphill neighbor — no epsilon fluxes) and updates its slab's weight
field (nattr, m, n2, n3) in lockstep, with `lax.ppermute` halo
exchanges along the sharded axis — mathematically identical to the
reference weights, fully data-parallel.  Attractor detection runs on
device inside the same sharded program (host cost: one bool grid).

Memory note: this variant stores DENSE per-basin weights (nattr x local
grid), the transparent choice when nattr is moderate (the single-device
yt_integrate keeps the reference's boundary-only compression and is the
tool for very large attractor counts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["yt_integrate_sharded", "ShardedYTResult"]


class ShardedYTResult:
    """Duck-type of analysis.yt.YTResult over the dense sharded weights,
    so intgrid/multipoles can consume the multi-device path unchanged."""

    def __init__(self, crystal, shape, nattr, xattr, iattr, labels, wflat):
        self.crystal = crystal
        self.shape = shape
        self.nattr = nattr
        self.xattr = xattr
        self.iattr = iattr
        self.labels = labels
        self._wflat = wflat          # (nattr, N) device array (sharded)

    def integrate(self, field_flat) -> np.ndarray:
        """sum_i w_i(b) f_i per basin (NOT scaled by Omega/N).
        Accepts one integrand (N,) or a stack (nprops, N)."""
        f = jnp.asarray(field_flat)
        if f.size == self._wflat.shape[1]:
            return np.asarray(self._wflat @ f.reshape(-1))
        return np.asarray(f.reshape(f.shape[0], -1) @ self._wflat.T)

    def weights(self, b: int) -> np.ndarray:
        return np.asarray(self._wflat[b]).reshape(self.shape)

    def basin_support(self, a: int, tol: float = 1e-15):
        """(flat indices, weights) of every point with weight > tol in
        basin `a` — the dense YT fractional weights, NOT argmax labels."""
        w = np.asarray(self._wflat[a]).reshape(-1)
        idx = np.where(w > tol)[0]
        return idx, w[idx]


def yt_integrate_sharded(mesh, crystal, rho, fields_flat=None,
                         max_iters: int | None = None,
                         result: bool = False):
    """YT basin charges over a slab-sharded grid.

    mesh: device mesh with a "space" axis; rho (n1, n2, n3) with n1
    divisible by the space axis. fields_flat: optional (nf, N) extra
    integrands. Returns (xattr (nattr, 3) fractional, charges (nf+1,
    nattr) basin sums of rho and the integrands, labels (n1, n2, n3)
    argmax assignment) — or, with result=True, a ShardedYTResult that
    plugs into analysis.integration.intgrid in place of YTResult.
    """
    from ..analysis.yt import _grid_ws_neighbors

    rho = np.asarray(rho)
    shape = tuple(int(v) for v in rho.shape)
    n1, n2, n3 = shape
    N = n1 * n2 * n3
    nspace = mesh.shape["space"]
    if n1 % nspace:
        raise ValueError(f"n1={n1} not divisible by space={nspace}")
    m = n1 // nspace

    offs_np, wts_np = _grid_ws_neighbors(crystal, shape)
    offs = tuple(tuple(int(v) for v in o) for o in np.asarray(offs_np))
    K = len(offs)
    H = max(abs(o[0]) for o in offs)             # halo width along axis 0
    if H > m:
        raise ValueError("halo wider than slab; use fewer shards")

    dt = jnp.asarray(rho[:1]).dtype
    rho_j = jax.device_put(jnp.asarray(rho),
                           NamedSharding(mesh, P("space", None, None)))
    wts_j = jnp.asarray(wts_np, dtype=dt)
    fidx = jax.device_put(
        jnp.arange(N, dtype=jnp.int32).reshape(shape),
        NamedSharding(mesh, P("space", None, None)))
    slabspec = P(None, "space", None, None)

    nperm_fwd = [(i, (i + 1) % nspace) for i in range(nspace)]
    nperm_bwd = [(i, (i - 1) % nspace) for i in range(nspace)]

    def halo3(r):
        """(m, n2, n3) -> (m + 2H, n2, n3) with periodic slab halos."""
        left = lax.ppermute(r[-H:], "space", nperm_fwd)
        right = lax.ppermute(r[:H], "space", nperm_bwd)
        return jnp.concatenate([left, r, right], axis=0)

    def halo4(w):
        """(B, m, n2, n3) -> (B, m + 2H, n2, n3)."""
        left = lax.ppermute(w[:, -H:], "space", nperm_fwd)
        right = lax.ppermute(w[:, :H], "space", nperm_bwd)
        return jnp.concatenate([left, w, right], axis=1)

    # ---- flux tensors + attractor mask (device, sharded) -----------
    # identical semantics to analysis/yt._flux_tensors: uphill means
    # (rho_k, -idx_k) >lex (rho_0, -idx_0); plateau fallback sends all
    # weight to the lexicographically best uphill neighbor
    def chi_kernel(rslab, fslab):
        rp = halo3(rslab)
        fp = halo3(fslab)
        r0 = rp[H:H + m]
        f0 = fp[H:H + m]
        chis = []
        tot = jnp.zeros((m, n2, n3), dt)
        anyhi = jnp.zeros((m, n2, n3), bool)
        best_rho = jnp.full((m, n2, n3), -jnp.inf, dt)
        best_idx = jnp.zeros((m, n2, n3), jnp.int32)
        best_k = jnp.zeros((m, n2, n3), jnp.int32)
        for k, o in enumerate(offs):
            sh = (-o[0], -o[1], -o[2])
            rk = jnp.roll(rp, sh, (0, 1, 2))[H:H + m]
            fk = jnp.roll(fp, sh, (0, 1, 2))[H:H + m]
            hi = (rk > r0) | ((rk == r0) & (fk < f0))
            chi = jnp.maximum(jnp.where(hi, wts_j[k] * (rk - r0), 0.0), 0.0)
            chis.append(chi)
            tot = tot + chi
            anyhi = anyhi | hi
            upd = hi & ((rk > best_rho)
                        | ((rk == best_rho) & (fk < best_idx)))
            best_rho = jnp.where(upd, rk, best_rho)
            best_idx = jnp.where(upd, fk, best_idx)
            best_k = jnp.where(upd, k, best_k)
        haspos = tot > 0
        inv = jnp.where(haspos, 1.0 / jnp.where(haspos, tot, 1.0), 0.0)
        out = []
        for k in range(K):
            fb = jnp.where(anyhi & (best_k == k), jnp.ones((), dt), 0.0)
            out.append(jnp.where(haspos, chis[k] * inv, fb))
        return jnp.stack(out), ~anyhi

    chi_fn = jax.jit(jax.shard_map(
        chi_kernel, mesh=mesh,
        in_specs=(P("space", None, None), P("space", None, None)),
        out_specs=(slabspec, P("space", None, None)), check_vma=False))
    chiP, is_attr = chi_fn(rho_j, fidx)

    # small host transfers only: the bool mask and the attractor rhos
    is_attr_np = np.asarray(is_attr).reshape(-1)
    iattr = np.flatnonzero(is_attr_np)
    rho_at = rho.reshape(-1)[iattr]
    iattr = iattr[np.lexsort((iattr, -rho_at))]   # sweep-appearance order
    nattr = len(iattr)
    xattr = np.stack(np.unravel_index(iattr, shape), axis=1) \
        / np.asarray(shape)

    # ---- sharded fixpoint w = seed + R w ---------------------------
    seed = np.zeros((nattr, N))
    seed[np.arange(nattr), iattr] = 1.0
    seed = jax.device_put(jnp.asarray(seed.reshape(nattr, *shape), dt),
                          NamedSharding(mesh, slabspec))

    def run(chi_slab, seed_slab, w0, niter):
        def body(_, w):
            wp = halo4(w)
            acc = seed_slab
            for k, o in enumerate(offs):
                sh = (-o[0], -o[1], -o[2])
                acc = acc + chi_slab[k] * jnp.roll(
                    wp, sh, (1, 2, 3))[:, H:H + m]
            return acc
        return lax.fori_loop(0, niter, body, w0)

    fn = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(slabspec, slabspec, slabspec, P()),
        out_specs=slabspec, check_vma=False))

    if max_iters is None:
        max_iters = n1 + n2 + n3 + 16
    chunk = max(8, (n1 + n2 + n3) // 4)
    it = 0
    w = seed
    while it < max_iters:
        w = fn(chiP, seed, w, jnp.int32(chunk))
        it += chunk
        punity = float(jnp.abs(w.sum(0) - 1.0).max())
        if punity < 1e-12:
            break

    # ---- charges + labels -------------------------------------------
    wflat = w.reshape(nattr, N)
    integrands = [jnp.asarray(rho).reshape(-1)]
    if fields_flat is not None:
        for f in np.atleast_2d(fields_flat):
            integrands.append(jnp.asarray(f).reshape(-1))
    charges = np.stack([np.asarray(wflat @ f) for f in integrands])
    labels = np.asarray(jnp.argmax(wflat, axis=0)).reshape(shape)
    if result:
        return ShardedYTResult(crystal, shape, nattr, xattr, iattr,
                               labels, wflat)
    return xattr, charges, labels
