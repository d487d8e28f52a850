"""Sharded grid-field evaluation: slab decomposition + halo exchange.

The workload the reference runs as an OpenMP loop over a shared-memory
grid (interpolation hot loops, src/grid3mod@proc.f90:1978-2143; property
accumulation, src/integration@proc.f90:949-1178) becomes here a
`shard_map` program over a ("space", "points") mesh:

  grid  : slab-sharded along axis 0 over "space", replicated over "points"
  points: sharded over "points", replicated over "space"

Each space shard exchanges one halo plane leftward and two rightward with
`lax.ppermute` (cyclic, so periodic wrap is free), evaluates the tricubic
stencil for the points whose base plane it owns, and the partial results
are `psum`-combined over "space" (each point has exactly one owner).
Weighted reductions (basin sums) then `psum` over "points".
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops.interp import _axes01, _axis2, _catmull_rom_weights

__all__ = ["sharded_eval_fn", "slab_tricubic"]


def _halo_pad(slab, axis_name="space"):
    """Return slab padded with 1 left + 2 right halo planes along axis 0,
    exchanged cyclically over `axis_name` (periodic boundary for free)."""
    n = lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to right neighbor
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to left neighbor
    left = lax.ppermute(slab[-1:], axis_name, fwd)     # my left halo
    right = lax.ppermute(slab[:2], axis_name, bwd)     # my right halo
    return jnp.concatenate([left, slab, right], axis=0)


def slab_tricubic(slab_pad, xfracT, n_global, lo, nder: int = 2):
    """Tricubic interpolation against a padded slab, batch-last SoA.

    slab_pad: (m+3, n2, n3) local slab with halo planes [left1|slab|right2].
    xfracT: (3, N) fractional coords in [0,1).
    n_global: (3,) full grid shape; lo: global index of slab row 0.
    Returns (y (N,), yp (3, N), ypp6 (6, N)); points whose base plane is
    outside [lo, lo+m) return zeros (their owner shard computes them) -
    combine with psum over "space".
    """
    m = slab_pad.shape[0] - 3
    n = jnp.asarray(n_global, dtype=slab_pad.dtype)
    x = xfracT - jnp.floor(xfracT)
    xg = x * n[:, None]
    i0 = jnp.floor(xg).astype(jnp.int32)
    t = xg - i0

    own = (i0[0] >= lo) & (i0[0] < lo + m)
    row = jnp.clip(i0[0] - lo, 0, m - 1) + 1             # padded-row base
    offs = jnp.arange(-1, 3)
    ridx = row[None, :] + offs[:, None]                   # (4, N) in [0, m+2]
    cidx = (i0[1][None, :] + offs[:, None]) % n_global[1]
    didx = (i0[2][None, :] + offs[:, None]) % n_global[2]
    flat = (ridx[:, None, None, :] * (slab_pad.shape[1] * slab_pad.shape[2])
            + cidx[None, :, None, :] * slab_pad.shape[2]
            + didx[None, None, :, :])                     # (4,4,4,N)
    g = jnp.take(slab_pad.reshape(-1), flat.reshape(-1),
                 axis=0).reshape(flat.shape)

    w1, d1, s1 = (a.T for a in _catmull_rom_weights(t[0]))
    w2, d2, s2 = (a.T for a in _catmull_rom_weights(t[1]))
    w3, d3, s3 = (a.T for a in _catmull_rom_weights(t[2]))
    a0 = _axis2(g, w3)
    y = _axes01(a0, w1, w2)
    N = xfracT.shape[1]
    yp = jnp.zeros((3, N), slab_pad.dtype)
    ypp6 = jnp.zeros((6, N), slab_pad.dtype)
    if nder >= 1:
        a1 = _axis2(g, d3)
        gx = _axes01(a0, d1, w2)
        gy = _axes01(a0, w1, d2)
        gz = _axes01(a1, w1, w2)
        yp = jnp.stack([gx, gy, gz]) * n[:, None]
    if nder >= 2:
        a2 = _axis2(g, s3)
        hxx = _axes01(a0, s1, w2)
        hyy = _axes01(a0, w1, s2)
        hzz = _axes01(a2, w1, w2)
        hxy = _axes01(a0, d1, d2)
        hxz = _axes01(a1, d1, w2)
        hyz = _axes01(a1, w1, d2)
        nn = jnp.stack([n[0] * n[0], n[1] * n[1], n[2] * n[2],
                        n[0] * n[1], n[0] * n[2], n[1] * n[2]])
        ypp6 = jnp.stack([hxx, hyy, hzz, hxy, hxz, hyz]) * nn[:, None]
    mask = own.astype(slab_pad.dtype)
    return y * mask, yp * mask[None, :], ypp6 * mask[None, :]


def sharded_eval_fn(mesh, n_global, m_c2x, m_x2c, nder: int = 2):
    """Build a jitted sharded evaluator.

    Returns fn(grid, points_cart, weights) -> (f, gf, hf, wsum) where grid
    is slab-sharded over "space", points/weights sharded over "points",
    outputs gathered per points-shard, and wsum = sum(weights * f) psum'd
    over every axis (the basin-reduction pattern).
    """
    nspace = mesh.shape["space"]
    if n_global[0] % nspace:
        raise ValueError(f"grid axis 0 ({n_global[0]}) not divisible by "
                         f"space axis ({nspace})")
    m = n_global[0] // nspace
    m_c2x = jnp.asarray(m_c2x)
    ng = tuple(int(v) for v in n_global)

    from ..ops.eig3 import sym6_rotation
    r6 = jnp.asarray(sym6_rotation(m_c2x))

    def step(slab, pts, w):
        wxT = m_c2x @ pts.T
        wxT = wxT - jnp.floor(wxT)
        lo = lax.axis_index("space") * m
        pad = _halo_pad(slab)
        f, gfT_frac, h6_frac = slab_tricubic(pad, wxT, ng, lo, nder=nder)
        f = lax.psum(f, "space")
        gf = (m_c2x.T @ lax.psum(gfT_frac, "space")).T
        h6 = r6 @ lax.psum(h6_frac, "space")
        from ..ops.interp import sym6_to_mat
        hf = sym6_to_mat(h6)
        wsum = lax.psum(jnp.sum(w * f), ("space", "points")) / nspace
        return f, gf, hf, wsum

    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("space", None, None), P("points", None), P("points")),
        out_specs=(P("points"), P("points", None),
                   P("points", None, None), P()),
        check_vma=False)
    return jax.jit(fn)
