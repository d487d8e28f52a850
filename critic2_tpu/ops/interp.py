"""Batched periodic grid interpolation on device (JAX).

TPU-native replacement for the reference's per-point interpolators
(src/grid3mod@proc.f90: grinterp_nearest :1633, grinterp_trilinear :1651,
grinterp_tricubic :1978). All functions take a batch of fractional
coordinates (N, 3) and return value / gradient / Hessian for the whole
batch in one device program; gradients are in fractional coordinates scaled
by the grid size (reference convention, src/grid3mod@proc.f90:2133-2140),
the Cartesian rotation happens in the field layer.

The tricubic interpolant: the reference uses the Lekien-Marsden 64x64
matrix with corner derivatives estimated by central differences. That
construction is *exactly* the separable tensor-product cubic-convolution
(Catmull-Rom) interpolant - the tensor polynomial satisfies all 64 LM
constraints and the LM system is nonsingular - so we evaluate it axis by
axis: 3x4 basis weights and a 4x4x4 stencil contraction per point, instead
of a 64x64 matvec. (Verified against an independently-built LM solve in
tests/test_interp.py.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["interp_batch", "eval_at_nodes"]


def _catmull_rom_weights(t):
    """Catmull-Rom basis weights over stencil offsets (-1, 0, 1, 2).

    t: (...,) fractional position in the base cell, in [0, 1).
    Returns (w, dw, d2w): each (..., 4).
    """
    t2 = t * t
    t3 = t2 * t
    w = jnp.stack(
        [
            0.5 * (-t3 + 2.0 * t2 - t),
            0.5 * (3.0 * t3 - 5.0 * t2 + 2.0),
            0.5 * (-3.0 * t3 + 4.0 * t2 + t),
            0.5 * (t3 - t2),
        ],
        axis=-1,
    )
    dw = jnp.stack(
        [
            0.5 * (-3.0 * t2 + 4.0 * t - 1.0),
            0.5 * (9.0 * t2 - 10.0 * t),
            0.5 * (-9.0 * t2 + 8.0 * t + 1.0),
            0.5 * (3.0 * t2 - 2.0 * t),
        ],
        axis=-1,
    )
    d2w = jnp.stack(
        [
            0.5 * (-6.0 * t + 4.0),
            0.5 * (18.0 * t - 10.0),
            0.5 * (-18.0 * t + 8.0),
            0.5 * (6.0 * t - 2.0),
        ],
        axis=-1,
    )
    return w, dw, d2w


def _linear_weights(t):
    w = jnp.stack([1.0 - t, t], axis=-1)
    dw = jnp.stack([-jnp.ones_like(t), jnp.ones_like(t)], axis=-1)
    return w, dw


def _gather_stencil(f, i0, offsets):
    """Gather a cubic stencil around base indices.

    f: (n1, n2, n3) grid; i0: (N, 3) int base indices;
    offsets: 1-D int array of stencil offsets (e.g. [-1,0,1,2]).
    Returns (N, k, k, k) with k = len(offsets).
    """
    n = jnp.asarray(f.shape)
    idx = (i0[:, None, :] + offsets[None, :, None]) % n  # (N, k, 3)
    flat = (
        idx[:, :, None, None, 0] * (f.shape[1] * f.shape[2])
        + idx[:, None, :, None, 1] * f.shape[2]
        + idx[:, None, None, :, 2]
    )  # (N, k, k, k)
    return jnp.take(f.reshape(-1), flat.reshape(flat.shape[0], -1), axis=0).reshape(
        flat.shape
    )


@partial(jax.jit, static_argnames=("mode", "nder"))
def interp_batch(f, xfrac, mode: str = "tricubic", nder: int = 2):
    """Interpolate grid f at fractional points xfrac (N, 3).

    Returns (y (N,), yp (N,3), ypp (N,3,3)); yp/ypp are zero when the mode
    or nder does not provide them. Derivatives are d/d(frac) (i.e. already
    scaled by n per axis, reference convention).
    """
    f = jnp.asarray(f)
    xfrac = jnp.asarray(xfrac, dtype=f.dtype)
    n = jnp.asarray(f.shape, dtype=f.dtype)
    N = xfrac.shape[0]
    x = xfrac - jnp.floor(xfrac)  # wrap to [0,1), reference interp :1052

    zero3 = jnp.zeros((N, 3), f.dtype)
    zero33 = jnp.zeros((N, 3, 3), f.dtype)

    if mode == "nearest":
        idx = jnp.mod(jnp.rint(x * n).astype(jnp.int32),
                      jnp.asarray(f.shape, dtype=jnp.int32))
        y = f[idx[:, 0], idx[:, 1], idx[:, 2]]
        return y, zero3, zero33

    xg = x * n
    i0 = jnp.floor(xg).astype(jnp.int32)
    t = xg - i0  # position within base cell, [0,1)

    if mode == "trilinear":
        g = _gather_stencil(f, i0, jnp.arange(0, 2))
        w1, d1 = _linear_weights(t[:, 0])
        w2, d2 = _linear_weights(t[:, 1])
        w3, d3 = _linear_weights(t[:, 2])
        y = jnp.einsum("nijk,ni,nj,nk->n", g, w1, w2, w3)
        if nder < 1:
            return y, zero3, zero33
        gx = jnp.einsum("nijk,ni,nj,nk->n", g, d1, w2, w3)
        gy = jnp.einsum("nijk,ni,nj,nk->n", g, w1, d2, w3)
        gz = jnp.einsum("nijk,ni,nj,nk->n", g, w1, w2, d3)
        yp = jnp.stack([gx, gy, gz], axis=-1) * n[None, :]
        return y, yp, zero33

    if mode != "tricubic":
        raise ValueError(f"unknown interpolation mode {mode}")

    g = _gather_stencil(f, i0, jnp.arange(-1, 3))  # (N,4,4,4)
    w1, d1, s1 = _catmull_rom_weights(t[:, 0])
    w2, d2, s2 = _catmull_rom_weights(t[:, 1])
    w3, d3, s3 = _catmull_rom_weights(t[:, 2])

    # contract axis 3 (z)
    a0 = jnp.einsum("nijk,nk->nij", g, w3)
    y = jnp.einsum("nij,ni,nj->n", a0, w1, w2)
    if nder < 1:
        return y, zero3, zero33

    a1 = jnp.einsum("nijk,nk->nij", g, d3)
    gx = jnp.einsum("nij,ni,nj->n", a0, d1, w2)
    gy = jnp.einsum("nij,ni,nj->n", a0, w1, d2)
    gz = jnp.einsum("nij,ni,nj->n", a1, w1, w2)
    yp = jnp.stack([gx, gy, gz], axis=-1) * n[None, :]
    if nder < 2:
        return y, yp, zero33

    a2 = jnp.einsum("nijk,nk->nij", g, s3)
    hxx = jnp.einsum("nij,ni,nj->n", a0, s1, w2)
    hyy = jnp.einsum("nij,ni,nj->n", a0, w1, s2)
    hzz = jnp.einsum("nij,ni,nj->n", a2, w1, w2)
    hxy = jnp.einsum("nij,ni,nj->n", a0, d1, d2)
    hxz = jnp.einsum("nij,ni,nj->n", a1, d1, w2)
    hyz = jnp.einsum("nij,ni,nj->n", a1, w1, d2)
    # scale: ypp_ij *= n_i * n_j (reference :2134-2140)
    nn = n[None, :, None] * n[None, None, :]
    ypp = (
        jnp.stack(
            [
                jnp.stack([hxx, hxy, hxz], axis=-1),
                jnp.stack([hxy, hyy, hyz], axis=-1),
                jnp.stack([hxz, hyz, hzz], axis=-1),
            ],
            axis=-2,
        )
        * nn
    )
    return y, yp, ypp


def eval_at_nodes(f, idx):
    """Exact node values at integer grid indices idx (N,3) (the nder==0
    near-grid shortcut of reference grd, src/fieldmod@proc.f90:728-737)."""
    f = jnp.asarray(f)
    idx = jnp.mod(idx, jnp.asarray(f.shape))
    return f[idx[:, 0], idx[:, 1], idx[:, 2]]
