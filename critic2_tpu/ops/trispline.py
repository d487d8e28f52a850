"""Trispline interpolation: periodic tensor-product cubic splines.

Role of the reference trispline mode (src/grid3mod@proc.f90:1705-1967 +
init_trispline :2167-2274): global C^2 cubic-spline interpolation of
periodic grids. The reference stores per-axis spline curvatures c2 and
evaluates with a "star" scheme that approximates the cross terms (and
computes off-diagonal Hessian entries by local polynomial interpolation).

Here the FULL tensor-product spline is used instead: all 2^3 mixed
curvature grids M^(abc) = (Dx^a Dy^b Dz^c) f are precomputed (Dd = the
periodic 1-D spline curvature operator along axis d, the same cyclic
tridiagonal solve as the reference's init_trispline), after which ANY
derivative up to second order is a separable 2-point formula - exact
C^2 interpolation, no star approximation, and the evaluation is the
same gather-shape as tricubic (8 corner gathers x 8 grids).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["spline_coeffs", "trispline_soa"]


def _curvature_matrix(n: int) -> np.ndarray:
    """Dense inverse-free operator data: returns the cyclic tridiagonal
    A with rows (1, 4, 1)/1 pattern; curvatures M = 6 n^2 A^{-1} d2,
    d2_i = f_{i+1} - 2 f_i + f_{i-1} (cyclic)."""
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = 4.0
        A[i, (i - 1) % n] = 1.0
        A[i, (i + 1) % n] = 1.0
    return A


def _apply_D(f, axis):
    """Spline curvature operator along `axis` (periodic), batched over
    the other axes."""
    n = f.shape[axis]
    A = jnp.asarray(_curvature_matrix(n))
    d2 = (jnp.roll(f, -1, axis) - 2.0 * f + jnp.roll(f, 1, axis))
    m = jnp.moveaxis(d2, axis, 0).reshape(n, -1)
    M = 6.0 * n * n * jnp.linalg.solve(A, m)
    return jnp.moveaxis(M.reshape((n,) + tuple(
        s for i, s in enumerate(f.shape) if i != axis)), 0, axis)


def spline_coeffs(f):
    """All 8 mixed-curvature grids, stacked (8, n1, n2, n3); index
    bit-packed abc with a = x-curvature, b = y, c = z."""
    f = jnp.asarray(f)
    fx = _apply_D(f, 0)
    fy = _apply_D(f, 1)
    fz = _apply_D(f, 2)
    fxy = _apply_D(fx, 1)
    fxz = _apply_D(fx, 2)
    fyz = _apply_D(fy, 2)
    fxyz = _apply_D(fxy, 2)
    return jnp.stack([f, fz, fy, fyz, fx, fxz, fxy, fxyz])


def _axis_weights(t, n, order):
    """Weight pairs (w_value (2,N), w_curv (2,N)) for derivative order."""
    one = jnp.ones_like(t)
    if order == 0:
        wv = jnp.stack([1.0 - t, t])
        u0 = 1.0 - t
        wc = jnp.stack([(u0 ** 3 - u0) / (6.0 * n * n),
                        (t ** 3 - t) / (6.0 * n * n)])
    elif order == 1:
        wv = jnp.stack([-n * one, n * one])
        u0 = 1.0 - t
        wc = jnp.stack([-(3.0 * u0 * u0 - 1.0) / (6.0 * n),
                        (3.0 * t * t - 1.0) / (6.0 * n)])
    else:
        wv = jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t)])
        wc = jnp.stack([1.0 - t, t])
    return wv, wc


@partial(jax.jit, static_argnames=("nder",))
def trispline_soa(coeffs, xT, nder: int = 2):
    """Evaluate the tensor-product spline at fractional points (3, N).

    coeffs: spline_coeffs output (8, n1, n2, n3). Returns (y, yp (3, N),
    ypp6 (6, N)) in the interp_soa conventions.
    """
    n1, n2, n3 = coeffs.shape[1:]
    ns = (n1, n2, n3)
    x = xT - jnp.floor(xT)
    xg = x * jnp.asarray(ns, coeffs.dtype)[:, None]
    i0 = jnp.floor(xg).astype(jnp.int32)
    t = xg - i0
    N = xT.shape[1]

    # corner gathers for all 8 grids: (8, 2, 2, 2, N)
    ix = jnp.stack([i0[0] % n1, (i0[0] + 1) % n1])        # (2, N)
    iy = jnp.stack([i0[1] % n2, (i0[1] + 1) % n2])
    iz = jnp.stack([i0[2] % n3, (i0[2] + 1) % n3])
    flat = (ix[:, None, None, :] * (n2 * n3)
            + iy[None, :, None, :] * n3 + iz[None, None, :, :])
    g = jnp.take(coeffs.reshape(8, -1), flat.reshape(-1),
                 axis=1).reshape(8, 2, 2, 2, N)

    def evaluate(ox, oy, oz):
        wxv, wxc = _axis_weights(t[0], ns[0], ox)
        wyv, wyc = _axis_weights(t[1], ns[1], oy)
        wzv, wzc = _axis_weights(t[2], ns[2], oz)
        out = 0.0
        for a, wx in ((0, wxv), (1, wxc)):
            if ox == 2 and a == 0:
                continue
            for b, wy in ((0, wyv), (1, wyc)):
                if oy == 2 and b == 0:
                    continue
                for c, wz in ((0, wzv), (1, wzc)):
                    if oz == 2 and c == 0:
                        continue
                    G = g[(a << 2) | (b << 1) | c]        # (2,2,2,N)
                    term = (G * wx[:, None, None, :]
                            * wy[None, :, None, :]
                            * wz[None, None, :, :]).sum((0, 1, 2))
                    out = out + term
        return out

    y = evaluate(0, 0, 0)
    z3 = jnp.zeros((3, N), coeffs.dtype)
    z6 = jnp.zeros((6, N), coeffs.dtype)
    if nder < 1:
        return y, z3, z6
    yp = jnp.stack([evaluate(1, 0, 0), evaluate(0, 1, 0),
                    evaluate(0, 0, 1)])
    if nder < 2:
        return y, yp, z6
    ypp6 = jnp.stack([
        evaluate(2, 0, 0), evaluate(0, 2, 0), evaluate(0, 0, 2),
        evaluate(1, 1, 0), evaluate(1, 0, 1), evaluate(0, 1, 1)])
    return y, yp, ypp6
