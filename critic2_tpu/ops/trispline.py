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


# ---------------------------------------------------------------------------
# Reference-parity "star" scheme (grinterp_trispline,
# src/grid3mod@proc.f90:1705-1967): directional spline averages for
# value/gradient/diagonal Hessian, local polynomial interpolation of the
# spline first-derivative fields for the off-diagonal Hessian. Matches
# the reference evaluation point-for-point (CP-position parity for
# TRISPLINE fields).
# ---------------------------------------------------------------------------

def star_c2(f):
    """Per-axis spline curvature grids (n1,n2,n3,3) exactly as
    init_trispline (:2167-2274): solve cyclic(1,4,1) c2 = 6 n^2 d2 along
    each axis - here diagonalized by FFT (the cyclic matrix is
    circulant)."""
    f = jnp.asarray(f)
    outs = []
    for ax in range(3):
        n = f.shape[ax]
        th = 2.0 * jnp.pi * jnp.fft.fftfreq(n)
        lam = (2.0 * jnp.cos(th) - 2.0) / (4.0 + 2.0 * jnp.cos(th))
        fh = jnp.fft.fft(f, axis=ax)
        shape = [1, 1, 1]
        shape[ax] = n
        c2h = fh * (6.0 * n * n) * lam.reshape(shape)
        outs.append(jnp.real(jnp.fft.ifft(c2h, axis=ax)))
    return jnp.stack(outs, axis=-1)


def trispline_star_soa(f, c2, xfracT, nder: int = 2):
    """Batched star-scheme evaluation. f (n1,n2,n3), c2 (n1,n2,n3,3),
    xfracT (3, N) fractional. Returns (y, yp (3,N), ypp6 (6,N)) in the
    framework convention (derivatives w.r.t. fractional coords)."""
    from .interp import _gather_stencil_soa

    f = jnp.asarray(f)
    nn = jnp.asarray(f.shape, dtype=f.dtype)
    xT = jnp.asarray(xfracT, dtype=f.dtype)
    N = xT.shape[1]
    x = xT - jnp.floor(xT)
    xg = x * nn[:, None]
    i0 = jnp.floor(xg).astype(jnp.int32)
    b = xg - i0                                   # bbb per axis, (3, N)

    offs = jnp.arange(-1, 3)
    S = _gather_stencil_soa(f, i0, offs)          # (4,4,4,N)
    Sx = _gather_stencil_soa(c2[..., 0], i0, offs)
    Sy = _gather_stencil_soa(c2[..., 1], i0, offs)
    Sz = _gather_stencil_soa(c2[..., 2], i0, offs)

    dix = 1.0 / nn                                # (3,)
    cof = jnp.stack([1.0 - b, b])                 # (2, 3, N)
    pomsq = (cof ** 3 - cof) / 6.0 * (dix ** 2)[None, :, None]
    pom2sq = (3.0 * cof ** 2 - 1.0) / 6.0 * dix[None, :, None]
    pom2sq = pom2sq.at[0].multiply(-1.0)

    c1, c2_, c3 = cof[:, 0], cof[:, 1], cof[:, 2]         # each (2, N)
    p1, p2, p3 = pomsq[:, 0], pomsq[:, 1], pomsq[:, 2]
    q1, q2, q3 = pom2sq[:, 0], pom2sq[:, 1], pom2sq[:, 2]

    # corner slices: stencil indices 1..2 = offsets 0..1
    R = S[1:3, 1:3, 1:3]
    Dx = Sx[1:3, 1:3, 1:3]
    Dy = Sy[1:3, 1:3, 1:3]
    Dz = Sz[1:3, 1:3, 1:3]

    # ddstar (6, N)
    dd = [None] * 6
    for i in range(2):
        dd[i] = sum(c2_[j] * c3[k] * Dx[i, j, k]
                    for j in range(2) for k in range(2))
        dd[i + 2] = sum(c3[j] * c1[k] * Dy[k, i, j]
                        for j in range(2) for k in range(2))
        dd[i + 4] = sum(c1[j] * c2_[k] * Dz[j, k, i]
                        for j in range(2) for k in range(2))

    # sqder / sqvlr (6, 4 Fortran -> dict[(i, j)])
    sqd = {}
    sqv = {}
    for i in range(2):
        for j in range(2):
            sqd[(i, j)] = sum(c2_[k] * Dz[i, k, j] for k in range(2))
            sqd[(i, j + 2)] = sum(c3[k] * Dy[i, j, k] for k in range(2))
            sqd[(i + 2, j)] = sum(c3[k] * Dx[j, i, k] for k in range(2))
            sqd[(i + 2, j + 2)] = sum(c1[k] * Dz[k, i, j] for k in range(2))
            sqd[(i + 4, j)] = sum(c1[k] * Dy[k, j, i] for k in range(2))
            sqd[(i + 4, j + 2)] = sum(c2_[k] * Dx[j, k, i] for k in range(2))
            sqv[(i, j)] = sum(c2_[k] * R[i, k, j] + p2[k] * Dy[i, k, j]
                              for k in range(2))
            sqv[(i, j + 2)] = sum(c3[k] * R[i, j, k] + p3[k] * Dz[i, j, k]
                                  for k in range(2))
            sqv[(i + 2, j + 2)] = sum(c1[k] * R[k, i, j] + p1[k] * Dx[k, i, j]
                                      for k in range(2))
    for i in range(2):
        for j in range(2):
            sqv[(i + 2, j)] = sqv[(j, i + 2)]
            sqv[(i + 4, j)] = sqv[(j + 2, i + 2)]
            sqv[(i + 4, j + 2)] = sqv[(j, i)]

    rh = [None] * 6
    for i in range(2):
        rh[i] = sum(c3[j] * sqv[(i, j)] + p3[j] * sqd[(i, j)]
                    + c2_[j] * sqv[(i, j + 2)] + p2[j] * sqd[(i, j + 2)]
                    for j in range(2))
        rh[i + 2] = sum(c1[j] * sqv[(i + 2, j)] + p1[j] * sqd[(i + 2, j)]
                        + c3[j] * sqv[(i + 2, j + 2)]
                        + p3[j] * sqd[(i + 2, j + 2)] for j in range(2))
        rh[i + 4] = sum(c2_[j] * sqv[(i + 4, j)] + p2[j] * sqd[(i + 4, j)]
                        + c1[j] * sqv[(i + 4, j + 2)]
                        + p1[j] * sqd[(i + 4, j + 2)] for j in range(2))
    rh = [v * 0.5 for v in rh]

    cofk = (c1, c2_, c3)
    pk = (p1, p2, p3)
    qk = (q1, q2, q3)
    y = jnp.zeros((N,), f.dtype)
    yp = [jnp.zeros((N,), f.dtype) for _ in range(3)]
    ypp = [[jnp.zeros((N,), f.dtype) for _ in range(3)] for _ in range(3)]
    for k in range(3):
        for j in range(2):
            sgn = -1.0 if j == 0 else 1.0
            y = y + cofk[k][j] * rh[2 * k + j] + pk[k][j] * dd[2 * k + j]
            yp[k] = yp[k] + qk[k][j] * dd[2 * k + j] \
                + sgn * rh[2 * k + j] * nn[k]
            ypp[k][k] = ypp[k][k] + cofk[k][j] * dd[2 * k + j]
    y = y / 3.0
    if nder < 1:
        return y, jnp.zeros((3, N), f.dtype), jnp.zeros((6, N), f.dtype)
    ypT = jnp.stack(yp)
    if nder < 2:
        return y, ypT, jnp.zeros((6, N), f.dtype)

    # --- off-diagonal Hessian: polynomial interpolation of the spline
    # first-derivative estimates along each axis (:1855-1947) ----------
    def newton_deriv(hh, tfrac, nk):
        """First derivative at tfrac of the cubic through 4 equally
        spaced nodes hh[a] at positions (a-1)/nk relative to the cell
        node; tfrac = b/nk is the in-cell position."""
        # divided differences with spacing 1/nk
        h1 = [(hh[a + 1] - hh[a]) * nk for a in range(3)]
        h2 = [(h1[a + 1] - h1[a]) * nk / 2.0 for a in range(2)]
        h3 = [(h2[1] - h2[0]) * nk / 3.0]
        # Newton form around node offsets (-1, 0, 1, 2)/nk; evaluate the
        # derivative at t = tfrac (distance from node offset -1 is
        # tfrac + 1/nk)
        t0 = tfrac + 1.0 / nk       # x - x_1
        t1 = tfrac                  # x - x_2
        t2 = tfrac - 1.0 / nk       # x - x_3
        # p(x) = c0 + c1 t0 + c2 t0 t1 + c3 t0 t1 t2
        # p'(x) = c1 + c2 (t0 + t1) + c3 (t0 t1 + t0 t2 + t1 t2)
        return (h1[0] + h2[0] * (t0 + t1)
                + h3[0] * (t0 * t1 + t0 * t2 + t1 * t2))

    tin = b * dix[:, None]      # in-cell fractional offset per axis (3,N)

    # axis x (ii=0): hh over stencil index a; mixed with y (nn=1) and z (2)
    hh_y = []
    hh_z = []
    for a in range(4):
        ddu0 = c3[0] * Sy[a, 1, 1] + c3[1] * Sy[a, 1, 2]
        ddu1 = c3[0] * Sy[a, 2, 1] + c3[1] * Sy[a, 2, 2]
        hrh0 = c3[0] * S[a, 1, 1] + c3[1] * S[a, 1, 2] \
            + p3[0] * Sz[a, 1, 1] + p3[1] * Sz[a, 1, 2]
        hrh1 = c3[0] * S[a, 2, 1] + c3[1] * S[a, 2, 2] \
            + p3[0] * Sz[a, 2, 1] + p3[1] * Sz[a, 2, 2]
        hh_y.append((hrh1 - hrh0) * nn[1] + q2[0] * ddu0 + q2[1] * ddu1)
        ddu0 = c2_[0] * Sz[a, 1, 1] + c2_[1] * Sz[a, 2, 1]
        ddu1 = c2_[0] * Sz[a, 1, 2] + c2_[1] * Sz[a, 2, 2]
        hrh0 = c2_[0] * S[a, 1, 1] + c2_[1] * S[a, 2, 1] \
            + p2[0] * Sy[a, 1, 1] + p2[1] * Sy[a, 2, 1]
        hrh1 = c2_[0] * S[a, 1, 2] + c2_[1] * S[a, 2, 2] \
            + p2[0] * Sy[a, 1, 2] + p2[1] * Sy[a, 2, 2]
        hh_z.append((hrh1 - hrh0) * nn[2] + q3[0] * ddu0 + q3[1] * ddu1)
    dxy = newton_deriv(hh_y, tin[0], nn[0])
    dxz = newton_deriv(hh_z, tin[0], nn[0])
    ypp[0][1] = ypp[0][1] + dxy
    ypp[1][0] = ypp[1][0] + dxy
    ypp[0][2] = ypp[0][2] + dxz
    ypp[2][0] = ypp[2][0] + dxz

    # axis y (ii=1): mixed with z (nn=2, hh(:,1)) and x (nn=0, hh(:,2))
    hh_z2 = []
    hh_x = []
    for a in range(4):
        ddu0 = c3[0] * Sx[1, a, 1] + c3[1] * Sx[1, a, 2]
        ddu1 = c3[0] * Sx[2, a, 1] + c3[1] * Sx[2, a, 2]
        hrh0 = c3[0] * S[1, a, 1] + c3[1] * S[1, a, 2] \
            + p3[0] * Sz[1, a, 1] + p3[1] * Sz[1, a, 2]
        hrh1 = c3[0] * S[2, a, 1] + c3[1] * S[2, a, 2] \
            + p3[0] * Sz[2, a, 1] + p3[1] * Sz[2, a, 2]
        hh_x.append((hrh1 - hrh0) * nn[0] + q1[0] * ddu0 + q1[1] * ddu1)
        ddu0 = c1[0] * Sz[1, a, 1] + c1[1] * Sz[2, a, 1]
        ddu1 = c1[0] * Sz[1, a, 2] + c1[1] * Sz[2, a, 2]
        hrh0 = c1[0] * S[1, a, 1] + c1[1] * S[2, a, 1] \
            + p1[0] * Sx[1, a, 1] + p1[1] * Sx[2, a, 1]
        hrh1 = c1[0] * S[1, a, 2] + c1[1] * S[2, a, 2] \
            + p1[0] * Sx[1, a, 2] + p1[1] * Sx[2, a, 2]
        hh_z2.append((hrh1 - hrh0) * nn[2] + q3[0] * ddu0 + q3[1] * ddu1)
    dyz = newton_deriv(hh_z2, tin[1], nn[1])
    dyx = newton_deriv(hh_x, tin[1], nn[1])
    ypp[1][2] = ypp[1][2] + dyz
    ypp[2][1] = ypp[2][1] + dyz
    ypp[1][0] = ypp[1][0] + dyx
    ypp[0][1] = ypp[0][1] + dyx

    # axis z (ii=2): mixed with x (nn=0, hh(:,1)) and y (nn=1, hh(:,2))
    hh_y2 = []
    hh_x2 = []
    for a in range(4):
        ddu0 = c1[0] * Sy[1, 1, a] + c1[1] * Sy[2, 1, a]
        ddu1 = c1[0] * Sy[1, 2, a] + c1[1] * Sy[2, 2, a]
        hrh0 = c1[0] * S[1, 1, a] + c1[1] * S[2, 1, a] \
            + p1[0] * Sx[1, 1, a] + p1[1] * Sx[2, 1, a]
        hrh1 = c1[0] * S[1, 2, a] + c1[1] * S[2, 2, a] \
            + p1[0] * Sx[1, 2, a] + p1[1] * Sx[2, 2, a]
        hh_y2.append((hrh1 - hrh0) * nn[1] + q2[0] * ddu0 + q2[1] * ddu1)
        ddu0 = c2_[0] * Sx[1, 1, a] + c2_[1] * Sx[1, 2, a]
        ddu1 = c2_[0] * Sx[2, 1, a] + c2_[1] * Sx[2, 2, a]
        hrh0 = c2_[0] * S[1, 1, a] + c2_[1] * S[1, 2, a] \
            + p2[0] * Sy[1, 1, a] + p2[1] * Sy[1, 2, a]
        hrh1 = c2_[0] * S[2, 1, a] + c2_[1] * S[2, 2, a] \
            + p2[0] * Sy[2, 1, a] + p2[1] * Sy[2, 2, a]
        hh_x2.append((hrh1 - hrh0) * nn[0] + q1[0] * ddu0 + q1[1] * ddu1)
    dzx = newton_deriv(hh_x2, tin[2], nn[2])
    dzy = newton_deriv(hh_y2, tin[2], nn[2])
    ypp[2][0] = ypp[2][0] + dzx
    ypp[0][2] = ypp[0][2] + dzx
    ypp[2][1] = ypp[2][1] + dzy
    ypp[1][2] = ypp[1][2] + dzy

    ypp6 = jnp.stack([ypp[0][0], ypp[1][1], ypp[2][2],
                      ypp[0][1] / 2.0, ypp[0][2] / 2.0, ypp[1][2] / 2.0])
    return y, ypT, ypp6
