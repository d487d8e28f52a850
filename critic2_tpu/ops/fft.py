"""FFT-based grid operators (device, jnp.fft → XLA TPU FFT).

Role of the reference grid3mod FFT machinery (src/grid3mod@proc.f90:
laplacian :1075, gradrho :1164, pot :1245, hxx :1345) built on the cfftnd
mixed-radix FFT (src/cfftnd.f90). Here each operator is a handful of
whole-grid jnp.fft.fftn calls; XLA fuses the k-space scaling.

Conventions: grids are (n1, n2, n3) arrays over fractional coordinates
(i/n1, j/n2, k/n3); x2c has lattice vectors as columns; G vectors are
built from the standard reciprocal basis (the reference uses the negated
set, which is equivalent for every quadratic form used here, and for
gradrho only |grad rho| is kept).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gvectors", "laplacian", "grad_components", "gradrho", "hxx", "pot"]


def _fftn(f):
    """fftn with a TPU-friendly dtype: TPU XLA has no complex128 FFT, so on
    TPU the transform runs in complex64 (the FFT-derived grids feed NCI and
    plotting paths where the reference itself falls back to trilinear
    interpolation over noisy data). On CPU, full f64 is kept.

    Returns (fk, real_dtype_for_output).
    """
    f = jnp.asarray(f)
    platform = jax.devices()[0].platform
    if platform != "cpu" and f.dtype == jnp.float64:
        return jnp.fft.fftn(f.astype(jnp.float32)), f.dtype
    return jnp.fft.fftn(f), f.dtype


def gvectors(shape, m_x2c):
    """Cartesian G vectors on the FFT grid: (n1, n2, n3, 3), f64 host const."""
    m_x2c = np.asarray(m_x2c, dtype=float)
    vol = abs(np.linalg.det(m_x2c))
    b = np.empty((3, 3))
    b[:, 0] = np.cross(m_x2c[:, 1], m_x2c[:, 2])
    b[:, 1] = np.cross(m_x2c[:, 2], m_x2c[:, 0])
    b[:, 2] = np.cross(m_x2c[:, 0], m_x2c[:, 1])
    b *= 2.0 * np.pi / vol
    ks = [np.fft.fftfreq(n, d=1.0 / n) for n in shape]  # integer frequencies
    kx, ky, kz = np.meshgrid(*ks, indexing="ij")
    return (
        kx[..., None] * b[:, 0]
        + ky[..., None] * b[:, 1]
        + kz[..., None] * b[:, 2]
    )


def laplacian(f, m_x2c):
    """del^2 f via FFT (reference laplacian, src/grid3mod@proc.f90:1075)."""
    g = gvectors(f.shape, m_x2c)
    g2 = (g * g).sum(-1)
    fk, dt = _fftn(f)
    g2 = jnp.asarray(g2, dtype=fk.real.dtype)
    return jnp.real(jnp.fft.ifftn(-g2 * fk)).astype(dt)


def grad_components(f, m_x2c):
    """Cartesian gradient components, (3, n1, n2, n3)."""
    g = gvectors(f.shape, m_x2c)
    fk, dt = _fftn(f)
    g = jnp.asarray(g, dtype=fk.real.dtype)
    outs = [jnp.real(jnp.fft.ifftn(1j * g[..., i] * fk)).astype(dt)
            for i in range(3)]
    return jnp.stack(outs)


def gradrho(f, m_x2c):
    """|grad f| grid (reference gradrho, src/grid3mod@proc.f90:1164)."""
    c = grad_components(f, m_x2c)
    return jnp.sqrt((c * c).sum(0))


def hxx(f, m_x2c, ix: int):
    """Diagonal Cartesian Hessian component d2f/dx_ix^2
    (reference hxx, src/grid3mod@proc.f90:1345)."""
    g = gvectors(f.shape, m_x2c)
    fk, dt = _fftn(f)
    gi = jnp.asarray(g[..., ix], dtype=fk.real.dtype)
    return jnp.real(jnp.fft.ifftn(-gi * gi * fk)).astype(dt)


def pot(f, m_x2c, isry: bool = False):
    """Hartree potential of the density f: V(G) = 4 pi rho(G)/G^2, V(0)=0
    (reference pot, src/grid3mod@proc.f90:1245; isry doubles to Rydberg)."""
    g = gvectors(f.shape, m_x2c)
    g2 = (g * g).sum(-1)
    inv = np.where(g2 < 1e-12, 0.0, 4.0 * np.pi / np.where(g2 < 1e-12, 1.0, g2))
    fk, dt = _fftn(f)
    v = jnp.real(jnp.fft.ifftn(jnp.asarray(inv, dtype=fk.real.dtype) * fk))
    return (2.0 * v if isry else v).astype(dt)
