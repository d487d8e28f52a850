"""Ewald electrostatics for point-charge lattices.

Role of the reference ewald_energy/ewald_pot (src/crystalmod@proc.f90):
the electrostatic energy and site potentials of the point-charge lattice
defined by the atomic charges (Q/QAT/ZPSP keywords), via Ewald summation.

Device formulation: the real-space erfc sum runs over a precomputed image
list and the reciprocal sum over a G-vector ball - both dense batched
reductions. Units: Hartree (energy), charges in e.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc

__all__ = ["ewald_energy", "ewald_potential"]


def _setup(crystal, qs, eta=None, rcut_tol=1e-12, gcut_tol=1e-12):
    c = crystal
    m = np.asarray(c.m_x2c)
    vol = c.volume
    if eta is None:
        # balance real/reciprocal work (standard choice)
        eta = np.sqrt(np.pi) / vol ** (1.0 / 3.0)
    # real-space cutoff: erfc(eta r)/r < tol
    rcut = 1.0
    while erfc_np(eta * rcut) / rcut > rcut_tol:
        rcut *= 1.25
    # reciprocal cutoff: exp(-g^2/(4 eta^2))/g^2 < tol
    gcut = 1.0
    while np.exp(-gcut ** 2 / (4 * eta ** 2)) / gcut ** 2 > gcut_tol:
        gcut *= 1.25
    # image list
    widths = 1.0 / np.linalg.norm(np.asarray(c.m_c2x), axis=1)
    nimg = np.ceil(rcut / widths).astype(int) + 1
    rng = [np.arange(-n, n + 1) for n in nimg]
    shifts = np.stack(np.meshgrid(*rng, indexing="ij"), -1).reshape(-1, 3)
    latvec = shifts @ m.T
    # G vectors
    gmat = 2.0 * np.pi * np.asarray(c.m_c2x)       # rows = b_i
    gwidth = np.linalg.norm(gmat, axis=1)
    ng = np.ceil(gcut / np.min(gwidth)).astype(int) + 1
    grng = np.arange(-ng, ng + 1)
    gid = np.stack(np.meshgrid(grng, grng, grng, indexing="ij"),
                   -1).reshape(-1, 3)
    gvec = gid @ gmat
    g2 = (gvec ** 2).sum(1)
    sel = (g2 > 1e-12) & (g2 < gcut ** 2)
    return eta, latvec, gvec[sel], g2[sel], vol


def erfc_np(x):
    from math import erfc as _e

    return _e(float(x))


def ewald_energy(crystal, charges=None) -> float:
    """Total Ewald energy (Ha) of the point-charge lattice."""
    c = crystal
    qs = np.asarray(charges if charges is not None else c.zatoms,
                    dtype=float)
    eta, latvec, gvec, g2, vol = _setup(c, qs)
    pos = jnp.asarray(c.x_cart)
    q = jnp.asarray(qs)
    lat = jnp.asarray(latvec)
    gv = jnp.asarray(gvec)
    g2j = jnp.asarray(g2)

    return float(_energy(pos, q, lat, gv, g2j, eta, vol))


# module-level jits: fresh per-call closures would retrace/recompile
# every call (seconds each through the remote-compile tunnel)
@jax.jit
def _energy(pos, q, lat, gv, g2j, eta, vol):
    # real space: 1/2 sum_ij sum_R' qi qj erfc(eta |rij+R|)/|rij+R|
    rij = pos[:, None, :] - pos[None, :, :]            # (n, n, 3)
    d = jnp.linalg.norm(rij[None, :, :, :] + lat[:, None, None, :],
                        axis=-1)                       # (R, n, n)
    mask = d > 1e-10
    er = jnp.where(mask, erfc(eta * d) / jnp.where(mask, d, 1.0), 0.0)
    ereal = 0.5 * jnp.einsum("i,j,rij->", q, q, er)
    # reciprocal space
    phase = gv @ pos.T                                  # (G, n)
    sk = (q[None, :] * jnp.exp(1j * phase)).sum(1)
    erec = (2.0 * jnp.pi / vol) * jnp.sum(
        jnp.exp(-g2j / (4 * eta ** 2)) / g2j * jnp.abs(sk) ** 2)
    eself = -eta / jnp.sqrt(jnp.pi) * jnp.sum(q * q)
    ebg = -jnp.pi / (2.0 * vol * eta ** 2) * jnp.sum(q) ** 2
    return ereal + erec + eself + ebg


def ewald_potential(crystal, points_cart, charges=None):
    """Ewald potential (Ha/e) at Cartesian points (N, 3)."""
    c = crystal
    qs = np.asarray(charges if charges is not None else c.zatoms,
                    dtype=float)
    eta, latvec, gvec, g2, vol = _setup(c, qs)
    pos = jnp.asarray(c.x_cart)
    q = jnp.asarray(qs)
    lat = jnp.asarray(latvec)
    gv = jnp.asarray(gvec)
    g2j = jnp.asarray(g2)
    pts = jnp.atleast_2d(jnp.asarray(points_cart))

    return np.asarray(_pot(pts, pos, q, lat, gv, g2j, eta, vol))


@jax.jit
def _pot(pts, pos, q, lat, gv, g2j, eta, vol):
    rij = pts[:, None, :] - pos[None, :, :]
    d = jnp.linalg.norm(rij[None, :, :, :] + lat[:, None, None, :],
                        axis=-1)                       # (R, N, n)
    mask = d > 1e-7   # same threshold as the isnuc detection below
    vreal = jnp.einsum("j,rnj->n", q, jnp.where(
        mask, erfc(eta * d) / jnp.where(mask, d, 1.0), 0.0))
    phase_p = gv @ pts.T                                # (G, N)
    phase_a = gv @ pos.T                                # (G, n)
    sk = (q[None, :] * jnp.exp(-1j * phase_a)).sum(1)   # (G,)
    vrec = (4.0 * jnp.pi / vol) * jnp.real(
        (jnp.exp(-g2j / (4 * eta ** 2)) / g2j)[:, None]
        * sk[:, None] * jnp.exp(1j * phase_p)).sum(0)
    vbg = -jnp.pi / (vol * eta ** 2) * jnp.sum(q)
    # nuclear self-term: at an atomic site the reciprocal sum still
    # contains that site's own Gaussian (potential 2*eta*q/sqrt(pi) at
    # its center) while the masked real-space term dropped the
    # compensating -q/d singularity; subtract it, matching the
    # reference's isnuc branch (crystalmod@proc.f90:2145-2150)
    onsite = (d.min(0) < 1e-7).astype(vreal.dtype)      # (N, n)
    vself = -(2.0 * eta / jnp.sqrt(jnp.pi)) * (onsite @ q)
    return vreal + vrec + vbg + vself
