"""Solid harmonics and basin multipoles."""
import numpy as np
import jax.numpy as jnp

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.integration import intgrid, multipoles
from critic2_tpu.fields.field import Field
from critic2_tpu.fields.grid3 import Grid3
from critic2_tpu.ops.rlm import solid_harmonics


def test_solid_harmonics_lowl(rng):
    x = jnp.asarray(rng.normal(0, 1, (3, 64)))
    rl = np.asarray(solid_harmonics(x, 2))
    xx, yy, zz = (np.asarray(v) for v in x)
    r2 = xx**2 + yy**2 + zz**2
    c0 = np.sqrt(1 / (4 * np.pi))
    np.testing.assert_allclose(rl[0], c0 * np.ones_like(xx), rtol=1e-12)
    c1 = np.sqrt(3 / (4 * np.pi))
    np.testing.assert_allclose(rl[1], c1 * yy, rtol=1e-10)   # m=-1
    np.testing.assert_allclose(rl[2], c1 * zz, rtol=1e-10)   # m=0
    np.testing.assert_allclose(rl[3], c1 * xx, rtol=1e-10)   # m=+1
    # l=2, m=0: sqrt(5/16pi)(3z^2-r^2)
    c20 = np.sqrt(5 / (16 * np.pi))
    np.testing.assert_allclose(rl[6], c20 * (3 * zz**2 - r2), rtol=1e-10)
    # l=2, m=+2: sqrt(15/16pi)(x^2-y^2)
    c22 = np.sqrt(15 / (16 * np.pi))
    np.testing.assert_allclose(rl[8], c22 * (xx**2 - yy**2), rtol=1e-10)


def test_orthonormality_on_sphere(rng):
    # random unit sphere sample: <S_lm S_l'm'> ~ delta/(4pi) * 4pi
    from critic2_tpu.analysis.mesh import product_sphere
    pts, w = product_sphere(24)
    rl = np.asarray(solid_harmonics(jnp.asarray(pts.T), 3))
    G = (rl * w[None, :]) @ rl.T * 4 * np.pi
    np.testing.assert_allclose(G, np.eye(len(G)), atol=1e-9)


def test_basin_multipoles_symmetric():
    # two identical gaussians: monopole = charge, dipole ~ 0 by symmetry
    c = Crystal(m_x2c=m_x2c_from_cellpar([10.0, 10.0, 10.0], [90, 90, 90]),
                x_frac=np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
                species_of=np.array([0, 0]), species=[Species("He", 2)])
    s = System.from_structure(c)
    shape = (24, 24, 24)
    g = np.stack(np.meshgrid(*[np.arange(n) / n for n in shape],
                             indexing="ij"), axis=-1)
    rho = np.zeros(shape)
    for site in c.x_frac:
        d = g - site
        d -= np.rint(d)
        dcart = d @ np.asarray(c.m_x2c).T
        rho += np.exp(-2.0 * (dcart ** 2).sum(-1))
    s.load_field(Field.from_grid(c, Grid3(jnp.asarray(rho))))
    res = intgrid(s, method="yt")
    q = multipoles(s, res, lmax=2)
    c0 = np.sqrt(1 / (4 * np.pi))
    # monopole = S00 * pop
    np.testing.assert_allclose(q[:, 0], c0 * res.charges, rtol=1e-10)
    # dipoles vanish by symmetry (attractor at the gaussian center)
    assert np.abs(q[:, 1:4]).max() < 1e-3
