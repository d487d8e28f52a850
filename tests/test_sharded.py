"""Sharded grid evaluation: slab decomposition + halo exchange vs the
single-device interpolation path, on a virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.ops.interp import interp_batch
from critic2_tpu.parallel.mesh import make_mesh, mesh_shape_for
from critic2_tpu.parallel.sharded import sharded_eval_fn


def _problem(n1, n2, n3, npts, rng):
    a = 7.0
    c = Crystal(m_x2c=m_x2c_from_cellpar([a, a, 1.3 * a], [90.0, 90.0, 120.0]),
                x_frac=np.zeros((1, 3)), species_of=np.array([0]),
                species=[Species("C", 6)])
    i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                          indexing="ij")
    f = (1.0 + np.sin(2 * np.pi * i / n1) * np.cos(2 * np.pi * j / n2)
         + 0.3 * np.cos(4 * np.pi * k / n3))
    pts_frac = rng.random((npts, 3))
    pts = pts_frac @ np.asarray(c.m_x2c).T
    return c, jnp.asarray(f), jnp.asarray(pts)


def test_mesh_shape_for():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(4) == (2, 2)
    assert mesh_shape_for(7) == (7, 1)
    assert mesh_shape_for(1) == (1, 1)


@pytest.mark.parametrize("ndev", [8, 4, 2])
def test_sharded_matches_single_device(ndev, rng):
    mesh = make_mesh(ndev)
    nspace = mesh.shape["space"]
    n1 = 4 * nspace
    npts = 32 * mesh.shape["points"]
    c, f, pts = _problem(n1, 8, 12, npts, rng)
    w = jnp.asarray(rng.random(npts))

    fn = sharded_eval_fn(mesh, (n1, 8, 12), c.m_c2x, c.m_x2c, nder=2)
    fv, gf, hf, wsum = fn(f, pts, w)

    wx = pts @ jnp.asarray(c.m_c2x).T
    y, yp, ypp = interp_batch(f, wx, mode="tricubic", nder=2)
    m_c2x = jnp.asarray(c.m_c2x)
    gref = yp @ m_c2x
    href = jnp.einsum("ki,nkl,lj->nij", m_c2x, ypp, m_c2x)

    np.testing.assert_allclose(fv, y, atol=1e-12)
    np.testing.assert_allclose(gf, gref, atol=1e-11)
    np.testing.assert_allclose(hf, href, atol=1e-10)
    np.testing.assert_allclose(float(wsum), float((w * y).sum()), rtol=1e-12)


def test_graft_entry_roundtrip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (3, 64)
    ge.dryrun_multichip(8)
