"""Trispline (tensor-product periodic cubic spline) interpolation."""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu.ops.trispline import spline_coeffs, trispline_soa


@pytest.fixture(scope="module")
def trig_grid():
    n = (24, 20, 16)
    i, j, k = np.meshgrid(*[np.arange(v) for v in n], indexing="ij")
    f = (np.sin(2 * np.pi * i / n[0]) * np.cos(2 * np.pi * j / n[1])
         + 0.5 * np.cos(2 * np.pi * k / n[2]))
    return n, jnp.asarray(f)


def _analytic(n, pts):
    x, y, z = (2 * np.pi * pts[a] for a in range(3))
    f = np.sin(x) * np.cos(y) + 0.5 * np.cos(z)
    tp = 2 * np.pi
    gx = tp * np.cos(x) * np.cos(y)
    gy = -tp * np.sin(x) * np.sin(y)
    gz = -0.5 * tp * np.sin(z)
    hxx = -tp * tp * np.sin(x) * np.cos(y)
    hyy = -tp * tp * np.sin(x) * np.cos(y)
    hzz = -0.5 * tp * tp * np.cos(z)
    hxy = -tp * tp * np.cos(x) * np.sin(y)
    return f, np.stack([gx, gy, gz]), hxx, hxy


def test_interpolates_nodes(trig_grid, rng):
    n, f = trig_grid
    c = spline_coeffs(f)
    idx = rng.integers(0, min(n), size=(3, 40))
    pts = jnp.asarray(idx / np.asarray(n)[:, None])
    y, _, _ = trispline_soa(c, pts, nder=0)
    ref = np.asarray(f)[idx[0], idx[1], idx[2]]
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-11)


def test_derivatives_vs_analytic(trig_grid, rng):
    n, f = trig_grid
    c = spline_coeffs(f)
    pts = rng.random((3, 200))
    y, yp, ypp6 = trispline_soa(jnp.asarray(c), jnp.asarray(pts))
    fa, ga, hxx, hxy = _analytic(n, pts)
    # spline of a band-limited function: high accuracy
    np.testing.assert_allclose(np.asarray(y), fa, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yp), ga, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ypp6)[0], hxx, atol=1.0)
    np.testing.assert_allclose(np.asarray(ypp6)[3], hxy, atol=1.0)


def test_c2_continuity(trig_grid):
    # second derivative is continuous across a cell boundary
    n, f = trig_grid
    c = spline_coeffs(f)
    eps = 1e-9
    xb = 5.0 / n[0]
    pts = jnp.asarray([[xb - eps, xb + eps], [0.37, 0.37], [0.21, 0.21]])
    _, _, ypp6 = trispline_soa(c, pts)
    np.testing.assert_allclose(np.asarray(ypp6)[:, 0],
                               np.asarray(ypp6)[:, 1], atol=1e-4)


def test_field_mode(rng):
    from critic2_tpu import System
    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.analysis.integration import _rasterize_field
    from critic2_tpu.fields.field import Field
    from critic2_tpu.fields.grid3 import Grid3

    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0] * 3, [90] * 3),
                x_frac=np.array([[0.5, 0.5, 0.5]]),
                species_of=np.array([0]), species=[Species("Ne", 10)])
    s = System.from_structure(c)
    g = _rasterize_field(s.fields[0], (20, 20, 20))
    fid = s.load_field(Field.from_grid(c, Grid3(jnp.asarray(g))))
    s.field(fid).set_options(interp="trispline")
    pts = rng.random((16, 3)) @ np.asarray(c.m_x2c).T
    res = s.ref.grd(pts)
    # against tricubic interpolation of the SAME grid data (analytic
    # comparison fails in the exponential tail where any 20^3-grid
    # interpolant overshoots)
    s.field(fid).set_options(interp="tricubic")
    ref = np.asarray(s.ref.grd(pts).f)
    s.field(fid).set_options(interp="trispline")
    np.testing.assert_allclose(np.asarray(res.f), ref, rtol=0.2,
                               atol=2e-3)
    # eval_fn path agrees with grd path
    fn = s.ref.eval_fn(nder=2)
    f2, g2, h62 = fn(jnp.asarray(pts.T))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(res.f),
                               rtol=1e-12)
