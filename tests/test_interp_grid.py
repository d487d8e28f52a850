"""Regular-grid separable tricubic vs the scattered-point path."""
import numpy as np
import jax.numpy as jnp

from critic2_tpu.ops.interp import interp_grid_soa, interp_soa


def test_grid_eval_matches_pointwise(rng):
    n = (12, 10, 8)
    f = jnp.asarray(rng.random(n))
    m = (9, 7, 11)
    origin = (0.13, 0.0, 0.4)
    lengths = (0.8, 1.0, 0.5)
    y, yp, ypp6 = interp_grid_soa(f, m, origin=origin, lengths=lengths)

    i, j, k = np.meshgrid(*[np.arange(v) for v in m], indexing="ij")
    pts = np.stack([origin[0] + i.ravel() / m[0] * lengths[0],
                    origin[1] + j.ravel() / m[1] * lengths[1],
                    origin[2] + k.ravel() / m[2] * lengths[2]])
    y2, yp2, ypp62 = interp_soa(f, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(y).ravel(), np.asarray(y2),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(yp).reshape(3, -1),
                               np.asarray(yp2), rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ypp6).reshape(6, -1),
                               np.asarray(ypp62), rtol=1e-10, atol=1e-9)


def test_grid_eval_same_grid_identity(rng):
    # Catmull-Rom interpolates: values at input nodes reproduce exactly
    n = (8, 8, 8)
    f = jnp.asarray(rng.random(n))
    y, _, _ = interp_grid_soa(f, n)
    np.testing.assert_allclose(np.asarray(y), np.asarray(f), atol=1e-13)
