"""Pallas fused tricubic sweep vs the XLA separable path (interpret
mode; the compiled Mosaic kernel is exercised on real TPU runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu.ops.interp import interp_grid_soa
from critic2_tpu.ops.pallas_sweep import sweep_shifted


@pytest.mark.parametrize("shift", [0.5, 0.25, 0.0])
def test_sweep_matches_xla(rng, shift):
    n = (8, 16, 128)
    f = jnp.asarray(rng.random(n))
    y, yp, ypp = sweep_shifted(f, shift=shift, interpret=True)
    o = tuple(shift / v for v in n)
    y2, yp2, ypp2 = interp_grid_soa(f, n, origin=o)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-13)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yp2), atol=1e-11)
    np.testing.assert_allclose(np.asarray(ypp), np.asarray(ypp2),
                               atol=1e-9)
