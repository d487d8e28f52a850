"""Gradient-path tracing and the AUTO bond-path graph."""
import numpy as np
import pytest
import jax.numpy as jnp

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.autocp import autocp, makegraph
from critic2_tpu.ops.ode import trace_paths, STAT_ATTRACTOR


def _nacl():
    c = Crystal(m_x2c=m_x2c_from_cellpar([10.66, 10.66, 10.66], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    return System.from_structure(c)


def test_trace_to_nucleus():
    s = _nacl()
    f = s.ref
    c = s.crystal
    # seeds slightly off the Na nucleus ascend back to it
    rng = np.random.default_rng(0)
    seeds = c.x_cart[0] + rng.normal(0, 0.4, (16, 3))
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)])
    imgs = c.x2c((c.x_frac[None, 0] + shifts).reshape(-1, 3))
    fn = f.eval_fn(nder=2)
    x, status, termid, plen, n = trace_paths(
        fn, jnp.asarray(seeds), iup=1, targets=jnp.asarray(imgs),
        rterm=jnp.full(len(imgs), 0.1))
    assert (np.asarray(status) == STAT_ATTRACTOR).all()
    assert (np.asarray(plen) > 0).all()


def test_trace_compaction_preserves_results():
    """Batch compaction (pow-2 regather of live lanes between chunks)
    must be invisible in the results: same final positions, statuses,
    termini and path lengths as the uncompacted trace.  Mixed batch:
    fast finishers (seeds near the nucleus) force compaction while
    slow ridge-side seeds are still live."""
    s = _nacl()
    c = s.crystal
    rng = np.random.default_rng(1)
    near = c.x_cart[0] + rng.normal(0, 0.3, (60, 3))
    # seeds near the basin boundary (long traces)
    far = c.x_cart[0] + 4.5 * rng.normal(0, 1.0, (8, 3))
    seeds = np.concatenate([near, far])
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)])
    imgs = c.x2c((np.asarray(c.x_frac)[None, :, :] + shifts[:, None, :])
                 .reshape(-1, 3))
    fn = s.ref.eval_fn(nder=2)
    kw = dict(iup=1, targets=jnp.asarray(imgs),
              rterm=jnp.full(len(imgs), 0.2), mstep=200)
    x1, st1, ti1, pl1, _ = trace_paths(fn, jnp.asarray(seeds),
                                       compact=True, **kw)
    x2, st2, ti2, pl2, _ = trace_paths(fn, jnp.asarray(seeds),
                                       compact=False, **kw)
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st2))
    np.testing.assert_array_equal(np.asarray(ti1), np.asarray(ti2))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pl1), np.asarray(pl2),
                               atol=1e-12)


@pytest.mark.slow
def test_makegraph_bcp_connects_na_cl():
    s = _nacl()
    cpl = autocp(s)
    makegraph(s, cpl)
    bcps = [cp for cp in cpl.cps if cp.typ == -1 and cp.ipath is not None]
    assert bcps, "no BCPs found"
    connected = 0
    for cp in bcps:
        ends = set(cp.ipath)
        if -1 in ends:
            continue
        names = {cpl.cps[i].name for i in ends}
        if names == {"Na", "Cl"}:
            connected += 1
    # at least one Na-Cl bond path fully resolved
    assert connected >= 1
