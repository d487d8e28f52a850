"""Lebedev-Laikov quadrature (tables extracted from the reference
src/tools_math@lebedev.f90; generators reimplemented in ops/lebedev)."""
import numpy as np
import pytest

from critic2_tpu.ops.lebedev import available_rules, good_lebedev, lebedev


def test_rule_inventory():
    rules = available_rules()
    assert rules[0] == 6 and rules[-1] == 5810 and len(rules) == 32


def test_weights_and_norms():
    for n in (6, 14, 50, 302, 1202, 5810):
        p, w = lebedev(n)
        assert len(p) == n
        assert abs(w.sum() - 1.0) < 1e-12
        np.testing.assert_allclose(np.linalg.norm(p, axis=1), 1.0,
                                   atol=1e-14)


def test_polynomial_exactness():
    # int x^(2k) over the unit sphere / 4pi = 1/(2k+1)
    for n, kmax in ((26, 3), (110, 8), (590, 20), (5810, 25)):
        p, w = lebedev(n)
        for k in range(1, kmax + 1):
            val = (w * p[:, 0] ** (2 * k)).sum()
            assert abs(val - 1.0 / (2 * k + 1)) < 1e-12, (n, k)
        # mixed moment x^2 y^2 z^2 = 1/105
        if n >= 26:
            assert abs((w * (p[:, 0] * p[:, 1] * p[:, 2]) ** 2).sum()
                       - 1.0 / 105.0) < 1e-12


def test_good_lebedev():
    assert good_lebedev(1) == 6
    assert good_lebedev(100) == 110
    assert good_lebedev(6000) == 5810


def test_mesh_integrates_gaussian():
    """Becke mesh with Lebedev angular rules integrates a Gaussian."""
    from critic2_tpu.analysis.mesh import becke_mesh
    from critic2_tpu.crystal.crystal import Crystal, Species

    c = Crystal(m_x2c=np.diag([30.0] * 3),
                x_frac=np.array([[0.5, 0.5, 0.5]]),
                species_of=np.array([0]), species=[Species("C", 6)],
                ismolecule=True)
    m = becke_mesh(c, "normal")
    x0 = np.asarray(c.x_cart[0])
    r2 = ((m.x - x0) ** 2).sum(1)
    val = (m.w * np.exp(-1.3 * r2)).sum()
    ref = (np.pi / 1.3) ** 1.5
    assert abs(val - ref) / ref < 1e-8


def test_becke_knn_matches_dense():
    """The mu-threshold Becke truncation (the >64-atom path used at the
    cps_large scale) must reproduce the dense O(nat^2) weights: every
    excluded atom has mu <= -0.85, where the 4x-iterated switching
    polynomial puts |1 - s| under ~3e-11, so the per-point error is
    bounded by nat * 3e-11 ~ 2e-9 on this 70-atom packed cluster (a
    worst-case geometry: a fixed 48-nearest cut erred 1e-4 here)."""
    from critic2_tpu.analysis.mesh import (_becke_mesh_points,
                                           _becke_parent_weights_knn,
                                           _becke_weights_chunked, _LVL)
    from critic2_tpu.crystal.crystal import Crystal, Species

    rng = np.random.default_rng(11)
    nat = 70
    # a packed random cluster (~3 bohr typical spacing, like a
    # molecular assembly interior)
    pos = rng.uniform(0, 14.0, size=(nat, 3))
    lo = pos.min(0) - 10.0
    side = pos.max(0) - lo + 10.0
    c = Crystal(m_x2c=np.diag(side),
                x_frac=(pos - lo) / side,
                species_of=np.zeros(nat, dtype=int),
                species=[Species("H", 1)],
                ismolecule=True, molx0=lo)
    x, wraw, parent = _becke_mesh_points(c, _LVL["small"])
    atpos = np.asarray(c.x_cart)
    # subsample: the dense reference is O(N nat^2)
    idx = rng.choice(len(x), size=4096, replace=False)
    dense = _becke_weights_chunked(x[idx], atpos)[
        np.arange(len(idx)), parent[idx]]
    knn = _becke_parent_weights_knn(x[idx], atpos, parent[idx])
    assert np.abs(dense - knn).max() < 1e-8
