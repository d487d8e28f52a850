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
