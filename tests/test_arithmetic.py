"""Expression engine: math, field modifiers, chemical functions, ghosts."""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu import System
from critic2_tpu.arithmetic import ExprError, eval_expr
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species

CTF = (3.0 / 10.0) * (3.0 * np.pi ** 2) ** (2.0 / 3.0)


@pytest.fixture(scope="module")
def s():
    c = Crystal(m_x2c=m_x2c_from_cellpar([9.0, 9.0, 9.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Li", 3), Species("F", 9)])
    return System.from_structure(c)


@pytest.fixture(scope="module")
def pts(s):
    rng = np.random.default_rng(5)
    return rng.random((32, 3)) @ np.asarray(s.crystal.m_x2c).T


def test_math_and_precedence(s, pts):
    v = eval_expr("2^3 + sqrt(16) - abs(-1)", s, pts[:1])
    assert float(v[0]) == 11.0
    v = eval_expr("min(3, max(1, 2))", s, pts[:1])
    assert float(v[0]) == 2.0
    v = eval_expr("atan2(1, 1) * 4", s, pts[:1])
    np.testing.assert_allclose(float(v[0]), np.pi, rtol=1e-12)


def test_field_modifiers(s, pts):
    res = s.ref.grd(pts)
    np.testing.assert_allclose(eval_expr("$0", s, pts), res.f, rtol=1e-12)
    np.testing.assert_allclose(eval_expr("$0:g", s, pts),
                               np.asarray(res.gfmod), rtol=1e-10)
    np.testing.assert_allclose(eval_expr("$0:l", s, pts),
                               np.asarray(res.del2f), rtol=1e-10)
    np.testing.assert_allclose(eval_expr("$0:xy", s, pts),
                               np.asarray(res.hf[:, 0, 1]), rtol=1e-10)
    # composite
    np.testing.assert_allclose(
        eval_expr("$0 * 2 + $0:l / 4", s, pts),
        np.asarray(res.f) * 2 + np.asarray(res.del2f) / 4, rtol=1e-10)


def test_comparison_and_vars(s, pts):
    s.vars["athr"] = 0.01
    v = eval_expr("($0 > athr) * $0", s, pts)
    res = np.asarray(s.ref.grd(pts).f)
    np.testing.assert_allclose(v, np.where(res > 0.01, res, 0.0), rtol=1e-12)


def test_chemical_functions(s, pts):
    res = s.ref.grd(pts)
    f = np.asarray(res.f)
    lap = np.asarray(res.del2f)
    gm = np.asarray(res.gfmod)
    gtf = CTF * np.maximum(f, 0) ** (5 / 3)
    np.testing.assert_allclose(eval_expr("gtf(0)", s, pts), gtf, rtol=1e-10)
    np.testing.assert_allclose(eval_expr("vtf(0)", s, pts),
                               0.25 * lap - 2 * gtf, rtol=1e-9)
    f0 = np.maximum(f, 1e-30)
    gkir = gtf + gm ** 2 / (72 * f0) + lap / 6
    np.testing.assert_allclose(eval_expr("gtf_kir(0)", s, pts), gkir,
                               rtol=1e-9)
    np.testing.assert_allclose(eval_expr("lag(0)", s, pts), -0.25 * lap,
                               rtol=1e-10)
    with pytest.raises(ExprError):
        eval_expr("elf(0)", s, pts)  # promolecular has no k.e.d.


def test_ghost_field_autodiff(s, pts):
    s.load_field_expr("$0 * 2", name="rho2", ghost=True)
    res0 = s.field(0).grd(pts)
    res2 = s.field("rho2").grd(pts)
    np.testing.assert_allclose(np.asarray(res2.f), 2 * np.asarray(res0.f),
                               rtol=1e-12)
    # AD differentiates the interpolant of rho, the analytic path
    # interpolates tabulated rho' - equal to interpolation error only
    np.testing.assert_allclose(np.asarray(res2.gf), 2 * np.asarray(res0.gf),
                               rtol=2e-3, atol=1e-10)
    # exact check: AD gradient == central differences of the ghost value
    h = 1e-5
    for d in range(3):
        pp = pts.copy(); pp[:, d] += h
        pm = pts.copy(); pm[:, d] -= h
        fd = (np.asarray(s.field("rho2").grd(pp, nder=0).f)
              - np.asarray(s.field("rho2").grd(pm, nder=0).f)) / (2 * h)
        np.testing.assert_allclose(np.asarray(res2.gf[:, d]), fd,
                                   rtol=5e-6, atol=1e-10)


def test_load_field_as_grid(s):
    fid = s.load_field_expr("$0:l", name="lap0", shape=(16, 16, 16))
    g = s.field(fid).grid.f
    assert g.shape == (16, 16, 16)
    # node value equals direct laplacian at the node
    x = np.asarray(s.crystal.m_x2c) @ np.array([3 / 16, 5 / 16, 7 / 16])
    direct = float(np.asarray(s.field(0).grd(x[None]).del2f)[0])
    assert abs(float(g[3, 5, 7]) - direct) < 1e-10


def test_rejects_malicious(s, pts):
    with pytest.raises(ExprError):
        eval_expr("__import__('os').system('id')", s, pts)
    with pytest.raises(ExprError):
        eval_expr("[1 for _ in range(3)]", s, pts)


def test_expr_rejects_keyword_arguments():
    import pytest
    from critic2_tpu.arithmetic import ExprError, eval_const
    with pytest.raises(ExprError):
        eval_const("abs(x=().__class__.__mro__[1].__subclasses__())")
    with pytest.raises(ExprError):
        eval_const("__import__('os')")
    assert abs(eval_const("2^3 + sqrt(4)") - 10.0) < 1e-12
    assert abs(eval_const("a*2", {"a": 3.5}) - 7.0) < 1e-12


def test_structural_variables():
    """@dnuc/@xx/@idnuc/... structural variables (reference
    structvareval, src/arithmetic@proc.F90 svar enum)."""
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.system import System

    c = Crystal(m_x2c=np.diag([6.0, 6.0, 6.0]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    s = System.from_structure(c)
    pts = np.array([[1.0, 0.5, 0.3], [3.2, 3.0, 2.8]])
    d = np.asarray(s.eval_expr("@dnuc", pts))
    np.testing.assert_allclose(d[0], np.linalg.norm(pts[0]), rtol=1e-12)
    np.testing.assert_allclose(
        d[1], np.linalg.norm(pts[1] - [3.0, 3.0, 3.0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s.eval_expr("@idnuc", pts)),
                               [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(s.eval_expr("@zatnuc", pts)),
                               [11.0, 17.0])
    np.testing.assert_allclose(np.asarray(s.eval_expr("@xx", pts)),
                               pts[:, 0] / 6.0)
    np.testing.assert_allclose(np.asarray(s.eval_expr("@xnucx", pts)),
                               [0.0, 0.5])
    rho0 = np.asarray(s.eval_expr("@rho0nuc", pts))
    assert (rho0 > 0).all() and rho0[1] > rho0[0]
    # combined with fields
    v = np.asarray(s.eval_expr("@dnuc * $0 + @zatnuc", pts))
    assert np.isfinite(v).all()


def test_ewald_special_field():
    """$ewald special field (reference isspecialfield/specialfieldeval,
    src/arithmetic@proc.F90:939-946)."""
    from critic2_tpu.analysis.ewald import ewald_potential
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.system import System

    c = Crystal(m_x2c=np.diag([6.0, 6.0, 6.0]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    s = System.from_structure(c)
    pts = np.array([[1.0, 0.5, 0.3], [2.0, 1.0, 0.8]])
    v = np.asarray(s.eval_expr("$ewald", pts))
    ref = np.asarray(ewald_potential(c, pts))
    np.testing.assert_allclose(v, ref, rtol=1e-12)
