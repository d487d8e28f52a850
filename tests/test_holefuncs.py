"""MEP / Slater potential / exchange hole / BR-hole arithmetic functions.

Analytic anchors (no external data): for a single doubly-occupied MO,
q_mu = phi(r) c_mu so U_x(r) = -phi^2 V_H[phi^2]/(2 phi^2) = -V_el(r)/4
where V_el is the electronic MEP term; and the exchange hole at the
reference point is -rho_spin. The BR inversion is checked against its
own defining constraint (8 pi A / alf^3 = hnorm)."""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu.fields.wfn import Wavefunction
from critic2_tpu.ops.mdint import overlap_kinetic_nuclear, rinv_pairs


@pytest.fixture(scope="module")
def h2():
    # H2-like, one doubly-occupied MO of 2 s-gaussians per atom
    atpos = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.4]])
    icenter = np.array([0, 0, 1, 1])
    itype = np.ones(4, dtype=int)          # s
    e = np.array([1.2, 0.3, 1.2, 0.3])
    cmo = np.array([[0.6, 0.4, 0.6, 0.4]])
    w = Wavefunction(atpos=atpos, atz=np.array([1, 1]),
                     icenter=icenter, itype=itype, e=e,
                     cmo=cmo, occ=np.array([2.0]), wfntyp="rhf")
    S, _, _ = overlap_kinetic_nuclear(w)
    nrm = float(cmo[0] @ np.asarray(S) @ cmo[0])
    w.cmo = cmo / np.sqrt(nrm)
    w._dev.clear()
    return w


def test_mep_far_field_neutral(h2):
    # neutral molecule: MEP ~ 0 at long range
    v = h2.mep(np.array([[25.0, 0.0, 0.7]]))
    assert abs(v[0]) < 1e-3


def test_mep_near_nucleus_positive(h2):
    v = h2.mep(h2.atpos[0:1] + np.array([0.02, 0.0, 0.0]))
    assert v[0] > 10.0


def test_uslater_single_mo_identity(h2):
    pts = np.array([[0.3, 0.2, 0.5], [1.0, -0.4, 1.1]])
    ux = h2.uslater(pts)
    # V_el = sum_mn D_mn <m|1/|r-c||n> with D = 2 c c^T
    D = (h2.cmo.T * h2.occ) @ h2.cmo
    V = rinv_pairs(h2, pts)
    vel = np.einsum("bmn,mn->b", V, D)
    np.testing.assert_allclose(ux, -vel / 4.0, rtol=1e-10)


def test_xhole_at_reference_is_minus_spin_rho(h2):
    p = np.array([[0.1, 0.0, 0.6]])
    xh = h2.xhole(p, p[0])
    rho, _, _ = h2.rho_eval_soa(jnp.asarray(p).T, nder=0)
    np.testing.assert_allclose(xh[0], -0.5 * float(rho[0]), rtol=1e-10)


def test_nheff_range(h2):
    _, nh = h2.uslater(np.array([[0.2, 0.1, 0.7]]), want_nheff=True)
    assert 0.0 < nh[0] <= 2.0


def test_bhole_consistency():
    from critic2_tpu.ops.brhole import bhole
    rho = jnp.asarray([0.3, 0.02, 1.5])
    quad = jnp.asarray([0.1, -0.05, 0.8])
    b, alf, a = bhole(rho, quad, 1.0)
    # normalization constraint of the BR model hole
    np.testing.assert_allclose(8.0 * np.pi * np.asarray(a)
                               / np.asarray(alf) ** 3, 1.0, rtol=1e-8)
    # the defining transcendental equation, x = b * alf
    x = np.asarray(b * alf)
    rhs = (2.0 / 3.0) * (np.pi * np.asarray(rho)) ** (2.0 / 3.0) \
        * np.asarray(rho) / np.asarray(quad)
    np.testing.assert_allclose(x * np.exp(-2.0 * x / 3.0) / (x - 2.0),
                               rhs, rtol=1e-8)


H2O_WFX = "/root/reference/tests_libxc/h2o.wfx"


@pytest.mark.skipif(not __import__("os").path.exists(H2O_WFX),
                    reason="reference wavefunction data not available")
def test_arithmetic_hole_functions():
    from critic2_tpu.system import System

    s = System.from_structure(H2O_WFX)
    s.load_field(H2O_WFX)
    pts = np.asarray(s.crystal.x2c(np.array([[0.52, 0.5, 0.56]])))
    for expr in ("mep(1)", "uslater(1)", "nheff(1)", "brhole_a(1)",
                 "brhole_b(1)", "brhole_alf(1)", "xhcurv(1)", "dsigs(1)",
                 "stress(1)"):
        v = s.eval_expr(expr, pts)
        assert np.all(np.isfinite(np.asarray(v))), expr
    assert float(s.eval_expr("dsigs(1)", pts)[0]) >= 0.0
    # xhole with the evaluation point as reference equals -rho/2 there
    f = s.field(1)
    rho = float(f.grd(pts, nder=0).f[0])
    if s.crystal.ismolecule:
        molx0 = np.asarray(s.crystal.molx0) \
            if s.crystal.molx0 is not None else 0.0
        xr = pts[0] + molx0              # back to the user input frame
    else:
        xr = np.asarray(s.crystal.c2x(pts))[0]
    v = s.eval_expr(f"xhole(1, {xr[0]}, {xr[1]}, {xr[2]})", pts)
    np.testing.assert_allclose(float(v[0]), -0.5 * rho, rtol=1e-8)
