"""XC functionals against the reference's pinned libxc values
(tests_libxc/ref.txt, h2o.wfx): LDA(SVWN), PBE, BLYP, BP86, TPSS.

Parity status at the converged ("ultra") mesh, measured 2026-08-17:
LDA 8e-8 Ha, BLYP 6e-9 Ha (exact to the pin — this also pins B88
exchange and LYP separately, since their errors would have to cancel),
PBE 2.0e-6 Ha, BP86 6.5e-6 Ha.  The LDA/BLYP exactness shows the pins
are converged and our rho/grad/quadrature are exact; the PBE/P86
residuals are libxc-build-specific functional details that cannot be
resolved further without a live libxc (absent from this image) — a
scan over every published constant variant (PBE mu/beta roundings,
PW92 A, P86 ftilde 0.19195 vs 0.192, PZ vs PZ_MOD) identified the
current set as the closest (see git history for the scan).
"""
import os

import pytest

from critic2_tpu import System
from critic2_tpu.analysis.molcalc import molcalc_integral

H2O = "/root/reference/tests_libxc/h2o.wfx"

pytestmark = pytest.mark.skipif(not os.path.exists(H2O),
                                reason="no reference data")

CASES = [
    # the "good" (302-pt Lebedev) mesh carries ~4e-6 quadrature error;
    # the value converges onto the pinned libxc number at higher levels
    # (amazing: 2.7e-7 - see test_lda_mesh_convergence)
    ("LDA", -8.957976118600001, "xc($1,1)+xc($1,8)", 6e-6),
    ("PBE", -9.242634846200005, "xc($1,$1:g,101)+xc($1,$1:g,130)", 1e-5),
    ("BLYP", -9.307752149199999, "xc($1,$1:g,106)+xc($1,$1:g,131)", 1e-5),
    ("BP86", -9.328661428600000, "xc($1,$1:g,106)+xc($1,$1:g,132)", 2e-5),
    ("TPSS", -9.331217985700007,
     "xc($1,$1:g,$1:l,0.5*gkin(1),202)+xc($1,$1:g,$1:l,0.5*gkin(1),231)",
     1.2e-5),
]


@pytest.fixture(scope="module")
def h2o():
    s = System.from_structure(H2O)
    s.load_field(H2O)
    return s


@pytest.mark.parametrize("name,ref,expr,tol", CASES,
                         ids=[c[0] for c in CASES])
def test_xc_functional(h2o, name, ref, expr, tol):
    v = molcalc_integral(h2o, expr, lvl="good")
    assert abs(v - ref) < tol, f"{name}: {v} vs {ref}"


@pytest.mark.slow
def test_lda_mesh_convergence(h2o):
    """The LDA integral converges onto the pinned libxc value as the
    mesh improves - the integrand matches libxc; residuals at lower
    levels are quadrature error."""
    v = molcalc_integral(h2o, "xc($1,1)+xc($1,8)", lvl="amazing")
    assert abs(v - (-8.957976118600001)) < 5e-7


@pytest.mark.slow
def test_xc_converged_pins(h2o):
    """Converged-mesh ("ultra") XC integrals, pinned from a measured
    run (2026-08-17): regressions in rho/gradient evaluation, mesh
    construction, or functional forms surface at the 1e-7 Ha scale.
    LDA and BLYP also match the reference pins at this mesh (8e-8 /
    6e-9 Ha), demonstrating converged exactness."""
    cases = [
        ("xc($1,1)+xc($1,8)", -8.9579762000, -8.957976118600001, 1e-6),
        ("xc($1,$1:g,106)+xc($1,$1:g,131)", -9.3077521492,
         -9.307752149199999, 1e-6),
        ("xc($1,$1:g,101)+xc($1,$1:g,130)", -9.2426369007,
         -9.242634846200005, 5e-6),
        ("xc($1,$1:g,106)+xc($1,$1:g,132)", -9.3286679481,
         -9.328661428600000, 1e-5),
    ]
    for expr, ours, pin, tolpin in cases:
        v = molcalc_integral(h2o, expr, lvl="ultra")
        assert abs(v - ours) < 2e-7, f"{expr}: {v} vs converged {ours}"
        assert abs(v - pin) < tolpin, f"{expr}: {v} vs pin {pin}"


def test_extra_lda_gga_ids():
    """Round-3 breadth ids: LDA_C_PZ (9), revPBE (102), PBEsol x/c
    (116/133), RPBE (117) - limit checks against the established
    functionals."""
    import numpy as np

    from critic2_tpu.ops.xc import xc_eval

    rho = np.array([1e-3, 0.05, 0.3, 1.0, 5.0])
    grad = np.array([1e-5, 0.02, 0.2, 1.0, 8.0])
    zero = np.zeros_like(rho)

    # s -> 0: every PBE-family exchange reduces to LDA exchange
    e_lda = np.asarray(xc_eval(1, rho))
    for fid in (101, 102, 116, 117):
        e0 = np.asarray(xc_eval(fid, rho, zero))
        np.testing.assert_allclose(e0, e_lda, rtol=1e-12)

    # RPBE tracks PBE at small s, is less negative at large s
    e_pbe = np.asarray(xc_eval(101, rho, grad))
    e_rpbe = np.asarray(xc_eval(117, rho, grad))
    assert abs(e_rpbe[0] - e_pbe[0]) < 1e-8
    # revPBE enhances more than PBE (kappa 1.245 > 0.804)
    e_rev = np.asarray(xc_eval(102, rho, grad))
    assert (e_rev <= e_pbe + 1e-14).all()

    # PBEsol exchange between LDA and PBE (mu smaller)
    e_sol = np.asarray(xc_eval(116, rho, grad))
    assert ((e_sol >= e_pbe - 1e-14) & (e_sol <= e_lda + 1e-12)).all()

    # PZ local correlation within 3% of PW92 (different fits of the
    # same Ceperley-Alder data)
    c_pz = np.asarray(xc_eval(9, rho))
    c_pw = np.asarray(xc_eval(12, rho))
    np.testing.assert_allclose(c_pz, c_pw, rtol=0.03)

    # PBEsol correlation differs from PBE but shares the t -> 0 limit
    c_pbe0 = np.asarray(xc_eval(130, rho, zero))
    c_sol0 = np.asarray(xc_eval(133, rho, zero))
    np.testing.assert_allclose(c_sol0, c_pbe0, rtol=1e-10)
    c_pbe = np.asarray(xc_eval(130, rho, grad))
    c_sol = np.asarray(xc_eval(133, rho, grad))
    assert np.max(np.abs(c_sol - c_pbe)) > 1e-8


def test_round4_gga_ids():
    """Round-4 breadth ids: PW91 x/c (109/134), Wu-Cohen (118) -
    limit and cross-functional checks."""
    import numpy as np

    from critic2_tpu.ops.xc import xc_eval

    rho = np.array([1e-3, 0.05, 0.3, 1.0, 5.0])
    grad = np.array([1e-5, 0.02, 0.2, 1.0, 8.0])
    zero = np.zeros_like(rho)

    e_lda = np.asarray(xc_eval(1, rho))
    # s -> 0 limits: PW91/WC exchange reduce to LDA exchange
    for fid in (109, 118):
        np.testing.assert_allclose(np.asarray(xc_eval(fid, rho, zero)),
                                   e_lda, rtol=1e-12)
    # t -> 0: PW91 correlation reduces exactly to the PW92 LDA
    c_pw92 = np.asarray(xc_eval(12, rho))
    np.testing.assert_allclose(np.asarray(xc_eval(134, rho, zero)),
                               c_pw92, rtol=1e-12, atol=1e-14)

    # PW91 and PBE (designed to reproduce PW91's numerics) agree to a
    # few percent at moderate reduced gradients and to <0.5% on the
    # energy density at chemically relevant rho
    e_pw91 = np.asarray(xc_eval(109, rho, grad))
    e_pbe = np.asarray(xc_eval(101, rho, grad))
    np.testing.assert_allclose(e_pw91, e_pbe, rtol=0.05)
    c_pw91 = np.asarray(xc_eval(134, rho, grad))
    c_pbe = np.asarray(xc_eval(130, rho, grad))
    np.testing.assert_allclose(c_pw91, c_pbe, rtol=0.1, atol=1e-5)

    # WC sits between PBEsol and PBE by construction (its x(s) has the
    # PBEsol small-s slope and grows toward the PBE form)
    e_sol = np.asarray(xc_eval(116, rho, grad))
    e_wc = np.asarray(xc_eval(118, rho, grad))
    assert ((e_wc <= e_sol + 1e-12) & (e_wc >= e_pbe - 1e-12)).all()

    # enhancement factors stay bounded by 1 + kappa
    s_big = np.full_like(rho, 50.0)
    for fid, cap in ((109, 1.0 + 0.9), (118, 1.0 + 0.804)):
        e_big = np.asarray(xc_eval(fid, rho, s_big * rho ** (4 / 3)
                                   * 2 * (3 * np.pi ** 2) ** (1 / 3)))
        assert (e_big >= cap * e_lda - 1e-10).all()   # e_x negative


def test_round5_gga_and_hybrid_ids():
    """Round-5 breadth ids: PW86 x (108), optB88/optPBE vdW exchange
    (139/141), and the B3LYP-family hybrid SEMILOCAL parts
    (401/402/406/475) - limit checks and exact recomposition against
    the established ingredient functionals."""
    import numpy as np

    from critic2_tpu.ops.xc import xc_eval

    rho = np.array([1e-3, 0.05, 0.3, 1.0, 5.0])
    grad = np.array([1e-5, 0.02, 0.2, 1.0, 8.0])
    zero = np.zeros_like(rho)

    e_lda = np.asarray(xc_eval(1, rho))
    # s -> 0 limits: PW86 / optPBE / optB88 reduce to LDA exchange
    for fid in (108, 139, 141):
        np.testing.assert_allclose(np.asarray(xc_eval(fid, rho, zero)),
                                   e_lda, rtol=1e-12)

    # optPBE enhances more than PBE at the same s (kappa 1.048 > 0.804,
    # mu smaller but the large-s cap dominates the ordering at big s)
    sval = 3.0
    gbig = sval * rho ** (4 / 3) * 2 * (3 * np.pi ** 2) ** (1 / 3)
    e_opt = np.asarray(xc_eval(141, rho, gbig))
    e_pbe = np.asarray(xc_eval(101, rho, gbig))
    assert (e_opt <= e_pbe + 1e-14).all()          # more negative

    # optB88 vs B88: different beta/gamma must change the density
    e_ob88 = np.asarray(xc_eval(139, rho, grad))
    e_b88 = np.asarray(xc_eval(106, rho, grad))
    assert np.max(np.abs(e_ob88 - e_b88)) > 1e-8

    # hybrid semilocal parts recompose EXACTLY from their ingredients
    b3lyp = np.asarray(xc_eval(402, rho, grad))
    mix = (0.08 * np.asarray(xc_eval(1, rho))
           + 0.72 * np.asarray(xc_eval(106, rho, grad))
           + 0.19 * np.asarray(xc_eval(8, rho))
           + 0.81 * np.asarray(xc_eval(131, rho, grad)))
    np.testing.assert_allclose(b3lyp, mix, rtol=1e-13, atol=1e-18)

    b3lyp5 = np.asarray(xc_eval(475, rho, grad))
    mix5 = mix - 0.19 * np.asarray(xc_eval(8, rho)) \
        + 0.19 * np.asarray(xc_eval(7, rho))
    np.testing.assert_allclose(b3lyp5, mix5, rtol=1e-13, atol=1e-18)

    b3pw91 = np.asarray(xc_eval(401, rho, grad))
    mixpw = (0.08 * np.asarray(xc_eval(1, rho))
             + 0.72 * np.asarray(xc_eval(106, rho, grad))
             + 0.19 * np.asarray(xc_eval(12, rho))
             + 0.81 * np.asarray(xc_eval(134, rho, grad)))
    np.testing.assert_allclose(b3pw91, mixpw, rtol=1e-13, atol=1e-18)

    pbe0 = np.asarray(xc_eval(406, rho, grad))
    mix0 = (0.75 * np.asarray(xc_eval(101, rho, grad))
            + np.asarray(xc_eval(130, rho, grad)))
    np.testing.assert_allclose(pbe0, mix0, rtol=1e-13, atol=1e-18)

    # B3LYP/B3LYP5 differ exactly by the VWN flavor choice
    assert np.max(np.abs(b3lyp - b3lyp5)) > 1e-8


def test_round5_tranche6_ids():
    """Tranche-6 breadth ids: G96 x (107), AM05 x/c (120/135),
    SCAN x/c (263/267) - exact-limit and structural checks."""
    import numpy as np

    from critic2_tpu.ops.xc import _lambertw0, xc_eval

    rho = np.array([1e-3, 0.05, 0.3, 1.0, 5.0])
    grad = np.array([1e-5, 0.02, 0.2, 1.0, 8.0])
    zero = np.zeros_like(rho)

    # Lambert W kernel: w e^w == x to f64 on the AM05-relevant range
    xs = np.array([1e-10, 1e-3, 0.1, 1.0, 10.0, 1e4, 1e8])
    w = np.asarray(_lambertw0(xs))
    np.testing.assert_allclose(w * np.exp(w), xs, rtol=1e-12)

    e_lda = np.asarray(xc_eval(1, rho))
    # s -> 0 limits: G96 and AM05 exchange reduce to LDA exchange
    np.testing.assert_allclose(np.asarray(xc_eval(107, rho, zero)),
                               e_lda, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xc_eval(120, rho, zero)),
                               e_lda, rtol=1e-3)  # Airy fb(0) = 0.999
    # AM05 correlation at s = 0 is exactly PW92
    c_pw92 = np.asarray(xc_eval(12, rho))
    np.testing.assert_allclose(np.asarray(xc_eval(135, rho, zero)),
                               c_pw92, rtol=1e-12)
    # and at large s it approaches gamma * PW92 from above
    gbig = 50.0 * rho ** (4 / 3) * 2 * (3 * np.pi ** 2) ** (1 / 3)
    c_big = np.asarray(xc_eval(135, rho, gbig))
    np.testing.assert_allclose(c_big, 0.8098 * c_pw92, rtol=1e-2)

    # exchange with gradients is MORE negative than LDA (G96, AM05)
    for fid in (107, 120):
        e_g = np.asarray(xc_eval(fid, rho, grad))
        assert (e_g <= e_lda + 1e-14).all()

    # SCAN uniform-gas limit: grad = 0, tau = tau_unif (alpha = 1)
    # recovers LDA exchange and PW92 correlation EXACTLY.  xc_eval
    # doubles its tau argument (the reference feeds 0.5*gkin), so pass
    # tau_unif/2.
    tau_unif = 0.3 * (3 * np.pi ** 2) ** (2 / 3) * rho ** (5 / 3)
    np.testing.assert_allclose(
        np.asarray(xc_eval(263, rho, zero, zero, tau_unif / 2)),
        e_lda, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(xc_eval(267, rho, zero, zero, tau_unif / 2)),
        c_pw92, rtol=1e-12, atol=1e-16)

    # single-orbital (alpha = 0: tau = tau_W) SCAN correlation matches
    # the published eps_c0 closed form at s = 0: -b1c/(1+b2c*srs+b3c*rs)
    tau_w = grad * grad / (8 * rho)
    c0 = np.asarray(xc_eval(267, rho, zero, zero, zero))
    rs = (3 / (4 * np.pi * rho)) ** (1 / 3)
    eps0 = -0.0285764 / (1 + 0.0889 * np.sqrt(rs) + 0.125541 * rs)
    np.testing.assert_allclose(c0, rho * eps0, rtol=1e-12)

    # SCAN exchange enhancement stays within its exact bounds:
    # 0 < Fx <= 1.174 for any (s, alpha) - scan a grid
    svals = np.array([0.01, 0.3, 1.0, 3.0, 10.0])
    r0 = np.ones_like(svals)
    g0 = svals * r0 ** (4 / 3) * 2 * (3 * np.pi ** 2) ** (1 / 3)
    tu = 0.3 * (3 * np.pi ** 2) ** (2 / 3) * r0 ** (5 / 3)
    for amult in (0.0, 0.5, 1.0, 2.0, 10.0):
        tw = g0 * g0 / (8 * r0)
        tau = tw + amult * tu
        e_scan = np.asarray(xc_eval(263, r0, g0, 0 * r0, tau / 2))
        fx = e_scan / np.asarray(xc_eval(1, r0))
        assert (fx > 0).all() and (fx <= 1.174 + 1e-12).all(), \
            (amult, fx)
