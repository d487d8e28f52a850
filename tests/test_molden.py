"""Molden reader + spherical-harmonic basis expansion checks."""
import os
import textwrap

import numpy as np
import pytest

from critic2_tpu.fields.wfn import Wavefunction

H2_MOLDEN = textwrap.dedent("""\
    [Molden Format]
    [Atoms] AU
    H 1 1 0.0 0.0 0.0
    H 2 1 0.0 0.0 1.4
    [GTO]
    1 0
     s 3 1.00
      3.42525091 0.15432897
      0.62391373 0.53532814
      0.16885540 0.44463454

    2 0
     s 3 1.00
      3.42525091 0.15432897
      0.62391373 0.53532814
      0.16885540 0.44463454

    [MO]
    Sym= A1
    Ene= -0.578
    Spin= Alpha
    Occup= 2.0
      1 0.54893404
      2 0.54893404
    Sym= A2
    Ene= 0.671
    Spin= Alpha
    Occup= 0.0
      1 1.21146407
      2 -1.21146407
""")


def test_molden_h2(tmp_path):
    p = tmp_path / "h2.molden"
    p.write_text(H2_MOLDEN)
    w = Wavefunction.read_molden(str(p))
    assert w.nelec == 2.0
    assert w.npri == 6
    assert w.nmo == 1          # only the occupied MO kept
    # normalization: for the standard STO-3G H2 bonding orbital at
    # R = 1.4 bohr the AO overlap is S ~ 0.6593 and c = 1/sqrt(2(1+S));
    # check <psi|psi> = 1 via the analytic overlap integrals
    from critic2_tpu.ops.mdint import overlap_kinetic_nuclear

    S, T, V = overlap_kinetic_nuclear(w)
    P = np.einsum("m,mp,mq->pq", w.occ, w.cmo, w.cmo)
    nelec = float((P * np.asarray(S)).sum())
    assert abs(nelec - 2.0) < 1e-4


NE_G_MOLDEN = textwrap.dedent("""\
    [Molden Format]
    [Atoms] AU
    Ne 1 10 0.0 0.0 0.0
    [GTO]
    1 0
     g 1 1.00
      1.00000000 1.00000000

    [9G]
    [MO]
    Sym= A1
    Ene= -1.0
    Spin= Alpha
    Occup= 2.0
      1 1.0
      2 0.0
      3 0.0
      4 0.0
      5 0.0
      6 0.0
      7 0.0
      8 0.0
      9 0.0
""")


def test_molden_spherical_g(tmp_path):
    """A single occupied spherical-g (l=4, m=0) basis function:
    normalization (NELEC = occupation by Becke-mesh quadrature) and the
    S40 angular shape (rho_z/rho_x at equal radius = (8/3)^2, from
    35cos^4 - 30cos^2 + 3 evaluated on the z and x axes)."""
    p = tmp_path / "ne_g.molden"
    p.write_text(NE_G_MOLDEN)
    w = Wavefunction.read_molden(str(p))
    assert w.nmo == 1 and w.npri == 15
    r = 1.3
    pts = np.array([[0.0, 0.0, r], [r, 0.0, 0.0], [0.0, r, 0.0]])
    rho = np.asarray(w.rho_eval(pts, nder=0)[0])
    assert abs(rho[0] / rho[1] - (8.0 / 3.0) ** 2) < 1e-10
    assert abs(rho[1] - rho[2]) < 1e-12 * rho[1]

    from critic2_tpu import System
    from critic2_tpu.analysis.molcalc import molcalc_nelec

    s = System.from_structure(str(p))
    s.load_field(str(p))
    assert abs(molcalc_nelec(s) - 2.0) < 1e-6


def test_molden_cartesian_g_matches_spherical(tmp_path):
    """The same l=4, m=0 function written as a cartesian-g molden (15
    components, coefficients from the solid-harmonic expansion divided
    by the per-component normalization factors) must evaluate to the
    same density."""
    from critic2_tpu.fields.wfn import (_sph_to_car, _TYPTRANS_MOLDEN,
                                        _JSHL0, _JSHL1)

    m0 = _sph_to_car(4, "molden")[0]          # m=0 row, molden order
    extra = []
    for j in range(_JSHL0[4], _JSHL1[4] + 1):
        ityp = int(_TYPTRANS_MOLDEN[j - 1])
        f = (np.sqrt(7.0) if 24 <= ityp <= 29 else
             np.sqrt(35.0 / 3.0) if 30 <= ityp <= 32 else
             np.sqrt(35.0) if 33 <= ityp <= 35 else 1.0)
        extra.append(f)
    coefs = m0 / np.asarray(extra)
    lines = "\n".join(f"  {i + 1} {c:.16f}" for i, c in enumerate(coefs))
    cart = NE_G_MOLDEN.replace("[9G]\n", "").replace(
        "  1 1.0\n  2 0.0\n  3 0.0\n  4 0.0\n  5 0.0\n  6 0.0\n"
        "  7 0.0\n  8 0.0\n  9 0.0\n", lines + "\n")
    psph = tmp_path / "sph.molden"
    pcar = tmp_path / "car.molden"
    psph.write_text(NE_G_MOLDEN)
    pcar.write_text(cart)
    ws = Wavefunction.read_molden(str(psph))
    wc = Wavefunction.read_molden(str(pcar))
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(32, 3)) * 1.5
    rs = np.asarray(ws.rho_eval(pts, nder=0)[0])
    rc = np.asarray(wc.rho_eval(pts, nder=0)[0])
    np.testing.assert_allclose(rc, rs, rtol=1e-10)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists("/root/reference/tests_cint/h2o-aqz.fchk"),
    reason="no reference data")
def test_fchk_spherical_g_nelec():
    # aug-cc-pVQZ water: spherical g (-4) shells on O exercise the
    # fchk g solid-harmonic matrix (gsphcar_fchk) end to end
    from critic2_tpu import System
    from critic2_tpu.analysis.molcalc import molcalc_nelec

    s = System.from_structure("/root/reference/tests_cint/h2o-aqz.fchk")
    s.load_field("/root/reference/tests_cint/h2o-aqz.fchk")
    assert abs(molcalc_nelec(s) - 10.0) < 1e-4


@pytest.mark.skipif(
    not os.path.exists("/root/reference/tests_cint/h2o-atz.fchk"),
    reason="no reference data")
def test_fchk_spherical_df_nelec():
    # aug-cc-pVTZ water: spherical d (-2) and f (-3) shells exercise the
    # solid-harmonic -> cartesian transforms end to end
    from critic2_tpu import System
    from critic2_tpu.analysis.molcalc import molcalc_nelec

    s = System.from_structure("/root/reference/tests_cint/h2o-atz.fchk")
    s.load_field("/root/reference/tests_cint/h2o-atz.fchk")
    assert abs(molcalc_nelec(s) - 10.0) < 1e-4
