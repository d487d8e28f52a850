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
