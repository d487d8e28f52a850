"""Molecular integrals (McMurchie-Davidson) and HF energies vs the
reference's pinned values (tests_cint/ref.txt)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu.ops.mdint import boys, overlap_kinetic_nuclear, rhf_energy

STO3G = "/root/reference/tests_cint/benzene-sto3g.fchk"

pytestmark = pytest.mark.skipif(not os.path.exists(STO3G),
                                reason="no reference data")


def test_boys_vs_quadrature():
    x, wq = np.polynomial.legendre.leggauss(400)
    t = 0.5 * (x + 1)
    wq = 0.5 * wq
    for T in (0.0, 0.3, 2.0, 10.0, 17.9, 18.1, 40.0, 300.0):
        F = np.asarray(boys(8, jnp.array([T])))[:, 0]
        for n in range(9):
            ref = float((t ** (2 * n) * np.exp(-T * t * t) * wq).sum())
            assert abs(F[n] - ref) < 1e-13


@pytest.fixture(scope="module")
def benzene():
    from critic2_tpu.fields.wfn import Wavefunction

    return Wavefunction.read_fchk(STO3G)


def test_overlap_normalization(benzene):
    S, T, V = overlap_kinetic_nuclear(benzene)
    P = np.einsum("m,mp,mq->pq", benzene.occ, benzene.cmo, benzene.cmo)
    nelec = float((P * np.asarray(S)).sum())
    assert abs(nelec - 42.0) < 1e-6


def test_rhf_benzene_sto3g(benzene):
    res = rhf_energy(benzene, block=128)
    # pinned: tests_cint/ref.txt; attainable precision limited by the
    # 8-significant-digit MO coefficients in the fchk
    assert abs(res["E_total"] - (-227.890996173)) < 1e-6
    assert abs(res["E_nn"] - 203.616859780) < 1e-8


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="~15 min on CPU; set RUN_SLOW=1")
def test_rhf_benzene_631gs():
    from critic2_tpu.fields.wfn import Wavefunction

    w = Wavefunction.read_fchk(
        "/root/reference/tests_cint/benzene-631gs.fchk")
    res = rhf_energy(w, block=96)
    # d functions exercise typtrans/gnorm/cartesian-normalization paths;
    # measured: -230.7023957194 (2.1e-8 Ha from the pinned reference)
    assert abs(res["E_total"] - (-230.702395698)) < 1e-6


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="~20 min on CPU; set RUN_SLOW=1")
def test_rhf_h2o_atz():
    from critic2_tpu.fields.wfn import Wavefunction

    w = Wavefunction.read_fchk("/root/reference/tests_cint/h2o-atz.fchk")
    res = rhf_energy(w, block=32)
    # f shells + spherical transforms; measured -76.06017687 (3.2e-8 Ha)
    assert abs(res["E_total"] - (-76.060176840)) < 1e-6
