"""Ewald sums: NaCl Madelung constant and potential consistency."""
import numpy as np
import pytest

from critic2_tpu import param
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.ewald import ewald_energy, ewald_potential

MADELUNG_NACL = 1.747564594633  # per ion pair, in units of e^2/r0


def _nacl(a=10.66):
    base = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    return Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90, 90, 90]),
                   x_frac=np.vstack([base, (base + [.5, .5, .5]) % 1]),
                   species_of=np.array([0] * 4 + [1] * 4),
                   species=[Species("Na", 11), Species("Cl", 17)])


def test_madelung_nacl():
    a = 10.66
    c = _nacl(a)
    q = np.array([1.0] * 4 + [-1.0] * 4)
    e = ewald_energy(c, q)
    r0 = a / 2
    # E_cell = -4 pairs * M / r0
    m = -e * r0 / 4.0
    assert abs(m - MADELUNG_NACL) < 1e-8


def test_madelung_cscl():
    MAD_CSCL = 1.762674773071
    a = 7.0
    c = Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90, 90, 90]),
                x_frac=np.array([[0, 0, 0], [.5, .5, .5]]),
                species_of=np.array([0, 1]),
                species=[Species("Cs", 55), Species("Cl", 17)])
    q = np.array([1.0, -1.0])
    e = ewald_energy(c, q)
    r0 = a * np.sqrt(3) / 2
    m = -e * r0
    assert abs(m - MAD_CSCL) < 1e-8


def test_potential_vs_energy():
    # E = 1/2 sum_i q_i V_i(at i, excluding self)
    c = _nacl()
    q = np.array([1.0] * 4 + [-1.0] * 4)
    e = ewald_energy(c, q)
    # ewald_potential now removes the on-site Gaussian self-term itself
    # (reference isnuc semantics), so V at atom sites is directly the
    # potential of all *other* charges
    v = ewald_potential(c, np.asarray(c.x_cart), q)
    e2 = 0.5 * float(q @ v)
    assert abs(e - e2) < 1e-8


def test_potential_self_term_autodetect():
    # a point 1e-8 bohr from a nucleus must match the on-site value, not
    # diverge by 2*eta*q/sqrt(pi)
    c = _nacl()
    q = np.array([1.0] * 4 + [-1.0] * 4)
    at = np.asarray(c.x_cart)[0]
    v_on = ewald_potential(c, at[None, :], q)[0]
    v_off = ewald_potential(c, at[None, :] + 1e-8, q)[0]
    assert abs(v_on - v_off) < 1e-5
