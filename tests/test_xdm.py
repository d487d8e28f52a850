"""XDM dispersion: BR hole inversion and the grid pipeline."""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.xdm import br_hole_b, xdm_grid
from critic2_tpu.analysis.integration import _rasterize_field
from critic2_tpu.fields.field import Field
from critic2_tpu.fields.grid3 import Grid3


def _scalar_newton(rhs):
    """Independent scalar solve of x e^(-2x/3)/(x-2) = rhs."""
    import math

    def g(x):
        return x * math.exp(-2 * x / 3) / (x - 2)

    if rhs > 0:
        x, shift = 3.0, 1.0
        while g(2.0 + shift) < rhs:
            shift *= 0.1
        x = 2.0 + shift
    else:
        shift = 1.0
        while g(2.0 - shift) > rhs:
            shift *= 0.1
        x = 2.0 - shift
    for _ in range(200):
        expx = math.exp(-2 * x / 3)
        gx = x * expx / (x - 2)
        fx = gx - rhs
        dfx = gx * (1 / x - 2 / 3 - 1 / (x - 2))
        xn = x - fx / dfx
        if abs(xn - x) < 1e-12:
            return xn
        x = xn
    return x


def test_br_inversion_matches_scalar():
    # synthetic per-point data with known per-spin quantities
    rng = np.random.default_rng(0)
    rho = rng.uniform(0.01, 2.0, 64)
    grad = rng.uniform(0.0, 1.0, 64)
    # tau >= von Weizsaecker to keep D >= 0 (physical region)
    tw = grad ** 2 / (8 * rho)
    tau = tw + rng.uniform(0.01, 1.0, 64)
    lap = rng.uniform(-2.0, 2.0, 64)
    b = np.asarray(br_hole_b(jnp.asarray(rho), jnp.asarray(grad),
                             jnp.asarray(lap), jnp.asarray(tau)))
    for idx in range(0, 64, 7):
        rhos = max(rho[idx], 1e-14) / 2
        ds = tau[idx] / 2 - 0.25 * (grad[idx] / 2) ** 2 / rhos
        qs = (lap[idx] / 2 - 2 * ds) / 6
        rhs = (2 / 3) * np.pi ** (2 / 3) * rhos ** (5 / 3) / qs
        x = _scalar_newton(rhs)
        b_ref = x * (np.exp(-x) / (8 * np.pi * rhos)) ** (1 / 3)
        assert abs(b[idx] - b_ref) < 1e-8


def test_xdm_grid_argon_crystal():
    # fcc argon-like promolecular density: sensible C6 and negative Evdw
    a = 10.0
    c = Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90, 90, 90]),
                x_frac=np.array([[0, 0, 0], [0, .5, .5],
                                 [.5, 0, .5], [.5, .5, 0]]),
                species_of=np.array([0] * 4, dtype=int),
                species=[Species("Ar", 18)])
    s = System.from_structure(c)
    g = _rasterize_field(s.fields[0], (24, 24, 24))
    s.load_field(Field.from_grid(c, Grid3(g)))
    res = xdm_grid(s)
    assert res.energy < 0.0
    # identical atoms: symmetric tables
    np.testing.assert_allclose(res.c6, res.c6.T)
    np.testing.assert_allclose(res.c6, res.c6[0, 0], rtol=1e-6)
    # free-atom Ar C6 is ~64.3 au; confined promolecular grid under
    # TF+W tau gives the right order of magnitude
    assert 5.0 < res.c6[0, 0] < 300.0
    assert (res.moments > 0).all()
    assert (res.rvdw > res.rc * 0.68).all()
    # forces vanish by symmetry in fcc
    assert np.abs(res.forces).max() < 1e-6


@pytest.mark.slow
def test_xdm_wfn_h2o():
    """Molecular XDM on the Becke mesh (reference xdm_wfn,
    src/xdm@proc.f90:1014): sensible volumes/alpha and a small negative
    dispersion energy for a single water molecule."""
    from critic2_tpu.analysis.xdm import xdm_wfn
    from critic2_tpu.system import System

    path = "/root/reference/tests_libxc/h2o.wfx"
    s = System.from_structure(path)
    s.load_field(path)
    res = xdm_wfn(s, lvl="small")
    assert res.energy < 0.0
    assert 15.0 < res.volumes[0] < 30.0       # O
    assert 2.0 < res.volumes[1] < 10.0        # H
    assert (res.alpha > 0).all() and (res.alpha < 10).all()
    assert res.c6[0, 0] > res.c6[1, 1]        # C6(O) > C6(H)


def test_xdm_qe_parses_and_sums(tmp_path):
    """XDM QE: parse a1/a2 + the pairwise coefficient table from a QE
    pw.x output and run the damped lattice sum (reference xdm_qe,
    src/xdm@proc.f90:751-889); BETWEEN/AND zeroes the excluded pairs."""
    import numpy as np

    from critic2_tpu import System
    from critic2_tpu.analysis.xdm import xdm_qe, _edisp_sum
    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.crystal.crystal import Crystal, Species

    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0] * 3, [90] * 3),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("Ar", 18)])
    s = System.from_structure(c)

    c6 = np.array([[64.3, 61.7], [61.7, 60.0]])
    c8 = 20.0 * c6
    c10 = 300.0 * c6
    rc = np.full((2, 2), 3.1)
    rvdw = np.full((2, 2), 4.6)
    qeout = ["some pw.x header", "* XDM dispersion", "  a1 = 0.6836",
             "  junk", "  a2 = 1.5045", "", "+ Dispersion coefficients"]
    for i in range(2):
        for j in range(i + 1):
            qeout.append(f" {i + 1} {j + 1} {c6[i, j]} {c8[i, j]} "
                         f"{c10[i, j]} {rc[i, j]} {rvdw[i, j]}")
    path = tmp_path / "pw.out"
    path.write_text("\n".join(qeout) + "\n")

    res = xdm_qe(s, path=str(path))
    e_ref, _, _ = _edisp_sum(c, c6, c8, c10, rvdw)
    assert res.energy == e_ref
    assert res.energy < 0.0
    np.testing.assert_allclose(res.c6, c6)

    # BETWEEN 1 AND 2 keeps only the 1-2 pair
    res12 = xdm_qe(s, path=str(path), between=[1], and_=[2])
    keep = np.array([[False, True], [True, False]])
    e12_ref, _, _ = _edisp_sum(c, np.where(keep, c6, 0.0),
                               np.where(keep, c8, 0.0),
                               np.where(keep, c10, 0.0), rvdw)
    assert res12.energy == e12_ref
    assert abs(res12.energy) < abs(res.energy)
