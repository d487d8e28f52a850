"""aiPI STO fields: ion file parsing, exact density/derivatives,
normalization, and the Field/CLI dispatch (reference pi_private,
src/pi_private@proc.f90:53-300)."""
import numpy as np
import pytest

from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.fields.pi import read_ion, PiField, _rho_radial
from critic2_tpu.system import System


ION_HE = """ PI7 STO
 He ground state, 2 STO fit
 HE        2.0
 1
 2
 1 1
 1.45 2.9
 1
 2.0
 -0.918
 0.8 0.3
"""

ION_LI = """ STO
 Li ion
 LI        3.0
 2
 2 1
 1 1 2
 2.7 4.5 0.65
 1 1
 2.0 1.0
 -2.5 -0.2
 0.9 0.2
 1.0
"""


@pytest.fixture
def ion_files(tmp_path):
    he = tmp_path / "he.ion"
    he.write_text(ION_HE)
    li = tmp_path / "li.ion"
    li.write_text(ION_LI)
    return str(he), str(li)


def test_read_ion(ion_files):
    he, li = ion_files
    ion = read_ion(he)
    assert ion["nsym"] == 1 and ion["nsto"] == [2]
    np.testing.assert_allclose(ion["z"], [1.45, 2.9])
    np.testing.assert_allclose(ion["nelec"], [2.0])
    ion2 = read_ion(li)
    assert ion2["nsym"] == 2
    assert ion2["nsto"] == [2, 1] and ion2["naos"] == [1, 1]
    np.testing.assert_allclose(ion2["nelec"], [2.0, 1.0])


def test_radial_density_normalization(ion_files):
    """Each normalized STO orbital integrates to its occupation:
    int rho 4 pi r^2 dr = sum nelec |c|^2-ish (exact for c-normalized)."""
    he, _ = ion_files
    ion = read_ion(he)
    r = np.linspace(1e-6, 30.0, 20000)
    rho, rhop, rhopp = _rho_radial(ion, r)
    q = np.trapezoid(rho * 4 * np.pi * r * r, r)
    # c = (0.8, 0.3) is not perfectly normalized; compute the exact norm
    C = np.array([0.8, 0.3])
    zz = np.array([1.45, 2.9])
    nn = np.array([1, 1])
    from math import factorial
    N = np.sqrt((2 * zz) ** (2 * nn + 1) / np.array([factorial(2 * n) for n in nn]))
    # overlap of two normalized 1s STOs
    def ovl(i, j):
        return N[i] * N[j] * factorial(nn[i] + nn[j]) / (zz[i] + zz[j]) ** (nn[i] + nn[j] + 1)
    S = np.array([[ovl(i, j) for j in range(2)] for i in range(2)])
    exact = 2.0 * C @ S @ C
    assert q == pytest.approx(exact, rel=1e-6)
    # derivative consistency by finite differences
    h = 1e-5
    rupper, _, _ = _rho_radial(ion, r[1000] + h)
    rlower, _, _ = _rho_radial(ion, r[1000] - h)
    assert rhop[1000] == pytest.approx((rupper[0] - rlower[0]) / (2 * h),
                                       rel=1e-6)


def test_pi_field_eval_and_derivatives(ion_files):
    he, li = ion_files
    c = Crystal(m_x2c=np.eye(3) * 12.0,
                x_frac=np.array([[0.25, 0.25, 0.25], [0.75, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("He", 2), Species("Li", 3)])
    pf = PiField.from_files(c, {"He": he, "Li": li})
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 12, size=(20, 3))
    rho, grad, hess = (np.asarray(v) for v in pf.eval(pts))
    assert (rho > 0).all()

    # finite-difference check of gradient and Hessian
    h = 1e-5
    for k in range(3):
        dp = pts.copy(); dp[:, k] += h
        dm = pts.copy(); dm[:, k] -= h
        rp = np.asarray(pf.eval(dp)[0])
        rm = np.asarray(pf.eval(dm)[0])
        np.testing.assert_allclose(grad[:, k], (rp - rm) / (2 * h),
                                   rtol=2e-5, atol=1e-10)
        gp = np.asarray(pf.eval(dp)[1])
        gm = np.asarray(pf.eval(dm)[1])
        np.testing.assert_allclose(hess[:, :, k], (gp - gm) / (2 * h),
                                   rtol=5e-5, atol=1e-8)


@pytest.mark.slow
def test_pi_cell_integral(ion_files):
    # periodic cell integral = total electrons per cell (2 He + 3 Li,
    # scaled by the orbital norms of the fits); needs a 40^3 grid to
    # resolve the nuclear cusps
    he, li = ion_files
    c = Crystal(m_x2c=np.eye(3) * 12.0,
                x_frac=np.array([[0.25, 0.25, 0.25], [0.75, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("He", 2), Species("Li", 3)])
    pf = PiField.from_files(c, {"He": he, "Li": li})
    n = 40
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    xc = np.stack([i, j, k], -1).reshape(-1, 3) / n * 12.0
    tot = 0.0
    for lo in range(0, len(xc), 16384):
        tot += float(np.asarray(pf.eval(xc[lo:lo + 16384], nder=0)[0]).sum())
    q = tot * (12.0 ** 3) / n ** 3
    assert 3.5 < q < 6.5          # ~2+3 modulo fit norms and grid error


def test_pi_system_cli(ion_files, tmp_path):
    import io
    from critic2_tpu.cli import Repl

    he, li = ion_files
    poscar = tmp_path / "POSCAR"
    poscar.write_text("HeLi\n1.0\n"
                      + "6.35 0 0\n0 6.35 0\n0 0 6.35\n"
                      "He Li\n1 1\nDirect\n0.25 0.25 0.25\n0.75 0.5 0.5\n")
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    r.run_script(f"""
crystal {poscar}
load pi {he} he {li} li
point 0.5 0.4 0.4
""")
    text = out.getvalue()
    assert "field 1" in text and "pi" in text
    f = r.sy.field(1)
    res = f.grd(np.array([[3.0, 2.5, 2.5]]))
    assert float(res.f[0]) > 0
