import numpy as np
import pytest

from critic2_tpu.crystal import cell
from critic2_tpu.ops import fft as fftops


def setup_field(n=(18, 20, 24), cellpar=([6.0, 7.0, 8.0], [80.0, 95.0, 102.0])):
    m = cell.m_x2c_from_cellpar(*cellpar)
    grids = np.meshgrid(*[np.arange(k) / k for k in n], indexing="ij")
    frac = np.stack(grids, axis=-1)
    cart = frac @ m.T
    b = cell.reciprocal_vectors(m)
    # single plane wave along a reciprocal vector combination
    G = b @ np.array([1.0, 2.0, -1.0])
    phase = cart @ G
    f = np.cos(phase)
    return m, f, G, cart


def test_laplacian_planewave():
    m, f, G, _ = setup_field()
    lap = np.asarray(fftops.laplacian(f, m))
    np.testing.assert_allclose(lap, -(G @ G) * f, atol=1e-9)


def test_gradrho_planewave():
    m, f, G, cart = setup_field()
    gr = np.asarray(fftops.gradrho(f, m))
    exact = np.abs(np.sin(cart @ G)) * np.linalg.norm(G)
    np.testing.assert_allclose(gr, exact, atol=1e-9)


def test_hxx_planewave():
    m, f, G, _ = setup_field()
    for ix in range(3):
        h = np.asarray(fftops.hxx(f, m, ix))
        np.testing.assert_allclose(h, -G[ix] ** 2 * f, atol=1e-9)


def test_pot_poisson():
    # del^2 V = -4 pi rho must hold for the FFT potential
    m, rho, G, _ = setup_field()
    v = fftops.pot(rho, m)
    lap = np.asarray(fftops.laplacian(np.asarray(v), m))
    np.testing.assert_allclose(lap, -4 * np.pi * rho, atol=1e-8)
    # Rydberg doubling
    v2 = np.asarray(fftops.pot(rho, m, isry=True))
    np.testing.assert_allclose(v2, 2 * np.asarray(v), atol=1e-12)
    # zero mean
    assert abs(np.asarray(v).mean()) < 1e-10


def test_grid3_roundtrip(tmp_path):
    from critic2_tpu.fields.grid3 import Grid3

    # cube format write-read consistency via a minimal hand-rolled cube
    n = (4, 5, 6)
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(n)
    path = tmp_path / "t.cube"
    with open(path, "w") as f:
        f.write("t\nt\n")
        f.write("1 0.0 0.0 0.0\n")
        for i in range(3):
            v = [0.0, 0.0, 0.0]
            v[i] = 1.0
            f.write(f"{n[i]} {v[0]} {v[1]} {v[2]}\n")
        f.write("1 1.0 0.0 0.0 0.0\n")
        flat = vals.reshape(-1)  # C order: k fastest, cube convention
        for i in range(0, len(flat), 6):
            f.write(" ".join(f"{x:.10e}" for x in flat[i:i + 6]) + "\n")
    g = Grid3.read_cube(str(path))
    np.testing.assert_allclose(np.asarray(g.f), vals, atol=1e-9)


def test_eig3(rng):
    from critic2_tpu.ops.eig3 import eigh3, eigvalsh3, inv3, rsindex

    mats = rng.standard_normal((50, 3, 3))
    mats = 0.5 * (mats + np.swapaxes(mats, 1, 2))
    w = np.asarray(eigvalsh3(mats))
    wref = np.linalg.eigvalsh(mats)
    np.testing.assert_allclose(w, wref, atol=1e-10)

    wv, v = eigh3(mats)
    wv, v = np.asarray(wv), np.asarray(v)
    # eigen equation and orthonormality
    for i in range(len(mats)):
        np.testing.assert_allclose(mats[i] @ v[i], v[i] * wv[i][None, :], atol=1e-8)
        np.testing.assert_allclose(v[i].T @ v[i], np.eye(3), atol=1e-8)

    inv = np.asarray(inv3(mats))
    np.testing.assert_allclose(inv @ mats, np.tile(np.eye(3), (50, 1, 1)),
                               atol=1e-7)

    # rsindex on a known saddle
    h = np.diag([2.0, -1.0, 3.0])
    e, r, s = rsindex(h[None])
    assert int(r[0]) == 3 and int(s[0]) == 1


def test_eig3_degenerate():
    from critic2_tpu.ops.eig3 import eigh3

    mats = np.stack([np.eye(3), np.diag([2.0, 2.0, 1.0]), np.zeros((3, 3))])
    w, v = eigh3(mats)
    w, v = np.asarray(w), np.asarray(v)
    np.testing.assert_allclose(w[0], [1, 1, 1], atol=1e-12)
    np.testing.assert_allclose(w[1], [1, 2, 2], atol=1e-12)
    for i in range(3):
        np.testing.assert_allclose(v[i].T @ v[i], np.eye(3), atol=1e-8)
        np.testing.assert_allclose(mats[i] @ v[i], v[i] * w[i][None, :], atol=1e-8)


def test_eig3_near_isotropic():
    """Near-isotropic Hessians (cage CPs at high-symmetry points) have
    p ~ 1e-18; the naive det/p^3 form underflows to 0/0 = NaN and the CP
    is then silently dropped as 'degenerate' (rank 0).  Regression for
    the NaCl (1/4,1/4,1/4) cage."""
    import jax.numpy as jnp

    from critic2_tpu.ops.eig3 import eigvalsh3, eigvalsh3s, rsindex

    lam = 1.28461739e-03
    h = np.array([[[lam, 0.0, 1.73472348e-18],
                   [0.0, lam, -2.16840434e-19],
                   [1.73472348e-18, -2.16840434e-19, lam]]])
    for dt in (jnp.float64, jnp.float32):
        w = np.asarray(eigvalsh3(jnp.asarray(h, dtype=dt)))
        assert np.all(np.isfinite(w))
        np.testing.assert_allclose(w[0], [lam] * 3, rtol=1e-6)
    h6 = jnp.asarray([[lam], [lam], [lam],
                      [0.0], [1.73e-18], [-2.17e-19]])
    w6 = np.asarray(eigvalsh3s(h6))
    assert np.all(np.isfinite(w6))
    np.testing.assert_allclose(w6.ravel(), [lam] * 3, rtol=1e-12)
    _, r, s = rsindex(jnp.asarray(h), eps=1e-8)
    assert int(r[0]) == 3 and int(s[0]) == 3
