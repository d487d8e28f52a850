"""Reference-parity trispline ("star" scheme): the vectorized device
implementation must match a direct scalar port of grinterp_trispline
(src/grid3mod@proc.f90:1705-1967) to machine precision, and the c2
curvature grids must solve the same cyclic system as init_trispline
(:2167-2274)."""
import numpy as np
import pytest

from critic2_tpu.ops.trispline import star_c2, trispline_star_soa


def _init_trispline_ref(f):
    """Direct cyclic-tridiagonal solve (dense) of init_trispline's
    system: A c2 = 6 n^2 d2, A = cyclic(1,4,1)."""
    out = np.zeros(f.shape + (3,))
    for d in range(3):
        n = f.shape[d]
        A = np.zeros((n, n))
        for i in range(n):
            A[i, i] = 4.0
            A[i, (i - 1) % n] = 1.0
            A[i, (i + 1) % n] = 1.0
        d2 = np.roll(f, -1, d) + np.roll(f, 1, d) - 2.0 * f
        m = np.moveaxis(d2, d, 0).reshape(n, -1)
        c2 = 6.0 * n * n * np.linalg.solve(A, m)
        out[..., d] = np.moveaxis(
            c2.reshape((n,) + tuple(s for i, s in enumerate(f.shape)
                                    if i != d)), 0, d)
    return out


def _star_scalar(f, c2, x0):
    """Scalar port of grinterp_trispline (1-based Fortran indices kept
    where it clarifies the transcription)."""
    n = np.asarray(f.shape)
    dix = 1.0 / n
    xx = np.mod(np.asarray(x0, float), 1.0)
    indx = np.empty(3, int)
    cof = np.zeros((2, 3))
    for ii in range(3):
        indx[ii] = int(xx[ii] * n[ii])
        bbb = (xx[ii] - indx[ii] * dix[ii]) * n[ii]
        if indx[ii] == n[ii]:
            indx[ii] = 0
            xx[ii] = 0.0
        cof[0, ii] = 1.0 - bbb
        cof[1, ii] = bbb
    pomsq = np.zeros((2, 3))
    pom2sq = np.zeros((2, 3))
    for ii in range(3):
        for jj in range(2):
            pomsq[jj, ii] = (cof[jj, ii] ** 3 - cof[jj, ii]) / 6.0 \
                * dix[ii] ** 2
            pom2sq[jj, ii] = (3.0 * cof[jj, ii] ** 2 - 1.0) / 6.0 * dix[ii]
            if jj == 0:
                pom2sq[jj, ii] = -pom2sq[jj, ii]

    def g(arr, di, dj, dk):
        return arr[(indx[0] + di) % n[0], (indx[1] + dj) % n[1],
                   (indx[2] + dk) % n[2]]

    rho = lambda i, j, k: g(f, i, j, k)  # noqa: E731
    ddx = lambda i, j, k: g(c2[..., 0], i, j, k)  # noqa: E731
    ddy = lambda i, j, k: g(c2[..., 1], i, j, k)  # noqa: E731
    ddz = lambda i, j, k: g(c2[..., 2], i, j, k)  # noqa: E731

    ddstar = np.zeros(6)
    sqder = np.zeros((6, 4))
    sqvlr = np.zeros((6, 4))
    for ii in range(2):
        for jj in range(2):
            for kk in range(2):
                ddstar[ii] += cof[jj, 1] * cof[kk, 2] * ddx(ii, jj, kk)
                ddstar[ii + 2] += cof[jj, 2] * cof[kk, 0] * ddy(kk, ii, jj)
                ddstar[ii + 4] += cof[jj, 0] * cof[kk, 1] * ddz(jj, kk, ii)
                sqder[ii, jj] += cof[kk, 1] * ddz(ii, kk, jj)
                sqder[ii, jj + 2] += cof[kk, 2] * ddy(ii, jj, kk)
                sqder[ii + 2, jj] += cof[kk, 2] * ddx(jj, ii, kk)
                sqder[ii + 2, jj + 2] += cof[kk, 0] * ddz(kk, ii, jj)
                sqder[ii + 4, jj] += cof[kk, 0] * ddy(kk, jj, ii)
                sqder[ii + 4, jj + 2] += cof[kk, 1] * ddx(jj, kk, ii)
                sqvlr[ii, jj] += cof[kk, 1] * rho(ii, kk, jj) \
                    + pomsq[kk, 1] * ddy(ii, kk, jj)
                sqvlr[ii, jj + 2] += cof[kk, 2] * rho(ii, jj, kk) \
                    + pomsq[kk, 2] * ddz(ii, jj, kk)
                sqvlr[ii + 2, jj + 2] += cof[kk, 0] * rho(kk, ii, jj) \
                    + pomsq[kk, 0] * ddx(kk, ii, jj)
    for ii in range(2):
        for jj in range(2):
            sqvlr[ii + 2, jj] = sqvlr[jj, ii + 2]
            sqvlr[ii + 4, jj] = sqvlr[jj + 2, ii + 2]
            sqvlr[ii + 4, jj + 2] = sqvlr[jj, ii]

    rhstar = np.zeros(6)
    for ii in range(2):
        for jj in range(2):
            rhstar[ii] += cof[jj, 2] * sqvlr[ii, jj] \
                + pomsq[jj, 2] * sqder[ii, jj] \
                + cof[jj, 1] * sqvlr[ii, jj + 2] \
                + pomsq[jj, 1] * sqder[ii, jj + 2]
            rhstar[ii + 2] += cof[jj, 0] * sqvlr[ii + 2, jj] \
                + pomsq[jj, 0] * sqder[ii + 2, jj] \
                + cof[jj, 2] * sqvlr[ii + 2, jj + 2] \
                + pomsq[jj, 2] * sqder[ii + 2, jj + 2]
            rhstar[ii + 4] += cof[jj, 1] * sqvlr[ii + 4, jj] \
                + pomsq[jj, 1] * sqder[ii + 4, jj] \
                + cof[jj, 0] * sqvlr[ii + 4, jj + 2] \
                + pomsq[jj, 0] * sqder[ii + 4, jj + 2]
    rhstar /= 2.0

    y = 0.0
    yp = np.zeros(3)
    ypp = np.zeros((3, 3))
    for kk in range(3):
        nnsgn = 1.0
        for jj in range(2):
            nnsgn = -nnsgn
            idx = 2 * kk + jj
            y += cof[jj, kk] * rhstar[idx] + pomsq[jj, kk] * ddstar[idx]
            yp[kk] += pom2sq[jj, kk] * ddstar[idx] \
                + nnsgn * rhstar[idx] / dix[kk]
            ypp[kk, kk] += cof[jj, kk] * ddstar[idx]
    y /= 3.0

    # off-diagonal hessian
    def inii(jj, ii):             # jj in 1..4 (Fortran), returns 0-based idx
        return (indx[ii] + jj - 2) % n[ii]

    for ii in range(3):
        hh = np.zeros((4, 2))
        for jjn in range(1, 5):
            a = inii(jjn, ii)
            if ii == 0:
                i2a, i2b = inii(2, 1), inii(3, 1)
                i3a, i3b = inii(2, 2), inii(3, 2)
                c2g = c2
                ddu1 = cof[0, 1] * c2g[a, i2a, i3a, 2] \
                    + cof[1, 1] * c2g[a, i2b, i3a, 2]
                ddu2 = cof[0, 1] * c2g[a, i2a, i3b, 2] \
                    + cof[1, 1] * c2g[a, i2b, i3b, 2]
                hrh1 = cof[0, 1] * f[a, i2a, i3a] + cof[1, 1] * f[a, i2b, i3a] \
                    + pomsq[0, 1] * c2g[a, i2a, i3a, 1] \
                    + pomsq[1, 1] * c2g[a, i2b, i3a, 1]
                hrh2 = cof[0, 1] * f[a, i2a, i3b] + cof[1, 1] * f[a, i2b, i3b] \
                    + pomsq[0, 1] * c2g[a, i2a, i3b, 1] \
                    + pomsq[1, 1] * c2g[a, i2b, i3b, 1]
                hh[jjn - 1, 1] = (hrh2 - hrh1) / dix[2] \
                    + pom2sq[0, 2] * ddu1 + pom2sq[1, 2] * ddu2
                ddu1 = cof[0, 2] * c2g[a, i2a, i3a, 1] \
                    + cof[1, 2] * c2g[a, i2a, i3b, 1]
                ddu2 = cof[0, 2] * c2g[a, i2b, i3a, 1] \
                    + cof[1, 2] * c2g[a, i2b, i3b, 1]
                hrh1 = cof[0, 2] * f[a, i2a, i3a] + cof[1, 2] * f[a, i2a, i3b] \
                    + pomsq[0, 2] * c2g[a, i2a, i3a, 2] \
                    + pomsq[1, 2] * c2g[a, i2a, i3b, 2]
                hrh2 = cof[0, 2] * f[a, i2b, i3a] + cof[1, 2] * f[a, i2b, i3b] \
                    + pomsq[0, 2] * c2g[a, i2b, i3a, 2] \
                    + pomsq[1, 2] * c2g[a, i2b, i3b, 2]
                hh[jjn - 1, 0] = (hrh2 - hrh1) / dix[1] \
                    + pom2sq[0, 1] * ddu1 + pom2sq[1, 1] * ddu2
            elif ii == 1:
                i1a, i1b = inii(2, 0), inii(3, 0)
                i3a, i3b = inii(2, 2), inii(3, 2)
                ddu1 = cof[0, 2] * c2[i1a, a, i3a, 0] \
                    + cof[1, 2] * c2[i1a, a, i3b, 0]
                ddu2 = cof[0, 2] * c2[i1b, a, i3a, 0] \
                    + cof[1, 2] * c2[i1b, a, i3b, 0]
                hrh1 = cof[0, 2] * f[i1a, a, i3a] + cof[1, 2] * f[i1a, a, i3b] \
                    + pomsq[0, 2] * c2[i1a, a, i3a, 2] \
                    + pomsq[1, 2] * c2[i1a, a, i3b, 2]
                hrh2 = cof[0, 2] * f[i1b, a, i3a] + cof[1, 2] * f[i1b, a, i3b] \
                    + pomsq[0, 2] * c2[i1b, a, i3a, 2] \
                    + pomsq[1, 2] * c2[i1b, a, i3b, 2]
                hh[jjn - 1, 1] = (hrh2 - hrh1) / dix[0] \
                    + pom2sq[0, 0] * ddu1 + pom2sq[1, 0] * ddu2
                ddu1 = cof[0, 0] * c2[i1a, a, i3a, 2] \
                    + cof[1, 0] * c2[i1b, a, i3a, 2]
                ddu2 = cof[0, 0] * c2[i1a, a, i3b, 2] \
                    + cof[1, 0] * c2[i1b, a, i3b, 2]
                hrh1 = cof[0, 0] * f[i1a, a, i3a] + cof[1, 0] * f[i1b, a, i3a] \
                    + pomsq[0, 0] * c2[i1a, a, i3a, 0] \
                    + pomsq[1, 0] * c2[i1b, a, i3a, 0]
                hrh2 = cof[0, 0] * f[i1a, a, i3b] + cof[1, 0] * f[i1b, a, i3b] \
                    + pomsq[0, 0] * c2[i1a, a, i3b, 0] \
                    + pomsq[1, 0] * c2[i1b, a, i3b, 0]
                hh[jjn - 1, 0] = (hrh2 - hrh1) / dix[2] \
                    + pom2sq[0, 2] * ddu1 + pom2sq[1, 2] * ddu2
            else:
                i1a, i1b = inii(2, 0), inii(3, 0)
                i2a, i2b = inii(2, 1), inii(3, 1)
                ddu1 = cof[0, 0] * c2[i1a, i2a, a, 1] \
                    + cof[1, 0] * c2[i1b, i2a, a, 1]
                ddu2 = cof[0, 0] * c2[i1a, i2b, a, 1] \
                    + cof[1, 0] * c2[i1b, i2b, a, 1]
                hrh1 = cof[0, 0] * f[i1a, i2a, a] + cof[1, 0] * f[i1b, i2a, a] \
                    + pomsq[0, 0] * c2[i1a, i2a, a, 0] \
                    + pomsq[1, 0] * c2[i1b, i2a, a, 0]
                hrh2 = cof[0, 0] * f[i1a, i2b, a] + cof[1, 0] * f[i1b, i2b, a] \
                    + pomsq[0, 0] * c2[i1a, i2b, a, 0] \
                    + pomsq[1, 0] * c2[i1b, i2b, a, 0]
                hh[jjn - 1, 1] = (hrh2 - hrh1) / dix[1] \
                    + pom2sq[0, 1] * ddu1 + pom2sq[1, 1] * ddu2
                ddu1 = cof[0, 1] * c2[i1a, i2a, a, 0] \
                    + cof[1, 1] * c2[i1a, i2b, a, 0]
                ddu2 = cof[0, 1] * c2[i1b, i2a, a, 0] \
                    + cof[1, 1] * c2[i1b, i2b, a, 0]
                hrh1 = cof[0, 1] * f[i1a, i2a, a] + cof[1, 1] * f[i1a, i2b, a] \
                    + pomsq[0, 1] * c2[i1a, i2a, a, 1] \
                    + pomsq[1, 1] * c2[i1a, i2b, a, 1]
                hrh2 = cof[0, 1] * f[i1b, i2a, a] + cof[1, 1] * f[i1b, i2b, a] \
                    + pomsq[0, 1] * c2[i1b, i2a, a, 1] \
                    + pomsq[1, 1] * c2[i1b, i2b, a, 1]
                hh[jjn - 1, 0] = (hrh2 - hrh1) / dix[0] \
                    + pom2sq[0, 0] * ddu1 + pom2sq[1, 0] * ddu2
        grd = np.array([(indx[ii] + jj) * dix[ii] for jj in range(-1, 3)])
        for jj in range(1, 3):
            hcol = hh[:, jj - 1].copy()
            for kk in range(1, 4):
                for ll in range(3, kk - 1, -1):
                    hcol[ll] = (hcol[ll] - hcol[ll - 1]) \
                        / (grd[ll] - grd[ll - kk])
            lder = np.zeros(4)
            lder[3] = hcol[3]
            for kk in range(2, -1, -1):
                lder[kk] = hcol[kk] + (xx[ii] - grd[kk]) * lder[kk + 1]
            for kk in range(1, 3):
                for ll in range(2, kk - 1, -1):
                    lder[ll] = lder[ll] + (xx[ii] - grd[ll - kk]) \
                        * lder[ll + 1]
            nn_ = ii + jj
            if nn_ > 2:
                nn_ -= 3
            ypp[ii, nn_] += lder[1]
            ypp[nn_, ii] += lder[1]
    for ii in range(3):
        for jj in range(3):
            if ii != jj:
                ypp[ii, jj] /= 2.0
    return y, yp, ypp


@pytest.fixture(scope="module")
def grid_data():
    rng = np.random.default_rng(3)
    f = rng.random((10, 12, 8))
    return f, np.asarray(star_c2(f))


def test_star_c2_solves_cyclic_system(grid_data):
    f, c2 = grid_data
    ref = _init_trispline_ref(f)
    np.testing.assert_allclose(c2, ref, atol=1e-8)


def test_star_vectorized_matches_scalar(grid_data):
    f, c2 = grid_data
    rng = np.random.default_rng(5)
    pts = rng.random((30, 3)) * 1.4 - 0.2       # include wrap cases
    import jax.numpy as jnp

    y, ypT, ypp6 = trispline_star_soa(jnp.asarray(f), jnp.asarray(c2),
                                      jnp.asarray(pts.T), nder=2)
    y, ypT, ypp6 = np.asarray(y), np.asarray(ypT), np.asarray(ypp6)
    for i, p in enumerate(pts):
        ys, yps, ypps = _star_scalar(f, c2, p)
        assert y[i] == pytest.approx(ys, rel=1e-12, abs=1e-12)
        np.testing.assert_allclose(ypT[:, i], yps, atol=1e-9)
        ref6 = [ypps[0, 0], ypps[1, 1], ypps[2, 2],
                ypps[0, 1], ypps[0, 2], ypps[1, 2]]
        np.testing.assert_allclose(ypp6[:, i], ref6, atol=1e-8)


def test_star_reproduces_smooth_function():
    """On a band-limited function the star value/gradient/diagonal
    Hessian converge to the analytic ones."""
    n = 24
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    tp = 2 * np.pi
    f = np.sin(tp * i / n) * np.cos(tp * j / n) + np.cos(tp * k / n)
    import jax.numpy as jnp

    c2 = star_c2(f)
    pts = np.array([[0.21, 0.37, 0.68], [0.5, 0.01, 0.93]])
    y, ypT, ypp6 = trispline_star_soa(jnp.asarray(f), c2,
                                      jnp.asarray(pts.T), nder=2)
    for i_, (x, yy, zz) in enumerate(pts):
        fa = np.sin(tp * x) * np.cos(tp * yy) + np.cos(tp * zz)
        assert float(y[i_]) == pytest.approx(fa, abs=2e-4)
        ga = np.array([tp * np.cos(tp * x) * np.cos(tp * yy),
                       -tp * np.sin(tp * x) * np.sin(tp * yy),
                       -tp * np.sin(tp * zz)])
        np.testing.assert_allclose(np.asarray(ypT)[:, i_], ga, atol=5e-3)
        # mixed xy Hessian
        hxy = -tp * tp * np.cos(tp * x) * np.sin(tp * yy)
        assert float(ypp6[3, i_]) == pytest.approx(hxy, abs=0.1)


def test_field_tristar_mode():
    """The tristar interpolation drives the full Field pipeline."""
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.fields.field import Field
    from critic2_tpu.fields.grid3 import Grid3
    import jax.numpy as jnp

    n = 16
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    f = 2.0 + np.cos(2 * np.pi * i / n) * np.cos(2 * np.pi * j / n) \
        + 0.3 * np.cos(2 * np.pi * k / n)
    c = Crystal(m_x2c=np.eye(3) * 8.0, x_frac=np.zeros((0, 3)),
                species_of=np.zeros(0, dtype=int), species=[])
    fld = Field.from_grid(c, Grid3(jnp.asarray(f)))
    fld.set_options(interp="tristar")
    pts = np.array([[1.3, 2.7, 0.4], [4.0, 4.0, 4.0]])
    res = fld.grd(pts, nder=2)
    x = pts[0] / 8.0
    fa = 2.0 + np.cos(2 * np.pi * x[0]) * np.cos(2 * np.pi * x[1]) \
        + 0.3 * np.cos(2 * np.pi * x[2])
    assert float(res.f[0]) == pytest.approx(fa, abs=5e-3)
    # jitted path agrees with direct path
    fn = fld.eval_fn(nder=2)
    y2 = np.asarray(fn(jnp.asarray(pts.T))[0])
    np.testing.assert_allclose(y2, np.asarray(res.f), atol=1e-12)
