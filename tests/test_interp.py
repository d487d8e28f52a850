import numpy as np
import pytest

from critic2_tpu.ops.interp import interp_batch


def make_grid(n=(12, 10, 14)):
    """Smooth periodic test field with known value/derivatives."""
    i, j, k = np.meshgrid(*[np.arange(m) / m for m in n], indexing="ij")
    return np.cos(2 * np.pi * i) * np.sin(2 * np.pi * j) + 0.3 * np.cos(
        2 * np.pi * (k + i)
    )


def reference_lm_tricubic(f, x):
    """Independent Lekien-Marsden evaluation: build the 64x64 constraint
    system numerically (values + central-difference derivatives at the 8
    cell corners), solve for the coefficients, evaluate the polynomial.
    This reproduces the reference grinterp_tricubic
    (src/grid3mod@proc.f90:1978) without its precomputed matrix."""
    n = np.array(f.shape)
    x = np.mod(x, 1.0)
    xg = x * n
    i0 = np.floor(xg).astype(int)
    t = xg - i0

    # stencil values g[-1..2]^3
    g = np.empty((4, 4, 4))
    for a in range(-1, 3):
        for b in range(-1, 3):
            for c in range(-1, 3):
                g[a + 1, b + 1, c + 1] = f[
                    (i0[0] + a) % n[0], (i0[1] + b) % n[1], (i0[2] + c) % n[2]
                ]

    # constraint matrix: monomial basis x^i y^j z^k, i,j,k in 0..3
    def monorow(p, dx, dy, dz):
        row = np.zeros(64)
        for i in range(4):
            for j in range(4):
                for k in range(4):
                    def dpow(v, e, d):
                        if d == 0:
                            return v**e
                        if d == 1:
                            return e * v ** (e - 1) if e >= 1 else 0.0
                        return 0.0
                    row[i * 16 + j * 4 + k] = (
                        dpow(p[0], i, dx) * dpow(p[1], j, dy) * dpow(p[2], k, dz)
                    )
        return row

    A = np.zeros((64, 64))
    rhs = np.zeros(64)
    r = 0
    corners = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]

    def gv(a, b, c):
        return g[a + 1, b + 1, c + 1]

    for (da, db, dc) in [
        (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
    ]:
        for (a, b, c) in corners:
            A[r] = monorow((a, b, c), da, db, dc)
            # central-difference estimate of the (da,db,dc) derivative
            val = 0.0
            for sa, wa in ([(0, 1.0)] if da == 0 else [(-1, -0.5), (1, 0.5)]):
                for sb, wb in ([(0, 1.0)] if db == 0 else [(-1, -0.5), (1, 0.5)]):
                    for sc, wc in ([(0, 1.0)] if dc == 0 else [(-1, -0.5), (1, 0.5)]):
                        val += wa * wb * wc * gv(a + sa, b + sb, c + sc)
            rhs[r] = val
            r += 1
    coef = np.linalg.solve(A, rhs)
    val = 0.0
    for i in range(4):
        for j in range(4):
            for k in range(4):
                val += coef[i * 16 + j * 4 + k] * t[0] ** i * t[1] ** j * t[2] ** k
    return val


def test_tricubic_matches_lekien_marsden(rng):
    f = make_grid()
    pts = rng.uniform(-1.0, 2.0, size=(20, 3))
    y, _, _ = interp_batch(f, pts, mode="tricubic")
    for m in range(len(pts)):
        ref = reference_lm_tricubic(f, pts[m])
        assert float(y[m]) == pytest.approx(ref, abs=1e-12)


def test_tricubic_node_exact(rng):
    f = make_grid()
    n = f.shape
    idx = np.stack([rng.integers(0, n[i], 30) for i in range(3)], axis=1)
    pts = idx / np.array(n)
    y, _, _ = interp_batch(f, pts, mode="tricubic")
    np.testing.assert_allclose(np.asarray(y), f[idx[:, 0], idx[:, 1], idx[:, 2]],
                               atol=1e-13)


def test_tricubic_derivatives_fd(rng):
    f = make_grid((16, 16, 16))
    pts = rng.uniform(0, 1, size=(5, 3))
    h = 1e-6
    y, yp, ypp = interp_batch(f, pts, mode="tricubic")
    for ax in range(3):
        dp = pts.copy(); dp[:, ax] += h
        dm = pts.copy(); dm[:, ax] -= h
        ypl, _, _ = interp_batch(f, dp, mode="tricubic")
        ymi, _, _ = interp_batch(f, dm, mode="tricubic")
        fd = (np.asarray(ypl) - np.asarray(ymi)) / (2 * h)
        np.testing.assert_allclose(np.asarray(yp)[:, ax], fd, rtol=1e-5, atol=1e-5)
    # hessian diagonal vs fd of gradient
    for ax in range(3):
        dp = pts.copy(); dp[:, ax] += h
        dm = pts.copy(); dm[:, ax] -= h
        _, gpl, _ = interp_batch(f, dp, mode="tricubic")
        _, gmi, _ = interp_batch(f, dm, mode="tricubic")
        fd = (np.asarray(gpl) - np.asarray(gmi)) / (2 * h)
        np.testing.assert_allclose(np.asarray(ypp)[:, ax, :], fd, rtol=1e-4,
                                   atol=1e-4)


def test_tricubic_accuracy_smooth():
    # interpolation error on a band-limited field must be tiny
    f = make_grid((32, 32, 32))
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(50, 3))
    y, _, _ = interp_batch(f, pts, mode="tricubic")
    exact = (
        np.cos(2 * np.pi * pts[:, 0]) * np.sin(2 * np.pi * pts[:, 1])
        + 0.3 * np.cos(2 * np.pi * (pts[:, 2] + pts[:, 0]))
    )
    np.testing.assert_allclose(np.asarray(y), exact, atol=2e-4)


def test_trilinear(rng):
    f = make_grid()
    pts = rng.uniform(0, 1, size=(10, 3))
    y, yp, _ = interp_batch(f, pts, mode="trilinear", nder=1)
    # node-exactness
    n = f.shape
    nodes = np.array([[1 / n[0], 2 / n[1], 3 / n[2]]])
    y0, _, _ = interp_batch(f, nodes, mode="trilinear")
    assert float(y0[0]) == pytest.approx(f[1, 2, 3], abs=1e-13)
    # gradient by fd
    h = 1e-7
    for ax in range(3):
        dp = pts.copy(); dp[:, ax] += h
        dm = pts.copy(); dm[:, ax] -= h
        ypl, _, _ = interp_batch(f, dp, mode="trilinear", nder=0)
        ymi, _, _ = interp_batch(f, dm, mode="trilinear", nder=0)
        fd = (np.asarray(ypl) - np.asarray(ymi)) / (2 * h)
        np.testing.assert_allclose(np.asarray(yp)[:, ax], fd, rtol=1e-4, atol=1e-4)


def test_nearest():
    f = make_grid()
    pts = np.array([[0.001, 0.001, 0.001], [0.999, 0.999, 0.999]])
    y, _, _ = interp_batch(f, pts, mode="nearest")
    assert float(y[0]) == pytest.approx(f[0, 0, 0])
    assert float(y[1]) == pytest.approx(f[0, 0, 0])
