import numpy as np
import pytest

from critic2_tpu.fields.grid1 import RadialTableSet, build_grid1
from critic2_tpu.fields.promol import PromolEnv, promol_tables, _radial_interp


def test_grid1_hydrogen_charge():
    g = build_grid1(1, 0)
    # log-grid quadrature: integral rho 4 pi r^2 dr = sum f * 4 pi r^3 * b
    q = np.sum(g.f * g.r**3 * g.b * 4 * np.pi)
    assert q == pytest.approx(1.0, abs=2e-3)


def test_grid1_iron_charge():
    g = build_grid1(26, 0)
    q = np.sum(g.f * g.r**3 * g.b * 4 * np.pi)
    assert q == pytest.approx(26.0, rel=1e-3)


def test_grid1_core_truncation():
    gc = build_grid1(26, 16)  # 10 core electrons
    q = np.sum(gc.f * gc.r**3 * gc.b * 4 * np.pi)
    assert q == pytest.approx(10.0, rel=1e-3)
    assert gc.rmax < build_grid1(26, 0).rmax


def test_radial_interp_matches_nodes():
    import jax.numpy as jnp

    ts = RadialTableSet.build([(1, 0), (8, 0)])
    tab = promol_tables(ts)
    g = build_grid1(8, 0)
    idx = np.arange(5, g.ngrid - 5, 97)
    s = jnp.full(len(idx), 1, dtype=jnp.int32)
    f, fp, fpp = _radial_interp(tab, s, jnp.asarray(g.r[idx]))
    np.testing.assert_allclose(np.asarray(f), g.f[idx], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fp), g.fp[idx], rtol=1e-10)


def test_radial_interp_smooth_between_nodes():
    import jax.numpy as jnp

    ts = RadialTableSet.build([(6, 0)])
    tab = promol_tables(ts)
    g = build_grid1(6, 0)
    r = np.geomspace(g.r[4] * 1.01, g.rmax * 0.9, 200)
    s = jnp.zeros(len(r), dtype=jnp.int32)
    f, fp, _ = _radial_interp(tab, s, jnp.asarray(r))
    f = np.asarray(f)
    assert np.all(f > 0)
    # derivative consistency by FD of the interpolant
    h = 1e-7
    fp_num = (
        np.asarray(_radial_interp(tab, s, jnp.asarray(r + h))[0])
        - np.asarray(_radial_interp(tab, s, jnp.asarray(r - h))[0])
    ) / (2 * h)
    fpn = np.asarray(fp)
    mask = np.abs(fpn) > 1e-12
    np.testing.assert_allclose(fp_num[mask], fpn[mask], rtol=2e-3)


def water_crystal():
    from critic2_tpu.crystal.crystal import Crystal, Species

    # water molecule in a periodic box (as a crystal: tests periodicity)
    m = np.eye(3) * 12.0
    cart = np.array(
        [[0.0, 0.0, 0.22], [0.0, 1.43, -0.89], [0.0, -1.43, -0.89]]
    ) + 6.0
    return Crystal(
        m_x2c=m,
        x_frac=cart / 12.0,
        species_of=np.array([0, 1, 1]),
        species=[Species("O", 8), Species("H", 1)],
    )


def test_promolecular_direct_sum():
    c = water_crystal()
    env = PromolEnv(c)
    pts = np.array([[6.0, 0.7, 6.3], [5.0, 6.0, 6.0], [0.1, 0.1, 0.1]])
    f, fp, fpp = env.eval(pts)
    f = np.asarray(f)

    # independent host-side sum over images within cutoff
    from critic2_tpu import param

    def direct(p):
        tot = 0.0
        for ia in range(3):
            z = c.species[c.species_of[ia]].z
            g = build_grid1(z, 0)
            cut = min(param.cutrad(z), g.rmax)
            for i in (-1, 0, 1):
                for j in (-1, 0, 1):
                    for k in (-1, 0, 1):
                        at = (c.x_frac[ia] + [i, j, k]) @ c.m_x2c.T
                        r = np.linalg.norm(p - at)
                        if r > cut:
                            continue
                        rr = max(r, g.r[0], 1e-14)
                        # numpy 4-node lagrange
                        ir = 1 + int(np.floor(np.log(rr / g.a) / g.b)) \
                            if rr > g.r[0] else 1
                        base = min(max(ir, 2), g.ngrid - 2) - 2
                        nodes = np.arange(base, base + 4)
                        w = np.ones(4)
                        rv = rr if rr > g.r[0] else g.r[0]
                        for a in range(4):
                            for bb in range(4):
                                if a == bb:
                                    continue
                                w[a] *= (rv - g.r[nodes[bb]]) / (
                                    g.r[nodes[a]] - g.r[nodes[bb]]
                                )
                        tot += max(float(g.f[nodes] @ w), 0.0)
        return tot

    for m in range(len(pts)):
        assert f[m] == pytest.approx(direct(pts[m]), rel=1e-10)


def test_promolecular_derivatives_fd():
    c = water_crystal()
    env = PromolEnv(c)
    pts = np.array([[6.5, 6.9, 6.1], [4.0, 5.0, 7.0]])
    f, fp, fpp = env.eval(pts)
    h = 1e-5
    for ax in range(3):
        dp = pts.copy(); dp[:, ax] += h
        dm = pts.copy(); dm[:, ax] -= h
        fdp = np.asarray(env.eval(dp, nder=0)[0])
        fdm = np.asarray(env.eval(dm, nder=0)[0])
        np.testing.assert_allclose(
            np.asarray(fp)[:, ax], (fdp - fdm) / (2 * h), rtol=1e-5, atol=1e-10
        )
        gdp = np.asarray(env.eval(dp, nder=1)[1])
        gdm = np.asarray(env.eval(dm, nder=1)[1])
        np.testing.assert_allclose(
            np.asarray(fpp)[:, ax, :], (gdp - gdm) / (2 * h), rtol=1e-4, atol=1e-8
        )


def test_promolecular_periodicity():
    c = water_crystal()
    env = PromolEnv(c)
    p = np.array([[1.0, 2.0, 3.0]])
    shifts = np.array([[12.0, 0, 0], [0, -12.0, 0], [12.0, 12.0, -12.0]])
    f0 = float(env.eval(p, nder=0)[0][0])
    for s in shifts:
        # evaluation is at wrapped fractional coords in the Field layer;
        # here feed pre-wrapped equivalents
        fs = float(env.eval(p + s - 12.0 * np.round((p + s) / 12.0 - 0.4), nder=0)[0][0])
    # field-level check with wrapping
    from critic2_tpu.fields.field import Field

    fld = Field.promolecular(c)
    v0 = np.asarray(fld.grd(p, nder=0).f)
    v1 = np.asarray(fld.grd(p + shifts[2], nder=0).f)
    np.testing.assert_allclose(v0, v1, rtol=1e-12)


def test_field_nucleus_clamp():
    from critic2_tpu.fields.field import Field

    c = water_crystal()
    fld = Field.promolecular(c)
    at = c.x_cart[0][None, :]
    res = fld.grd(at, nder=2)
    assert bool(np.asarray(res.isnuc)[0])
    np.testing.assert_allclose(np.asarray(res.gf)[0], 0.0)
    assert float(np.asarray(res.f)[0]) > 100.0  # oxygen nuclear density is large
