"""Integration driver: YT/Bader on promolecular and analytic grids."""
import numpy as np
import jax.numpy as jnp

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.bader import bader_integrate
from critic2_tpu.analysis.integration import intgrid
from critic2_tpu.fields.field import Field
from critic2_tpu.fields.grid3 import Grid3


def _nacl_system(shape=(24, 24, 24)):
    c = Crystal(m_x2c=m_x2c_from_cellpar([10.66, 10.66, 10.66], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    s = System.from_structure(c)
    from critic2_tpu.analysis.integration import _rasterize_field
    g = _rasterize_field(s.fields[0], shape)
    s.load_field(Field.from_grid(c, Grid3(g), name="promolgrid"))
    return s


def test_intgrid_yt_promolecular_charges():
    s = _nacl_system()
    res = intgrid(s, method="yt")
    # both atoms present, no NNM for a promolecular density
    names = sorted(r.name for r in res.rows)
    assert names == ["Cl", "Na"]
    # total integrated density == grid sum * Omega/N; promolecular grids at
    # 24^3 resolution underestimate the cusp integral, but the partition
    # must be exact: sum of basin pops == total grid integral
    g = np.asarray(s.ref.grid.f)
    total = g.sum() * s.crystal.volume / g.size
    assert abs(res.charges.sum() - total) < 1e-8
    assert abs(res.volumes.sum() - s.crystal.volume) < 1e-6
    # Na (Z=11) holds less charge than Cl (Z=17)
    q = {r.name: r.pop for r in res.rows}
    assert q["Cl"] > q["Na"] > 0


def test_intgrid_yt_sharded_matches_single_device():
    """intgrid(mesh=...) runs the slab-parallel YT (parallel.yt_sharded)
    and must reproduce the single-device charges and volumes."""
    from critic2_tpu.parallel.mesh import make_mesh

    s = _nacl_system(shape=(16, 16, 16))
    ref = intgrid(s, method="yt")
    res = intgrid(s, method="yt", mesh=make_mesh(8))
    assert sorted(r.name for r in res.rows) == \
        sorted(r.name for r in ref.rows)
    q0 = {r.name: r.pop for r in ref.rows}
    v0 = {r.name: r.volume for r in ref.rows}
    for r in res.rows:
        assert abs(r.pop - q0[r.name]) < 1e-8
        assert abs(r.volume - v0[r.name]) < 1e-8


def test_intgrid_bader_agrees_roughly_with_yt():
    s = _nacl_system()
    r_yt = intgrid(s, method="yt")
    r_b = intgrid(s, method="bader")
    q_yt = {r.name: r.pop for r in r_yt.rows}
    q_b = {r.name: r.pop for r in r_b.rows}
    assert abs(r_b.charges.sum() - r_yt.charges.sum()) < 1e-8
    for k in q_yt:
        # ongrid vs YT differ on boundary handling; same basins to ~2%
        assert abs(q_yt[k] - q_b[k]) / q_yt[k] < 0.02


def test_bader_attractor_positions():
    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0, 8.0, 8.0], [90, 90, 90]),
                x_frac=np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
                species_of=np.array([0, 0]), species=[Species("C", 6)])
    shape = (20, 20, 20)
    g = np.stack(np.meshgrid(*[np.arange(n) / n for n in shape],
                             indexing="ij"), axis=-1)
    rho = np.zeros(shape)
    for site in c.x_frac:
        d = g - site
        d -= np.rint(d)
        dc = d @ np.asarray(c.m_x2c).T
        rho += np.exp(-(dc ** 2).sum(-1))
    res = bader_integrate(c, jnp.asarray(rho))
    assert res.nattr == 2
    vol = res.integrate(np.ones(rho.size))
    assert abs(vol.sum() - rho.size) < 1e-9
    # symmetric problem: near-equal volumes (exact midplane plateau points
    # tie-break by neighbor order, as in the reference ongrid walk)
    assert abs(vol[0] - vol[1]) / vol.sum() < 0.03


def test_integrable_expressions():
    s = _nacl_system(shape=(16, 16, 16))
    s.integrables.append("$1 * 2")
    res = intgrid(s, method="yt")
    for r in res.rows:
        assert abs(r.extra["$1 * 2"] - 2 * r.pop) < 1e-8
    assert "$1 * 2" in res.table()


def test_bader_plateau_single_attractor():
    # a zero-clamped vacuum plateau must not explode into per-point
    # attractors: two Gaussian blobs + exact-zero background
    c = Crystal(m_x2c=np.eye(3) * 12.0,
                x_frac=np.array([[0.25, 0.5, 0.5], [0.75, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("X", 1)])
    n = 16
    ii, jj, kk = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    x = np.stack([ii, jj, kk], -1) / n * 12.0
    rho = np.zeros((n, n, n))
    for ctr in ([3.0, 6.0, 6.0], [9.0, 6.0, 6.0]):
        d2 = ((x - np.asarray(ctr)) ** 2).sum(-1)
        rho += np.exp(-d2)
    rho[rho < 1e-4] = 0.0            # exact plateau
    res = bader_integrate(c, jnp.asarray(rho))
    # 2 blobs + a handful of plateau representatives at most
    assert res.nattr <= 8, res.nattr


def test_intgrid_attractor_options():
    """NNM/NOATOMS/RATOM/DISCARD semantics (reference intgrid_driver,
    src/integration@proc.f90:108-175 and yt DISCARD,
    src/yt@proc.f90:160-166)."""
    s = _nacl_system(shape=(16, 16, 16))
    # default (nnm=False equivalent): everything assigned to atoms
    res = intgrid(s, method="yt", nnm=False)
    assert all(r.atom >= 0 for r in res.rows)
    # noatoms: every attractor is a NNM row
    res_na = intgrid(s, method="yt", noatoms=True)
    assert all(r.atom < 0 for r in res_na.rows)
    assert abs(sum(r.pop for r in res_na.rows)
               - sum(r.pop for r in res.rows)) < 1e-8
    # discard with an always-false condition keeps everything
    res_d0 = intgrid(s, method="yt", discard="$1 < 0")
    assert len(res_d0.rows) == len(res.rows)
    # discard everything with rho above a threshold at the attractor
    # (all attractors are nuclei here -> all dropped)
    res_d = intgrid(s, method="yt", discard="$1 > 1e-6")
    assert len(res_d.rows) == 0
