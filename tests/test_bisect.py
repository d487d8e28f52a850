"""IAS bisection, basin plotting, bisection-based integration."""
import numpy as np
import pytest

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.bisect import (basin_integral, basinplot,
                                         bisect_basin, basin_rays,
                                         sphere_integral)


@pytest.fixture(scope="module")
def cscl():
    c = Crystal(m_x2c=m_x2c_from_cellpar([7.0, 7.0, 7.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Cs", 55), Species("Cl", 17)])
    return System.from_structure(c)


def test_sphere_integral_promol(cscl):
    # small sphere around Cs: integral of rho over the surface ~ 4pi r^2
    # times rho(r) (spherical near the nucleus)
    r = 0.8
    v = sphere_integral(cscl, [0.0, 0.0, 0.0], r)
    rho_r = float(np.asarray(cscl.ref.grd(
        cscl.crystal.x2c(np.array([[r / 7.0, 0, 0]])), nder=0).f)[0])
    assert abs(v - 4 * np.pi * r * r * rho_r) / v < 0.02


def test_bisect_and_plot(cscl, tmp_path):
    # tol 1e-3 keeps the gradient-trace batches small; the radius
    # assertion is at the 0.2*d111 scale, 3 orders above the tolerance
    dirs, faces = basin_rays(level=2)
    r = bisect_basin(cscl, [0.0, 0.0, 0.0], dirs, tol=1e-2, maxit=12)
    # basin radius along (111) is around half the Cs-Cl distance
    d111 = 7.0 * np.sqrt(3) / 2
    along = dirs @ (np.ones(3) / np.sqrt(3))
    r111 = r[np.argmax(along)]
    assert 0.35 * d111 < r111 < 0.75 * d111
    verts, faces, r = basinplot(cscl, [0.0, 0.0, 0.0], level=1,
                                file=str(tmp_path / "basin.obj"),
                                tol=1e-2, maxit=12)
    assert (tmp_path / "basin.obj").exists()
    assert len(faces) > 10


@pytest.mark.slow
def test_basin_integral_vs_yt():
    # bisection-based basin charge vs YT, on a SMOOTH two-gaussian field
    # the grid fully resolves (grid methods cannot resolve heavy-atom
    # cusps; the reference adds core augmentation for that case)
    import jax.numpy as jnp
    from critic2_tpu.analysis.integration import intgrid
    from critic2_tpu.fields.field import Field
    from critic2_tpu.fields.grid3 import Grid3

    c = Crystal(m_x2c=m_x2c_from_cellpar([9.0, 9.0, 9.0], [90, 90, 90]),
                x_frac=np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
                species_of=np.array([0, 0]), species=[Species("He", 2)])
    shape = (32, 32, 32)
    g = np.stack(np.meshgrid(*[np.arange(n) / n for n in shape],
                             indexing="ij"), axis=-1)
    rho = np.zeros(shape)
    for site, amp in zip(c.x_frac, (1.0, 0.6)):
        d = g - site
        d -= np.rint(d)
        dcart = d @ np.asarray(c.m_x2c).T
        rho += amp * np.exp(-1.5 * (dcart ** 2).sum(-1))
    s = System.from_structure(c)
    s.load_field(Field.from_grid(c, Grid3(jnp.asarray(rho))))

    res = intgrid(s, method="yt")
    row = max(res.rows, key=lambda r: r.pop)
    q_yt = row.pop
    q_bis = basin_integral(s, row.xfrac, level=2, nr=40)
    assert abs(q_bis - q_yt) / q_yt < 0.03
