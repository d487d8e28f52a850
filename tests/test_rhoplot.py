"""POINT/LINE/PLANE/CUBE drivers."""
import numpy as np
import pytest

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis import rhoplot


@pytest.fixture(scope="module")
def s():
    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0, 8.0, 8.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 0]),
                species=[Species("C", 6)])
    return System.from_structure(c)


def test_point(s):
    rep = rhoplot.point(s, [0.25, 0.25, 0.25])
    assert rep.f > 0
    assert rep.eig[0] <= rep.eig[1] + 1e-12 <= rep.eig[2] + 2e-12
    assert "POINT" in str(rep)


def test_line_midpoint_symmetry(s):
    t, dist, vals = rhoplot.line(s, [0, 0, 0], [0.5, 0.5, 0.5], npts=41)
    # line between two identical atoms: symmetric profile
    np.testing.assert_allclose(vals, vals[::-1], rtol=1e-8)
    assert vals[0] > vals[20]  # density falls toward the midpoint


def test_line_expression(s):
    _, _, vals = rhoplot.line(s, [0, 0, 0], [0.5, 0.0, 0.0], npts=11,
                              what="2*$0")
    _, _, base = rhoplot.line(s, [0, 0, 0], [0.5, 0.0, 0.0], npts=11)
    np.testing.assert_allclose(vals, 2 * base, rtol=1e-12)


def test_plane_and_gnuplot(s, tmp_path):
    f = tmp_path / "plane.dat"
    u, v, vals = rhoplot.plane(s, [0, 0, 0], [1, 0, 0], [0, 1, 0],
                               nx=11, ny=11, file=str(f))
    assert vals.shape == (11, 11)
    assert f.exists()
    # periodic plane: corners equal
    np.testing.assert_allclose(vals[0, 0], vals[-1, -1], rtol=1e-8)


def test_cube_writer_roundtrip(s, tmp_path):
    f = tmp_path / "rho.cube"
    data = rhoplot.cube(s, n=(12, 12, 12), what="f", file=str(f))
    from critic2_tpu.fields.grid3 import Grid3
    g = Grid3.read_cube(str(f))
    np.testing.assert_allclose(np.asarray(g.f), data, rtol=2e-4, atol=1e-12)


def test_cube_lap_matches_grd(s):
    data = rhoplot.cube(s, n=(8, 8, 8), what="lap")
    x = np.array([[3 / 8, 5 / 8, 7 / 8]])
    direct = float(np.asarray(s.ref.grd(x @ np.asarray(
        s.crystal.m_x2c).T).del2f)[0])
    assert abs(data[3, 5, 7] - direct) < 1e-10


@pytest.mark.slow
def test_grdvec(s, tmp_path):
    from critic2_tpu.analysis.rhoplot import grdvec
    from critic2_tpu.analysis.autocp import autocp

    cpl = autocp(s)
    f = tmp_path / "grdvec.dat"
    vals, paths = grdvec(s, [0, 0, 0], [1, 0, 0], [0, 1, 0],
                         cpl=cpl, nx=21, ny=21, file=str(f), nrec=80)
    assert vals.shape == (21, 21)
    assert len(paths) >= 2
    assert f.exists() and f.stat().st_size > 1000
