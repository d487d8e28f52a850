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


def test_write_grid_file_formats(tmp_path):
    """CUBE FILE output dispatch (reference rhoplot_cube writers,
    src/rhoplot@proc.f90:356-645): cube/bincube/xsf/CHGCAR written and
    read back by this package's own readers."""
    import numpy as np
    from critic2_tpu.analysis.rhoplot import write_grid_file
    from critic2_tpu.fields.grid3 import Grid3
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.crystal.seed import read_structure

    c = Crystal(m_x2c=np.diag([8.0, 9.0, 10.0]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    rng = np.random.default_rng(3)
    data = rng.random((6, 5, 4)) + 0.5

    p = tmp_path / "t.bincube"
    write_grid_file(c, data, str(p))
    np.testing.assert_allclose(np.asarray(Grid3.from_file(str(p)).f),
                               data, atol=0)

    p = tmp_path / "CHGCAR"
    write_grid_file(c, data, str(p))
    g = Grid3.from_file(str(p))
    np.testing.assert_allclose(np.asarray(g.f), data, rtol=1e-9)
    cc = read_structure(str(p))
    assert cc.ncel == 2 and abs(cc.volume - 720.0) < 1e-6

    p = tmp_path / "t.xsf"
    write_grid_file(c, data, str(p))
    txt = p.read_text()
    assert "BEGIN_DATAGRID_3D" in txt and "7 6 5" in txt

    p = tmp_path / "t.cube"
    write_grid_file(c, data, str(p))
    np.testing.assert_allclose(np.asarray(Grid3.from_file(str(p)).f),
                               data, rtol=1e-5)   # text precision
