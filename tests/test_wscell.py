import numpy as np
import pytest

from critic2_tpu.crystal import cell
from critic2_tpu.crystal.wscell import delaunay_reduce, wigner_seitz


def ws_volume(ws):
    """Volume of the WS polyhedron from its facet fan."""
    vol = 0.0
    for face in ws.faces:
        v = ws.vertices[face]
        for i in range(1, len(v) - 1):
            vol += abs(np.linalg.det(np.stack([v[0], v[i], v[i + 1]]))) / 6.0
    return vol


def test_delaunay_nonpositive_products():
    m = cell.m_x2c_from_cellpar([4.0, 5.5, 6.2], [75.0, 85.0, 100.0])
    rfrac = delaunay_reduce(m)
    r = m @ rfrac
    sc = r.T @ r
    np.fill_diagonal(sc, -1.0)
    assert np.all(sc <= 1e-8)


def test_ws_cubic():
    m = np.eye(3) * 4.0
    ws = wigner_seitz(m)
    # cube: 6 facets, each a square of area 16
    assert ws.nf == 6
    np.testing.assert_allclose(sorted(ws.areas), [16.0] * 6, atol=1e-8)
    assert ws.isortho
    assert ws_volume(ws) == pytest.approx(64.0)
    # neighbors are the six unit lattice vectors
    s = set(tuple(v) for v in ws.ineighx)
    assert s == {(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)}


def test_ws_fcc():
    # fcc primitive cell: WS cell is the rhombic dodecahedron (12 facets)
    a = 4.0
    m = np.array([[0, a / 2, a / 2], [a / 2, 0, a / 2], [a / 2, a / 2, 0]]).T
    ws = wigner_seitz(m)
    assert ws.nf == 12
    assert ws_volume(ws) == pytest.approx(abs(np.linalg.det(m)))


def test_ws_bcc():
    # bcc primitive cell: truncated octahedron (8 hexagons + 6 squares)
    a = 3.0
    m = np.array([[-a / 2, a / 2, a / 2], [a / 2, -a / 2, a / 2],
                  [a / 2, a / 2, -a / 2]]).T
    ws = wigner_seitz(m)
    assert ws.nf == 14
    assert ws_volume(ws) == pytest.approx(abs(np.linalg.det(m)))


def test_ws_triclinic_volume():
    m = cell.m_x2c_from_cellpar([4.0, 5.5, 6.2], [75.0, 85.0, 100.0])
    ws = wigner_seitz(m)
    assert ws_volume(ws) == pytest.approx(abs(np.linalg.det(m)), rel=1e-8)
    # areas positive, neighbors come in +/- pairs
    assert np.all(ws.areas > 0)
    s = set(tuple(v) for v in ws.ineighx)
    assert all(tuple(-np.array(v)) in s for v in s)
