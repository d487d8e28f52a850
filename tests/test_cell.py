import numpy as np
import pytest

from critic2_tpu.crystal import cell


def test_cellpar_roundtrip():
    aa = np.array([5.0, 6.0, 7.0])
    bb = np.array([80.0, 95.0, 105.0])
    m = cell.m_x2c_from_cellpar(aa, bb)
    aa2, bb2 = cell.cellpar_from_m_x2c(m)
    np.testing.assert_allclose(aa2, aa, atol=1e-12)
    np.testing.assert_allclose(bb2, bb, atol=1e-10)


def test_volume_triclinic():
    aa = np.array([3.0, 4.0, 5.0])
    bb = np.array([90.0, 90.0, 90.0])
    m = cell.m_x2c_from_cellpar(aa, bb)
    assert cell.cell_volume(m) == pytest.approx(60.0)


def test_reciprocal():
    m = cell.m_x2c_from_cellpar([4.0, 5.0, 6.0], [70.0, 80.0, 110.0])
    b = cell.reciprocal_vectors(m)
    np.testing.assert_allclose(b.T @ m, 2 * np.pi * np.eye(3), atol=1e-10)


def test_metric():
    m = cell.m_x2c_from_cellpar([4.0, 5.0, 6.0], [70.0, 80.0, 110.0])
    g = cell.metric_tensor(m)
    dx = np.array([0.1, -0.2, 0.3])
    d1 = np.linalg.norm(m @ dx)
    d2 = np.sqrt(dx @ g @ dx)
    assert d1 == pytest.approx(d2)


def test_list_near_atoms():
    """KDTree neighbor query (role of environ list_near_atoms,
    src/environmod@proc.f90:895): up2d and up2n modes, sorted output,
    correct lattice vectors."""
    from critic2_tpu.crystal.crystal import Crystal, Species

    a = 5.64
    c = Crystal(m_x2c=np.diag([a, a, a]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    # CsCl-like: nearest neighbors of the corner atom are 8 Cl at
    # sqrt(3)/2 a, then 6 Na at a
    eid, d, lv = c.list_near_atoms([0.0, 0.0, 0.0], up2d=1.01 * a)
    assert eid[0] == 0 and d[0] < 1e-12
    d_cl = np.sqrt(3.0) / 2.0 * a
    np.testing.assert_allclose(d[1:9], d_cl, rtol=1e-10)
    assert (eid[1:9] == 1).all()
    np.testing.assert_allclose(d[9:15], a, rtol=1e-10)
    # up2n mode returns exactly n nearest
    eid2, d2, lv2 = c.list_near_atoms([0.0, 0.0, 0.0], up2n=9)
    assert len(eid2) == 9 and (d2[:9] == d[:9]).all()
    # lattice vector consistency: position reconstruction matches dist
    x_img = (c.x_frac[eid] + lv) @ np.asarray(c.m_x2c).T
    np.testing.assert_allclose(np.linalg.norm(x_img, axis=1), d,
                               atol=1e-10)
