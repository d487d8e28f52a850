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
