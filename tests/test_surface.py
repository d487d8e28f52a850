"""Minisurf sphere triangulations, node surfaces, IAS file round-trip
(reference surface module, src/surface.f90:44-55)."""
import numpy as np

from critic2_tpu.analysis.surface import (MiniSurf, gauleg_nodes,
                                          lebedev_nodes, sphere_cub,
                                          sphere_oct)


def test_sphere_oct_counts():
    v, f = sphere_oct(0)
    assert len(v) == 6 and len(f) == 8
    v, f = sphere_oct(2)
    assert len(f) == 8 * 16
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0)
    # closed surface: Euler characteristic V - E + F = 2
    edges = {tuple(sorted(e)) for tri in f
             for e in ((tri[0], tri[1]), (tri[1], tri[2]),
                       (tri[2], tri[0]))}
    assert len(v) - len(edges) + len(f) == 2


def test_sphere_cub_counts():
    v, f = sphere_cub(0)
    assert len(v) == 8 and len(f) == 12
    v, f = sphere_cub(2)
    assert len(f) == 6 * 16 * 2
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0)
    edges = {tuple(sorted(e)) for tri in f
             for e in ((tri[0], tri[1]), (tri[1], tri[2]),
                       (tri[2], tri[0]))}
    assert len(v) - len(edges) + len(f) == 2


def test_node_surfaces_integrate():
    # surface integral of z^2 over unit sphere = 4pi/3
    for d, w in (gauleg_nodes(16, 32), lebedev_nodes(194)):
        val = (w * d[:, 2] ** 2).sum()
        assert abs(val - 4 * np.pi / 3) < 1e-10


def test_writeint_roundtrip(tmp_path):
    s = MiniSurf.triang([0.1, 0.2, 0.3], level=1, scheme="cub")
    s.r = np.linspace(1.0, 2.0, s.nv)
    p = tmp_path / "ias.int"
    s.writeint(p, n1=3, n2=7, meth=2)
    s2 = MiniSurf.triang([0, 0, 0], level=1, scheme="cub")
    n1, n2, meth = s2.readint(p)
    assert (n1, n2, meth) == (3, 7, 2)
    np.testing.assert_allclose(s2.n, s.n)
    np.testing.assert_allclose(s2.r, s.r, rtol=1e-14)
