"""C++ native kernels: hull, WS cell, sequential YT sweep."""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        if not native.build():
            pytest.skip("no C++ toolchain")


def test_hull_cube():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                    [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
                    [0.5, 0.5, 0.5]], dtype=float)
    tris = native.hull(pts)
    assert len(tris) == 12
    assert 8 not in set(tris.ravel())      # interior point not on hull


def test_ws_cubic_and_fcc():
    ineigh, areas, verts = native.ws_cell(np.eye(3) * 4.0)
    assert len(areas) == 6
    np.testing.assert_allclose(areas, 16.0, rtol=1e-10)
    assert len(verts) == 8
    m = np.array([[0, 2, 2], [2, 0, 2], [2, 2, 0]], dtype=float)
    _, areas, verts = native.ws_cell(m)
    assert len(areas) == 12                # rhombic dodecahedron
    assert len(verts) == 14


def test_ws_matches_python():
    from critic2_tpu.crystal.wscell import wigner_seitz
    from critic2_tpu.crystal.cell import m_x2c_from_cellpar

    m = m_x2c_from_cellpar([5.0, 6.0, 7.0], [80.0, 95.0, 100.0])
    ineigh, areas, verts = native.ws_cell(m)
    ws = wigner_seitz(m)
    assert len(areas) == ws.nf
    # same facet set: match by lattice vector
    ref = {tuple(v): a for v, a in zip(np.asarray(ws.ineighx, int),
                                       ws.areas)}
    for v, a in zip(ineigh, areas):
        assert tuple(v) in ref
        np.testing.assert_allclose(a, ref[tuple(v)], rtol=1e-8)


def test_yt_native_matches_device(rng):
    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.analysis.yt import yt_integrate, _grid_ws_neighbors

    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0] * 3, [90] * 3),
                x_frac=np.array([[0.25, 0.25, 0.25], [0.7, 0.67, 0.73]]),
                species_of=np.array([0, 0]), species=[Species("C", 6)])
    shape = (12, 12, 12)
    g = np.stack(np.meshgrid(*[np.arange(s) / s for s in shape],
                             indexing="ij"), axis=-1)
    rho = np.zeros(shape)
    for site, amp in zip(c.x_frac, (1.0, 0.8)):
        d = g - site
        d -= np.rint(d)
        rho += amp * np.exp(-((d @ np.asarray(c.m_x2c).T) ** 2).sum(-1))
    rho += 1e-3 * rng.random(shape)
    offs, wts = _grid_ws_neighbors(c, shape)
    lab, nattr = native.yt_labels(rho, offs, wts)
    res = yt_integrate(c, jnp.asarray(rho), block=256)
    assert nattr == res.nattr
    np.testing.assert_array_equal(lab, res.labels)


def test_nci_sweep_matches_device(rng):
    """The native full-NCI-driver stand-in (interp + eig + RDG +
    cutoffs, the honest CPU denominator) agrees with the device fused
    fast path on the dat-selection count."""
    import jax.numpy as jnp

    from critic2_tpu.analysis.nci import _fast_fn

    n = 24
    g = np.abs(rng.random((n, n, n))) + 0.01
    m_c2x = np.eye(3) / 8.0
    ndat_native = native.nci_sweep(g, m_c2x, 0.2, 2.0)
    fused = _fast_fn((n, n, n), m_c2x.tobytes(), False, False, False)
    _, _, _, sel = fused(jnp.asarray(g), 0.2, 2.0, 0.1, -1e30, 1e30)
    assert ndat_native == int(sel.sum())
