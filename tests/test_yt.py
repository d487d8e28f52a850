"""YT basin integration: parity against an independent sequential sweep.

The device implementation (blocked level-synchronous propagation) must
reproduce the strictly-sequential reference algorithm bit-for-bit in
assignment and to near machine precision in weights.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.yt import yt_integrate, _grid_ws_neighbors


def _sequential_yt(rho, offs, wts, shape):
    """Reference sequential YT sweep (NumPy, mirrors src/yt@proc.f90:106-190)."""
    N = rho.size
    n1, n2, n3 = shape
    order = np.argsort(-rho, kind="stable")
    rank = np.argsort(order, kind="stable")
    nbrs = np.zeros((len(offs), N), dtype=np.int64)
    x1, r = np.divmod(np.arange(N), n2 * n3)
    x2, x3 = np.divmod(r, n3)
    for k, (d1, d2, d3) in enumerate(offs):
        nbrs[k] = ((x1 + d1) % n1) * (n2 * n3) + ((x2 + d2) % n2) * n3 + (x3 + d3) % n3

    W = {}          # flat idx -> dict basin -> weight (sparse rows)
    label = np.full(N, -1, dtype=int)
    nattr = 0
    attr_pos = []
    for i in order:
        hi = [k for k in range(len(offs)) if rank[nbrs[k, i]] < rank[i]]
        if not hi:
            label[i] = nattr
            W[i] = {nattr: 1.0}
            attr_pos.append(i)
            nattr += 1
            continue
        chi = {k: wts[k] * (rho[nbrs[k, i]] - rho[i]) for k in hi}
        chi = {k: v for k, v in chi.items() if v > 0}
        if not chi:
            k0 = min(hi, key=lambda k: rank[nbrs[k, i]])
            chi = {k0: 1.0}
        tot = sum(chi.values())
        row = {}
        for k, v in chi.items():
            for b, w in W[nbrs[k, i]].items():
                row[b] = row.get(b, 0.0) + (v / tot) * w
        W[i] = row
        label[i] = max(row, key=row.get)
    return label, W, nattr, attr_pos


def _problem(shape, seed=3):
    a = 8.0
    c = Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90, 90, 90]),
                x_frac=np.array([[0.25, 0.25, 0.25], [0.75, 0.7, 0.6]]),
                species_of=np.array([0, 0]), species=[Species("C", 6)])
    g = np.stack(np.meshgrid(*[np.arange(s) / s for s in shape], indexing="ij"),
                 axis=-1)
    rho = np.zeros(shape)
    for site, amp in zip(c.x_frac, (1.0, 0.8)):
        d = g - site
        d -= np.rint(d)
        dc = d @ np.asarray(c.m_x2c).T
        rho += amp * np.exp(-(dc ** 2).sum(-1))
    rng = np.random.default_rng(seed)
    rho += 1e-3 * rng.random(shape)     # break plateaus irregularly
    return c, rho


@pytest.mark.parametrize("shape", [(12, 12, 12), (16, 12, 10)])
def test_yt_matches_sequential(shape):
    c, rho = _problem(shape)
    res = yt_integrate(c, jnp.asarray(rho), block=256)

    offs, wts = _grid_ws_neighbors(c, shape)
    label_ref, W_ref, nattr_ref, attr_ref = _sequential_yt(
        rho.reshape(-1), offs, wts, shape)

    assert res.nattr == nattr_ref
    np.testing.assert_array_equal(np.sort(res.iattr), np.sort(attr_ref))
    np.testing.assert_array_equal(res.labels.reshape(-1), label_ref)

    # weights: basin sums of rho
    q = res.integrate(rho.reshape(-1))
    q_ref = np.zeros(nattr_ref)
    for i, row in W_ref.items():
        for b, w in row.items():
            q_ref[b] += w * rho.reshape(-1)[i]
    np.testing.assert_allclose(q, q_ref, rtol=1e-10, atol=1e-12)

    # partition of unity: basin volumes sum to the cell
    vols = res.integrate(np.ones(rho.size))
    assert abs(vols.sum() - rho.size) < 1e-8


def test_yt_two_attractors_integral():
    c, rho = _problem((20, 20, 20))
    res = yt_integrate(c, jnp.asarray(rho), block=1024)
    q = res.integrate(rho.reshape(-1))
    # total basin charge == total grid sum
    assert abs(q.sum() - rho.sum()) < 1e-8
    assert res.nattr >= 2
    # the two dominant basins sit at the two gaussian sites
    top2 = np.argsort(-q)[:2]
    for b in top2:
        d = res.xattr[b] - c.x_frac
        d -= np.rint(d)
        dc = np.linalg.norm(d @ np.asarray(c.m_x2c).T, axis=1)
        assert dc.min() < 1.0


def test_yt_charges_parity_native():
    # device YT basin charges vs the exact sequential fractional-weight
    # sweep (native C++): the BASELINE parity bar is 1e-6 e
    from critic2_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    import jax.numpy as jnp
    from critic2_tpu.analysis.yt import yt_integrate, _grid_ws_neighbors
    c, rho = _problem((12, 10, 8))
    res = yt_integrate(c, jnp.asarray(rho))
    q = np.sort(np.asarray(res.integrate(jnp.asarray(rho))))
    offs, wts = _grid_ws_neighbors(c, rho.shape)
    _, q_seq = native.yt_charges(rho, offs, wts, rho)
    assert len(q) == len(q_seq)
    assert np.max(np.abs(q - np.sort(q_seq))) < 1e-9


def test_bader_neargrid_matches_attractors(rng):
    """Exact neargrid walks find the same attractors as ongrid and give
    a charge-conserving assignment (reference NEARGRID default,
    src/bader@proc.f90:81,363-431)."""
    import numpy as np
    from critic2_tpu.analysis.bader import bader_integrate
    from critic2_tpu.crystal.crystal import Crystal, Species

    n = (18, 16, 14)
    i, j, k = np.meshgrid(*[np.arange(x) for x in n], indexing="ij")
    rho = (2.0 + np.cos(2 * np.pi * i / n[0]) * np.cos(2 * np.pi * j / n[1])
           + 0.5 * np.cos(2 * np.pi * k / n[2]) + 0.02 * rng.random(n))
    c = Crystal(m_x2c=np.diag([8.0, 7.0, 6.0]),
                x_frac=np.array([[0.0, 0.0, 0.0]]),
                species_of=np.array([0]), species=[Species("X", 10)])
    r1 = bader_integrate(c, rho, method="ongrid")
    r2 = bader_integrate(c, rho, method="neargrid")
    assert r2.nattr == r1.nattr
    assert set(map(tuple, r2.iattr.reshape(-1, 1))) == \
        set(map(tuple, r1.iattr.reshape(-1, 1)))
    assert abs(r2.integrate(rho).sum() - rho.sum()) < 1e-8
    # boundaries may differ but the assignments agree in the bulk
    assert (r1.labels == r2.labels).mean() > 0.9


# --------------------------------------------- f32 construction guard

def _gauss_cell(n, tilt=0.0, clip=None, amp=3.0, alpha=0.9):
    """Two-Gaussian test cell; optional sub-f32 tilt and plateau clip
    (the adversarial combination: the clip creates a constant-density
    shell whose f64 uphill ordering comes only from the tilt, which an
    f32 cast erases)."""
    a = 8.0
    c = Crystal(m_x2c=np.diag([a, a, a]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    ii, jj, kk = np.meshgrid(*[np.arange(n) / n] * 3, indexing="ij")
    xf = np.stack([ii, jj, kk], axis=-1)

    def gauss(center, amp, alpha):
        d = xf - center
        d -= np.round(d)
        return amp * np.exp(-alpha * ((d * a) ** 2).sum(-1))

    g1 = gauss(np.zeros(3), amp, alpha)
    g2 = gauss(np.full(3, 0.5), amp, alpha)
    rho = g1 + g2 + 1e-3
    if clip is not None:
        rho = np.maximum(rho, clip)
        # quantize to f32 then add a sub-f32-resolution tilt: in f64
        # the tilt orders the plateau, in f32 it vanishes
        rho = np.asarray(np.asarray(rho, np.float32), np.float64)
        if tilt:
            rho = rho + tilt * ii
    return c, rho


def test_yt_f32_guard_benign():
    """On a benign grid the guard stays quiet, its drift estimate
    tracks the true f32-vs-f64 charge drift, and the drift is inside
    the 1e-6 e parity bar."""
    from critic2_tpu.analysis.yt import yt_f32_guarded

    # (amp 2, alpha 0.5, n 32): measured drift estimate 1.7e-8 e,
    # ~14x under the trip threshold - most atomic-density-like grids
    # sit AT the 1e-6 bar (est 3e-7..2e-6 across n in a scan), which
    # is exactly why the guard exists
    c, rho = _gauss_cell(32, amp=2.0, alpha=0.5)
    vol = float(np.abs(np.linalg.det(np.asarray(c.m_x2c))))
    dv = vol / rho.size
    res, audit = yt_f32_guarded(c, rho)
    assert not audit["tripped"], audit
    q32 = np.sort(np.asarray(res.integrate(jnp.asarray(rho)))) * dv
    res64 = yt_integrate(c, jnp.asarray(rho))
    q64 = np.sort(np.asarray(res64.integrate(jnp.asarray(rho)))) * dv
    dq = float(np.abs(q32 - q64).max())
    # the estimate is exact to second order in the routing difference
    assert dq <= 4.0 * audit["drift_est_e"] + 1e-12, (dq, audit)
    assert dq < 1e-6


def test_yt_f32_guard_trips_adversarial():
    """A flat plateau ordered only by a sub-f32-resolution tilt: the
    f32 cast erases the ordering, rewiring the plateau's flux, and the
    guard must trip and return the f64-constructed result."""
    from critic2_tpu.analysis.yt import yt_f32_guarded

    # clip creates a macroscopic constant-density shell between the
    # two peaks; the 1e-9 tilt (~1e-2 of one f32 ulp at rho ~ 1)
    # decides its f64 uphill ordering
    c, rho = _gauss_cell(32, tilt=1e-9, clip=1.0)
    vol = float(np.abs(np.linalg.det(np.asarray(c.m_x2c))))
    dv = vol / rho.size
    res, audit = yt_f32_guarded(c, rho)
    assert audit["tripped"], audit
    assert audit["dtype"] == "f64"
    # the returned result IS the f64 construction
    res64 = yt_integrate(c, jnp.asarray(rho))
    assert res.nattr == res64.nattr
    q = np.sort(np.asarray(res.integrate(jnp.asarray(rho)))) * dv
    q64 = np.sort(np.asarray(res64.integrate(jnp.asarray(rho)))) * dv
    np.testing.assert_allclose(q, q64, rtol=0, atol=1e-12)
