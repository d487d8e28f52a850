"""Wavefunction fields: readers, GTO evaluation, mesh integration, ELF.

Data files come from the read-only reference checkout (test inputs, not
code); tests skip if unavailable.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from critic2_tpu import System
from critic2_tpu.analysis.mesh import becke_mesh
from critic2_tpu.analysis.molcalc import molcalc_nelec
from critic2_tpu.fields.wfn import Wavefunction

H2O_WFX = "/root/reference/tests_libxc/h2o.wfx"
BENZENE = "/root/reference/tests_cint/benzene-631gs.fchk"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(H2O_WFX) and os.path.exists(BENZENE)),
    reason="reference wavefunction data not available")


@pytest.fixture(scope="module")
def h2o():
    return System.from_structure(H2O_WFX)


def test_wfx_reader():
    w = Wavefunction.read_wfx(H2O_WFX)
    assert w.nelec == 10.0
    assert len(w.atz) == 3
    assert w.npri == 65


def test_fchk_reader():
    w = Wavefunction.read_fchk(BENZENE)
    assert w.nelec == 42.0
    assert w.nmo == 21
    assert w.npri == 192          # 6-31G* benzene primitive expansion


def test_rho_integrates_to_nelec_h2o(h2o):
    h2o.load_field(H2O_WFX)
    n = molcalc_nelec(h2o)
    assert abs(n - 10.0) < 1e-4


def test_rho_integrates_to_nelec_benzene():
    s = System.from_structure(BENZENE)
    s.load_field(BENZENE)
    n = molcalc_nelec(s)
    assert abs(n - 42.0) < 5e-3


def test_gradient_hessian_consistency(h2o):
    h2o.load_field(H2O_WFX)
    f = h2o.ref
    rng = np.random.default_rng(0)
    pts = np.asarray(f.crystal.x_cart)[0] + rng.normal(0, 1.0, (8, 3))
    res = f.grd(pts, periodic=False)
    h = 1e-5
    for d in range(3):
        pp = pts.copy(); pp[:, d] += h
        pm = pts.copy(); pm[:, d] -= h
        fd = (np.asarray(f.grd(pp, nder=0, periodic=False).f)
              - np.asarray(f.grd(pm, nder=0, periodic=False).f)) / (2 * h)
        np.testing.assert_allclose(np.asarray(res.gf)[:, d], fd,
                                   rtol=5e-5, atol=1e-8)
        fd2 = (np.asarray(f.grd(pp, nder=1, periodic=False).gf)
               - np.asarray(f.grd(pm, nder=1, periodic=False).gf)) / (2 * h)
        np.testing.assert_allclose(np.asarray(res.hf)[:, :, d], fd2,
                                   rtol=5e-4, atol=1e-6)


def test_elf_range(h2o):
    h2o.load_field(H2O_WFX)
    from critic2_tpu.arithmetic import eval_expr

    rng = np.random.default_rng(1)
    pts = np.asarray(h2o.crystal.x_cart).mean(0) + rng.normal(0, 1.5, (64, 3))
    elf = np.asarray(eval_expr(f"elf({h2o.iref})", h2o, pts))
    assert (elf >= 0).all() and (elf <= 1).all()
    # covalent bond region has high ELF somewhere
    assert elf.max() > 0.7


def test_gkin_positive_and_virial_negative(h2o):
    h2o.load_field(H2O_WFX)
    w = h2o.ref.wfn
    m = becke_mesh(h2o.crystal, "small")
    ex = w.extras_soa(jnp.asarray(m.x.T))
    gk = np.asarray(ex["gkin"])
    assert (gk >= -1e-10).all()
    # integral of gkin = kinetic energy ~ 76 Ha for water (virial: E ~ -T)
    T = float(gk @ m.w)
    assert 74.0 < T < 78.0


def test_franchini_periodic_mesh():
    # periodic NaCl cell: the promolecular density integrates to sum(Z)
    import jax.numpy as jnp
    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.analysis.mesh import franchini_mesh
    from critic2_tpu.fields.promol import promolecular_soa

    c = Crystal(m_x2c=m_x2c_from_cellpar([10.66] * 3, [90] * 3),
                x_frac=np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    s = System.from_structure(c)
    m = franchini_mesh(c, "normal")
    env = s.fields[0].promol
    out = np.empty(m.n)
    for lo in range(0, m.n, 1 << 14):
        xT = jnp.asarray(m.x[lo:lo + (1 << 14)].T)
        out[lo:lo + xT.shape[1]] = np.asarray(promolecular_soa(
            xT, env.atpos, env.atspc, env.tab, nder=0)[0])
    assert abs(m.integrate(out) - 28.0) < 2e-3


def test_peach_identity_transition(h2o):
    """Lambda for a i->i 'transition' is the self-overlap integral
    int |phi_i|^2 = 1 for a normalized occupied MO (reference
    molcalc_peach, src/molcalc@proc.F90:105)."""
    from critic2_tpu.analysis.molcalc import molcalc_peach

    h2o.load_field(H2O_WFX)
    lam = molcalc_peach(h2o, [(1, 1, 1.0)])
    assert abs(lam - 1.0) < 5e-4
    # disjoint orbitals overlap less than identical ones
    lam2 = molcalc_peach(h2o, [(1, 5, 0.7)])
    assert 0.0 < lam2 < 1.0


def test_wfx_edf_core_density():
    """Synthetic EDF block: the core density c exp(-a r^2) adds to rho
    with exact analytic derivatives (reference calculate_edf,
    src/wfn_private@proc.F90)."""
    import jax.numpy as jnp

    from critic2_tpu.fields.wfn import Wavefunction

    w = Wavefunction(atpos=np.zeros((1, 3)), atz=np.array([26]),
                     icenter=np.array([0]), itype=np.array([1]),
                     e=np.array([1.0]), cmo=np.zeros((1, 1)),
                     occ=np.array([0.0]),
                     edf_icenter=np.array([0]), edf_itype=np.array([1]),
                     edf_e=np.array([2.5]), edf_c=np.array([3.0]))
    pts = np.array([[0.3, 0.2, 0.1], [1.0, 0.0, 0.0]])
    rho, g, h6 = w.rho_eval_soa(jnp.asarray(pts).T, nder=2)
    r2 = (pts ** 2).sum(1)
    ref = 3.0 * np.exp(-2.5 * r2)
    np.testing.assert_allclose(np.asarray(rho), ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), (-2 * 2.5 * pts.T) * ref,
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(h6)[0], (4 * 2.5 ** 2 * pts[:, 0] ** 2 - 2 * 2.5) * ref,
        rtol=1e-12)


@pytest.mark.slow
def test_uhf_hf_energy_consistency():
    """A UHF wavefunction with identical alpha/beta orbitals must give
    the RHF energy (same density, same exchange)."""
    from critic2_tpu.ops.mdint import rhf_energy

    w = Wavefunction.read_wfx(H2O_WFX)
    res_rhf = rhf_energy(w)
    # split each doubly-occupied MO into alpha+beta singly-occupied
    w2 = Wavefunction(atpos=w.atpos, atz=w.atz, icenter=w.icenter,
                      itype=w.itype, e=w.e,
                      cmo=np.vstack([w.cmo, w.cmo]),
                      occ=np.concatenate([w.occ / 2, w.occ / 2]),
                      wfntyp="uhf", nalpha=w.nmo)
    res_uhf = rhf_energy(w2)
    assert abs(res_uhf["E_total"] - res_rhf["E_total"]) < 1e-8


def test_spin_channel_modifiers(h2o):
    """$f:up/:dn/:sp spin channels (reference fieldeval up/dn/sp and
    rho2 spin outputs): RHF channels are rho/2; a synthetic UHF split
    reproduces asymmetric channels."""
    h2o.load_field(H2O_WFX)
    pts = np.asarray(h2o.crystal.x2c(np.array([[0.52, 0.5, 0.55]])))
    up = float(h2o.eval_expr("$1:up", pts)[0])
    dn = float(h2o.eval_expr("$1:dn", pts)[0])
    tot = float(h2o.eval_expr("$1", pts)[0])
    assert abs(up + dn - tot) < 1e-10 * max(tot, 1.0)
    assert abs(float(h2o.eval_expr("$1:sp", pts)[0])) < 1e-12

    # UHF with an unpaired alpha orbital: sp > 0 somewhere
    from critic2_tpu.fields.wfn import Wavefunction

    w = Wavefunction.read_wfx(H2O_WFX)
    w2 = Wavefunction(atpos=w.atpos, atz=w.atz, icenter=w.icenter,
                      itype=w.itype, e=w.e,
                      cmo=np.vstack([w.cmo, w.cmo[:-1]]),
                      occ=np.concatenate([w.occ / 2,
                                          (w.occ / 2)[:-1]]),
                      wfntyp="uhf", nalpha=w.nmo)
    r_up, r_dn = (np.asarray(v) for v in
                  w2.rho_spin_soa(np.asarray(pts).T))
    assert (r_up >= r_dn - 1e-14).all() and r_up.sum() > r_dn.sum()


@pytest.mark.slow
def test_nelec_converges_under_basin_bar():
    """Mesh NELEC at the 'ultra' quality level must sit under the 1e-6
    basin-charge parity bar (VERDICT round-1: converged-mesh
    demonstration; reference apparatus src/meshmod@proc.f90 z2nr/z2nang
    + molcalc)."""
    s = System.from_structure(BENZENE)
    s.load_field(BENZENE)
    n = molcalc_nelec(s, lvl="ultra")
    assert abs(n - 42.0) < 1e-6


def test_mixed_precision_rho_eval(h2o):
    """The dtype=f32 eval path (f64 displacements, f32 primitive stage
    + HIGHEST-precision MXU matmuls, f64 occ-contraction) tracks the
    f64 path to f32-accumulation accuracy (~1e-5 relative) - the CUBE/
    grid fast path on the v5e, where f64 vector ops are emulated."""
    h2o.load_field(H2O_WFX)
    w = h2o.ref.wfn
    rng = np.random.default_rng(2)
    pts = np.asarray(h2o.crystal.x_cart).mean(0) + rng.normal(0, 1.5, (256, 3))
    xT = jnp.asarray(pts.T)
    r64, g64, h64 = (np.asarray(v) for v in w.rho_eval_soa(xT, nder=2))
    r32, g32, h32 = (np.asarray(v) for v in
                     w.rho_eval_soa(xT, nder=2, dtype=jnp.float32))
    scale = np.abs(r64).max()
    assert np.abs(r32 - r64).max() < 3e-5 * scale
    assert np.abs(g32 - g64).max() < 3e-4 * np.abs(g64).max()
    assert np.abs(h32 - h64).max() < 3e-4 * np.abs(h64).max()


def test_f32_becke_weights_quadrature(h2o):
    """f32 Becke partition weights (the fast mesh-build path) leave the
    quadrature NELEC within ~1e-6 e of the all-f64 build: per-point
    weight errors are ~1e-7 relative with random sign and cancel in
    the sum (see analysis/mesh._becke_weights_chunked)."""
    h2o.load_field(H2O_WFX)
    m64 = becke_mesh(h2o.crystal, "good")
    m32 = becke_mesh(h2o.crystal, "good", weights_dtype=np.float32)
    rho = np.asarray(h2o.ref.wfn.rho_eval_soa(
        jnp.asarray(m64.x.T), nder=0)[0])
    n64 = float(np.asarray(m64.w, np.float64) @ rho)
    n32 = float(np.asarray(m32.w, np.float64) @ rho)
    assert abs(n32 - n64) < 2e-6


@pytest.mark.slow
def test_benzene_auto_topology():
    """AUTO on the benzene 6-31G* wavefunction (the cps_large workload
    shape, examples/cps_large/12_di.cri): the exact benzene topology -
    12 nuclei, 12 bond CPs, 1 ring CP, Morse sum 1."""
    from critic2_tpu.analysis.autocp import autocp

    s = System.from_structure(BENZENE)
    s.load_field(BENZENE)
    s.iref = 1
    cpl = autocp(s, verbose=False)
    assert cpl.counts() == (12, 12, 1, 0)


# ---------------------------------------------------------------------
# screened/blocked evaluation (the cps_large path; reference screening
# semantics src/wfn_private@proc.F90:2032-2228, :3075-3145)
# ---------------------------------------------------------------------
def test_screened_matches_dense_benzene():
    """The screened density-matrix contraction must reproduce the dense
    MO path to screening-threshold accuracy, at every derivative order,
    in chunk sizes that force multi-chunk plans and padded tails."""
    w = Wavefunction.read_fchk(BENZENE)
    rng = np.random.default_rng(1)
    pts = (w.atpos[rng.integers(0, len(w.atz), 150)]
           + rng.normal(scale=1.5, size=(150, 3)))
    xT = jnp.asarray(pts.T)
    for nder in (0, 1, 2):
        f0, g0, h0 = (np.asarray(v) for v in w.rho_eval_soa(xT, nder=nder))
        f1, g1, h1 = (np.asarray(v)
                      for v in w.rho_eval_screened(xT, nder=nder,
                                                   n_chunk=64))
        assert np.abs(f1 - f0).max() <= 1e-10 * np.abs(f0).max()
        if nder >= 1:
            assert np.abs(g1 - g0).max() <= 1e-10 * np.abs(g0).max()
        if nder >= 2:
            assert np.abs(h1 - h0).max() <= 1e-10 * np.abs(h0).max()


def test_screened_extras_match_dense(h2o):
    w = h2o.fields[0].wfn if h2o.fields[0].type == "wfn" else \
        Wavefunction.from_file(H2O_WFX)
    rng = np.random.default_rng(2)
    pts = (w.atpos[rng.integers(0, len(w.atz), 60)]
           + rng.normal(scale=1.0, size=(60, 3)))
    xT = jnp.asarray(pts.T)
    ex0 = {k: np.asarray(v) for k, v in w.extras_soa(xT).items()}
    core = w.screened_closure(nder=2, extras=True)
    order, xstack, bidx, N = w.screen_plan(pts, n_chunk=32)
    cst = w.screen_consts()
    outs = [core(cst, jnp.asarray(xstack[i]), jnp.asarray(bidx[i]))
            for i in range(len(xstack))]
    inv = np.argsort(order)
    for k in ("rho", "grad", "h6", "gkin", "vir", "stress6"):
        v = np.concatenate([np.asarray(o[k]) for o in outs],
                           axis=-1)[..., :N][..., inv]
        ref = ex0[k]
        assert np.abs(v - ref).max() <= 1e-10 * max(np.abs(ref).max(),
                                                    1e-30), k


def test_screened_block_table_drops_far_blocks():
    """A 2x1x1 benzene assembly: chunks near copy 0 must not gather
    every block (the whole point of screening), yet stay exact."""
    w = Wavefunction.read_fchk(BENZENE).tile((3, 1, 1), gap=30.0)
    scr = w._screen()
    pts = w.atpos[:12] + 0.3        # points hugging copy 0
    order, xstack, bidx, N = w.screen_plan(pts, n_chunk=32)
    used = np.unique(bidx)
    nreal = scr["nb"]
    assert len(used[used < nreal]) < nreal   # some blocks screened out
    f0, _, _ = w.rho_eval_soa(jnp.asarray(pts.T), nder=0)
    f1, _, _ = w.rho_eval_screened(jnp.asarray(pts.T), nder=0,
                                   n_chunk=32)
    assert np.abs(np.asarray(f1) - np.asarray(f0)).max() <= 1e-10


def test_tile_assembly_additivity():
    """Tiled wavefunction: NELEC and per-point density are exactly
    additive (non-interacting copies)."""
    w = Wavefunction.read_fchk(BENZENE)
    w2 = w.tile((2, 1, 1), gap=6.0)
    assert w2.nelec == 2 * w.nelec
    assert w2.npri == 2 * w.npri
    rng = np.random.default_rng(3)
    pts = w.atpos[rng.integers(0, 12, 40)] + rng.normal(
        scale=1.0, size=(40, 3))
    span = w.atpos.max(0) - w.atpos.min(0) + 6.0
    f_mono = np.asarray(w.rho_eval_soa(jnp.asarray(pts.T), nder=0)[0])
    f_mono_sh = np.asarray(w.rho_eval_soa(
        jnp.asarray((pts - span * np.array([1.0, 0, 0])).T), nder=0)[0])
    f_tile = np.asarray(w2.rho_eval_screened(jnp.asarray(pts.T),
                                             nder=0)[0])
    assert np.abs(f_tile - (f_mono + f_mono_sh)).max() <= 1e-10


@pytest.mark.slow
def test_screened_auto_and_graph_match_dense():
    """Full AUTO + makegraph through the screened path (SCREEN_NPRI
    forced down) must reproduce the dense benzene topology: counts,
    CP positions, bond-path connectivity, and path lengths."""
    from critic2_tpu.analysis.autocp import autocp, makegraph

    s = System.from_structure(BENZENE)
    s.load_field(BENZENE)
    s.iref = 1
    cpl0 = autocp(s, verbose=False)
    makegraph(s, cpl0)
    g0 = sorted(tuple(sorted(cp.ipath)) for cp in cpl0.cps
                if cp.typ == -1)

    w = s.fields[1].wfn
    w.SCREEN_NPRI = 1                      # force the screened path
    s.fields[1]._eval_cache = {}
    cpl1 = autocp(s, verbose=False)
    makegraph(s, cpl1)
    g1 = sorted(tuple(sorted(cp.ipath)) for cp in cpl1.cps
                if cp.typ == -1)
    assert cpl0.counts() == cpl1.counts() == (12, 12, 1, 0)
    assert g0 == g1
    x0 = np.sort(np.concatenate([cp.r for cp in cpl0.cps]).ravel())
    x1 = np.sort(np.concatenate([cp.r for cp in cpl1.cps]).ravel())
    assert np.abs(x0 - x1).max() < 1e-8


def test_trace_paths_screened_multichunk_escape():
    """Grouped tracer on a 2-copy tile with a tiny chunk size: paths
    must cross chunk escape spheres (STAT_OOR resume) and still land on
    their nuclei."""
    from critic2_tpu.ops.ode import trace_paths_screened

    w = Wavefunction.read_fchk(BENZENE).tile((2, 1, 1), gap=6.0)
    rng = np.random.default_rng(5)
    # uphill seeds: 0.5 bohr off 16 random nuclei
    iat = rng.integers(0, len(w.atz), 16)
    u = rng.normal(size=(16, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    seeds = w.atpos[iat] + 0.5 * u
    x, stat, term, plen, h = trace_paths_screened(
        w, seeds, iup=1, targets=w.atpos,
        rterm=np.full(len(w.atpos), 0.2),
        n_chunk=8, margin=2.0)
    stat = np.asarray(stat)
    term = np.asarray(term)
    assert (stat == 0).all(), stat          # all reached an attractor
    # each path hits a nucleus of the copy it started near
    d = np.linalg.norm(x - w.atpos[term], axis=1)
    assert d.max() < 0.3
