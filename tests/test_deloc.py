"""Wannier delocalization indices: pwc reader, Wannier construction,
Sij/Fa assembly, sum rules, and loop-level parity with a brute-force
mirror of the reference algorithm (intgrid_deloc_wannier /
calc_sij_wannier, src/integration@proc.f90:1183-1879)."""
import numpy as np
import pytest

from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.fields.qe import FortranFile, QEData, read_pwc, read_wannier_chk
from critic2_tpu.analysis.yt import yt_integrate
from critic2_tpu.analysis.deloc import (deloc_wannier, _pack_perm, QE_rvectors,
                                        write_fachk, read_fachk)


# ------------------------------------------------------------ synthetic pwc

def _gvectors(n, gmax=2):
    gs = []
    for g1 in range(-gmax, gmax + 1):
        for g2 in range(-gmax, gmax + 1):
            for g3 in range(-gmax, gmax + 1):
                if g1 * g1 + g2 * g2 + g3 * g3 <= gmax * gmax:
                    gs.append((g1, g2, g3))
    return np.array(gs, dtype=np.int64)


def write_pwc(path, at, nk, nbnd, n, seed=7, nspin=1):
    """Write a synthetic pw2critic.x pwc file: random orthonormal
    plane-wave coefficients per k-point, occupations = k-weight
    (occupancy 1), record layout of read_pwc
    (src/grid3mod@proc.f90:755-840)."""
    rng = np.random.default_rng(seed)
    g = _gvectors(n[0] // 4 + 1)
    ngms = len(g)
    nl = (1 + (g[:, 0] % n[0]) + n[0] * ((g[:, 1] % n[1])
          + n[1] * (g[:, 2] % n[2]))).astype(np.int32)
    nks = int(np.prod(nk))
    npwx = ngms
    kf = np.stack(np.meshgrid(np.arange(nk[0]) / nk[0],
                              np.arange(nk[1]) / nk[1],
                              np.arange(nk[2]) / nk[2],
                              indexing="ij"), axis=-1).reshape(-1, 3)
    kcart = kf @ np.linalg.inv(at)      # reader does kpt @ at -> frac
    wk = np.full(nks, 1.0 / nks)
    occ = np.tile(wk[:, None], (nspin, nbnd)).reshape(nspin * nks, nbnd)
    ek = rng.normal(size=(nspin * nks, nbnd))

    evc = rng.normal(size=(nspin, nks, ngms, nbnd)) \
        + 1j * rng.normal(size=(nspin, nks, ngms, nbnd))
    for s in range(nspin):
        for ik in range(nks):
            q, _ = np.linalg.qr(evc[s, ik])
            evc[s, ik] = q[:, :nbnd]
    evc = evc.transpose(0, 1, 3, 2)      # (nspin, nks, nbnd, ngms)

    with FortranFile(path, "wb") as fh:
        fh.write_record(np.int32(1))                     # version
        fh.write_record(np.array([1, 2], np.int32))      # nsp, nat
        fh.write_record(b"XX")                           # atm
        fh.write_record(np.array([1, 1], np.int32))      # ityp
        fh.write_record(np.zeros(6))                     # tau
        fh.write_record(np.asarray(at, np.float64).flatten(order="F"))
        fh.write_record(np.array([nks, nbnd, nspin, 0], np.int32))
        fh.write_record(np.asarray(nk, np.int32))
        fh.write_record(np.asarray(n, np.int32))
        fh.write_record(np.array([npwx, ngms], np.int32))
        fh.write_record(kcart.astype(np.float64).reshape(-1))
        fh.write_record(wk)
        fh.write_record(ek.reshape(-1))                  # (bnd fastest ok: we
        fh.write_record(occ.reshape(-1))                 # read back same way)
        fh.write_record(np.full(nks, ngms, np.int32))
        fh.write_record(np.tile(np.arange(1, ngms + 1, dtype=np.int32),
                                (nks, 1)).reshape(-1))
        fh.write_record(nl)
        for s in range(nspin):
            for ik in range(nks):
                for ib in range(nbnd):
                    fh.write_record(evc[s, ik, ib].astype(np.complex128))
    return evc, kf, g, nl


def write_chk(path, qe_nbnd, nks, nk, kf, rlatt, u, centers=None,
              spreads=None):
    """Synthetic wannier90 .chk matching read_wannier_chk's record walk."""
    nw = u.shape[1]
    if centers is None:
        centers = np.zeros((nw, 3))
    if spreads is None:
        spreads = np.ones(nw)
    with FortranFile(path, "wb") as fh:
        fh.write_record(b" " * 33)
        fh.write_record(np.int32(qe_nbnd))
        fh.write_record(np.int32(0))                     # excluded bands
        fh.write_record(b"")                             # excluded list
        fh.write_record(np.asarray(rlatt, np.float64).flatten(order="F"))
        fh.write_record(np.linalg.inv(rlatt).T.flatten(order="F") * 2 * np.pi)
        fh.write_record(np.int32(nks))
        fh.write_record(np.asarray(nk, np.int32))
        fh.write_record(kf.astype(np.float64).reshape(-1))
        fh.write_record(np.int32(8))                     # nntot
        fh.write_record(np.int32(nw))
        fh.write_record(b" " * 20)
        fh.write_record(np.int32(0))                     # not disentangled
        fh.write_record(u.transpose(0, 2, 1).astype(np.complex128).reshape(-1))
        fh.write_record(np.zeros(2, np.complex128))      # m matrix (skipped)
        fh.write_record((centers @ rlatt.T if False else centers)
                        .astype(np.float64).reshape(-1))
        fh.write_record((spreads ** 2).astype(np.float64))


# --------------------------------------------------- brute-force reference

def _wannier_brute(qe: QEData, s, b, useu):
    """Loop-level mirror of get_qe_wnr (src/grid3mod@proc.f90:1507-1624):
    per-k scatter+FFT+phase, accumulated per lattice vector."""
    n1, n2, n3 = qe.n
    nlat = qe.nlat
    out = np.zeros((nlat, n1, n2, n3), np.complex128)
    rv = qe.rvectors()
    for ik in range(qe.nks):
        if useu:
            nb = int(qe.nbndw[s])
            coef = sum(qe.u[s, ik, j, b] * qe.evc[s, ik, j]
                       for j in range(nb))
        else:
            coef = qe.evc[s, ik, b]
        rseq = np.zeros(n1 * n2 * n3, np.complex128)
        npw = int(qe.ngk[ik])
        rseq[qe.nl[qe.igk_k[ik, :npw] - 1] - 1] = coef[:npw]
        u = np.fft.ifftn(rseq.reshape((n1, n2, n3), order="F"),
                         norm="forward")
        i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                              indexing="ij")
        ph = np.exp(2j * np.pi * (qe.kpt[ik, 0] * i / n1
                                  + qe.kpt[ik, 1] * j / n2
                                  + qe.kpt[ik, 2] * k / n3))
        psi = u * ph
        for il in range(nlat):
            out[il] += psi * np.exp(-2j * np.pi * (qe.kpt[ik] @ rv[il]))
    out /= nlat
    im = np.unravel_index(np.argmax(np.abs(out)), out.shape)
    t = out[im]
    out *= np.abs(t) / t
    return out


def _deloc_brute(crystal, decomp, qe, useu):
    """Mirror of calc_sij_wannier + the Fa loop (YT branch), with dense
    per-basin YT weight grids."""
    n = qe.n
    ntot = int(np.prod(n))
    nk = np.asarray(qe.nk)
    nlat = int(np.prod(nk))
    nb = int(qe.nbndw[0]) if useu else qe.nbnd
    nmo = nlat * nb
    rv = qe.rvectors()
    W = np.empty((nlat, nb) + tuple(n), np.complex128)
    for b in range(nb):
        W[:, b] = _wannier_brute(qe, 0, b, useu)

    # grid fractional coords and per-basin shift classification
    i, j, k = np.meshgrid(np.arange(n[0]), np.arange(n[1]), np.arange(n[2]),
                          indexing="ij")
    xg = np.stack([i / n[0], j / n[1], k / n[2]], axis=-1).reshape(-1, 3)
    m_c2x = np.linalg.inv(crystal.m_x2c)

    S = np.zeros((decomp.nattr, nmo, nmo), np.complex128)
    for a in range(decomp.nattr):
        w = decomp.weights(a).reshape(-1)
        sel = np.abs(w) > 1e-15
        x = xg[sel] - decomp.xattr[a]
        xs = crystal.shortest_vector(x)
        p = np.rint(x - xs @ m_c2x.T).astype(int)
        for pu in np.unique(p, axis=0):
            msk = (p == pu).all(1)
            idx = np.where(sel)[0][msk]
            for ila in range(nlat):
                for ba in range(nb):
                    for ilb in range(nlat):
                        for bb in range(nb):
                            val = np.sum(
                                np.conj(W[ila, ba].reshape(-1)[idx])
                                * W[ilb, bb].reshape(-1)[idx] * w[idx])
                            ra = (rv[ila] - pu) % nk
                            rb = (rv[ilb] - pu) % nk
                            imo = ba + nb * (ra[2] + nk[2] * (ra[1] + nk[1] * ra[0]))
                            jmo = bb + nb * (rb[2] + nk[2] * (rb[1] + nk[1] * rb[0]))
                            S[a, imo, jmo] += val
    S /= ntot

    fa = np.zeros((decomp.nattr, decomp.nattr, nlat))
    for a in range(decomp.nattr):
        for b_ in range(decomp.nattr):
            for kk in range(nlat):
                q = _pack_perm(nk, nb, rv[kk])
                acc = 0.0
                for imo in range(nmo):
                    for jmo in range(nmo):
                        acc += (S[a, jmo, imo] * S[b_, q[imo], q[jmo]]).real
                fa[a, b_, kk] = acc
    return S, fa


# -------------------------------------------------------------------- tests

@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    a = 6.0
    at = np.eye(3) * a
    c = Crystal(m_x2c=at, x_frac=np.array([[0.25, 0.25, 0.25],
                                           [0.75, 0.75, 0.75]]),
                species_of=np.array([0, 0]), species=[Species("He", 2)])
    n = (8, 8, 8)
    nk = (2, 1, 1)
    nbnd = 2
    path = str(tmp_path_factory.mktemp("pwc") / "test.pwc")
    evc, kf, g, nl = write_pwc(path, at, nk, nbnd, n)
    qe, rho = read_pwc(path)
    return c, qe, rho, path, kf, at


def test_read_pwc_roundtrip(setup):
    c, qe, rho, path, kf, at = setup
    assert qe.nks == 2 and qe.nbnd == 2 and qe.nspin == 1
    np.testing.assert_allclose(qe.kpt, kf, atol=1e-12)
    # integrated density = fspin * nbnd electrons (occupancy-1 bands)
    nelec = rho.sum() * c.volume / rho.size
    assert nelec == pytest.approx(4.0, abs=1e-9)


def test_wannier_home_matches_brute(setup):
    c, qe, rho, path, kf, at = setup
    for b in range(qe.nbnd):
        Wf = np.asarray(qe.wannier_home(0, b, useu=False))
        Wb = _wannier_brute(qe, 0, b, useu=False)
        np.testing.assert_allclose(Wf, Wb, atol=1e-10)


def test_deloc_sum_rules_and_parity(setup):
    c, qe, rho, path, kf, at = setup
    decomp = yt_integrate(c, rho)
    res = deloc_wannier(c, decomp, qe, useu=False)

    # populations from the Fa sum rule match the YT basin populations
    scale = c.volume / rho.size
    pop_yt = decomp.integrate(rho.reshape(-1)) * scale
    np.testing.assert_allclose(res.population(), pop_yt, atol=5e-6)
    # total = all electrons; LI <= N
    assert res.population().sum() == pytest.approx(4.0, abs=1e-6)
    assert np.all(res.li() <= res.population() + 1e-12)


def test_deloc_brute_parity(setup):
    """Loop-level parity with the reference algorithm mirror (runs in
    ~5 s warm; kept in the default suite per round-2 advisor: marking
    it slow removed the only reference-loop parity check)."""
    c, qe, rho, path, kf, at = setup
    decomp = yt_integrate(c, rho)
    res = deloc_wannier(c, decomp, qe, useu=False)
    S_b, fa_b = _deloc_brute(c, decomp, qe, useu=False)
    np.testing.assert_allclose(res.sij[0], S_b, atol=1e-10)
    np.testing.assert_allclose(res.fa[0], fa_b, atol=1e-10)


def test_deloc_with_u_rotation(setup, tmp_path):
    c, qe, rho, path, kf, at = setup
    # random unitary U per k-point
    rng = np.random.default_rng(3)
    nw = qe.nbnd
    u = np.empty((qe.nks, nw, nw), np.complex128)
    for ik in range(qe.nks):
        m = rng.normal(size=(nw, nw)) + 1j * rng.normal(size=(nw, nw))
        q, _ = np.linalg.qr(m)
        u[ik] = q
    chk = str(tmp_path / "test.chk")
    write_chk(chk, qe.nbnd, qe.nks, qe.nk, kf, at, u)
    read_wannier_chk(qe, chk)
    assert qe.iswan and qe.nbndw[0] == nw
    np.testing.assert_allclose(qe.u[0], u, atol=1e-14)

    decomp = yt_integrate(c, rho)
    res = deloc_wannier(c, decomp, qe, useu=True)
    # unitary rotation preserves the basin populations
    scale = c.volume / rho.size
    pop_yt = decomp.integrate(rho.reshape(-1)) * scale
    np.testing.assert_allclose(res.population(), pop_yt, atol=5e-6)

    S_b, fa_b = _deloc_brute(c, decomp, qe, useu=True)
    np.testing.assert_allclose(res.sij[0], S_b, atol=1e-10)
    np.testing.assert_allclose(res.fa[0], fa_b, atol=1e-10)

    # checkpoint roundtrip
    fchk = str(tmp_path / "fa.npz")
    write_fachk(fchk, res)
    res2 = read_fachk(fchk)
    np.testing.assert_allclose(res2.fa, res.fa, atol=0)
    np.testing.assert_allclose(res2.li(), res.li(), atol=0)


def test_cli_deloc(setup, tmp_path):
    """LOAD x.pwc + INTEGRABLE DELOC + YT through the keyword REPL."""
    import io
    from critic2_tpu.cli import Repl

    c, qe, rho, path, kf, at = setup
    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "He2\n1.0\n"
        + "\n".join(" ".join(f"{v * 0.52917720859:.10f}" for v in row)
                    for row in np.asarray(c.m_x2c).T)
        + "\nHe\n2\nDirect\n0.25 0.25 0.25\n0.75 0.75 0.75\n")
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    r.run_script(f"""
crystal {poscar}
load {path}
integrable 1 deloc nou
yt
""")
    text = out.getvalue()
    assert "LI/DI" in text
    assert "attractors" in text


def test_deloc_sharded_decomposition_matches(setup):
    """Sij/DI computed on a ShardedYTResult must match the
    single-device YT decomposition (ADVICE round-1: the sharded path
    used to fall back silently to argmax labels, discarding fractional
    boundary weights)."""
    import jax
    from jax.sharding import Mesh

    from critic2_tpu.parallel.yt_sharded import yt_integrate_sharded

    c, qe, rho, path, kf, at = setup
    decomp = yt_integrate(c, rho)
    res1 = deloc_wannier(c, decomp, qe, useu=False)

    mesh = Mesh(np.array(jax.devices()), ("space",))
    sh = yt_integrate_sharded(mesh, c, rho, result=True)
    res2 = deloc_wannier(c, sh, qe, useu=False)

    # basins may be numbered differently; compare sorted populations
    # and the sorted DI multiset
    np.testing.assert_allclose(np.sort(res1.population()),
                               np.sort(res2.population()), atol=1e-8)
    n1 = len(res1.population())
    d1 = np.sort([res1.di(a, b) for a in range(n1) for b in range(n1)],
                 axis=None)
    d2 = np.sort([res2.di(a, b) for a in range(n1) for b in range(n1)],
                 axis=None)
    np.testing.assert_allclose(d1, d2, atol=1e-8)


# ------------------------------------------------- CUBE state dumps

def test_cube_states_unk_psink_parity(setup, tmp_path):
    """CUBE UNK/PSINK dumps against the loaded pwc density: the
    occupation-weighted |psi_nk|^2 sum over all bands/k-points must
    rebuild rho (the same sum read_pwc uses), and UNK/PSINK must agree
    through the Bloch phase."""
    from critic2_tpu import System
    from critic2_tpu.analysis.rhoplot import cube_states

    c, qe, rho, path, kf, at = setup
    s = System.from_structure(c)
    s.load_field(path)
    s.iref = 1

    n1, n2, n3 = qe.n
    i, j, k = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                          indexing="ij")
    acc = np.zeros(tuple(qe.n))
    for ik in range(qe.nks):
        kpt = qe.kpt[ik]
        ph = np.exp(2j * np.pi * (kpt[0] * i / n1 + kpt[1] * j / n2
                                  + kpt[2] * k / n3))
        for b in range(qe.nbnd):
            u, _ = cube_states(s, "unk", b + 1, ik=ik + 1, write=False)
            psi, _ = cube_states(s, "psink", b + 1, ik=ik + 1,
                                 write=False)
            np.testing.assert_allclose(psi, u * ph, atol=1e-12)
            acc += qe.occ[ik, b] * np.abs(psi) ** 2
    acc *= 2.0 / (abs(np.linalg.det(qe.at)) * qe.wk.sum())  # fspin=2
    np.testing.assert_allclose(acc, rho, atol=1e-10)

    # file writing: a parseable cube pair lands on disk
    import os

    root = str(tmp_path / "st")
    _, files = cube_states(s, "psink", 1, ik=1, fileroot=root)
    assert len(files) == 2 and all(os.path.exists(p) for p in files)


def test_cube_states_mlwf_supercell(setup, tmp_path):
    """CUBE WANNIER/MLWF: the supercell assembly equals the brute-force
    get_qe_wnr mirror laid out cell copy by cell copy, and the MLWF
    variant applies the chk U rotation (deloc's rotated states)."""
    import os

    from critic2_tpu import System
    from critic2_tpu.analysis.rhoplot import cube_states
    from critic2_tpu.fields.qe import read_pwc

    c, qe0, rho, path, kf, at = setup
    s = System.from_structure(c)
    s.load_field(path)
    s.iref = 1
    qe = s.fields[1].grid.qe
    nk = tuple(int(v) for v in qe.nk)
    n = tuple(int(v) for v in qe.n)

    def assemble(W):
        S = np.empty((nk[0] * n[0], nk[1] * n[1], nk[2] * n[2]),
                     complex)
        rv = qe.rvectors()
        for il, (r1, r2, r3) in enumerate(rv):
            jl = ((((-r1) % nk[0]) * nk[1] + ((-r2) % nk[1])) * nk[2]
                  + ((-r3) % nk[2]))
            S[r1 * n[0]:(r1 + 1) * n[0], r2 * n[1]:(r2 + 1) * n[1],
              r3 * n[2]:(r3 + 1) * n[2]] = W[jl]
        return S

    b = 1
    Wb = _wannier_brute(qe, 0, b - 1, useu=False)
    root = str(tmp_path / "wan")
    S, files = cube_states(s, "wannier", b, fileroot=root)
    np.testing.assert_allclose(S, assemble(Wb), atol=1e-10)
    assert len(files) == 2 and all(os.path.exists(p) for p in files)
    # supercell cube geometry: nk * n grid points, nlat * ncel atoms
    with open(files[0]) as fh:
        lines = fh.readlines()
    natoms = int(lines[2].split()[0])
    assert natoms == qe.nlat * c.ncel
    assert int(lines[3].split()[0]) == nk[0] * n[0]

    # MLWF = U-rotated: attach a chk, compare against the brute with U
    nw = qe.nbnd
    rng = np.random.default_rng(5)
    u = np.zeros((qe.nks, nw, nw), complex)
    for ik in range(qe.nks):
        m = rng.normal(size=(nw, nw)) + 1j * rng.normal(size=(nw, nw))
        q_, _ = np.linalg.qr(m)
        u[ik] = q_
    chk = str(tmp_path / "test.chk")
    write_chk(chk, qe.nbnd, qe.nks, qe.nk, kf,
              np.linalg.inv(at).T, u,
              centers=np.zeros((nw, 3)))
    qe2, _ = read_pwc(path)
    from critic2_tpu.fields.qe import read_wannier_chk

    read_wannier_chk(qe2, chk)
    s.fields[1].grid.qe = qe2
    Sm, _ = cube_states(s, "mlwf", b, fileroot=root, write=False)
    Wm = _wannier_brute(qe2, 0, b - 1, useu=True)
    np.testing.assert_allclose(Sm, assemble(Wm), atol=1e-10)


def test_cli_cube_mlwf(setup, tmp_path):
    """CUBE WANNIER/UNK/PSINK through the keyword REPL."""
    import io
    import os

    from critic2_tpu.cli import Repl

    c, qe, rho, path, kf, at = setup
    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "He2\n1.0\n"
        + "\n".join(" ".join(f"{v * 0.52917720859:.10f}" for v in row)
                    for row in np.asarray(c.m_x2c).T)
        + "\nHe\n2\nDirect\n0.25 0.25 0.25\n0.75 0.75 0.75\n")
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    os.chdir(tmp_path)
    r.run_script(f"""
crystal {poscar}
load {path}
root {tmp_path}/wn
cube wannier 1
cube unk 1 1
cube psink 2 2
""")
    text = out.getvalue()
    assert "CUBE WANNIER" in text
    assert os.path.exists(f"{tmp_path}/wn-wannier-1-1-re.cube")
    assert os.path.exists(f"{tmp_path}/wn-unk-1-1-1-re.cube")
    assert os.path.exists(f"{tmp_path}/wn-psink-2-2-1-im.cube")
