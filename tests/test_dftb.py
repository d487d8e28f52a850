"""DFTB+ field evaluator against hand-computed sums (synthetic data).

The reference has no test data for dftb_private in-tree; these tests
synthesize a minimal DFTB+ output (detailed.xml + eigenvec.bin +
wfc.hsd) for a 1-atom cubic H crystal with one s orbital, where
rho(x) = sum_k occ_k w_k |sum_L R(|x - L|) e^{ik.L}|^2 can be
evaluated directly in numpy."""
import struct

import numpy as np
import pytest

from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.fields.dftb import (DftbField, read_detailed_xml,
                                     read_eigenvec_bin, read_hsd_basis)

A = 4.0          # cubic cell, bohr
CUT = 5.5        # orbital cutoff
EXPS = (0.9, 2.1)
COEFS = ((0.7, 0.2), (0.4, -0.1))   # (iexp, icoef): c * r^(l+j-1)


def radial(r):
    """R_0(r) = sum_i e^{-a_i r} (c_i1 + c_i2 r) (l = 0)."""
    out = np.zeros_like(r)
    for (a, cc) in zip(EXPS, COEFS):
        out += np.exp(-a * r) * (cc[0] + cc[1] * r)
    return out


def write_hsd(path):
    path.write_text("""
H {
  AtomicNumber = 1
  Orbital {
    AngularMomentum = 0
    Occupation = 1.0
    Cutoff = %g
    Exponents { %g %g }
    Coefficients {
      %g %g
      %g %g
    }
  }
}
""" % (CUT, EXPS[0], EXPS[1], COEFS[0][0], COEFS[0][1],
       COEFS[1][0], COEFS[1][1]))


def write_xml(path, kpts, occ, isreal):
    nk = len(kpts)
    blocks = []
    for ik in range(nk):
        blocks.append(f" <k{ik + 1}>\n  "
                      + " ".join(f"{o:.10f}" for o in occ[:, ik, 0])
                      + f"\n </k{ik + 1}>")
    path.write_text(f"""<detailedout>
 <real>{'yes' if isreal else 'no'}</real>
 <nrofkpoints>{nk}</nrofkpoints>
 <nrofspins>1</nrofspins>
 <nrofstates>1</nrofstates>
 <nroforbitals>1</nroforbitals>
 <kpointsandweights>
{chr(10).join('  %.10f %.10f %.10f %.10f' % (k[0], k[1], k[2], w)
              for k, w in kpts)}
 </kpointsandweights>
 <occupations>
{chr(10).join(blocks)}
 </occupations>
</detailedout>
""")


def write_bin(path, vecs, isreal):
    with open(path, "wb") as fh:
        def rec(payload):
            fh.write(struct.pack("<i", len(payload)))
            fh.write(payload)
            fh.write(struct.pack("<i", len(payload)))
        rec(struct.pack("<i", 1))
        for v in vecs:
            if isreal:
                rec(struct.pack("<%dd" % len(v), *np.real(v)))
            else:
                buf = b"".join(struct.pack("<dd", c.real, c.imag)
                               for c in v)
                rec(buf)


@pytest.fixture
def crystal():
    return Crystal(m_x2c=np.diag([A, A, A]),
                   x_frac=np.array([[0.0, 0.0, 0.0]]),
                   species_of=np.array([0]),
                   species=[Species("H", 1)])


def _images(cut):
    n = int(np.ceil(cut / A)) + 1
    r = np.arange(-n, n + 1) * A
    return np.stack(np.meshgrid(r, r, r, indexing="ij"),
                    axis=-1).reshape(-1, 3)


def rho_ref(pts, kfrac, occw):
    """Direct numpy rho for the 1-orbital model."""
    L = _images(CUT)
    Lfrac = L / A
    rho = np.zeros(len(pts))
    for (kf, ow) in zip(kfrac, occw):
        ph = np.exp(1j * 2.0 * np.pi * (Lfrac @ kf))
        psi = np.zeros(len(pts), dtype=complex)
        d = np.linalg.norm(pts[:, None, :] - L[None, :, :], axis=-1)
        chi = np.where(d <= CUT, radial(d), 0.0) \
            * np.sqrt(1.0 / (4.0 * np.pi))
        psi = (chi * ph[None, :]).sum(1)
        rho += ow * np.abs(psi) ** 2
    return rho


def test_readers(tmp_path):
    write_hsd(tmp_path / "wfc.hsd")
    bas = read_hsd_basis(tmp_path / "wfc.hsd")
    assert 1 in bas and len(bas[1]) == 1
    orb = bas[1][0]
    assert orb.l == 0 and orb.cutoff == CUT
    np.testing.assert_allclose(orb.eexp, EXPS)
    np.testing.assert_allclose(orb.coef, COEFS)

    kpts = [(np.zeros(3), 1.0)]
    occ = np.full((1, 1, 1), 2.0)
    write_xml(tmp_path / "detailed.xml", kpts, occ, True)
    meta = read_detailed_xml(tmp_path / "detailed.xml")
    assert meta["isreal"] and meta["nkpt"] == 1
    np.testing.assert_allclose(meta["occ"], occ)

    write_bin(tmp_path / "eigenvec.bin", [np.array([1.0])], True)
    ev = read_eigenvec_bin(tmp_path / "eigenvec.bin", 1, 1, 1, 1, True)
    np.testing.assert_allclose(ev, [[[1.0]]])


def test_real_gamma_density(tmp_path, crystal):
    write_hsd(tmp_path / "wfc.hsd")
    write_xml(tmp_path / "detailed.xml", [(np.zeros(3), 1.0)],
              np.full((1, 1, 1), 2.0), True)
    write_bin(tmp_path / "eigenvec.bin", [np.array([1.0])], True)
    f = DftbField.from_files(crystal, tmp_path / "detailed.xml",
                             tmp_path / "eigenvec.bin",
                             tmp_path / "wfc.hsd")
    rng = np.random.default_rng(3)
    pts = rng.random((24, 3)) * A
    rho, g, H, gk = (np.asarray(v) for v in f.eval(pts, nder=2))
    ref = rho_ref(pts, [np.zeros(3)], [2.0])
    np.testing.assert_allclose(rho, ref, rtol=1e-9, atol=1e-12)
    # gradient/Hessian/gkin via finite differences of the model
    h = 2e-5
    for d in range(3):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += h
        pm[:, d] -= h
        fd = (rho_ref(pp, [np.zeros(3)], [2.0])
              - rho_ref(pm, [np.zeros(3)], [2.0])) / (2 * h)
        np.testing.assert_allclose(g[:, d], fd, rtol=2e-5, atol=1e-7)
    rp, _, _, _ = (np.asarray(v) for v in f.eval(pts + [h, 0, 0], nder=0))
    rm, _, _, _ = (np.asarray(v) for v in f.eval(pts - [h, 0, 0], nder=0))
    # Hxx via second difference
    fdxx = (rp - 2 * rho + rm) / h ** 2
    np.testing.assert_allclose(H[:, 0, 0], fdxx, rtol=5e-4, atol=5e-5)
    assert np.all(gk >= 0)


def test_system_integration(tmp_path, crystal):
    """LOAD detailed.xml eigenvec.bin wfc.hsd through the System layer:
    field dispatch, nucleus clamp, and the gkin arithmetic function."""
    from critic2_tpu.system import System

    write_hsd(tmp_path / "wfc.hsd")
    write_xml(tmp_path / "detailed.xml", [(np.zeros(3), 1.0)],
              np.full((1, 1, 1), 2.0), True)
    write_bin(tmp_path / "eigenvec.bin", [np.array([1.0])], True)
    s = System.from_structure(crystal)
    fid = s.load_field(str(tmp_path / "detailed.xml"),
                       file2=str(tmp_path / "eigenvec.bin"),
                       file3=str(tmp_path / "wfc.hsd"))
    f = s.field(fid)
    assert f.type == "dftb"
    rng = np.random.default_rng(11)
    pts = rng.random((8, 3)) * A
    res = f.grd(pts, nder=2)
    ref = rho_ref(pts, [np.zeros(3)], [2.0])
    np.testing.assert_allclose(np.asarray(res.f), ref, rtol=1e-9)
    gk = np.asarray(s.eval_expr(f"gkin({fid})", pts))
    assert np.all(gk >= 0) and np.all(np.isfinite(gk))
    elf = np.asarray(s.eval_expr(f"elf({fid})", pts))
    assert np.all((elf >= 0) & (elf <= 1))


def test_complex_gamma_matches_real(tmp_path, crystal):
    write_hsd(tmp_path / "wfc.hsd")
    kpts = [(np.zeros(3), 0.5), (np.array([0.5, 0.0, 0.0]), 0.5)]
    occ = np.zeros((1, 2, 1))
    occ[0, 0, 0] = 2.0
    occ[0, 1, 0] = 1.0
    write_xml(tmp_path / "detailed.xml", kpts, occ, False)
    write_bin(tmp_path / "eigenvec.bin",
              [np.array([1.0 + 0j]), np.array([1.0 + 0j])], False)
    f = DftbField.from_files(crystal, tmp_path / "detailed.xml",
                             tmp_path / "eigenvec.bin",
                             tmp_path / "wfc.hsd")
    rng = np.random.default_rng(5)
    pts = rng.random((16, 3)) * A
    rho, g, H, gk = (np.asarray(v) for v in f.eval(pts, nder=2))
    ref = rho_ref(pts, [np.zeros(3), np.array([0.5, 0, 0])],
                  [2.0 * 0.5, 1.0 * 0.5])
    np.testing.assert_allclose(rho, ref, rtol=1e-9, atol=1e-12)
