"""Elk LAPW evaluator: synthetic STATE.OUT/GEOMETRY.OUT parity.

Hermetic field rho(x) = 2 + cos(q x) with q = 2 pi / a along x (so the
m != 0 angular channels are exercised): muffin-tin coefficients from the
Rayleigh expansion in the reference rho2's real-harmonic convention
(src/elk_private@proc.f90:100-230), interstitial from the FFT of the
grid samples. STATE.OUT is written as real Fortran sequential
unformatted records (the format read_elk_state parses,
src/elk_private@proc.f90:330-476).
"""
import math
import struct

import numpy as np
import pytest
from scipy.special import spherical_jn

from critic2_tpu.fields.elk import ElkField

A0 = 8.0
RMT = 2.0
NR = 301
R0 = 1e-4
Q = 2.0 * math.pi / A0
LMAX = 10


def _rec(data: bytes) -> bytes:
    return struct.pack("<i", len(data)) + data + struct.pack("<i", len(data))


def _ints(*v):
    return _rec(np.asarray(v, dtype="<i4").tobytes())


def _flts(arr):
    return _rec(np.asarray(arr, dtype="<f8").tobytes())


def _elk_sign(l, m):
    if m > 0:
        return (-1.0) ** m
    if m < 0:
        return -1.0
    return 1.0


def _write_geometry(path):
    txt = ["", "avec", ]
    for j in range(3):
        row = ["0.0"] * 3
        row[j] = f"{A0:.10f}"
        txt.append("  " + "  ".join(row))
    txt += ["", "atoms", "   1   : nspecies", "'X.in'",
            "   1   : natoms",
            "  0.0 0.0 0.0  0.0 0.0 0.0"]
    open(path, "w").write("\n".join(txt) + "\n")


def _write_state(path, ngrid=(16, 16, 16)):
    from critic2_tpu.ops.rlm import solid_harmonics

    r = R0 * np.exp(np.arange(NR) * math.log(RMT / R0) / (NR - 1))
    lmmax = (LMAX + 1) ** 2
    # S_lm(q^) for q along +x
    S = np.asarray(solid_harmonics(np.array([[1.0], [0.0], [0.0]]), LMAX))[:, 0]
    rhomt = np.zeros((lmmax, NR))           # (lm, ir)
    k = 0
    for l in range(LMAX + 1):
        for m in range(-l, l + 1):
            if l % 2 == 0:
                cl = 4.0 * math.pi * (-1.0) ** (l // 2) \
                    * spherical_jn(l, Q * r)
                rhomt[k] = cl * _elk_sign(l, m) * S[k]
            if l == 0 and m == 0:
                rhomt[k] += 2.0 * math.sqrt(4.0 * math.pi)
            k += 1

    n1, n2, n3 = ngrid
    i1 = np.arange(n1)
    rho_g = np.broadcast_to((2.0 + np.cos(2 * np.pi * i1 / n1))[:, None, None],
                            ngrid)

    out = b""
    out += _ints(9, 5, 14)                  # version (newer than 2.3.16)
    out += _ints(0)                         # spinpol
    out += _ints(1)                         # nspecies
    out += _ints(lmmax)                     # lmmaxvr
    out += _ints(NR)                        # nrmtmax
    out += _ints(NR)                        # nrcmtmax
    out += _ints(1)                         # natoms(1)
    out += _ints(NR)                        # nrmt(1)
    out += _flts(r)                         # spr
    out += _ints(NR)                        # nrcmt(1)
    out += _flts(r)                         # rcmt
    out += _ints(*ngrid)                    # ngridg
    out += _ints(19)                        # ngvec
    out += _ints(0)                         # ndmag
    out += _ints(1)                         # nspinor
    out += _ints(0)                         # fixspin
    out += _ints(0)                         # ftmtype
    out += _ints(0)                         # dftu
    out += _ints(0)                         # lmmaxdm
    # rhomt(lmmaxvr, nrmtmax, ncell) column-major + rhoir
    rhotmp = np.zeros((lmmax, NR, 1))
    rhotmp[:, :, 0] = rhomt
    blob = np.concatenate([rhotmp.reshape(-1, order="F"),
                           np.asarray(rho_g).reshape(-1, order="F")])
    out += _flts(blob)
    open(path, "wb").write(out)


@pytest.fixture(scope="module")
def field(tmp_path_factory):
    d = tmp_path_factory.mktemp("elk")
    _write_geometry(d / "GEOMETRY.OUT")
    _write_state(d / "STATE.OUT")
    return ElkField.from_files(str(d / "STATE.OUT"), str(d / "GEOMETRY.OUT"))


def _exact(x):
    return 2.0 + np.cos(Q * x[:, 0])


def test_reader(field):
    assert field.lmax == LMAX
    assert abs(field.rmt[0] - RMT) < 1e-12
    assert np.allclose(np.asarray(field.P), np.diag([A0] * 3))


def test_interstitial(field):
    rng = np.random.default_rng(1)
    x = rng.uniform(2.5, 5.5, (64, 3))
    f, _, _ = field.grd(x, nder=0)
    assert np.allclose(np.asarray(f), _exact(x), atol=1e-10)


def test_muffin_tin(field):
    rng = np.random.default_rng(2)
    u = rng.normal(size=(64, 3))
    u /= np.linalg.norm(u, axis=1)[:, None]
    x = u * rng.uniform(0.05, 0.95 * RMT, (64, 1))
    f, _, _ = field.grd(x, nder=0)
    err = np.max(np.abs(np.asarray(f) - _exact(x)))
    assert err < 1e-6, err


def test_continuity(field):
    rng = np.random.default_rng(3)
    u = rng.normal(size=(32, 3))
    u /= np.linalg.norm(u, axis=1)[:, None]
    fin, _, _ = field.grd(u * (RMT - 1e-6), nder=0)
    fout, _, _ = field.grd(u * (RMT + 1e-6), nder=0)
    assert np.max(np.abs(np.asarray(fin) - np.asarray(fout))) < 1e-5


@pytest.mark.slow
def test_derivatives(field):
    pts = np.array([[0.9, 0.3, 0.2],
                    [1.2, 0.4, 1.0],
                    [4.0, 3.5, 2.8]])
    f, gf, h6 = field.grd(pts, nder=2)
    gf = np.asarray(gf)
    h6 = np.asarray(h6)
    x = pts[:, 0]
    assert np.allclose(gf[0], -Q * np.sin(Q * x), atol=3e-5)
    assert np.allclose(gf[1], 0.0, atol=3e-5)
    assert np.allclose(gf[2], 0.0, atol=3e-5)
    assert np.allclose(h6[0], -Q * Q * np.cos(Q * x), atol=3e-4)
    assert np.allclose(h6[3], 0.0, atol=3e-4)


def test_nuclear_gradient_null(field):
    f, gf, _ = field.grd(np.array([[1e-6, 0.0, 0.0]]), nder=1)
    assert np.allclose(np.asarray(gf)[:, 0], 0.0)


@pytest.mark.slow
def test_system_integration(tmp_path):
    _write_geometry(tmp_path / "GEOMETRY.OUT")
    _write_state(tmp_path / "STATE.OUT")
    from critic2_tpu import System
    s = System.from_structure(str(tmp_path / "GEOMETRY.OUT"))
    assert abs(s.crystal.volume - A0 ** 3) < 1e-8
    fid = s.load_field(str(tmp_path / "STATE.OUT"))
    s.iref = fid
    pts = np.array([[4.0, 4.0, 4.0], [1.0, 0.3, 0.4]])
    r = s.ref.grd(pts, nder=2)
    assert np.allclose(np.asarray(r.f), _exact(pts), atol=1e-7)
    v = s.eval_expr("2*$1", pts)
    assert np.allclose(np.asarray(v), 2 * _exact(pts), atol=1e-7)
