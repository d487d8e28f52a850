"""WIEN2k LAPW evaluator: synthetic-field parity in both zones.

The hermetic field is rho(x) = 2 + cos(q z) with q = 2 pi / a:
  - interstitial: plane waves (0,0,0), (0,0,+-1),
  - muffin tin: the exact Rayleigh expansion cos(qz) =
    sum_{l even} (-1)^{l/2} sqrt(4 pi (2l+1)) j_l(qr) Y_l0(x^),
written to synthetic .struct/.clmsum files in the reference's fixed
formats (src/wien_private@proc.f90:476-918), so the test covers the
parsers, the radial Lagrange scheme, the real-harmonics conventions,
the interstitial star sum, MT/interstitial continuity at Rmt
(TESTRMT-style), and the autodiff gradients/Hessians.
"""
import math
import os

import numpy as np
import pytest
from scipy.special import spherical_jn

from critic2_tpu.fields.wien import WienField, read_struct

A0 = 8.0      # cubic lattice parameter (bohr)
RMT = 2.0
JRI = 401
RNOT = 1e-4
Q = 2.0 * math.pi / A0
SQFP = math.sqrt(4.0 * math.pi)


def _write_struct(path):
    lines = []
    lines.append("synthetic cosine field")
    lines.append(f"{'P':<4s}{'LATTICE,NONEQUIV.ATOMS':<23s}{1:>3d} {'NREL':<4s}")
    lines.append("MODE OF CALC=RELA unit=bohr")
    lines.append(f"{A0:10.5f}{A0:10.5f}{A0:10.5f}{90.0:10.5f}{90.0:10.5f}{90.0:10.5f}")
    lines.append(f"{'ATOM':<4s}{-1:>4d}{': X=':<4s}{0.0:10.7f}{' Y=':<3s}{0.0:10.7f}{' Z=':<3s}{0.0:10.7f}")
    lines.append(f"{'MULT=':>15s}{1:>2d}")
    lines.append(f"{'X':<10s}{'NPT=':>5s}{JRI:>5d}{'R0=':>5s}{RNOT:10.8f}{'RMT=':>5s}{RMT:10.5f}{'Z:':>5s}{8.0:5.1f}")
    for j in range(3):
        row = [1.0 if i == j else 0.0 for i in range(3)]
        lines.append(f"{'LOCAL ROT MATRIX:':<20s}" + "".join(f"{v:10.8f}" for v in row))
    lines.append(f"{1:>4d}")
    for j in range(3):
        iz = [1 if i == j else 0 for i in range(3)]
        lines.append(f"{iz[0]:2d}{iz[1]:2d}{iz[2]:2d}{0.0:10.5f}")
    lines.append(f"{1:>8d}")
    open(path, "w").write("\n".join(lines) + "\n")


def _write_clmsum(path, lmax=12):
    r = RNOT * np.exp(np.arange(JRI) * math.log(RMT / RNOT) / (JRI - 1))
    ls = [l for l in range(0, lmax + 1, 2)]
    lines = ["head1", "head2", "head3"]        # FORMAT(//) skips 3
    lines.append("skip")                       # leading / of 118
    lines.append(f"{'NUMBER OF LM':<15s}{len(ls):>3d}")
    lines += ["skip", "skip"]                  # trailing //
    for l in ls:
        # c_l(r): cos(q z) Rayleigh coefficient (+ the constant at l=0)
        cl = (-1.0) ** (l // 2) * math.sqrt(4 * math.pi * (2 * l + 1)) \
            * spherical_jn(l, Q * r)
        if l == 0:
            cl = cl + 2.0 * SQFP
        vals = cl * r * r
        if l == 0:
            vals = vals * SQFP                 # reader divides by sqrt(4pi)
        lines.append(" " * 15 + f"{l:3d}" + " " * 5 + f"{0:2d}")
        lines.append("skip")                   # trailing / of 2010
        for k in range(0, JRI, 4):
            lines.append("   " + "".join(f"{v:19.12E}" for v in vals[k:k + 4]))
        lines += ["skip", "skip"]              # FORMAT(/) consumes 2
    lines += ["skip"] * 4                      # FORMAT(///)
    # plane waves
    lines += ["skip", "skip"]                  # leading // of 117
    waves = [((0, 0, 0), 2.0), ((0, 0, 1), 0.5), ((0, 0, -1), 0.5)]
    lines.append(" " * 13 + f"{len(waves):6d}")
    for (k, s) in waves:
        lines.append("   " + "".join(f"{v:5d}" for v in k)
                     + f"{s:19.12E}" + f"{0.0:19.12E}")
    open(path, "w").write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def field(tmp_path_factory):
    d = tmp_path_factory.mktemp("wien")
    _write_struct(d / "syn.struct")
    _write_clmsum(d / "syn.clmsum")
    return WienField.from_files(str(d / "syn.clmsum"), str(d / "syn.struct"))


def _rho_exact(x):
    return 2.0 + np.cos(Q * x[:, 2])


def test_struct_parser(field):
    st = field.st
    assert st["nat"] == 1 and st["niord"] == 1
    assert np.allclose(st["br1"], np.diag([A0, A0, A0]))
    assert st["ortho"]
    assert st["jri"][0] == JRI and abs(st["rmt"][0] - RMT) < 1e-12


def test_interstitial_values(field):
    rng = np.random.default_rng(1)
    x = rng.uniform(2.5, 5.5, (64, 3))       # all outside the MT
    f, _, _ = field.grd(x, nder=0)
    assert np.allclose(np.asarray(f), _rho_exact(x), atol=1e-10)


def test_muffin_tin_values(field):
    rng = np.random.default_rng(2)
    v = rng.normal(size=(64, 3))
    v = v / np.linalg.norm(v, axis=1)[:, None] \
        * rng.uniform(0.05, 0.95 * RMT, (64, 1))
    f, _, _ = field.grd(v, nder=0)
    err = np.max(np.abs(np.asarray(f) - _rho_exact(v)))
    assert err < 5e-7, err                    # radial-interp limited


def test_continuity_at_rmt(field):
    # TESTRMT analogue: values just inside and outside Rmt must agree
    rng = np.random.default_rng(3)
    u = rng.normal(size=(32, 3))
    u = u / np.linalg.norm(u, axis=1)[:, None]
    fin, _, _ = field.grd(u * (RMT - 1e-6), nder=0)
    fout, _, _ = field.grd(u * (RMT + 1e-6), nder=0)
    assert np.max(np.abs(np.asarray(fin) - np.asarray(fout))) < 1e-5


@pytest.mark.slow
def test_derivatives_both_zones(field):
    pts = np.array([[0.3, 0.2, 0.9],          # MT
                    [1.0, 0.4, 1.2],          # MT
                    [3.5, 4.0, 2.8],          # interstitial
                    [5.0, 2.0, 6.0]])         # interstitial
    f, gf, h6 = field.grd(pts, nder=2)
    gf = np.asarray(gf)
    h6 = np.asarray(h6)
    z = pts[:, 2]
    # exact: grad = (0, 0, -q sin(qz)); hess zz = -q^2 cos(qz)
    assert np.allclose(gf[0], 0.0, atol=2e-5)
    assert np.allclose(gf[1], 0.0, atol=2e-5)
    assert np.allclose(gf[2], -Q * np.sin(Q * z), atol=2e-5)
    assert np.allclose(h6[5], -Q * Q * np.cos(Q * z), atol=2e-4)
    assert np.allclose(h6[0], 0.0, atol=2e-4)
    assert np.allclose(h6[1], 0.0, atol=2e-4)


def test_periodic_images(field):
    # evaluation far outside the home cell must wrap correctly
    x = np.array([[0.5, 0.1, 0.7]])
    xs = x + np.array([[2 * A0, -A0, 3 * A0]])
    f1, _, _ = field.grd(x, nder=0)
    f2, _, _ = field.grd(xs, nder=0)
    assert abs(float(f1[0]) - float(f2[0])) < 1e-10


@pytest.mark.slow
def test_nuclear_capture(field):
    f, gf, h6 = field.grd(np.array([[0.0, 0.0, 1e-6]]), nder=2)
    assert float(np.asarray(gf)[2, 0]) == 0.0
    assert float(np.asarray(h6)[0, 0]) == -1e15


@pytest.mark.slow
def test_system_integration(tmp_path):
    _write_struct(tmp_path / "syn.struct")
    _write_clmsum(tmp_path / "syn.clmsum")
    from critic2_tpu import System
    s = System.from_structure(str(tmp_path / "syn.struct"))
    assert abs(s.crystal.volume - A0 ** 3) < 1e-8
    fid = s.load_field(str(tmp_path / "syn.clmsum"))
    s.iref = fid
    pts = np.array([[4.0, 4.0, 4.0], [3.0, 1.0, 2.0]])
    r = s.ref.grd(pts, nder=2)
    assert np.allclose(np.asarray(r.f), _rho_exact(pts), atol=1e-8)
    # expression engine over the LAPW field
    v = s.eval_expr("$1+1", pts)
    assert np.allclose(np.asarray(v), _rho_exact(pts) + 1.0, atol=1e-8)


@pytest.mark.slow
def test_cli_wien(tmp_path):
    _write_struct(tmp_path / "syn.struct")
    _write_clmsum(tmp_path / "syn.clmsum")
    import io
    from critic2_tpu.cli import Repl
    out = io.StringIO()
    it = Repl(out=out)
    it.run_script(f"crystal {tmp_path}/syn.struct\n"
                  f"load {tmp_path}/syn.clmsum {tmp_path}/syn.struct\n"
                  "point 0.5 0.5 0.5\n"
                  "testrmt\n")
    text = out.getvalue()
    assert "type wien" in text
    assert "TESTRMT" in text
    assert it.nwarns == 0, text
