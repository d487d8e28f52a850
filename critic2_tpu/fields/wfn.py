"""Molecular wavefunctions: readers + batched GTO evaluation on device.

Role of the reference wfn_private (src/wfn_private.f90, @proc.F90):
read .wfn/.wfx/.fchk molecular wavefunctions into primitive Cartesian
Gaussians phi_p = x^a y^b z^c exp(-alpha r^2) with MO coefficients, and
evaluate rho / grad / Hessian / G(r) / virial at points (rho2,
src/wfn_private@proc.F90:2032-2228).

TPU decomposition of the hot loop (calculate_mo_gto, :2707-2781): the
per-point neighbor-list loop over primitives becomes a dense
points x primitives computation - the 10 derivative components chi_d are
(P, N) arrays built on the VPU, and the MO contractions
phi_d = C (M, P) @ chi_d (P, N) are MXU matmuls. Distance screening is a
multiplicative exp(-alpha r^2) underflow, not a dynamic list, so shapes
stay static. Density assembly follows rho2 exactly: rho = sum occ phi^2,
grad = 2 sum occ phi dphi, H from phi d2phi + dphi dphi, gkin = 1/2 sum
occ |dphi|^2, stress_ij = 1/2 sum occ (phi phi_ij - phi_i phi_j), vir =
tr(stress).

Primitive type convention = AIMPAC (li table,
src/wfn_private@proc.F90:2695-2705); fchk shells are expanded to
normalized primitives exactly as read_fchk does (gnorm, typtrans,
basis-function renormalization, :1230-1300).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Wavefunction"]


def _morton3(cell):
    """Morton (Z-order) code of non-negative integer cells (N, 3):
    interleaves the low 21 bits of each axis so lexicographic order is
    spatially local (used to keep screening blocks/chunks compact)."""
    c = np.asarray(cell, dtype=np.uint64)

    def spread(v):
        v = v & np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return ((spread(c[:, 0]) << np.uint64(2))
            | (spread(c[:, 1]) << np.uint64(1)) | spread(c[:, 2]))

# AIMPAC primitive type -> cartesian powers (reference li table)
_LI = np.array([
    (0, 0, 0),
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (2, 0, 0), (0, 2, 0), (0, 0, 2), (1, 1, 0), (1, 0, 1), (0, 1, 1),
    (3, 0, 0), (0, 3, 0), (0, 0, 3), (2, 1, 0), (2, 0, 1), (0, 2, 1),
    (1, 2, 0), (1, 0, 2), (0, 1, 2), (1, 1, 1),
    (4, 0, 0), (0, 4, 0), (0, 0, 4), (3, 1, 0), (3, 0, 1), (1, 3, 0),
    (0, 3, 1), (1, 0, 3), (0, 1, 3), (2, 2, 0), (2, 0, 2), (0, 2, 2),
    (2, 1, 1), (1, 2, 1), (1, 1, 2),
    (0, 0, 5), (0, 1, 4), (0, 2, 3), (0, 3, 2), (0, 4, 1), (0, 5, 0),
    (1, 0, 4), (1, 1, 3), (1, 2, 2), (1, 3, 1), (1, 4, 0), (2, 0, 3),
    (2, 1, 2), (2, 2, 1), (2, 3, 0), (3, 0, 2), (3, 1, 1), (3, 2, 0),
    (4, 0, 1), (4, 1, 0), (5, 0, 0),
], dtype=np.int32)   # types 1..56 (0-indexed row = type-1; h block
                     # order matches the reference li table,
                     # src/wfn_private@proc.F90:2695-2705)

_DFACM1 = np.array([1, 1, 1, 2, 3, 8, 15, 48, 105, 384, 945],
                   dtype=float)   # (n-1)!! for n = 0..10

# fchk in-shell primitive order -> AIMPAC type (reference typtrans,
# src/wfn_private@proc.F90 read_fchk)
_TYPTRANS = np.array([
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17, 14, 15, 18, 19, 16, 20,
    23, 29, 32, 27, 22, 28, 35, 34, 26, 31, 33, 30, 25, 24, 21],
    dtype=np.int32)

# molden in-shell order -> AIMPAC type: identical through f; the molden
# g cartesian order IS the AIMPAC order (reference typtrans,
# src/wfn_private@proc.F90:1503-1509)
_TYPTRANS_MOLDEN = np.array(
    list(_TYPTRANS[:20]) + list(range(21, 36)), dtype=np.int32)

# first/last fchk in-shell type index per |l| (reference jshl0/jshl1, 1-based)
_JSHL0 = {0: 1, 1: 2, 2: 5, 3: 11, 4: 21}
_JSHL1 = {0: 1, 1: 4, 2: 10, 3: 20, 4: 35}
_NSHLT_CAR = {0: 1, 1: 3, 2: 6, 3: 10, 4: 15}
_NSHLT_SPH = {0: 1, 1: 3, 2: 5, 3: 7, 4: 9}


def _gnorm(ityp: int, a: float) -> float:
    """Primitive normalization (reference gnorm,
    src/wfn_private@proc.F90:2877-2933)."""
    lx, ly, lz = _LI[ityp - 1]
    l = int(lx + ly + lz)
    dd = _DFACM1[2 * lx] * _DFACM1[2 * ly] * _DFACM1[2 * lz]
    return (2.0 ** (3.0 / 4.0 + l) * a ** (3.0 / 4.0 + l / 2.0)
            / np.pi ** (3.0 / 4.0) / np.sqrt(dd))


def _sph_to_car(l: int, order: str = "fchk") -> np.ndarray:
    """(nsph, ncar) solid-harmonic -> cartesian-product matrices
    (reference dsphcar/fsphcar/gsphcar{,_fchk}).  Rows are m = 0, 1,
    -1, 2, -2, ...; columns follow the file format's in-shell cartesian
    component order.  fchk and molden agree for d and f; only the g
    cartesian order differs (`order` selects it)."""
    s3 = np.sqrt(3.0); s3_8 = np.sqrt(3 / 8); s5_8 = np.sqrt(5 / 8)
    s6 = np.sqrt(6.0); s15 = np.sqrt(15.0); s15_4 = np.sqrt(15 / 4)
    s45_8 = np.sqrt(45 / 8)
    if l == 2:
        # fchk cartesian order: xx yy zz xy xz yz; sph: 0 1 -1 2 -2
        m = np.zeros((5, 6))
        s3_4 = np.sqrt(3 / 4)
        m[:, 0] = [-0.5, 0, 0, s3_4, 0]     # xx
        m[:, 1] = [-0.5, 0, 0, -s3_4, 0]    # yy
        m[:, 2] = [1.0, 0, 0, 0, 0]         # zz
        m[:, 3] = [0, 0, 0, 0, s3]          # xy
        m[:, 4] = [0, s3, 0, 0, 0]          # xz
        m[:, 5] = [0, 0, s3, 0, 0]          # yz
        return m
    if l == 3:
        # fchk cartesian order: xxx yyy zzz xyy xxy xxz xzz yzz yyz xyz
        m = np.zeros((7, 10))
        m[:, 0] = [0, -s3_8, 0, 0, 0, s5_8, 0]      # xxx
        m[:, 1] = [0, 0, -s3_8, 0, 0, 0, -s5_8]     # yyy
        m[:, 2] = [1, 0, 0, 0, 0, 0, 0]             # zzz
        m[:, 3] = [0, -s3_8, 0, 0, 0, -s45_8, 0]    # xyy
        m[:, 4] = [0, 0, -s3_8, 0, 0, 0, s45_8]     # xxy
        m[:, 5] = [-1.5, 0, 0, s15_4, 0, 0, 0]      # xxz
        m[:, 6] = [0, s6, 0, 0, 0, 0, 0]            # xzz
        m[:, 7] = [0, 0, s6, 0, 0, 0, 0]            # yzz
        m[:, 8] = [-1.5, 0, 0, -s15_4, 0, 0, 0]     # yyz
        m[:, 9] = [0, 0, 0, 0, s15, 0, 0]           # xyz
        return m
    if l == 4:
        d38 = 3 / 8; d34 = 3 / 4
        s5_16 = np.sqrt(5 / 16); s35_64 = np.sqrt(35 / 64)
        s10_8 = np.sqrt(10 / 8); s35_4 = np.sqrt(35 / 4)
        s35_8 = np.sqrt(35 / 8); s10 = np.sqrt(10.0)
        s45_4 = np.sqrt(45 / 4); s45 = np.sqrt(45.0)
        s315_8 = np.sqrt(315 / 8); s315_16 = np.sqrt(315 / 16)
        # fchk cart order: zzzz yzzz yyzz yyyz yyyy xzzz xyzz xyyz xyyy
        #                  xxzz xxyz xxyy xxxz xxxy xxxx
        m = np.zeros((9, 15))
        m[:, 0] = [1, 0, 0, 0, 0, 0, 0, 0, 0]                    # zzzz
        m[:, 1] = [0, 0, s10, 0, 0, 0, 0, 0, 0]                  # yzzz
        m[:, 2] = [-3, 0, 0, -s45_4, 0, 0, 0, 0, 0]              # yyzz
        m[:, 3] = [0, 0, -s45_8, 0, 0, 0, -s35_8, 0, 0]          # yyyz
        m[:, 4] = [d38, 0, 0, s5_16, 0, 0, 0, s35_64, 0]         # yyyy
        m[:, 5] = [0, s10, 0, 0, 0, 0, 0, 0, 0]                  # xzzz
        m[:, 6] = [0, 0, 0, 0, s45, 0, 0, 0, 0]                  # xyzz
        m[:, 7] = [0, -s45_8, 0, 0, 0, -s315_8, 0, 0, 0]         # xyyz
        m[:, 8] = [0, 0, 0, 0, -s10_8, 0, 0, 0, -s35_4]          # xyyy
        m[:, 9] = [-3, 0, 0, s45_4, 0, 0, 0, 0, 0]               # xxzz
        m[:, 10] = [0, 0, -s45_8, 0, 0, 0, s315_8, 0, 0]         # xxyz
        m[:, 11] = [d34, 0, 0, 0, 0, 0, 0, -s315_16, 0]          # xxyy
        m[:, 12] = [0, -s45_8, 0, 0, 0, s35_8, 0, 0, 0]          # xxxz
        m[:, 13] = [0, 0, 0, 0, -s10_8, 0, 0, 0, s35_4]          # xxxy
        m[:, 14] = [d38, 0, 0, -s5_16, 0, 0, 0, s35_64, 0]       # xxxx
        if order == "molden":
            # molden g cartesian order (reference gsphcar,
            # src/wfn_private@proc.F90:98-101): permute the fchk columns
            # xxxx yyyy zzzz xxxy xxxz xyyy yyyz xzzz yzzz xxyy xxzz
            # yyzz xxyz xyyz xyzz
            perm = [14, 4, 0, 13, 12, 8, 3, 5, 1, 11, 9, 2, 10, 7, 6]
            m = m[:, perm]
        return m
    raise ValueError(f"no spherical transform for l={l}")


def _shells_to_primitives(sh_l, sh_at, sh_exp, sh_cc, mo_sph,
                          order: str = "fchk"):
    """Expand contracted shells to normalized primitives and per-primitive
    MO coefficients (the tail of reference read_fchk/read_molden,
    src/wfn_private@proc.F90:1230-1300 and :1400-1425).

    sh_l: signed shell l (negative = spherical, except -1 which the
    caller unfolds to s+p); sh_at: 1-based atom; sh_exp/sh_cc: primitive
    exponents/contraction coefficients per shell; mo_sph: (M, nbas) MO
    coefficients over the shells' basis functions in shell order (both
    fchk and molden use the same in-shell cartesian component orders for
    d/f, the matrices _sph_to_car rows).
    Returns (icenter, itype, e, cmo).
    """
    icenter, itype, e, cmo_cols = [], [], [], []
    ns = 0
    for s in range(len(sh_l)):
        lsig = sh_l[s]
        l = abs(lsig)
        ee = np.asarray(sh_exp[s])
        cc = np.asarray(sh_cc[s])
        npr = len(ee)
        ncar = _NSHLT_CAR[l]
        nsph = _NSHLT_SPH[l] if lsig < -1 else ncar
        mo_blk = mo_sph[:, ns:ns + nsph]            # (M, nsph)
        if lsig < -1:
            mo_car = mo_blk @ _sph_to_car(l, order)  # (M, ncar)
        else:
            mo_car = mo_blk
        ns += nsph

        tt = _TYPTRANS if order == "fchk" else _TYPTRANS_MOLDEN
        for jj, j in enumerate(range(_JSHL0[l], _JSHL1[l] + 1)):
            ityp = int(tt[j - 1])
            cn = np.array([cc[k] * _gnorm(ityp, ee[k])
                           for k in range(npr)])
            # basis-function normalization (reference :1247-1258)
            norm = 0.0
            for k1 in range(npr):
                for k2 in range(npr):
                    norm += cn[k1] * cn[k2] / \
                        (ee[k1] + ee[k2]) ** (l + 1.5)
            cons = np.pi ** 1.5 * _DFACM1[2 * l] / 2 ** l
            norm = 1.0 / np.sqrt(norm * cons)
            if lsig >= 0:
                if 8 <= ityp <= 10:
                    norm *= np.sqrt(3.0)
                elif 14 <= ityp <= 19:
                    norm *= np.sqrt(5.0)
                elif ityp == 20:
                    norm *= np.sqrt(15.0)
                elif 24 <= ityp <= 29:
                    norm *= np.sqrt(7.0)
                elif 30 <= ityp <= 32:
                    norm *= np.sqrt(35.0 / 3.0)
                elif 33 <= ityp <= 35:
                    norm *= np.sqrt(35.0)
            for k in range(npr):
                icenter.append(sh_at[s] - 1)
                itype.append(ityp)
                e.append(ee[k])
                cmo_cols.append(cn[k] * norm * mo_car[:, jj])

    return (np.asarray(icenter, dtype=np.int32),
            np.asarray(itype, dtype=np.int32),
            np.asarray(e), np.stack(cmo_cols, axis=1))


class _ScreenShim:
    """eval_fn duck-type (see fields/field.py _build_eval_fn) wrapping
    the screened GTO kernel for ops.newton/ops.ode consumers."""

    __slots__ = ("_c2t_raw", "_c2t_consts", "_c2t_loop")

    def __init__(self, raw, consts):
        self._c2t_raw = raw
        self._c2t_consts = consts
        self._c2t_loop = "fori"      # matmuls + selects: gather-safe

    def __call__(self, xT):
        return self._c2t_raw(self._c2t_consts, xT)


@dataclass
class Wavefunction:
    """Primitive-expanded molecular wavefunction (GTO)."""

    atpos: np.ndarray          # (nat, 3) Cartesian bohr
    atz: np.ndarray            # (nat,)
    icenter: np.ndarray        # (P,) 0-based atom index per primitive
    itype: np.ndarray          # (P,) AIMPAC type (1-based)
    e: np.ndarray              # (P,) exponents
    cmo: np.ndarray            # (M, P) MO coefficients (primitive basis)
    occ: np.ndarray            # (M,) occupations
    wfntyp: str = "rhf"        # rhf | uhf | frac
    nalpha: int = 0
    source: str = ""
    # EDF core density (ECP wavefunctions; reference calculate_edf)
    edf_icenter: np.ndarray = None   # (Pc,) 0-based atom index
    edf_itype: np.ndarray = None     # (Pc,) AIMPAC type
    edf_e: np.ndarray = None         # (Pc,) exponents
    edf_c: np.ndarray = None         # (Pc,) coefficients
    # device cache
    _dev: dict = dfield(default_factory=dict, repr=False)

    @property
    def nmo(self):
        return self.cmo.shape[0]

    @property
    def npri(self):
        return self.cmo.shape[1]

    @property
    def nelec(self):
        return float(np.sum(self.occ))

    # ------------------------------------------------------------------
    def _device(self):
        if not self._dev:
            # host numpy, NOT jnp: the first call may happen under an
            # outer jit trace (e.g. the AUTO newton batch), where
            # jnp.asarray would cache TRACERS into self._dev and break
            # every later (or even the current) trace.  numpy constants
            # are concrete in any context and jit embeds them.
            li = _LI[self.itype - 1]               # (P, 3)
            self._dev = dict(
                ctr=np.asarray(self.atpos)[self.icenter],    # (P, 3)
                lx=np.ascontiguousarray(li.T),               # (3, P)
                al=np.asarray(self.e),
                C=np.asarray(self.cmo),
                occ=np.asarray(self.occ),
            )
            if self.edf_e is not None:
                lie = _LI[self.edf_itype - 1]
                self._dev.update(
                    ectr=np.asarray(self.atpos)[self.edf_icenter],
                    elx=np.ascontiguousarray(lie.T),
                    eal=np.asarray(self.edf_e),
                    ec=np.asarray(self.edf_c),
                )
        return self._dev

    def eval_closure(self, nder: int = 2, extras: bool = False,
                     dtype=None):
        """Build a jittable SoA closure xT (3, N) -> outputs.

        Without extras: (rho, grad (3, N), h6 (6, N)).
        With extras: dict with rho, grad, h6, gkin, vir, stress6.

        dtype=jnp.float32 selects the mixed-precision path: primitive
        displacements are formed in f64 (position accuracy) then cast,
        the (P, N) elementwise stage and the C@chi MXU matmuls run f32
        at Precision.HIGHEST, and every occ-contraction accumulates in
        f64.  On the v5e every f64 vector op is emulated (~10x f32), so
        this is the fast sweep for visualization-grade workloads (CUBE,
        grids); measured pointwise relative rho error ~2e-6 (f32
        accumulation over the P-primitive contraction), so QUADRATURE
        SUMS should use the f64 path - the benzene ultra-mesh NELEC
        picks up a 7e-5 e systematic bias in f32 vs 1.7e-7 e quadrature
        error in f64 (reference rho2 hot loop:
        src/wfn_private@proc.F90:2032-2228).
        """
        d = self._device()
        ctrT, lx, al, C, occ = d["ctr"].T, d["lx"], d["al"], d["C"], d["occ"]
        has_edf = "eal" in d
        if has_edf:
            ectrT, elx, eal, ec = (d["ectr"].T, d["elx"], d["eal"],
                                   d["ec"])
            enmax = int(np.max(np.asarray(elx))) + 2

        nmax = int(np.max(np.asarray(lx))) + 2

        lowp = dtype is not None and np.dtype(dtype) != np.float64
        if lowp:
            al = np.asarray(al, dtype)
            C = np.asarray(C, dtype)
            if has_edf:
                eal = np.asarray(eal, dtype)
                ec = np.asarray(ec, dtype)
        occ = np.asarray(occ, np.float64)
        # f64 accumulation of the occupied-MO contractions: (M, N) is
        # small (M ~ tens) next to the (P, N) primitive stage
        acc = (lambda v: v.astype(jnp.float64)) if lowp else (lambda v: v)
        psum = (lambda v: v.sum(0, dtype=jnp.float64)) if lowp \
            else (lambda v: v.sum(0))
        prec = jax.lax.Precision.HIGHEST

        def pows(V):
            # shared power table V^k, k = 0..nmax, built ONCE per
            # direction and reused by every exponent selection below
            # (a per-call multiply chain kept ~200 (P, N) temporaries
            # live in large-assembly programs - see screened_closure)
            out = [jnp.ones_like(V), V]
            for _ in range(2, nmax + 1):
                out.append(out[-1] * V)
            return out

        def pw(pV, n):
            # pV[n] for per-primitive int exponents n (P,), 0 for n < 0.
            # Integer-select powers: the XLA pow lowering on the
            # v5e returns NaN for subnormal bases with zero exponents
            # (pow(1e-320, 0) = NaN), which poisons near-nucleus mesh
            # points; selects over the exact product table avoid pow
            # entirely and are exact in f64.
            nb = n[:, None]
            out = jnp.where(nb == 0, 1.0, 0.0)
            for k in range(1, nmax + 1):
                out = jnp.where(nb == k, pV[k], out)
            return out

        def fn(xT):
            # per-primitive displacements (3, P, N): formed in f64 even
            # on the f32 path (casting xT first would shift positions
            # by ~1e-7 bohr, a 1e-6-relative rho error near nuclei)
            dx = xT[:, None, :] - ctrT[:, :, None]
            if lowp:
                dx = dx.astype(dtype)
            r2 = (dx * dx).sum(0)                          # (P, N)
            ex = jnp.exp(-al[:, None] * r2)
            X, Y, Z = dx[0], dx[1], dx[2]
            a, b, c = lx[0], lx[1], lx[2]
            pX, pY, pZ = pows(X), pows(Y), pows(Z)
            xa, yb, zc = pw(pX, a), pw(pY, b), pw(pZ, c)
            chi0 = xa * yb * zc * ex
            phi0 = jnp.matmul(C, chi0, precision=prec)      # (M, N) matmul
            rho = occ @ acc(phi0 * phi0)
            N = xT.shape[1]

            # EDF core density: rho_c = sum_p c_p x^l y^m z^n e^{-a r^2}
            # (reference calculate_edf; coefficients are raw, no gnorm)
            if has_edf:
                def pwe(X, n):
                    nb = n[:, None]
                    out = jnp.where(nb == 0, 1.0, 0.0)
                    Xk = X
                    for k in range(1, enmax + 1):
                        out = jnp.where(nb == k, Xk, out)
                        Xk = Xk * X
                    return out

                dxe = xT[:, None, :] - ectrT[:, :, None]    # (3, Pc, N)
                if lowp:
                    dxe = dxe.astype(dtype)
                r2e = (dxe * dxe).sum(0)
                exe = ec[:, None] * jnp.exp(-eal[:, None] * r2e)
                Xe, Ye, Ze = dxe[0], dxe[1], dxe[2]
                ae, be, ce_ = elx[0], elx[1], elx[2]
                xae, ybe, zce = pwe(Xe, ae), pwe(Ye, be), pwe(Ze, ce_)
                rho = rho + psum(xae * ybe * zce * exe)
            if nder < 1 and not extras:
                return rho, jnp.zeros((3, N)), jnp.zeros((6, N))

            dxa = a[:, None] * pw(pX, a - 1) \
                - 2.0 * al[:, None] * pw(pX, a + 1)
            dyb = b[:, None] * pw(pY, b - 1) \
                - 2.0 * al[:, None] * pw(pY, b + 1)
            dzc = c[:, None] * pw(pZ, c - 1) \
                - 2.0 * al[:, None] * pw(pZ, c + 1)
            phix = jnp.matmul(C, dxa * yb * zc * ex, precision=prec)
            phiy = jnp.matmul(C, xa * dyb * zc * ex, precision=prec)
            phiz = jnp.matmul(C, xa * yb * dzc * ex, precision=prec)
            grad = jnp.stack([occ @ acc(phi0 * phix),
                              occ @ acc(phi0 * phiy),
                              occ @ acc(phi0 * phiz)]) * 2.0
            if has_edf:
                edxa = ae[:, None] * pwe(Xe, ae - 1) \
                    - 2.0 * eal[:, None] * pwe(Xe, ae + 1)
                edyb = be[:, None] * pwe(Ye, be - 1) \
                    - 2.0 * eal[:, None] * pwe(Ye, be + 1)
                edzc = ce_[:, None] * pwe(Ze, ce_ - 1) \
                    - 2.0 * eal[:, None] * pwe(Ze, ce_ + 1)
                grad = grad + jnp.stack([
                    psum(edxa * ybe * zce * exe),
                    psum(xae * edyb * zce * exe),
                    psum(xae * ybe * edzc * exe)])
            gkin = 0.5 * (occ @ acc(phix * phix + phiy * phiy
                                    + phiz * phiz))
            if nder < 2 and not extras:
                return rho, grad, jnp.zeros((6, N))

            al2 = 2.0 * al[:, None]
            sxa = (a * (a - 1))[:, None] * pw(pX, a - 2) \
                - al2 * (2 * a + 1)[:, None] * xa \
                + 4.0 * al[:, None] ** 2 * pw(pX, a + 2)
            syb = (b * (b - 1))[:, None] * pw(pY, b - 2) \
                - al2 * (2 * b + 1)[:, None] * yb \
                + 4.0 * al[:, None] ** 2 * pw(pY, b + 2)
            szc = (c * (c - 1))[:, None] * pw(pZ, c - 2) \
                - al2 * (2 * c + 1)[:, None] * zc \
                + 4.0 * al[:, None] ** 2 * pw(pZ, c + 2)
            phixx = jnp.matmul(C, sxa * yb * zc * ex, precision=prec)
            phiyy = jnp.matmul(C, xa * syb * zc * ex, precision=prec)
            phizz = jnp.matmul(C, xa * yb * szc * ex, precision=prec)
            phixy = jnp.matmul(C, dxa * dyb * zc * ex, precision=prec)
            phixz = jnp.matmul(C, dxa * yb * dzc * ex, precision=prec)
            phiyz = jnp.matmul(C, xa * dyb * dzc * ex, precision=prec)
            h6 = jnp.stack([
                2.0 * (occ @ acc(phi0 * phixx + phix * phix)),
                2.0 * (occ @ acc(phi0 * phiyy + phiy * phiy)),
                2.0 * (occ @ acc(phi0 * phizz + phiz * phiz)),
                2.0 * (occ @ acc(phi0 * phixy + phix * phiy)),
                2.0 * (occ @ acc(phi0 * phixz + phix * phiz)),
                2.0 * (occ @ acc(phi0 * phiyz + phiy * phiz)),
            ])
            if has_edf:
                eal2 = 2.0 * eal[:, None]
                esxa = (ae * (ae - 1))[:, None] * pwe(Xe, ae - 2) \
                    - eal2 * (2 * ae + 1)[:, None] * xae \
                    + 4.0 * eal[:, None] ** 2 * pwe(Xe, ae + 2)
                esyb = (be * (be - 1))[:, None] * pwe(Ye, be - 2) \
                    - eal2 * (2 * be + 1)[:, None] * ybe \
                    + 4.0 * eal[:, None] ** 2 * pwe(Ye, be + 2)
                eszc = (ce_ * (ce_ - 1))[:, None] * pwe(Ze, ce_ - 2) \
                    - eal2 * (2 * ce_ + 1)[:, None] * zce \
                    + 4.0 * eal[:, None] ** 2 * pwe(Ze, ce_ + 2)
                h6 = h6 + jnp.stack([
                    psum(esxa * ybe * zce * exe),
                    psum(xae * esyb * zce * exe),
                    psum(xae * ybe * eszc * exe),
                    psum(edxa * edyb * zce * exe),
                    psum(edxa * ybe * edzc * exe),
                    psum(xae * edyb * edzc * exe)])
            if not extras:
                return rho, grad, h6
            s6 = 0.5 * jnp.stack([
                occ @ acc(phi0 * phixx - phix * phix),
                occ @ acc(phi0 * phiyy - phiy * phiy),
                occ @ acc(phi0 * phizz - phiz * phiz),
                occ @ acc(phi0 * phixy - phix * phiy),
                occ @ acc(phi0 * phixz - phix * phiz),
                occ @ acc(phi0 * phiyz - phiy * phiz),
            ])
            vir = s6[0] + s6[1] + s6[2]
            return {"rho": rho, "grad": grad, "h6": h6, "gkin": gkin,
                    "vir": vir, "stress6": s6}

        return fn

    # ------------------------------------------------------------------
    # screened/blocked evaluation (large molecules)
    #
    # The reference evaluates per point through near-atom primitive
    # lists (list_near_atoms + the per-primitive dran cutoff,
    # src/wfn_private@proc.F90:2032-2228, 2707-2781, cutoffs
    # :3075-3145: dran_p = sqrt(-ln(1e-12)/alpha_p)).  That dynamic
    # list is the wrong shape for XLA; the TPU-native decomposition:
    #
    #   * primitives are sorted by a spatial hash of their center (so
    #     nearby primitives are contiguous) and grouped into fixed-size
    #     blocks of B; each block carries a bounding sphere that
    #     contains every member's dran ball,
    #   * evaluation points are sorted spatially and cut into fixed
    #     chunks of n; each chunk carries its bounding sphere,
    #   * a host-computed (nchunk, K) table lists the blocks whose
    #     reach intersects each chunk (padded with an all-zero dummy
    #     block to the fixed width K), so shapes stay static and the
    #     whole sweep is ONE compiled scan,
    #   * per chunk the kernel gathers the K blocks' primitive data +
    #     the (M, Ka) MO-coefficient columns and contracts
    #     phi_d = C_g @ chi_d, rho = occ . phi^2 (the dense math
    #     restricted to active primitives): cost per point is
    #     O(M * P_active) vs O(P * M) dense - the difference between
    #     benzene and insulin being feasible.  (A density-matrix tile
    #     rho = chi^T D chi was tried first: O(P_active^2) only wins
    #     when the active set is narrower than the occupied space,
    #     which 64-wide BLOCK screening never achieves - see _screen.)
    #
    # Primitives outside dran but inside a gathered block contribute
    # their true (sub-1e-12) exponential tails, so the screened result
    # differs from unscreened dense math only below the reference's own
    # screening threshold.
    # ------------------------------------------------------------------
    SCREEN_NPRI = 2048     # rho_eval_soa routes here above this size

    def _screen(self, B: int = 64, thres: float = 1e-12):
        """Host-precomputed primitive blocks + density matrix (cached).

        thres mirrors the reference rprim_thres
        (src/wfn_private@proc.F90:145): dran = sqrt(-ln(thres)/alpha).
        """
        key = (B, thres)
        cache = getattr(self, "_screen_cache", None)
        if cache is None:
            cache = self._screen_cache = {}
        if key in cache:
            return cache[key]
        ctr = np.asarray(self.atpos)[self.icenter]        # (P, 3)
        al = np.asarray(self.e, float)
        li = _LI[self.itype - 1].astype(np.int32)         # (P, 3)
        dran = np.sqrt(-np.log(thres) / al)
        P = len(al)

        # spatial sort: Morton (Z-order) code of the quantized cell
        # keeps CONSECUTIVE primitives spatially adjacent, so 64-wide
        # blocks stay compact.  (The first implementation lexsorted an
        # XOR hash of the cell, which orders distant cells arbitrarily:
        # on the 768-atom cps assembly the median block bounding radius
        # came out 31 bohr - wider than a benzene copy - and every
        # chunk's "screened" table saturated at all 192 blocks, OOMing
        # the 16 GB v5e on the gathered density-matrix tile.  Morton
        # ordering cuts the median bR to the cell+dran scale.)  Within
        # a cell, diffuse primitives (large dran) group together so
        # tight blocks keep small bounding radii.
        h = 4.0
        cell = np.floor((ctr - ctr.min(0)) / h).astype(np.int64)
        perm = np.lexsort((dran, _morton3(cell)))
        ctr, al, li, dran = ctr[perm], al[perm], li[perm], dran[perm]

        # MO coefficients in the permuted primitive basis.  The kernel
        # contracts through the MOs (phi = C_g @ chi, rho = occ.(phi^2))
        # rather than a density-matrix tile: at BLOCK granularity the
        # active set Ka = K*B runs thousands wide, so the (Ka, Ka) tile
        # gather costs O(Ka^2) memory AND the D @ chi matmuls O(Ka^2 n)
        # flops, vs O(M Ka) / O(M Ka n) for the MO route with M << Ka
        # occupied orbitals (the cps assembly: M = 1344 vs Ka up to
        # 12288 - the tile route's buffer plan hit 15.76 GB and refused
        # to compile on the 16 GB v5e).  A density-matrix tile only
        # wins when the active set is narrower than the occupied space,
        # which block screening never achieves.
        Cp = np.ascontiguousarray(self.cmo[:, perm])      # (M, P)

        # pad to a block multiple with inert primitives (zero C columns
        # guarantee exactly zero contribution; dran = 0 keeps them out
        # of every block radius)
        npad = (-P) % B
        if npad:
            ctr = np.concatenate([ctr, np.broadcast_to(ctr.mean(0),
                                                       (npad, 3))])
            al = np.concatenate([al, np.ones(npad)])
            li = np.concatenate([li, np.zeros((npad, 3), np.int32)])
            dran = np.concatenate([dran, np.zeros(npad)])
            Cp = np.concatenate([Cp, np.zeros((len(Cp), npad))], axis=1)
        Pp = len(al)
        nb = Pp // B

        bctr = ctr.reshape(nb, B, 3).mean(axis=1)         # (nb, 3)
        spread = np.linalg.norm(
            ctr.reshape(nb, B, 3) - bctr[:, None, :], axis=2)
        bR = (spread + dran.reshape(nb, B)).max(axis=1)   # (nb,)

        # dummy block index nb: gathering it must be inert -> one extra
        # all-zero block appended to the per-primitive arrays
        ctr = np.concatenate([ctr, np.broadcast_to(ctr.mean(0), (B, 3))])
        al = np.concatenate([al, np.ones(B)])
        li = np.concatenate([li, np.zeros((B, 3), np.int32)])
        Cp = np.concatenate([Cp, np.zeros((len(Cp), B))], axis=1)
        scr = dict(
            perm=perm, B=B, nb=nb, Pp=Pp,
            bctr=bctr, bR=bR,
            ctrT=np.ascontiguousarray(ctr.T),             # (3, Pp+B)
            al=al, lxT=np.ascontiguousarray(li.T),        # (3, Pp+B)
            C=Cp,                                         # (M, Pp+B)
            occ=np.asarray(self.occ, np.float64),
            nmax=int(li.max()) + 2,
        )
        cache[key] = scr
        return scr

    def screen_consts(self, dtype=None):
        """The device-argument pytree for the screened kernel (passed
        as jit arguments, never closure-captured: a captured 1.2 GB
        density matrix would be inlined into the lowered IR).  Device
        arrays are cached per precision so repeated driver calls do not
        re-transfer the density matrix."""
        scr = self._screen()
        lowp = dtype is not None and np.dtype(dtype) != np.float64
        key = ("consts", lowp)
        cache = self._screen_cache
        if key not in cache:
            dt = np.float32 if lowp else np.float64
            cache[key] = {
                "s_ctrT": jnp.asarray(scr["ctrT"]),  # f64 displacements
                "s_al": jnp.asarray(scr["al"].astype(dt)),
                "s_lxT": jnp.asarray(scr["lxT"]),
                "s_C": jnp.asarray(scr["C"].astype(dt)),
                "s_occ": jnp.asarray(scr["occ"]),    # f64 accumulation
            }
        return cache[key]

    def screened_shim(self, bidx, nder: int = 2, dtype=None):
        """eval_fn duck-type over the screened kernel for ops.newton /
        ops.ode: `raw(consts, xT)` reads the chunk's block table from
        consts["s_bidx"], so every spatial chunk reuses ONE compiled
        Newton/ODE program (raw is cached; consts is a real jit
        argument with chunk-independent shapes)."""
        key = ("shimraw", nder, np.dtype(dtype).name if dtype else None)
        cache = getattr(self, "_screen_cache", None)
        if cache is None:
            cache = self._screen_cache = {}
        if key not in cache:
            core = self.screened_closure(nder=nder, dtype=dtype)

            def raw(cst, xT):
                return core(cst, xT, cst["s_bidx"])

            cache[key] = raw
        cst = dict(self.screen_consts(dtype))
        cst["s_bidx"] = jnp.asarray(bidx)
        return _ScreenShim(cache[key], cst)

    def screened_closure(self, nder: int = 2, extras: bool = False,
                         dtype=None):
        """Jittable screened kernel: (consts, xT (3, n), bidx (K,)) ->
        (rho, grad (3, n), h6 (6, n)) [or extras dict].

        MO contraction (see _screen for why not a density-matrix
        tile): gathers the bidx blocks' primitive data and the (M, Ka)
        MO-coefficient columns; the MXU matmuls are phi_d = C_g @ chi_d
        per derivative component, and every occupied-space reduction
        accumulates in f64 (the same math as eval_closure restricted
        to the gathered primitives).  EDF core primitives (ECP
        wavefunctions) are evaluated densely per chunk (their count is
        O(atoms), never the bottleneck)."""
        scr = self._screen()
        B = scr["B"]
        nmax = scr["nmax"]
        d = self._device()
        has_edf = "eal" in d
        if has_edf:
            ectrT, elx = d["ectr"].T, d["elx"]
            enmax = int(np.max(np.asarray(elx))) + 2
        lowp = dtype is not None and np.dtype(dtype) != np.float64
        eal, ec = None, None
        if has_edf:
            eal = np.asarray(d["eal"], np.float32 if lowp else np.float64)
            ec = np.asarray(d["ec"], np.float32 if lowp else np.float64)
        acc = (lambda v: v.astype(jnp.float64)) if lowp else (lambda v: v)
        prec = jax.lax.Precision.HIGHEST

        def psum(v):
            # f64 accumulation of the primitive-axis reductions
            return v.sum(0, dtype=jnp.float64) if lowp else v.sum(0)

        def fn(cst, xT, bidx):
            pidx = (bidx[:, None] * B
                    + jnp.arange(B, dtype=bidx.dtype)[None, :]).reshape(-1)
            ctrT = cst["s_ctrT"][:, pidx]                 # (3, Ka)
            al = cst["s_al"][pidx]
            a = cst["s_lxT"][0, pidx]
            b = cst["s_lxT"][1, pidx]
            c = cst["s_lxT"][2, pidx]
            Cg = jnp.take(cst["s_C"], pidx, axis=1)       # (M, Ka)
            occ = cst["s_occ"]

            dx = xT[:, None, :] - ctrT[:, :, None]        # (3, Ka, n) f64
            if lowp:
                dx = dx.astype(dtype)
            r2 = (dx * dx).sum(0)
            ex = jnp.exp(-al[:, None] * r2)
            X, Y, Z = dx[0], dx[1], dx[2]

            # shared power tables: V^k for k = 0..nmax computed ONCE
            # per direction, every exponent selection reuses them.  A
            # per-call multiply chain (the first implementation) built
            # ~15 calls x nmax fresh (Ka, n) temporaries inside the
            # Newton while-loop body - the buffer plan hit 15.76 GB on
            # the 12288-primitive cps assembly and the 16 GB v5e
            # refused to compile it.
            def pows(V):
                out = [jnp.ones_like(V), V]
                for _ in range(2, nmax + 1):
                    out.append(out[-1] * V)
                return out

            pX, pY, pZ = pows(X), pows(Y), pows(Z)

            def pw(pV, nexp):
                nbx = nexp[:, None]
                out = jnp.where(nbx == 0, 1.0, 0.0)
                for k in range(1, nmax + 1):
                    out = jnp.where(nbx == k, pV[k], out)
                return out

            xa, yb, zc = pw(pX, a), pw(pY, b), pw(pZ, c)
            chi0 = xa * yb * zc * ex
            phi0 = jnp.matmul(Cg, chi0, precision=prec)   # (M, n)
            rho = occ @ acc(phi0 * phi0)
            n = xT.shape[1]

            if has_edf:
                # dense EDF contribution (same math as eval_closure)
                def pwe(V, nexp):
                    nbx = nexp[:, None]
                    out = jnp.where(nbx == 0, 1.0, 0.0)
                    Vk = V
                    for k in range(1, enmax + 1):
                        out = jnp.where(nbx == k, Vk, out)
                        Vk = Vk * V
                    return out

                dxe = xT[:, None, :] - ectrT[:, :, None]
                if lowp:
                    dxe = dxe.astype(dtype)
                r2e = (dxe * dxe).sum(0)
                exe = ec[:, None] * jnp.exp(-eal[:, None] * r2e)
                Xe, Ye, Ze = dxe[0], dxe[1], dxe[2]
                ae, be, ce_ = elx[0], elx[1], elx[2]
                xae, ybe, zce = pwe(Xe, ae), pwe(Ye, be), pwe(Ze, ce_)
                rho = rho + psum(xae * ybe * zce * exe)
            if nder < 1 and not extras:
                return rho, jnp.zeros((3, n)), jnp.zeros((6, n))

            dxa = a[:, None] * pw(pX, a - 1) \
                - 2.0 * al[:, None] * pw(pX, a + 1)
            dyb = b[:, None] * pw(pY, b - 1) \
                - 2.0 * al[:, None] * pw(pY, b + 1)
            dzc = c[:, None] * pw(pZ, c - 1) \
                - 2.0 * al[:, None] * pw(pZ, c + 1)
            cx = dxa * yb * zc * ex
            cy = xa * dyb * zc * ex
            cz = xa * yb * dzc * ex
            phix = jnp.matmul(Cg, cx, precision=prec)
            phiy = jnp.matmul(Cg, cy, precision=prec)
            phiz = jnp.matmul(Cg, cz, precision=prec)
            grad = 2.0 * jnp.stack([occ @ acc(phi0 * phix),
                                    occ @ acc(phi0 * phiy),
                                    occ @ acc(phi0 * phiz)])
            gkin = 0.5 * (occ @ acc(phix * phix + phiy * phiy
                                    + phiz * phiz))
            if has_edf:
                edxa = ae[:, None] * pwe(Xe, ae - 1) \
                    - 2.0 * eal[:, None] * pwe(Xe, ae + 1)
                edyb = be[:, None] * pwe(Ye, be - 1) \
                    - 2.0 * eal[:, None] * pwe(Ye, be + 1)
                edzc = ce_[:, None] * pwe(Ze, ce_ - 1) \
                    - 2.0 * eal[:, None] * pwe(Ze, ce_ + 1)
                grad = grad + jnp.stack([
                    psum(edxa * ybe * zce * exe),
                    psum(xae * edyb * zce * exe),
                    psum(xae * ybe * edzc * exe)])
            if nder < 2 and not extras:
                return rho, grad, jnp.zeros((6, n))

            al2 = 2.0 * al[:, None]
            sxa = (a * (a - 1))[:, None] * pw(pX, a - 2) \
                - al2 * (2 * a + 1)[:, None] * xa \
                + 4.0 * al[:, None] ** 2 * pw(pX, a + 2)
            syb = (b * (b - 1))[:, None] * pw(pY, b - 2) \
                - al2 * (2 * b + 1)[:, None] * yb \
                + 4.0 * al[:, None] ** 2 * pw(pY, b + 2)
            szc = (c * (c - 1))[:, None] * pw(pZ, c - 2) \
                - al2 * (2 * c + 1)[:, None] * zc \
                + 4.0 * al[:, None] ** 2 * pw(pZ, c + 2)
            cxx = sxa * yb * zc * ex
            cyy = xa * syb * zc * ex
            czz = xa * yb * szc * ex
            cxy = dxa * dyb * zc * ex
            cxz = dxa * yb * dzc * ex
            cyz = xa * dyb * dzc * ex
            phixx = jnp.matmul(Cg, cxx, precision=prec)
            phiyy = jnp.matmul(Cg, cyy, precision=prec)
            phizz = jnp.matmul(Cg, czz, precision=prec)
            phixy = jnp.matmul(Cg, cxy, precision=prec)
            phixz = jnp.matmul(Cg, cxz, precision=prec)
            phiyz = jnp.matmul(Cg, cyz, precision=prec)
            h6 = 2.0 * jnp.stack([
                occ @ acc(phi0 * phixx + phix * phix),
                occ @ acc(phi0 * phiyy + phiy * phiy),
                occ @ acc(phi0 * phizz + phiz * phiz),
                occ @ acc(phi0 * phixy + phix * phiy),
                occ @ acc(phi0 * phixz + phix * phiz),
                occ @ acc(phi0 * phiyz + phiy * phiz),
            ])
            if has_edf:
                eal2 = 2.0 * eal[:, None]
                esxa = (ae * (ae - 1))[:, None] * pwe(Xe, ae - 2) \
                    - eal2 * (2 * ae + 1)[:, None] * xae \
                    + 4.0 * eal[:, None] ** 2 * pwe(Xe, ae + 2)
                esyb = (be * (be - 1))[:, None] * pwe(Ye, be - 2) \
                    - eal2 * (2 * be + 1)[:, None] * ybe \
                    + 4.0 * eal[:, None] ** 2 * pwe(Ye, be + 2)
                eszc = (ce_ * (ce_ - 1))[:, None] * pwe(Ze, ce_ - 2) \
                    - eal2 * (2 * ce_ + 1)[:, None] * zce \
                    + 4.0 * eal[:, None] ** 2 * pwe(Ze, ce_ + 2)
                h6 = h6 + jnp.stack([
                    psum(esxa * ybe * zce * exe),
                    psum(xae * esyb * zce * exe),
                    psum(xae * ybe * eszc * exe),
                    psum(edxa * edyb * zce * exe),
                    psum(edxa * ybe * edzc * exe),
                    psum(xae * edyb * edzc * exe)])
            if not extras:
                return rho, grad, h6
            s6 = 0.5 * jnp.stack([
                occ @ acc(phi0 * phixx - phix * phix),
                occ @ acc(phi0 * phiyy - phiy * phiy),
                occ @ acc(phi0 * phizz - phiz * phiz),
                occ @ acc(phi0 * phixy - phix * phiy),
                occ @ acc(phi0 * phixz - phix * phiz),
                occ @ acc(phi0 * phiyz - phiy * phiz),
            ])
            vir = s6[0] + s6[1] + s6[2]
            return {"rho": rho, "grad": grad, "h6": h6, "gkin": gkin,
                    "vir": vir, "stress6": s6}

        return fn

    def screen_plan(self, points, n_chunk: int = 2048,
                    margin: float = 0.0):
        """Host chunk planner for the screened sweep.

        Sorts `points` (N, 3) spatially, cuts them into fixed chunks of
        n_chunk (tail padded by repeating the last point), and computes
        each chunk's active block list from bounding spheres.  margin
        (bohr) widens the reach test - Newton/ODE callers use it to
        keep one block table valid while points move.

        Returns (order, xstack (nchunk, 3, n), bidx (nchunk, K), N).
        Outputs of the screened kernel over xstack, flattened and
        indexed by argsort(order), restore caller order.
        """
        scr = self._screen()
        pts = np.asarray(points, float).reshape(-1, 3)
        N = len(pts)
        h = 3.0
        cell = np.floor((pts - pts.min(0)) / h).astype(np.int64)
        # Morton order: chunks of consecutive points stay spatially
        # compact (plain lexicographic cell order makes chunks span
        # entire x-slabs - measured rc up to 44 bohr on the cps
        # assembly, inflating every chunk's block table)
        order = np.argsort(_morton3(cell), kind="stable")
        p = pts[order]
        npadp = (-N) % n_chunk
        if npadp:
            p = np.concatenate([p, np.broadcast_to(p[-1], (npadp, 3))])
        nchunk = len(p) // n_chunk
        pc = p.reshape(nchunk, n_chunk, 3)
        centers = pc.mean(axis=1)                          # (nchunk, 3)
        rc = np.linalg.norm(pc - centers[:, None, :], axis=2).max(axis=1)

        dd = np.linalg.norm(centers[:, None, :] - scr["bctr"][None, :, :],
                            axis=2)                        # (nchunk, nb)
        act = dd <= rc[:, None] + scr["bR"][None, :] + margin
        kmax = int(act.sum(axis=1).max())
        # quantize K COARSELY (multiples of 64) to bound distinct
        # compile shapes: the screened kernel compiles per K, each
        # compile costs minutes through the remote-compile tunnel, and
        # the cps AUTO driver re-plans between Newton segments - with
        # multiples-of-8 quantization one 105k-seed run generated a
        # dozen distinct K shapes and spent its entire wall in compiles
        K = max(64, -(-kmax // 64) * 64)
        bidx = np.full((nchunk, K), scr["nb"], dtype=np.int32)
        for i in range(nchunk):
            ai = np.flatnonzero(act[i])
            bidx[i, :len(ai)] = ai
        xstack = np.ascontiguousarray(pc.transpose(0, 2, 1))
        return order, xstack, bidx, N

    def _jitted_screened(self, nder: int, extras: bool, dtype):
        if not hasattr(self, "_scr_jit_cache"):
            self._scr_jit_cache = {}
        key = (nder, extras, np.dtype(dtype).name if dtype else None)
        if key not in self._scr_jit_cache:
            core = self.screened_closure(nder=nder, extras=extras,
                                         dtype=dtype)

            def sweep(cst, xstack, bstack):
                def body(_, inp):
                    x, bi = inp
                    return None, core(cst, x, bi)
                _, outs = jax.lax.scan(body, None, (xstack, bstack))
                return outs

            self._scr_jit_cache[key] = (jax.jit(sweep), core,
                                        jax.jit(core))
        return self._scr_jit_cache[key]

    # max scan length per sweep dispatch: a 14M-point mesh at
    # n_chunk=2048 is a 6852-iteration scan, and one device program
    # running past the multi-minute mark crashed the TPU worker
    # (watchdog); groups of 256 chunks keep each dispatch ~10 s while
    # amortizing the ~27 ms tunnel latency 256x
    SWEEP_GROUP = 256

    def rho_eval_screened(self, xT, nder: int = 2, dtype=None,
                          n_chunk: int = 2048):
        """Screened (f, gf (3, N), h6 (6, N)) sweep; any N, any layout
        of points (they are re-sorted spatially internally)."""
        pts = np.asarray(xT).T
        order, xstack, bidx, N = self.screen_plan(pts, n_chunk=n_chunk)
        sweep, _, _ = self._jitted_screened(nder, False, dtype)
        cst = self.screen_consts(dtype)
        G = self.SWEEP_GROUP
        nch = len(xstack)
        if nch <= G:
            outs = sweep(cst, jnp.asarray(xstack), jnp.asarray(bidx))
        else:
            # fixed-size groups (tail padded by repeating the last
            # chunk) -> one compiled program per (G, K, n) shape
            npadg = (-nch) % G
            if npadg:
                xstack = np.concatenate(
                    [xstack, np.repeat(xstack[-1:], npadg, axis=0)])
                bidx = np.concatenate(
                    [bidx, np.repeat(bidx[-1:], npadg, axis=0)])
            parts = [sweep(cst, jnp.asarray(xstack[lo:lo + G]),
                           jnp.asarray(bidx[lo:lo + G]))
                     for lo in range(0, len(xstack), G)]
            outs = tuple(jnp.concatenate([p[i] for p in parts])[:nch]
                         for i in range(len(parts[0])))
        inv = np.argsort(order)
        res = []
        for o in outs:
            o = np.asarray(o)
            o = np.moveaxis(o, 0, -2).reshape(o.shape[1:-1] + (-1,))[..., :N]
            res.append(jnp.asarray(o[..., inv]))
        return tuple(res)

    def _jitted(self, nder: int, extras: bool = False, dtype=None):
        """Cached jitted closure (a fresh closure per call would force a
        recompile every driver call)."""
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        key = (nder, extras, np.dtype(dtype).name if dtype else None)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self.eval_closure(nder=nder, extras=extras, dtype=dtype))
        return self._jit_cache[key]

    def rho_eval_soa(self, xT, nder: int = 2, block: int | None = None,
                     dtype=None):
        """(f, gf (3,N), h6 (6,N)) with internal chunking.

        The chunk size scales with the derivative order: value-only
        evals keep ~6 (P, N) temporaries live vs ~20 at nder=2, and a
        4096-point chunk on a 3M-point mesh is ~800 dispatches of pure
        tunnel latency (the round-2 wfn-mesh leg's 24.7 s wall).
        dtype=jnp.float32 selects the mixed-precision closure (see
        eval_closure); outputs are always f64.

        Above SCREEN_NPRI primitives, concrete (non-tracer) point
        batches route through the screened density-matrix sweep
        (rho_eval_screened): the dense path materializes (P, N)
        intermediates and O(M P N) matmuls, which do not survive a
        10^4-primitive molecule (the cps_large workload). Traced
        callers (Newton/ODE under jit) must use the screened closure
        with an explicit block table - see screen_plan."""
        if (self.npri >= self.SCREEN_NPRI
                and not isinstance(xT, jax.core.Tracer)):
            return self.rho_eval_screened(xT, nder=nder, dtype=dtype)
        if block is None:
            block = {0: 1 << 17, 1: 1 << 15, 2: 1 << 12}[min(nder, 2)]
            if dtype is not None and np.dtype(dtype) != np.float64:
                block *= 2
        fn = self._jitted(nder, dtype=dtype)
        N = xT.shape[1]
        if N <= block:
            return fn(xT)
        # pad to a block multiple: every chunk then has the SAME shape,
        # so one compiled program per (block, nder, dtype) serves any
        # mesh size (a ragged tail chunk costs a fresh ~30-700 s
        # remote-tunnel compile per distinct mesh)
        npad = (-N) % block
        if npad:
            xT = jnp.concatenate(
                [xT, jnp.broadcast_to(xT[:, :1], (3, npad))], axis=1)
        outs = [fn(xT[:, lo:lo + block])
                for lo in range(0, N + npad, block)]
        return tuple(jnp.concatenate([o[i] for o in outs],
                                     axis=-1)[..., :N]
                     for i in range(3))

    def extras_soa(self, xT, block: int = 4096):
        fn = self._jitted(2, extras=True)
        N = xT.shape[1]
        if N <= block:
            return fn(xT)
        outs = [fn(xT[:, lo:lo + block]) for lo in range(0, N, block)]
        return {k: jnp.concatenate([o[k] for o in outs], axis=-1)
                for k in outs[0]}

    def rho_eval(self, points, nder: int = 2):
        """Batch-first wrapper: points (N,3) -> (f, gf (N,3), hf (N,3,3))."""
        from ..ops.interp import sym6_to_mat

        f, gfT, h6 = self.rho_eval_soa(jnp.asarray(points).T, nder=nder)
        return f, gfT.T, sym6_to_mat(h6)

    def mo_values(self, points):
        """MO values at points (N, 3) -> (M, N)."""
        d = self._device()
        xT = jnp.asarray(points).T
        dx = xT[:, None, :] - d["ctr"].T[:, :, None]
        r2 = (dx * dx).sum(0)
        ex = jnp.exp(-d["al"][:, None] * r2)
        a, b, c = d["lx"]
        nmax = int(np.max(np.asarray(d["lx"])))

        def pw(X, n):
            nb = n[:, None]
            out = jnp.where(nb == 0, 1.0, 0.0)
            Xk = X
            for k in range(1, nmax + 1):
                out = jnp.where(nb == k, Xk, out)
                Xk = Xk * X
            return out

        chi = pw(dx[0], a) * pw(dx[1], b) * pw(dx[2], c) * ex
        return d["C"] @ chi

    def rho_spin_soa(self, xT):
        """(rho_up, rho_dn) at points xT (3, N) (reference rho2 spin
        channels, src/wfn_private@proc.F90:2150-2176: RHF channels are
        rho/2 each; UHF sums alpha MOs then beta MOs)."""
        pts = np.asarray(xT).T if hasattr(xT, "T") else np.asarray(xT).T
        mo = self.mo_values(jnp.asarray(pts))         # (M, N)
        occ = jnp.asarray(self.occ)
        if self.wfntyp == "uhf":
            up = jnp.arange(self.nmo) < self.nalpha
            r_up = (jnp.where(up, occ, 0.0)) @ (mo * mo)
            r_dn = (jnp.where(~up, occ, 0.0)) @ (mo * mo)
            return r_up, r_dn
        rho = occ @ (mo * mo)
        return 0.5 * rho, 0.5 * rho

    # ------------------------------------------------------------------
    # hole/potential properties (reference wfn_private@proc.F90
    # mep :2231, uslater :2311, xhole :2423)
    # ------------------------------------------------------------------
    def mep(self, points):
        """Molecular electrostatic potential at points (N, 3):
        sum_A Z_A/|r-R_A| - sum_mn D_mn <m|1/|r-r0||n> (reference mep,
        src/wfn_private@proc.F90:2231-2309, via libCINT CINT1e_rinv;
        here via the McMurchie-Davidson rinv_pairs)."""
        from ..ops.mdint import rinv_pairs

        pts = np.asarray(points, dtype=float).reshape(-1, 3)
        D = (self.cmo.T * self.occ) @ self.cmo            # (P, P) 1-RDM
        V = rinv_pairs(self, pts)                         # (B, P, P)
        el = np.einsum("bmn,mn->b", V, D)
        d = np.linalg.norm(pts[:, None, :] - self.atpos[None], axis=-1)
        vnuc = (self.atz[None, :] / np.maximum(d, 1e-14)).sum(1)
        return vnuc - el

    def uslater(self, points, want_nheff: bool = False):
        """Slater potential U_x (and optionally the effective hole
        normalization) at points (N, 3) (reference uslater,
        src/wfn_private@proc.F90:2311-2420): U_x = -(q V q)/rho with
        q_mu = sum_i phi_i(r) c_i_mu over occupied MOs."""
        from ..ops.mdint import rinv_pairs

        pts = np.asarray(points, dtype=float).reshape(-1, 3)
        xmo = np.asarray(self.mo_values(pts))             # (M, B)
        q = xmo.T @ self.cmo                              # (B, P)
        V = rinv_pairs(self, pts)                         # (B, P, P)
        qVq = np.einsum("bm,bmn,bn->b", q, V, q)
        ex = self.extras_soa(jnp.asarray(pts).T)
        rho = np.asarray(ex["rho"])
        ux = -qVq / np.maximum(rho, 1e-40)
        if not want_nheff:
            return ux
        from ..ops.brhole import xlnorm

        lap = np.asarray(ex["h6"][0] + ex["h6"][1] + ex["h6"][2])
        gmod = np.asarray(np.sqrt((ex["grad"] ** 2).sum(0)))
        gkin = np.asarray(ex["gkin"])
        rhos = 0.5 * rho
        laps = 0.5 * lap
        drhos2 = (0.5 * gmod) ** 2
        dsigs = gkin - 0.25 * drhos2 / np.maximum(rhos, 1e-40)
        quads = (laps - 2.0 * dsigs) / 6.0
        nheff = np.asarray(xlnorm(jnp.asarray(rhos), jnp.asarray(quads),
                                  jnp.asarray(2.0 * ux)))
        return ux, nheff

    def xhole(self, points, xref):
        """Exchange hole h_x(r; r_ref) = -gamma_1(r, r_ref)^2 /
        rho_spin(r_ref) for RHF (reference xhole,
        src/wfn_private@proc.F90:2423-2453)."""
        if self.wfntyp != "rhf":
            raise NotImplementedError("xhole: only rhf supported "
                                      "(as in the reference)")
        pts = np.asarray(points, dtype=float).reshape(-1, 3)
        xr = np.asarray(xref, dtype=float).reshape(1, 3)
        mop = np.asarray(self.mo_values(pts))              # (M, B)
        mor = np.asarray(self.mo_values(xr))[:, 0]         # (M,)
        gam1 = mor @ mop                                   # (B,)
        rho_ref, _, _ = self.rho_eval_soa(jnp.asarray(xr).T, nder=0)
        rho_spin = 0.5 * float(rho_ref[0])
        return -(gam1 * gam1) / max(rho_spin, 1e-40)

    def tile(self, reps=(2, 2, 2), gap: float = 4.0) -> "Wavefunction":
        """Non-interacting assembly: reps[0]*reps[1]*reps[2] displaced
        copies of this wavefunction, spaced bbox + gap (bohr) apart.

        The copies' MOs do not overlap electronically (each keeps its
        own occupied set; cmo is block-diagonal), so every integral is
        exactly ncopies x the monomer value - a machine-checkable
        large-molecule workload for the screened evaluator (the
        cps_large benchmark shape, examples/cps_large/insulin.cri:
        ~800 atoms, 10^4+ primitives)."""
        reps = tuple(int(v) for v in reps)
        ncopy = reps[0] * reps[1] * reps[2]
        span = self.atpos.max(0) - self.atpos.min(0) + gap
        offsets = np.stack(np.meshgrid(
            *[np.arange(r) for r in reps], indexing="ij"),
            -1).reshape(-1, 3) * span[None, :]
        nat, P, M = len(self.atz), self.npri, self.nmo
        atpos = (self.atpos[None, :, :] + offsets[:, None, :]
                 ).reshape(-1, 3)
        atz = np.tile(self.atz, ncopy)
        icenter = (self.icenter[None, :]
                   + (np.arange(ncopy) * nat)[:, None]).reshape(-1)
        itype = np.tile(self.itype, ncopy)
        e = np.tile(self.e, ncopy)
        cmo = np.zeros((M * ncopy, P * ncopy))
        for k in range(ncopy):
            cmo[k * M:(k + 1) * M, k * P:(k + 1) * P] = self.cmo
        occ = np.tile(self.occ, ncopy)
        if self.wfntyp == "uhf":
            # restore the "all alpha MOs first" layout that nalpha
            # encodes (the per-copy tiling interleaves spins)
            na = self.nalpha
            idx = np.concatenate([
                (np.arange(ncopy)[:, None] * M
                 + np.arange(na)[None, :]).ravel(),
                (np.arange(ncopy)[:, None] * M
                 + np.arange(na, M)[None, :]).ravel()])
            cmo = cmo[idx]
            occ = occ[idx]
        kw = {}
        if self.edf_e is not None:
            kw = dict(
                edf_icenter=(self.edf_icenter[None, :]
                             + (np.arange(ncopy) * nat)[:, None]
                             ).reshape(-1).astype(np.int32),
                edf_itype=np.tile(self.edf_itype, ncopy),
                edf_e=np.tile(self.edf_e, ncopy),
                edf_c=np.tile(self.edf_c, ncopy))
        return Wavefunction(
            atpos=atpos, atz=atz, icenter=icenter.astype(np.int32),
            itype=itype, e=e, cmo=cmo, occ=occ, wfntyp=self.wfntyp,
            nalpha=self.nalpha * ncopy if self.wfntyp == "uhf" else 0,
            source=f"{self.source}[tiled {reps}]", **kw)

    # ------------------------------------------------------------------
    # readers
    # ------------------------------------------------------------------
    @classmethod
    def from_file(cls, path: str) -> "Wavefunction":
        low = path.lower()
        if low.endswith(".wfn"):
            return cls.read_wfn(path)
        if low.endswith(".wfx"):
            return cls.read_wfx(path)
        if low.endswith(".fchk") or low.endswith(".fck") or \
                low.endswith(".fch"):
            return cls.read_fchk(path)
        if low.endswith(".molden") or low.endswith(".molden.input"):
            return cls.read_molden(path)
        raise ValueError(f"unknown wavefunction format: {path}")

    @classmethod
    def read_wfn(cls, path: str) -> "Wavefunction":
        """AIMPAC .wfn reader (reference read_wfn,
        src/wfn_private@proc.F90:484-...)."""
        import re

        with open(path) as fh:
            lines = fh.read().splitlines()
        m = re.search(r"(\d+)\s+MOL ORBITALS\s+(\d+)\s+PRIMITIVES\s+(\d+)\s+NUCLEI",
                      lines[1])
        if not m:
            raise ValueError("bad .wfn header")
        nmo, npri, nat = (int(v) for v in m.groups())
        atpos = np.zeros((nat, 3))
        atz = np.zeros(nat, dtype=int)
        iline = 2
        for i in range(nat):
            ln = lines[iline + i]
            mm = re.search(r"\)\s*([-\d.DEde+]+)\s+([-\d.DEde+]+)\s+"
                           r"([-\d.DEde+]+)\s+CHARGE\s*=\s*([-\d.DEde+]+)", ln)
            atpos[i] = [float(v.replace("D", "E")) for v in mm.groups()[:3]]
            atz[i] = int(float(mm.group(4).replace("D", "E")))
        iline += nat

        def read_ints(tag):
            nonlocal iline
            vals = []
            while iline < len(lines) and lines[iline].lstrip().startswith(tag):
                vals.extend(int(v) for v in
                            re.findall(r"(\d+)", lines[iline].split(tag)[1]))
                iline += 1
            return np.asarray(vals, dtype=np.int32)

        icenter = read_ints("CENTRE ASSIGNMENTS")
        itype = read_ints("TYPE ASSIGNMENTS")
        expos = []
        while iline < len(lines) and lines[iline].lstrip().startswith("EXPONENTS"):
            expos.extend(float(v.replace("D", "E")) for v in
                         re.findall(r"[-\d.]+[DEde][-+]\d+",
                                    lines[iline]))
            iline += 1
        e = np.asarray(expos)
        if not (len(icenter) == len(itype) == len(e) == npri):
            raise ValueError("inconsistent .wfn primitive data")

        occ = np.zeros(nmo)
        cmo = np.zeros((nmo, npri))
        imo = -1
        vals = []
        for ln in lines[iline:]:
            if ln.startswith("MO") or "OCC NO" in ln:
                if imo >= 0:
                    cmo[imo, :] = vals[:npri]
                mm = re.search(r"OCC NO\s*=\s*([-\d.DEde+]+)", ln)
                if mm is None:
                    break
                imo += 1
                occ[imo] = float(mm.group(1).replace("D", "E"))
                vals = []
            elif ln.strip().startswith("END DATA"):
                if imo >= 0:
                    cmo[imo, :] = vals[:npri]
                break
            else:
                vals.extend(float(v.replace("D", "E")) for v in
                            re.findall(r"[-\d.]+[DEde][-+]\d+", ln))
        return cls(atpos=atpos, atz=atz, icenter=icenter - 1, itype=itype,
                   e=e, cmo=cmo, occ=occ, source=path)

    @classmethod
    def read_wfx(cls, path: str) -> "Wavefunction":
        """AIM .wfx reader (reference read_wfx,
        src/wfn_private@proc.F90:588-913), including the EDF core
        density block of ECP wavefunctions."""
        text = open(path).read()

        def tag(name, dtype=float):
            import re

            m = re.search(rf"<{re.escape(name)}>(.*?)</{re.escape(name)}>",
                          text, re.S)
            if m is None:
                return None
            body = m.group(1)
            body = re.sub(r"<MO Number>.*?</MO Number>", " ", body, flags=re.S)
            vals = body.replace("D", "E").replace("d", "E").split()
            return np.asarray([dtype(v) for v in vals])

        nat = int(tag("Number of Nuclei", int)[0])
        atz = tag("Atomic Numbers", int)
        atpos = tag("Nuclear Cartesian Coordinates").reshape(nat, 3)
        icenter = tag("Primitive Centers", int)
        itype = tag("Primitive Types", int)
        e = tag("Primitive Exponents")
        occ = tag("Molecular Orbital Occupation Numbers")
        coefs = tag("Molecular Orbital Primitive Coefficients")
        nmo = len(occ)
        npri = len(e)
        cmo = coefs.reshape(nmo, npri)
        kw = {}
        edf_e = tag("EDF Primitive Exponents")
        if edf_e is not None and len(edf_e):
            kw = dict(
                edf_icenter=tag("EDF Primitive Centers",
                                int).astype(np.int32) - 1,
                edf_itype=tag("EDF Primitive Types",
                              int).astype(np.int32),
                edf_e=edf_e,
                edf_c=tag("EDF Primitive Coefficients"))
        return cls(atpos=atpos, atz=atz.astype(int),
                   icenter=icenter.astype(np.int32) - 1,
                   itype=itype.astype(np.int32), e=e, cmo=cmo, occ=occ,
                   source=path, **kw)

    @classmethod
    def read_fchk(cls, path: str, readvirtual: bool = False) -> "Wavefunction":
        """Gaussian formatted-checkpoint reader (reference read_fchk,
        src/wfn_private@proc.F90:920-1436)."""
        ints = {}
        arrays = {}
        with open(path) as fh:
            lines = fh.read().splitlines()
        i = 0
        while i < len(lines):
            ln = lines[i]
            if len(ln) > 47 and ln[43] == "I" and "N=" not in ln:
                ints[ln[:40].strip()] = int(ln.split()[-1])
                i += 1
                continue
            if "N=" in ln and len(ln) > 47 and ln[43] in "IR":
                name = ln[:40].strip()
                n = int(ln.split()[-1])
                kind = ln[43]
                perline = 5 if kind == "R" else 6
                nlines = (n + perline - 1) // perline
                vals = []
                i += 1
                for _ in range(nlines):
                    vals.extend(lines[i].split())
                    i += 1
                arrays[name] = (np.asarray(vals, dtype=float) if kind == "R"
                                else np.asarray(vals, dtype=int))
                continue
            if len(ln) > 47 and ln[43] == "R" and "N=" not in ln:
                try:
                    ints[ln[:40].strip()] = float(ln.split()[-1])
                except ValueError:
                    pass
            i += 1

        nelec = ints["Number of electrons"]
        nalpha = ints["Number of alpha electrons"]
        uhf = "Beta Orbital Energies" in arrays
        nat = ints["Number of atoms"]
        atz = arrays["Atomic numbers"].astype(int)
        atpos = arrays["Current cartesian coordinates"].reshape(nat, 3)

        ishlt = arrays["Shell types"].astype(int)
        ishlpri = arrays["Number of primitives per shell"].astype(int)
        ishlat = arrays["Shell to atom map"].astype(int)
        exppri = arrays["Primitive exponents"]
        ccontr = arrays["Contraction coefficients"]
        pccontr = arrays.get("P(S=P) Contraction coefficients")
        nbassph = ints["Number of basis functions"]

        if uhf:
            nmoocc = nelec
            occ = np.ones(nmoocc)
        else:
            if nelec % 2:
                raise ValueError("odd electron count for RHF fchk")
            nmoocc = nelec // 2
            occ = np.full(nmoocc, 2.0)

        amo = arrays["Alpha MO coefficients"].reshape(-1, nbassph)
        if uhf:
            bmo = arrays["Beta MO coefficients"].reshape(-1, nbassph)
            mo_sph = np.concatenate([amo[:nalpha], bmo[:nelec - nalpha]])
        else:
            mo_sph = amo[:nmoocc]
        nmo = mo_sph.shape[0]

        # unfold SP (l = -1) shells into s + p
        sh_l, sh_at, sh_exp, sh_cc = [], [], [], []
        ip = 0
        for s in range(len(ishlt)):
            npr = ishlpri[s]
            ee = exppri[ip:ip + npr]
            cc = ccontr[ip:ip + npr]
            if ishlt[s] == -1:
                pc = pccontr[ip:ip + npr]
                sh_l.append(0); sh_at.append(ishlat[s])
                sh_exp.append(ee); sh_cc.append(cc)
                sh_l.append(1); sh_at.append(ishlat[s])
                sh_exp.append(ee); sh_cc.append(pc)
            else:
                sh_l.append(int(ishlt[s])); sh_at.append(ishlat[s])
                sh_exp.append(ee); sh_cc.append(cc)
            ip += npr

        icenter, itype, e, cmo = _shells_to_primitives(
            sh_l, sh_at, sh_exp, sh_cc, mo_sph)
        return cls(atpos=atpos, atz=atz, icenter=icenter, itype=itype,
                   e=e, cmo=cmo, occ=occ,
                   wfntyp="uhf" if uhf else "rhf", nalpha=nalpha,
                   source=path)

    @classmethod
    def read_molden(cls, path: str) -> "Wavefunction":
        """Molden file reader (reference read_molden,
        src/wfn_private@proc.F90:1438-1870): [Atoms], [GTO] with s/p/sp/
        d/f shells, [MO] blocks; [5D]/[7F]/[5D10F]/[5D7F] spherical flags
        (molden's cartesian d/f component orders match the fchk orders
        used by _shells_to_primitives)."""
        import re

        text = open(path, errors="replace").read()
        low = text.lower()

        # spherical flags (reference read_molden tag parsing,
        # src/wfn_private@proc.F90:1618-1632)
        d_sph = "[5d" in low or "[5d]" in low
        f_sph = ("[7f]" in low or "[5d7f]" in low
                 or ("[5d]" in low and "[5d10f]" not in low))
        g_sph = "[9g]" in low

        def section(name):
            m = re.search(rf"\[{name}\][^\n]*\n(.*?)(?=\n\s*\[|\Z)", text,
                          re.S | re.I)
            return m.group(1) if m else None

        # atoms
        m = re.search(r"\[Atoms\]\s*(\S*)", text, re.I)
        unit = (m.group(1) or "").lower() if m else ""
        toang = unit.startswith("angs")
        atoms = section("Atoms")
        if atoms is None:
            raise ValueError("no [Atoms] section in molden file")
        atz, atpos = [], []
        for ln in atoms.splitlines():
            t = ln.split()
            if len(t) < 6:
                continue
            atz.append(int(t[2]))
            xyz = np.array([float(v) for v in t[3:6]])
            if toang:
                from .. import param

                xyz = xyz * param.ANGSTROM_TO_BOHR
            atpos.append(xyz)
        atz = np.asarray(atz, dtype=int)
        atpos = np.asarray(atpos)

        # GTO shells
        gto = section("GTO")
        if gto is None:
            raise ValueError("no [GTO] section in molden file")
        sh_l, sh_at, sh_exp, sh_cc = [], [], [], []
        lmap = {"s": 0, "p": 1, "d": 2, "f": 3, "g": 4}
        lines = iter(gto.splitlines())
        cur_atom = None
        for ln in lines:
            t = ln.split()
            if not t:
                cur_atom = None
                continue
            if cur_atom is None:
                cur_atom = int(t[0])
                continue
            typ = t[0].lower()
            if typ in lmap or typ == "sp":
                npr = int(t[1])
                ee, cc, pc = [], [], []
                for _ in range(npr):
                    row = next(lines).replace("D", "E").replace(
                        "d", "e").split()
                    ee.append(float(row[0]))
                    cc.append(float(row[1]))
                    if typ == "sp":
                        pc.append(float(row[2]))
                if typ == "sp":
                    sh_l.append(0); sh_at.append(cur_atom)
                    sh_exp.append(np.asarray(ee)); sh_cc.append(np.asarray(cc))
                    sh_l.append(1); sh_at.append(cur_atom)
                    sh_exp.append(np.asarray(ee)); sh_cc.append(np.asarray(pc))
                else:
                    l = lmap[typ]
                    sph = (d_sph if l == 2 else f_sph if l == 3
                           else g_sph if l == 4 else False)
                    sh_l.append(-l if (sph and l >= 2) else l)
                    sh_at.append(cur_atom)
                    sh_exp.append(np.asarray(ee))
                    sh_cc.append(np.asarray(cc))

        nbas = sum(_NSHLT_SPH[abs(l)] if l < -1 else _NSHLT_CAR[abs(l)]
                   for l in sh_l)

        # MOs
        mo = section("MO")
        if mo is None:
            raise ValueError("no [MO] section in molden file")
        occs, coefs, spins = [], [], []
        cur = None
        for ln in mo.splitlines():
            st = ln.strip()
            lowln = st.lower()
            if lowln.startswith(("sym=", "ene=")):
                continue
            if lowln.startswith("spin="):
                spins.append(lowln.split("=")[1].strip())
                continue
            if lowln.startswith("occup="):
                occs.append(float(st.split("=")[1]))
                cur = np.zeros(nbas)
                coefs.append(cur)
                continue
            t = st.split()
            if len(t) >= 2 and cur is not None:
                cur[int(t[0]) - 1] = float(t[1].replace("D", "E"))

        occs = np.asarray(occs)
        keep = occs > 1e-12
        mo_sph = np.stack([c for c, k in zip(coefs, keep) if k])
        occ = occs[keep]
        uhf = any(s.startswith("beta") for s in spins)

        icenter, itype, e, cmo = _shells_to_primitives(
            sh_l, sh_at, sh_exp, sh_cc, mo_sph, order="molden")
        return cls(atpos=atpos, atz=atz, icenter=icenter, itype=itype,
                   e=e, cmo=cmo, occ=occ,
                   wfntyp="uhf" if uhf else "rhf", source=path)
