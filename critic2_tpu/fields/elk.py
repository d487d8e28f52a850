"""Elk LAPW density evaluator (STATE.OUT + GEOMETRY.OUT).

Reference behavior: src/elk_private.f90:50-53 with the implementation
src/elk_private@proc.f90 - read_out (:55), rho2 (:100), tolap (:232),
elk_geometry (:289), read_elk_state (:330). The field is rho_lm(r) real
spherical-harmonic radial tables per cell atom inside muffin tins, and a
plane-wave sum over the ngvec shortest G vectors of the FFT of the
interstitial grid density outside.

TPU design mirrors fields/wien.py: host-side parsing (Fortran
sequential-unformatted STATE.OUT records, GEOMETRY.OUT text) into dense
device tables; batched evaluation with the angular part as one
(nY, N) solid-harmonics block (ops/rlm) contracted against per-atom
coefficient rows, the radial part as a 4-node Lagrange gather on the
log grid (reference tools_math radial_derivs node scheme), and the
interstitial as a points-by-G phase matmul. Gradients/Hessians by
forward-mode autodiff (jvp) instead of ylmderiv.

Real-harmonic convention: rho2 combines Condon-Shortley Y_lm as
  m > 0:  (Y_lm + (-1)^m Y_l,-m)/sqrt(2)          = (-1)^m  S_lm
  m < 0:  (Y_lm - (-1)^m Y_l,-m)/(i sqrt(2))      = -S_lm
  m = 0:  Y_l0                                    = S_l0
with S_lm the ops/rlm real tesseral basis; the sign factors are folded
into the coefficient tables on the host.
"""
from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["ElkField", "read_geometry", "read_state"]


# ---------------------------------------------------------------------
# Fortran sequential unformatted records
# ---------------------------------------------------------------------

class _FortranRecords:
    """Sequential unformatted file with 4-byte record markers."""

    def __init__(self, path: str):
        self.buf = open(path, "rb").read()
        self.pos = 0

    def record(self) -> bytes:
        n, = struct.unpack_from("<i", self.buf, self.pos)
        data = self.buf[self.pos + 4:self.pos + 4 + n]
        n2, = struct.unpack_from("<i", self.buf, self.pos + 4 + n)
        if n2 != n:
            raise ValueError("corrupt Fortran record markers")
        self.pos += 8 + n
        return data

    def ints(self, count=None):
        d = np.frombuffer(self.record(), dtype="<i4")
        return d if count is None else d[:count]

    def floats(self):
        return np.frombuffer(self.record(), dtype="<f8")


def read_geometry(path: str) -> dict:
    """Parse elk GEOMETRY.OUT (reference elk_geometry,
    src/elk_private@proc.f90:289-330): lattice vectors (columns of x2c)
    and the species/atom list."""
    lines = [ln.rstrip() for ln in open(path)]
    i = 0

    def seek(tag):
        nonlocal i
        while i < len(lines) and not lines[i].strip().startswith(tag):
            i += 1
        i += 1

    seek("avec")
    x2c = np.zeros((3, 3))
    for j in range(3):
        x2c[:, j] = [float(v) for v in lines[i + j].split()[:3]]
    seek("atoms")
    nspecies = int(lines[i].split()[0])
    i += 1
    species, natoms, pos = [], [], []
    for _ in range(nspecies):
        name = lines[i].split()[0].strip("'\"")
        species.append(name.replace(".in", ""))
        i += 1
        na = int(lines[i].split()[0])
        i += 1
        nat_sp = []
        for _ in range(na):
            nat_sp.append([float(v) for v in lines[i].split()[:3]])
            i += 1
        natoms.append(na)
        pos.append(np.asarray(nat_sp))
    return {"x2c": x2c, "species": species, "natoms": natoms,
            "pos_frac": pos}


def read_state(path: str, ncell: int) -> dict:
    """Parse the STATE.OUT binary (reference read_elk_state,
    src/elk_private@proc.f90:330-476). ncell = total atoms in the cell
    (from GEOMETRY.OUT)."""
    f = _FortranRecords(path)
    version = f.ints(3)

    def newer(i, j, k):
        v = tuple(int(x) for x in version)
        return v >= (i, j, k)

    f.record()                       # spinpol logical
    nspecies = int(f.ints(1)[0])
    lmmaxvr = int(f.ints(1)[0])
    lmaxvr = int(round(math.sqrt(lmmaxvr))) - 1
    nrmtmax = int(f.ints(1)[0])
    if newer(2, 1, 22):
        f.ints(1)                    # nrcmtmax
    spr = np.zeros((nspecies, nrmtmax))
    nrmt = np.zeros(nspecies, dtype=int)
    for isp in range(nspecies):
        f.ints(1)                    # natoms(is)
        nrmt[isp] = int(f.ints(1)[0])
        spr[isp, :nrmt[isp]] = f.floats()[:nrmt[isp]]
        if newer(2, 1, 22):
            f.ints(1)                # nrcmt(is)
            f.floats()               # rcmt
    ngrid = f.ints(3)
    ngvec = int(f.ints(1)[0])
    f.ints()                         # ndmag
    f.ints()                         # nspinor
    if newer(2, 1, 22):
        f.ints()                     # fixspin/fsmtype
    if newer(2, 3, 16):
        f.ints()                     # ftmtype
    f.ints()                         # ldapu/dftu
    f.ints()                         # lmmaxdm
    ngrtot = int(np.prod(ngrid))
    data = f.floats()
    nmt = lmmaxvr * nrmtmax * ncell
    rhomt = data[:nmt].reshape(ncell, nrmtmax, lmmaxvr)  # fortran order:
    # rhotmp(lmmaxvr, nrmtmax, ncell) stored column-major == this C view
    rhoir = data[nmt:nmt + ngrtot]
    return {"version": version, "lmaxvr": lmaxvr, "nrmt": nrmt,
            "spr": spr, "ngrid": np.asarray(ngrid, dtype=int),
            "ngvec": ngvec, "rhomt": rhomt, "rhoir": rhoir}


class ElkField:
    """Batched elk LAPW density evaluator (Cartesian bohr points)."""

    def __init__(self, geo: dict, st: dict):
        import jax.numpy as jnp

        self.geo, self.stt = geo, st
        x2c = geo["x2c"]
        self.lmax = st["lmaxvr"]
        nY = (self.lmax + 1) ** 2

        # per-cell-atom data (species-major order, like the reference env)
        pos_cart, spc_of = [], []
        for isp, posl in enumerate(geo["pos_frac"]):
            for p in posl:
                pos_cart.append(x2c @ p)
                spc_of.append(isp)
        self.pos_cart = jnp.asarray(np.asarray(pos_cart))
        self.spc_of = np.asarray(spc_of, dtype=int)
        ncell = len(spc_of)

        nrmt = st["nrmt"]
        self.rmt = np.array([st["spr"][s, nrmt[s] - 1]
                             for s in range(len(nrmt))])
        self.rmt_of = jnp.asarray(self.rmt[self.spc_of])
        self.spr_a = np.array([st["spr"][s, 0] for s in range(len(nrmt))])
        self.spr_b = np.array([
            math.log(self.rmt[s] / self.spr_a[s]) / (nrmt[s] - 1)
            for s in range(len(nrmt))])
        self.nrmt = nrmt

        # coefficient tables in the ops/rlm S basis: (ncell, nY, nrmtmax)
        sign = np.ones(nY)
        lp = np.zeros(nY)
        k = 0
        for l in range(self.lmax + 1):
            for m in range(-l, l + 1):
                lp[k] = l
                if m > 0:
                    sign[k] = (-1.0) ** m
                elif m < 0:
                    sign[k] = -1.0
                k += 1
        # note rhomt lm index runs m = -l..l (elk elem(l,m)), matching
        # the ops/rlm ordering
        self.C = jnp.asarray(np.transpose(st["rhomt"], (0, 2, 1))
                             * sign[None, :, None])    # (ncell, nY, nrmt)
        self.lpow = jnp.asarray(lp)

        # lattice for nearest-image wrapping
        self.P = jnp.asarray(x2c)
        self.Pinv = jnp.asarray(np.linalg.inv(x2c))

        # interstitial: FFT -> ngvec shortest G vectors
        ngrid = st["ngrid"]
        rho_g = st["rhoir"].reshape(tuple(ngrid), order="F")
        rhok = np.fft.fftn(rho_g) / rho_g.size
        b = 2.0 * math.pi * np.linalg.inv(x2c).T          # rows b_i
        ii = [np.fft.fftfreq(n, 1.0 / n).astype(int) for n in ngrid]
        I, J, K = np.meshgrid(*ii, indexing="ij")
        gint = np.stack([I, J, K], -1).reshape(-1, 3)
        gc = gint @ b                                      # (Ng, 3) cart
        glen = np.linalg.norm(gc, axis=1)
        order = np.argsort(glen, kind="stable")[:st["ngvec"]]
        self.vgc = jnp.asarray(gc[order])                  # (ngvec, 3)
        self.rhok_re = jnp.asarray(np.real(rhok.reshape(-1)[order]))
        self.rhok_im = jnp.asarray(np.imag(rhok.reshape(-1)[order]))

    @classmethod
    def from_files(cls, state_path: str, geometry_path: str) -> "ElkField":
        geo = read_geometry(geometry_path)
        st = read_state(state_path, ncell=sum(geo["natoms"]))
        return cls(geo, st)

    # -- evaluation -----------------------------------------------------
    def _assign(self, vT):
        import jax
        import jax.numpy as jnp

        d = vT[None, :, :] - self.pos_cart.T[:, :, None]   # (nc, 3, N)
        f = jnp.einsum("ij,ajn->ain", self.Pinv, d)
        f = f - jnp.round(jax.lax.stop_gradient(f))
        dc = jnp.einsum("ij,ajn->ain", self.P, f)
        r2 = jnp.sum(dc * dc, axis=1)
        iat = jnp.argmin(r2 - (self.rmt_of ** 2)[:, None], axis=0)
        r = jnp.sqrt(jnp.take_along_axis(r2, iat[None, :], axis=0)[0]
                     + 1e-300)
        ins = r < self.rmt_of[iat]
        sel = jnp.broadcast_to(iat[None, None, :], (1, 3, dc.shape[2]))
        d0 = jnp.take_along_axis(dc, sel, axis=0)[0]
        return iat, d0, r, ins

    def _interstitial(self, vT):
        import jax.numpy as jnp

        ph = self.vgc @ vT                                 # (ngvec, N)
        return (self.rhok_re @ jnp.cos(ph)) - (self.rhok_im @ jnp.sin(ph))

    def _mt(self, iat, vtT, r):
        """MT density: per-point atom table gather + Lagrange radial +
        solid-harmonics contraction (reference rho2 MT branch)."""
        import jax
        import jax.numpy as jnp

        from ..ops.rlm import solid_harmonics

        spc = self.spc_of
        a = jnp.asarray(self.spr_a)[jnp.asarray(spc)][iat]
        b = jnp.asarray(self.spr_b)[jnp.asarray(spc)][iat]
        nr = jnp.asarray(self.nrmt)[jnp.asarray(spc)][iat]
        rc = jnp.maximum(r, a)
        ir = jnp.clip(jnp.floor(jnp.log(rc / a) / b).astype(jnp.int32) + 1,
                      2, nr - 2)
        ii = (ir[:, None] - 2) + jnp.arange(4)[None, :]    # (N,4) 0-based
        r1 = a[:, None] * jnp.exp(ii * b[:, None])
        dr = rc[:, None] - r1
        w = []
        for p in range(4):
            num = 1.0
            for q in range(4):
                if q != p:
                    num = num * dr[:, q] / (r1[:, p] - r1[:, q])
            w.append(num)
        W = jnp.stack(w, axis=1)                           # (N,4)
        idx = jax.lax.stop_gradient(ii)                    # radial nodes
        # gather (N, nY, 4) coefficient nodes for each point's atom
        Ct = self.C[iat]                                   # (N, nY, nrmt)
        cn = jnp.take_along_axis(
            Ct, idx[:, None, :].repeat(Ct.shape[1], 1), axis=2)
        g = jnp.einsum("na,nya->ny", W, cn)                # rho_lm(r)
        S = solid_harmonics(vtT, self.lmax)                # (nY, N)
        rl = jnp.exp(self.lpow[:, None] * jnp.log(rc)[None, :])
        return jnp.sum(g.T / rl * S, axis=0)

    def rho(self, vT):
        import jax
        import jax.numpy as jnp

        iat, d0, r, ins = self._assign(vT)
        iat = jax.lax.stop_gradient(iat)
        ins = jax.lax.stop_gradient(ins)
        mt = self._mt(iat, d0, r)
        return jnp.where(ins, mt, self._interstitial(vT))

    def grd(self, points_cart, nder: int = 2):
        """(rho (N,), grad (3,N), hess6 (6,N)) at Cartesian (N,3) points;
        derivatives by forward autodiff. Gradient nulled within 1e-5 of a
        nucleus (reference rho2 :195-198)."""
        import jax
        import jax.numpy as jnp

        x = jnp.atleast_2d(jnp.asarray(points_cart))
        vT = x.T
        f = self.rho(vT)
        if nder <= 0:
            return f, None, None
        basis = [jnp.zeros_like(vT).at[k].set(1.0) for k in range(3)]
        grads = [jax.jvp(self.rho, (vT,), (basis[k],))[1] for k in range(3)]
        gf = jnp.stack(grads)
        if nder == 1:
            h6 = None
        else:
            def gk(v, k):
                return jax.jvp(self.rho, (v,), (basis[k],))[1]

            h = {}
            for a_ in range(3):
                for b_ in range(a_, 3):
                    h[(a_, b_)] = jax.jvp(lambda v: gk(v, a_), (vT,),
                                          (basis[b_],))[1]
            h6 = jnp.stack([h[(0, 0)], h[(0, 1)], h[(0, 2)],
                            h[(1, 1)], h[(1, 2)], h[(2, 2)]])
        _, _, r, ins = self._assign(vT)
        isnuc = ins & (r < 1e-5)
        gf = jnp.where(isnuc[None, :], 0.0, gf)
        return f, gf, h6
