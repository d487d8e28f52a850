"""DFTB+ wavefunction fields (Slater-Koster basis), TPU-native.

Role of the reference dftb_private (src/dftb_private.f90:63-65,
src/dftb_private@proc.f90): read a DFTB+ calculation (detailed.xml for
dimensions/k-points/occupations, eigenvec.bin for eigenvectors, and the
wfc .hsd file for the Slater basis) and evaluate rho / grad rho / H /
G(r) at arbitrary points.

The basis: per species and angular momentum l, a radial function
R_l(r) = sum_i exp(-a_i r) sum_j c_ij r^{l+j-1} (reference calculate_rl,
src/dftb_private@proc.f90:940-982) times real spherical harmonics; an
AO on atom A with k-point phase e^{i k.L} per periodic image L. MOs are
psi_sk = sum_AO evec[AO, s, k] chi_AO and
rho = sum_sk occ_sk w_k |psi_sk|^2.

TPU mapping: the reference walks a per-point neighbor list and
hand-assembles ylmderiv tables (src/dftb_private@proc.f90:230-526).
Here all candidate periodic images enter one masked batch: AO values
for (points x images x orbitals) are dense arrays, the image->cell-AO
reduction is a segment sum with the k phase, the AO->MO contraction is
one complex matmul per (spin, k) on the MXU, and derivatives come from
nested forward-mode autodiff of the same smooth expression (exact, same
strategy as fields/wien.py). The radial part is evaluated EXACTLY (the
reference default interpolates a precomputed log grid; `exact=True`
semantics) - polynomials x exponentials are cheap on the VPU.
"""
from __future__ import annotations

import re
import struct as _struct
from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DftbBasisOrbital", "DftbData", "DftbField",
           "read_detailed_xml", "read_eigenvec_bin", "read_hsd_basis"]


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------
def read_detailed_xml(path: str) -> dict:
    """Parse the DFTB+ detailed.xml: flags, k-points (x 2pi, weights
    folded into occupations) and occupations (reference dftb_read first
    and second xml passes, src/dftb_private@proc.f90:76-120)."""
    text = open(path).read()
    low = text.lower()

    def tagval(name):
        m = re.search(rf"<{name}>\s*([^<]+)\s*</{name}>", low)
        if not m:
            raise ValueError(f"detailed.xml: missing <{name}>")
        return m.group(1).strip()

    isreal = tagval("real") in ("yes", "true", ".true.", "t", "1")
    nkpt = int(tagval("nrofkpoints"))
    nspin = int(tagval("nrofspins"))
    nstates = int(tagval("nrofstates"))
    norb = int(tagval("nroforbitals"))

    m = re.search(r"<kpointsandweights>(.*?)</kpointsandweights>", low,
                  re.S)
    if not m:
        raise ValueError("detailed.xml: missing <kpointsandweights>")
    vals = np.array([float(v) for v in m.group(1).split()])
    if vals.size != 4 * nkpt:
        raise ValueError("detailed.xml: bad kpointsandweights block")
    vals = vals.reshape(nkpt, 4)
    kpts = vals[:, :3] * (2.0 * np.pi)
    w = vals[:, 3]

    m = re.search(r"<occupations>(.*)</occupations>", low, re.S)
    if not m:
        raise ValueError("detailed.xml: missing <occupations>")
    occ = np.zeros((nstates, nkpt, nspin))
    body = m.group(1)
    # per spin, per k: a <kN> ... </kN> block of nstates numbers
    pos = 0
    for ispin in range(nspin):
        for ik in range(nkpt):
            mk = re.search(rf"<k{ik + 1}>(.*?)</k{ik + 1}>", body[pos:],
                           re.S)
            if not mk:
                raise ValueError(f"detailed.xml: missing occupations "
                                 f"<k{ik + 1}> (spin {ispin + 1})")
            nums = [float(v) for v in mk.group(1).split()]
            if len(nums) < nstates:
                raise ValueError("detailed.xml: short occupation block")
            occ[:, ik, ispin] = nums[:nstates]
            pos += mk.end()
    occ = occ * w[None, :, None]      # fold in k weights (reference :115)
    return dict(isreal=isreal, nkpt=nkpt, nspin=nspin, nstates=nstates,
                norb=norb, kpts=kpts, occ=occ)


def read_eigenvec_bin(path: str, norb: int, nstates: int, nkpt: int,
                      nspin: int, isreal: bool):
    """Fortran sequential unformatted eigenvec.bin: one int record
    (identity), then per spin (x kpt) x state one record of norb f64 or
    complex128 (reference dftb_read, src/dftb_private@proc.f90:122-142)."""
    buf = open(path, "rb").read()
    off = 0

    def rec():
        nonlocal off
        (n,) = _struct.unpack_from("<i", buf, off)
        off += 4
        payload = buf[off:off + n]
        off += n
        (n2,) = _struct.unpack_from("<i", buf, off)
        off += 4
        if n2 != n:
            raise ValueError("eigenvec.bin: bad record markers")
        return payload

    rec()                                           # identity
    if isreal:
        ev = np.empty((norb, nstates, nspin))
        for i in range(nspin):
            for k in range(nstates):
                ev[:, k, i] = np.frombuffer(rec(), dtype="<f8", count=norb)
        return ev
    ev = np.empty((norb, nstates, nkpt, nspin), dtype=complex)
    for i in range(nspin):
        for j in range(nkpt):
            for k in range(nstates):
                ev[:, k, j, i] = np.frombuffer(rec(), dtype="<c16",
                                               count=norb)
    return ev


@dataclass
class DftbBasisOrbital:
    l: int
    occ: float
    cutoff: float
    eexp: np.ndarray            # (nexp,)
    coef: np.ndarray            # (nexp, ncoef)


def read_hsd_basis(path: str) -> dict:
    """Parse the wfc .hsd basis file: {z: [DftbBasisOrbital, ...]}
    (reference next_hsd_atom, src/dftb_private@proc.f90 hsd parser)."""
    text = open(path).read()
    # tokenize into a brace tree
    toks = re.findall(r"\{|\}|=|[^\s{}=]+", text)
    i = 0

    def parse_block():
        nonlocal i
        items = []
        while i < len(toks):
            if toks[i] == "}":
                i += 1
                return items
            name = toks[i]
            i += 1
            if i < len(toks) and toks[i] == "=":
                i += 1
                # value: either scalar or block
                if toks[i] == "{":
                    i += 1
                    items.append((name.lower(), parse_block()))
                else:
                    items.append((name.lower(), toks[i]))
                    i += 1
            elif i < len(toks) and toks[i] == "{":
                i += 1
                items.append((name.lower(), parse_block()))
            else:
                items.append((name.lower(), None))
        return items

    tree = parse_block()
    out = {}
    for name, body in tree:
        if not isinstance(body, list):
            continue
        z = None
        orbs = []
        for key, val in body:
            if key == "atomicnumber":
                z = int(float(val))
            elif key == "orbital" and isinstance(val, list):
                d = dict(val)
                nums = [float(k) for k, _ in d.get("exponents", [])]
                coefs = [float(k) for k, _ in d.get("coefficients", [])]
                nexp = len(nums)
                if nexp == 0 or len(coefs) % nexp:
                    raise ValueError(f"hsd: bad orbital block for {name}")
                nc = len(coefs) // nexp
                orbs.append(DftbBasisOrbital(
                    l=int(float(d["angularmomentum"])),
                    occ=float(d.get("occupation", 0.0)),
                    cutoff=float(d["cutoff"]),
                    eexp=np.asarray(nums),
                    coef=np.asarray(coefs).reshape(nexp, nc)))
        if z is None:
            raise ValueError(f"hsd: atom block {name} missing "
                             "AtomicNumber")
        out[z] = orbs
    return out


# ---------------------------------------------------------------------------
# field
# ---------------------------------------------------------------------------
@dataclass
class DftbData:
    isreal: bool
    kpts: np.ndarray           # (nkpt, 3) already x 2pi
    occ: np.ndarray            # (nstates, nkpt, nspin) x k-weight
    evec: np.ndarray           # real: (norb, nstates, nspin);
    #                            complex: (norb, nstates, nkpt, nspin)
    basis: dict                # z -> [DftbBasisOrbital]


class DftbField:
    """Evaluator for rho/grad/H/gkin of a DFTB+ wavefunction."""

    def __init__(self, crystal, data: DftbData):
        self.crystal = crystal
        self.data = data
        c = crystal
        zs = [c.species[s].z for s in np.asarray(c.species_of)]
        for z in zs:
            if z not in data.basis:
                raise ValueError(f"dftb basis missing for Z={z}")
        # AO order: cell atoms in order, per atom its orbitals, per
        # orbital m = -l..l (reference idxorb, dftb_read :172-190)
        ao_atom, ao_orb, ao_l, ao_m = [], [], [], []
        for ia, z in enumerate(zs):
            for io, orb in enumerate(data.basis[z]):
                for m in range(-orb.l, orb.l + 1):
                    ao_atom.append(ia)
                    ao_orb.append(io)
                    ao_l.append(orb.l)
                    ao_m.append(m)
        self.norb = len(ao_atom)
        if self.norb != data.evec.shape[0]:
            raise ValueError(
                f"AO count {self.norb} != eigenvector rows "
                f"{data.evec.shape[0]}")
        self._zs = zs
        self.globalcutoff = max(o.cutoff for z in set(zs)
                                for o in data.basis[z])
        self._images = self._build_images()
        self._jit = {}

    # -- periodic images whose basis sphere can reach the cell ----------
    def _build_images(self):
        c = self.crystal
        x = np.asarray(c.x_frac)
        if getattr(c, "ismolecule", False):
            lvecs = np.zeros((1, 3))
        else:
            # enough lattice shells to cover the global cutoff from any
            # point in the home cell
            m = np.asarray(c.m_x2c)
            inv = np.linalg.inv(m)
            h = 1.0 / np.linalg.norm(inv, axis=1)    # plane spacings
            nsh = np.maximum(1, np.ceil(self.globalcutoff / h + 1)
                             .astype(int))
            rng = [np.arange(-n, n + 1) for n in nsh]
            lvecs = np.stack(np.meshgrid(*rng, indexing="ij"),
                             axis=-1).reshape(-1, 3)
        # images: (nimg, 3) cart position, atom index, lattice vector
        pos, iat, lat = [], [], []
        mm = np.asarray(c.m_x2c)
        for L in lvecs:
            pc = (x + L) @ mm.T
            pos.append(pc)
            iat.append(np.arange(len(x)))
            lat.append(np.tile(L, (len(x), 1)))
        return (np.concatenate(pos), np.concatenate(iat),
                np.concatenate(lat))

    # -- AO tables -------------------------------------------------------
    def _ao_tables(self):
        """Static per-AO-image arrays for the dense masked batch."""
        data = self.data
        zs = self._zs
        pos, iat, lat = self._images
        # per (image, orbital-of-that-atom): radial params padded
        rows = []
        maxexp = max(len(o.eexp) for z in set(zs) for o in data.basis[z])
        maxco = max(o.coef.shape[1] for z in set(zs)
                    for o in data.basis[z])
        for ii in range(len(iat)):
            z = zs[iat[ii]]
            ao0 = int(np.sum([2 * o.l + 1 for a in range(iat[ii])
                              for o in data.basis[zs[a]]]))
            for io, orb in enumerate(data.basis[z]):
                for m in range(-orb.l, orb.l + 1):
                    ee = np.zeros(maxexp)
                    cc = np.zeros((maxexp, maxco))
                    ee[:len(orb.eexp)] = orb.eexp
                    cc[:orb.coef.shape[0], :orb.coef.shape[1]] = orb.coef
                    rows.append((pos[ii], lat[ii], ao0, orb.l, m,
                                 orb.cutoff, ee, cc))
                    ao0 += 1
        pos_a = np.array([r[0] for r in rows])
        lat_a = np.array([r[1] for r in rows])
        ao_a = np.array([r[2] for r in rows], dtype=np.int32)
        l_a = np.array([r[3] for r in rows], dtype=np.int32)
        m_a = np.array([r[4] for r in rows], dtype=np.int32)
        cut_a = np.array([r[5] for r in rows])
        ee_a = np.array([r[6] for r in rows])
        cc_a = np.array([r[7] for r in rows])
        return pos_a, lat_a, ao_a, l_a, m_a, cut_a, ee_a, cc_a

    # -- evaluation -------------------------------------------------------
    def _build_fn(self, nder: int):
        data = self.data
        (pos_a, lat_a, ao_a, l_a, m_a, cut_a, ee_a, cc_a) = \
            self._ao_tables()
        lmax = int(l_a.max())
        nAO = self.norb
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        cdt = jnp.complex64 if on_tpu else jnp.complex128
        rdt = jnp.float32 if on_tpu else jnp.float64

        from ..ops.rlm import solid_harmonics

        pos_j = jnp.asarray(pos_a, rdt)
        ee_j = jnp.asarray(ee_a, rdt)
        cc_j = jnp.asarray(cc_a, rdt)
        cut2 = jnp.asarray(cut_a ** 2, rdt)
        l_j = jnp.asarray(l_a)
        nexp = ee_a.shape[1]
        ncoef = cc_a.shape[2]
        # index of the real spherical harmonic (l, m) in ops/rlm order
        rlm_idx = jnp.asarray(l_a * l_a + l_a + m_a, dtype=jnp.int32)

        occ = jnp.asarray(data.occ, rdt)               # (S, K, nspin)
        if data.isreal:
            ev = jnp.asarray(data.evec, rdt)           # (nAO, S, nspin)
        else:
            ev = jnp.asarray(data.evec).astype(cdt)    # (nAO, S, K, nspin)
            kph = jnp.exp(1j * (jnp.asarray(lat_a, rdt)
                                @ jnp.asarray(data.kpts.T, rdt))
                          .astype(cdt))                # (nrow, K)

        def chi(x):
            """AO values for all (image-AO rows) at one point x (3,)."""
            d = x[None, :].astype(rdt) - pos_j                 # (R, 3)
            r2 = (d * d).sum(-1)
            r = jnp.sqrt(jnp.maximum(r2, 1e-12))
            # radial part / r^l (smooth): sum_i e^{-a r} sum_j c r^{j-1}
            rp = jnp.stack([r ** j for j in range(ncoef)], -1)  # (R, nc)
            poly = (cc_j * rp[:, None, :]).sum(-1)              # (R, ne)
            rad = (jnp.exp(-ee_j * r[:, None]) * poly).sum(-1)  # (R,)
            # chi = R_l Y_lm = (R_l / r^l) (r^l Y_lm) = rad * S_lm with
            # S_lm the real SOLID harmonic (polynomial in x,y,z): the
            # whole expression is smooth, so nested jacfwd is exact
            S = solid_harmonics(d.T, lmax)                      # (nlm, R)
            Ssel = jnp.take_along_axis(
                S, rlm_idx[None, :], axis=0)[0]                 # (R,)
            val = rad * Ssel
            return jnp.where(r2 <= cut2, val, 0.0)

        def psi_all(x):
            """MO values (flattened over spin/k/state) at x, complex."""
            ch = chi(x)                                         # (R,)
            if data.isreal:
                xao = jax.ops.segment_sum(ch, jnp.asarray(ao_a),
                                          num_segments=nAO)     # (nAO,)
                # (nAO,) @ (nAO, S, nspin) -> (S, nspin)
                return jnp.tensordot(xao, ev, axes=(0, 0))
            out = []
            for k in range(data.kpts.shape[0]):
                xao = jax.ops.segment_sum(
                    (ch.astype(cdt) * kph[:, k]), jnp.asarray(ao_a),
                    num_segments=nAO)
                out.append(jnp.tensordot(xao, ev[:, :, k, :],
                                         axes=(0, 0)))          # (S, ns)
            return jnp.stack(out, axis=1)          # (S, K, nspin)

        occ_b = occ if not data.isreal else occ[:, 0, :]

        def point_quants(x):
            if data.isreal:
                psi = psi_all(x)                   # (S, nspin) real
                rho = (occ_b * psi * psi).sum()
                jac = jax.jacfwd(psi_all)(x)       # (S, nspin, 3)
                g = 2.0 * jnp.einsum("sn,snx->x", occ_b * psi, jac)
                gk = 0.5 * jnp.einsum("sn,snx,snx->", occ_b, jac, jac)
            else:
                psi = psi_all(x)                   # (S, K, nspin)
                rho = (occ * (psi * jnp.conj(psi)).real).sum()
                jac = jax.jacfwd(psi_all)(x)       # complex (S,K,ns,3)
                g = 2.0 * jnp.einsum("skn,sknx->x", occ * jnp.conj(psi),
                                     jac).real
                gk = 0.5 * jnp.einsum("skn,sknx->", occ,
                                      (jac * jnp.conj(jac)).real)
            return rho, g, gk

        def rho_only(x):
            return point_quants(x)[0]

        def one(x):
            rho, g, gk = point_quants(x)
            if nder < 2:
                return rho, g, jnp.zeros((3, 3), g.dtype), gk
            H = jax.jacfwd(lambda y: point_quants(y)[1])(x)
            return rho, g, 0.5 * (H + H.T), gk

        def fn(pts):
            rho, g, H, gk = jax.vmap(one)(pts.astype(rdt))
            return (rho.astype(jnp.float64),
                    g.astype(jnp.float64),
                    H.astype(jnp.float64),
                    gk.astype(jnp.float64))

        return jax.jit(fn)

    def eval(self, points, nder: int = 2, block: int = 1024):
        """points (N, 3) Cartesian -> (rho (N,), grad (N,3), H (N,3,3),
        gkin (N,))."""
        if nder not in self._jit:
            self._jit[nder] = self._build_fn(nder)
        fn = self._jit[nder]
        pts = jnp.atleast_2d(jnp.asarray(points))
        outs = [fn(pts[lo:lo + block])
                for lo in range(0, pts.shape[0], block)]
        return tuple(jnp.concatenate([o[i] for o in outs])
                     for i in range(4))

    @classmethod
    def from_files(cls, crystal, xml_path: str, bin_path: str,
                   hsd_path: str) -> "DftbField":
        meta = read_detailed_xml(xml_path)
        ev = read_eigenvec_bin(bin_path, meta["norb"], meta["nstates"],
                               meta["nkpt"], meta["nspin"],
                               meta["isreal"])
        data = DftbData(isreal=meta["isreal"], kpts=meta["kpts"],
                        occ=meta["occ"], evec=ev,
                        basis=read_hsd_basis(hsd_path))
        return cls(crystal, data)
