"""Quantum ESPRESSO Kohn-Sham states and Wannier functions (pwc files).

Role of the reference qedat type and its grid3mod machinery
(src/grid3mod.f90:26-46; read_pwc src/grid3mod@proc.f90:734-852;
read_wannier_chk :899-1038; rotate_qe_evc :1440-1497; get_qe_wnr
:1507-1624).  The reference streams plane-wave coefficients band by band
from scratch files and assembles one Wannier function at a time with
per-k FFT loops.  Here the whole coefficient block lives in memory, the
Bloch orbitals are built with batched device FFTs, the U rotation is one
einsum over the band axis, and every lattice-translated Wannier image on
the home cell is produced by a single (nlat, nks) phase matrix times the
(nks, Npts) Bloch stack - an MXU matmul instead of the reference's
accumulation loop.

Conventions (matching the reference bit-for-bit where it matters):
- pwc record layout as written by QE's pw2critic.x (read_pwc cites the
  record order); Fortran sequential unformatted with 4-byte markers.
- cfftnd(+1) is an UNSCALED backward transform (src/cfftnd.f90:34-40),
  i.e. np.fft.ifftn(x, norm="forward").
- Grids are Fortran-ordered flat (n1 fastest); nl/igk_k are 1-based.
- Lattice vectors R are enumerated ilat = k3 + nk3*(k2 + nk2*k1)
  (C-order over (k1,k2,k3)), the same ordering the reference derives
  from the k-point list (get_qe_wnr, src/grid3mod@proc.f90:1594-1599).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np


# ---------------------------------------------------------------- file layer

class FortranFile:
    """Sequential Fortran unformatted records (4-byte length markers)."""

    def __init__(self, path, mode="rb"):
        self.fh = open(path, mode)

    def read_record(self, dtype=None, count=-1):
        head = self.fh.read(4)
        if len(head) < 4:
            raise EOFError("no more records")
        nbytes = int(np.frombuffer(head, np.int32)[0])
        raw = self.fh.read(nbytes)
        tail = self.fh.read(4)
        if len(tail) < 4 or int(np.frombuffer(tail, np.int32)[0]) != nbytes:
            raise ValueError("corrupt Fortran record")
        if dtype is None:
            return raw
        return np.frombuffer(raw, dtype=dtype, count=count)

    def write_record(self, *arrays):
        raw = b"".join(np.asarray(a).tobytes() for a in arrays)
        mark = np.int32(len(raw)).tobytes()
        self.fh.write(mark + raw + mark)

    def close(self):
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


# ------------------------------------------------------------------ QE data

@dataclass
class QEData:
    """In-memory image of a pwc file (+ optional wannier90 chk data)."""

    nks: int                 # number of k-points
    nk: np.ndarray           # (3,) k-grid dimensions
    nbnd: int
    nspin: int
    gamma_only: bool
    n: tuple                 # (n1, n2, n3) real-space grid
    at: np.ndarray           # (3,3) lattice vectors (columns), pwc units
    kpt: np.ndarray          # (nks, 3) crystallographic k-points
    wk: np.ndarray           # (nks,)
    ek: np.ndarray           # (nspin*nks, nbnd) band energies [Ha]
    occ: np.ndarray          # (nspin*nks, nbnd)
    ngk: np.ndarray          # (nks,)
    igk_k: np.ndarray        # (nks, npwx) 1-based
    nl: np.ndarray           # (ngms,)  1-based flat Fortran grid index
    nlm: np.ndarray | None   # (ngms,)  gamma-only partner
    evc: np.ndarray          # (nspin, nks, nbnd, npwx) complex128
    fpwc: str = ""
    # wannier (read_wannier_chk)
    iswan: bool = False
    nbndw: np.ndarray = dfield(default_factory=lambda: np.zeros(2, np.int64))
    center: np.ndarray | None = None   # (nspin, nbndw, 3) cryst (supercell)
    spread: np.ndarray | None = None   # (nspin, nbndw) bohr
    u: np.ndarray | None = None        # (nspin, nks, nbndw, nbndw)

    @property
    def nlat(self) -> int:
        return int(np.prod(self.nk))

    def rvectors(self) -> np.ndarray:
        """(nlat, 3) integer lattice vectors, ilat = k3+nk3*(k2+nk2*k1)."""
        k1, k2, k3 = np.meshgrid(np.arange(self.nk[0]), np.arange(self.nk[1]),
                                 np.arange(self.nk[2]), indexing="ij")
        return np.stack([k1.ravel(), k2.ravel(), k3.ravel()], axis=1)

    # ------------------------------------------------------- device programs

    def bloch_on_grid(self, spin: int, band: int, useu: bool = True):
        """Periodic parts u_k(r) of (optionally U-rotated) band `band`:
        (nks, n1, n2, n3) complex.  Batched-FFT replacement for the
        reference scratch-file pipeline (rotate_qe_evc + the per-k FFT in
        get_qe_wnr, src/grid3mod@proc.f90:1440-1580)."""
        import jax.numpy as jnp

        n1, n2, n3 = self.n
        ntot = n1 * n2 * n3
        if useu and self.iswan:
            nb = int(self.nbndw[spin])
            # evcnew_k = sum_j U[k, j, band] evc_{k j}  (rotate_qe_evc)
            coef = np.einsum("kj,kjp->kp", self.u[spin, :, :nb, band],
                             self.evc[spin, :, :nb, :])
        else:
            coef = self.evc[spin, :, band, :]
        # scatter to the FFT grid (host: irregular index write), then batch FFT
        grids = np.zeros((self.nks, ntot), np.complex128)
        for ik in range(self.nks):
            npw = int(self.ngk[ik])
            idx = self.nl[self.igk_k[ik, :npw] - 1] - 1
            grids[ik, idx] = coef[ik, :npw]
            if self.gamma_only and self.nlm is not None:
                idxm = self.nlm[self.igk_k[ik, :npw] - 1] - 1
                grids[ik, idxm] = np.conj(coef[ik, :npw])
        g = grids.reshape(self.nks, n3, n2, n1).transpose(0, 3, 2, 1)
        # Fortran-flat -> (n1,n2,n3); cfftnd(+1) == ifftn(norm="forward")
        return jnp.fft.ifftn(jnp.asarray(g), axes=(1, 2, 3), norm="forward")

    def wannier_home(self, spin: int, band: int, useu: bool = True,
                     phase_fix: bool = True):
        """All lattice images of Wannier function `band` on the home cell:
        W[ilat, i, j, k] = w_{band, R_ilat}(x_ijk)  (nlat, n1, n2, n3).

        Equals the reference get_qe_wnr supercell output read per cell
        copy (src/grid3mod@proc.f90:1507-1624): the supercell value at
        cell copy R is the home-cell value of the image translated by R.
        The k-sum is a (nlat, nks) phase matrix times the Bloch stack.
        """
        import jax.numpy as jnp

        n1, n2, n3 = self.n
        u = self.bloch_on_grid(spin, band, useu=useu)        # (nks, n1,n2,n3)
        fx = jnp.arange(n1) / n1
        fy = jnp.arange(n2) / n2
        fz = jnp.arange(n3) / n3
        kpt = jnp.asarray(self.kpt)
        ph = jnp.exp(2j * jnp.pi * (
            kpt[:, 0, None, None, None] * fx[None, :, None, None]
            + kpt[:, 1, None, None, None] * fy[None, None, :, None]
            + kpt[:, 2, None, None, None] * fz[None, None, None, :]))
        psi = (u * ph).reshape(self.nks, -1)                 # (nks, N)
        rvec = jnp.asarray(self.rvectors(), dtype=jnp.float64)  # (nlat, 3)
        E = jnp.exp(-2j * jnp.pi * (rvec @ kpt.T)) / self.nlat  # (nlat, nks)
        W = (E @ psi)                                        # (nlat, N) matmul
        if phase_fix:
            # reference tnorm: rotate the global abs-max value to real+
            imax = int(jnp.argmax(jnp.abs(W)))
            t = W.reshape(-1)[imax]
            W = W * (jnp.abs(t) / t)
        return W.reshape(self.nlat, n1, n2, n3)


def read_pwc(path: str) -> tuple[QEData, np.ndarray]:
    """Read a pwc file (pw2critic.x); returns (QEData, rho grid (n1,n2,n3)).

    Mirrors src/grid3mod@proc.f90:734-852 including the density build
    rho = fspin/(det(at) sum(wk)) * sum_{s,k,b} occ |ifft(evc)|^2 and the
    cart->cryst k-point conversion kpt_cryst = kpt @ at."""
    fh = FortranFile(path)
    fh.read_record()                      # version
    fh.read_record()                      # nsp, nat
    fh.read_record()                      # atm
    fh.read_record()                      # ityp
    fh.read_record()                      # tau
    at = fh.read_record(np.float64)[:9].reshape(3, 3, order="F")
    hdr = fh.read_record(np.int32)
    nks, nbnd, nspin = int(hdr[0]), int(hdr[1]), int(hdr[2])
    gamma_only = bool(hdr[3])
    nk = fh.read_record(np.int32)[:3].astype(np.int64)
    n = tuple(int(v) for v in fh.read_record(np.int32)[:3])
    npwx, ngms = (int(v) for v in fh.read_record(np.int32)[:2])
    nkstot = nspin * nks
    kpt = fh.read_record(np.float64).reshape(nks, 3)          # (nks,3) cart
    wk = fh.read_record(np.float64)[:nks]
    ek = fh.read_record(np.float64).reshape(nkstot, nbnd)
    occ = fh.read_record(np.float64).reshape(nkstot, nbnd)
    ngk = fh.read_record(np.int32)[:nks].astype(np.int64)
    igk_k = fh.read_record(np.int32).reshape(nks, npwx).astype(np.int64)
    nl = fh.read_record(np.int32)[:ngms].astype(np.int64)
    nlm = None
    if gamma_only:
        nlm = fh.read_record(np.int32)[:ngms].astype(np.int64)

    # cart (2pi/alat) -> crystallographic; Ry -> Ha
    kpt = kpt @ at
    ek = 0.5 * ek

    evc = np.zeros((nspin, nks, nbnd, npwx), np.complex128)
    for ispin in range(nspin):
        for ik in range(nks):
            for ib in range(nbnd):
                evc[ispin, ik, ib, :ngk[ik]] = fh.read_record(
                    np.complex128)[:ngk[ik]]
    fh.close()

    qe = QEData(nks=nks, nk=nk, nbnd=nbnd, nspin=nspin, gamma_only=gamma_only,
                n=n, at=at, kpt=kpt, wk=wk, ek=ek, occ=occ, ngk=ngk,
                igk_k=igk_k, nl=nl, nlm=nlm, evc=evc, fpwc=path)

    # electron density (batched over bands on device)
    import jax.numpy as jnp

    fspin = 2.0 if nspin == 1 else 1.0
    n1, n2, n3 = n
    rho = np.zeros(n, np.float64)
    for ispin in range(nspin):
        for ik in range(nks):
            npw = int(ngk[ik])
            idx = nl[igk_k[ik, :npw] - 1] - 1
            grids = np.zeros((nbnd, n1 * n2 * n3), np.complex128)
            grids[:, idx] = evc[ispin, ik, :, :npw]
            if gamma_only and nlm is not None:
                idxm = nlm[igk_k[ik, :npw] - 1] - 1
                grids[:, idxm] = np.conj(evc[ispin, ik, :, :npw])
            g = grids.reshape(nbnd, n3, n2, n1).transpose(0, 3, 2, 1)
            psi = jnp.fft.ifftn(jnp.asarray(g), axes=(1, 2, 3), norm="forward")
            w = jnp.asarray(occ[ispin * nks + ik])[:, None, None, None]
            rho += np.asarray((w * jnp.abs(psi) ** 2).sum(0))
    rho *= fspin / (abs(np.linalg.det(at)) * wk.sum())
    return qe, rho


def read_wannier_chk(qe: QEData, fileup: str, filedn: str | None = None):
    """Attach wannier90 .chk data (U matrices, centers, spreads) to `qe`.

    Mirrors src/grid3mod@proc.f90:899-1038: rejects excluded bands and
    disentanglement, checks k-point consistency, converts centers to
    crystallographic (supercell fraction * nk) and spreads to bohr."""
    nspin = qe.nspin
    if (filedn is not None) != (nspin == 2):
        raise ValueError("chk files inconsistent with nspin")
    files = [fileup] + ([filedn] if filedn else [])
    bohrtoa = 0.52917720859

    nbndw = np.zeros(2, np.int64)
    udata, cdata, sdata = [], [], []
    for is_, fname in enumerate(files):
        fh = FortranFile(fname)
        fh.read_record()                                   # header
        nbnd = int(fh.read_record(np.int32)[0])
        jexcl = int(fh.read_record(np.int32)[0])
        if jexcl > 0:
            raise ValueError("number of excluded bands must be 0")
        if nbnd != qe.nbnd and nspin == 1:
            raise ValueError("number of bands different in wannier and qe")
        fh.read_record()                                   # excluded list
        rlatt = fh.read_record(np.float64)[:9].reshape(3, 3, order="F")
        fh.read_record(np.float64)                         # recip lattice
        nks = int(fh.read_record(np.int32)[0])
        nk = fh.read_record(np.int32)[:3].astype(np.int64)
        if nks == 0 or np.any(nk == 0) or nks != int(np.prod(nk)):
            raise ValueError("error in number of k-points (wannier)")
        if nks != qe.nks:
            raise ValueError("number of k-points from wannier != qe")
        kpt = fh.read_record(np.float64).reshape(nks, 3)
        ik = np.rint(kpt * nk[None, :])
        if np.max(np.abs(kpt * nk[None, :] - ik)) > 1e-5:
            raise ValueError("not a uniform monkhorst-pack grid")
        if np.max(np.abs(kpt - qe.kpt)) > 1e-5:
            raise ValueError("inconsistent wannier/qe k-point coordinates")
        qe.nk = nk
        fh.read_record()                                   # nntot
        jb = int(fh.read_record(np.int32)[0])              # num wann
        nbndw[is_] = jb
        fh.read_record()                                   # chkpt position
        disent = bool(fh.read_record(np.int32)[0])
        if disent:
            raise ValueError("cannot handle disentangled wannier functions")
        u = fh.read_record(np.complex128).reshape(nks, jb, jb)
        u = u.transpose(0, 2, 1)                           # (k, i, j) col-major
        fh.read_record()                                   # m matrix
        cen = fh.read_record(np.float64).reshape(jb, 3)
        spr = fh.read_record(np.float64)[:jb]
        fh.close()
        # centers: cartesian (ang) -> supercell crystallographic
        cen = cen @ np.linalg.inv(rlatt)
        cen = np.where(cen > nk[None, :], cen - nk[None, :], cen)
        cen = np.where(cen < 0.0, cen + nk[None, :], cen)
        spr = np.sqrt(spr) / bohrtoa
        udata.append(u)
        cdata.append(cen)
        sdata.append(spr)

    jb = int(nbndw[:len(files)].max())
    qe.nbndw = nbndw if nspin == 2 else np.array([nbndw[0], nbndw[0]])
    qe.u = np.zeros((nspin, qe.nks, jb, jb), np.complex128)
    qe.center = np.zeros((nspin, jb, 3))
    qe.spread = np.zeros((nspin, jb))
    for is_ in range(len(files)):
        b = int(nbndw[is_])
        qe.u[is_, :, :b, :b] = udata[is_]
        qe.center[is_, :b] = cdata[is_]
        qe.spread[is_, :b] = sdata[is_]
    qe.iswan = True
    return qe
