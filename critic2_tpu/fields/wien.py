"""WIEN2k LAPW density evaluator (struct + clmsum files).

Reference behavior: src/wien_private.f90:61-70 with the 2,043-line
implementation src/wien_private@proc.f90 — read_clmsum (:146), rho2
(:174), wien_read_struct (:476), readslm (:733), readk (:802), rotdef
(:945), gener (:1060), sternb (:1085), charge (:1291), radial (:1523),
rhoout (:1619). The field is a muffin-tin decomposition: inside atomic
spheres rho = sum_lm rho_lm(r) * S_lm(x^), with rho_lm on a logarithmic
radial grid and S_lm real (lattice/cubic) harmonics; in the interstitial
rho = sum_K s_K exp(2*pi*i K.x) over symmetry stars.

TPU design (not a translation):
  - All file parsing, symmetry assignment (rotdef), star expansion
    (sternb) and cubic-harmonics folding (Kara & Kurki-Suonio c_kub
    pairs/triples) happen once on the host into dense per-atom-type
    tables: combined radial coefficient rows (T, jri) and an angular
    matrix A (T, (lmax+1)^2) over real solid harmonics.
  - Muffin-tin evaluation is batched over points: one (T, nY) x (nY, N)
    MXU matmul for the angular part (ops/rlm.solid_harmonics), a 4-node
    gather + Lagrange combination on the log radial grid for the radial
    part (exactly the reference `radial` node scheme for the value).
  - The interstitial is a points-by-waves phase matmul + cos/sin
    contraction - MXU-native.
  - Gradients and Hessians come from forward-mode autodiff (jvp) through
    the smooth evaluation chain instead of the reference's ylmderiv
    tables and finite-difference radial derivative stacks; they are the
    exact derivatives of the same interpolant (the reference instead
    Lagrange-interpolates separately-derived radial FD curves, an
    O(h^3)-equivalent choice).
  - Per equivalent atom the whole symmetry chain (rotator/rotato/reduc/
    rotat) collapses to one constant 3x3 local map M applied to the
    nearest-image displacement; M is precomputed on the host.
"""
from __future__ import annotations

import math

import numpy as np

LMAX2 = 14          # max l in the LM expansion (reference lmax2)
_SQFP = math.sqrt(4.0 * math.pi)
_PWCUT = 1e-30


def _c_kub() -> np.ndarray:
    """Kara & Kurki-Suonio cubic-harmonic coefficients
    (reference src/param.F90:629-653)."""
    c = np.zeros((LMAX2 + 1, LMAX2 + 1))
    c[0, 0] = 1.0
    c[3, 2] = 1.0
    c[4, 0] = 0.5 * math.sqrt(7.0 / 3.0)
    c[4, 4] = 0.5 * math.sqrt(5.0 / 3.0)
    c[6, 0] = 0.5 * math.sqrt(0.5)
    c[6, 2] = 0.25 * math.sqrt(11.0)
    c[6, 4] = -0.5 * math.sqrt(7.0 / 2.0)
    c[6, 6] = -0.25 * math.sqrt(5.0)
    c[7, 2] = 0.5 * math.sqrt(13.0 / 6.0)
    c[7, 6] = 0.5 * math.sqrt(11.0 / 6.0)
    c[8, 0] = 0.125 * math.sqrt(33.0)
    c[8, 4] = 0.25 * math.sqrt(7.0 / 3.0)
    c[8, 8] = 0.125 * math.sqrt(65.0 / 3.0)
    c[9, 2] = 0.25 * math.sqrt(3.0)
    c[9, 4] = 0.5 * math.sqrt(17.0 / 6.0)
    c[9, 6] = -0.25 * math.sqrt(13.0)
    c[9, 8] = -0.5 * math.sqrt(7.0 / 6.0)
    c[10, 0] = 0.125 * math.sqrt(65.0 / 6.0)
    c[10, 2] = 0.125 * math.sqrt(247.0 / 6.0)
    c[10, 4] = -0.25 * math.sqrt(11.0 / 2.0)
    c[10, 6] = 0.0625 * math.sqrt(19.0 / 3.0)
    c[10, 8] = -0.125 * math.sqrt(187.0 / 6.0)
    c[10, 10] = -0.0625 * math.sqrt(85.0)
    return c


def _f(s: str) -> float:
    s = s.strip()
    return float(s) if s else 0.0


def _i(s: str) -> int:
    s = s.strip()
    return int(s) if s else 0


# ---------------------------------------------------------------------
# struct file
# ---------------------------------------------------------------------

def read_struct(path: str) -> dict:
    """Parse a WIEN2k .struct file (reference wien_read_struct fixed
    formats, src/wien_private@proc.f90:476-733)."""
    lines = open(path, errors="replace").read().splitlines()
    out = {}
    out["title"] = lines[0]
    lattic = lines[1][0:4]
    out["lattic"] = lattic
    nat = _i(lines[1][27:30])
    out["nat"] = nat
    out["ishlat"] = lattic.startswith("H")
    # line 2 (mode of calc) skipped by the reference's format
    a = np.array([_f(lines[3][i * 10:(i + 1) * 10]) for i in range(3)])
    ang = np.array([_f(lines[3][(3 + i) * 10:(4 + i) * 10])
                    for i in range(3)])
    if ang[2] == 0.0:
        ang[2] = 90.0
    out["a"], out["angles"] = a, ang
    ca, cb, cg = np.cos(np.deg2rad(ang))
    sa, sb, sg = np.sin(np.deg2rad(ang))

    br1 = np.zeros((3, 3))
    br2 = np.zeros((3, 3))
    ortho = False
    L = lattic[0]
    if L in ("S", "P"):
        cosg1 = (cg - ca * cb) / (sa * sb)
        g0 = math.acos(min(1.0, max(-1.0, cosg1)))
        br2[0, 0] = a[0] * math.sin(g0) * sb
        br2[0, 1] = a[0] * math.cos(g0) * sb
        br2[0, 2] = a[0] * cb
        br2[1, 1] = a[1] * sa
        br2[1, 2] = a[1] * ca
        br2[2, 2] = a[2]
        br1 = br2.copy()
        ortho = np.allclose(ang, 90.0)
    elif L == "F":
        br2[0, 0] = 0.5 * a[0]
        br2[1, 0] = 0.5 * a[0]
        br2[1, 1] = 0.5 * a[1]
        br2[2, 1] = 0.5 * a[1]
        br2[0, 2] = 0.5 * a[2]
        br2[2, 2] = 0.5 * a[2]
        br1 = np.diag(a)
        ortho = True
    elif L == "B":
        br2 = 0.5 * np.array([[-a[0], a[1], a[2]],
                              [a[0], -a[1], a[2]],
                              [a[0], a[1], -a[2]]])
        br1 = np.diag(a)
        ortho = True
    elif L == "H":
        br1[0, 0] = math.sqrt(3.0) / 2.0 * a[0]
        br1[0, 1] = -0.5 * a[1]
        br1[1, 1] = a[1]
        br1[2, 2] = a[2]
        br2 = br1.copy()
        ortho = False
    elif L == "R":
        s3 = math.sqrt(3.0)
        br1[0] = [a[0] / s3 / 2.0, -0.5 * a[1], a[2] / 3.0]
        br1[1] = [a[0] / s3 / 2.0, 0.5 * a[1], a[2] / 3.0]
        br1[2] = [-a[0] / s3, 0.0, a[2] / 3.0]
        br2 = br1.copy()
        ortho = False
    elif lattic[:3] == "CXY":
        br2[0, 0] = 0.5 * a[0]
        br2[1, 0] = 0.5 * a[0]
        br2[0, 1] = 0.5 * a[1]
        br2[1, 1] = -0.5 * a[1]
        br2[2, 2] = a[2]
        br1 = np.diag(a)
        ortho = True
    elif lattic[:3] == "CYZ":
        br2[0, 0] = a[0]
        br2[1, 1] = -0.5 * a[1]
        br2[2, 1] = 0.5 * a[1]
        br2[1, 2] = 0.5 * a[2]
        br2[2, 2] = 0.5 * a[2]
        br1 = np.diag(a)
        ortho = True
    elif lattic[:3] == "CXZ":
        br2[0, 0] = 0.5 * a[0] * sg
        br2[0, 1] = 0.5 * a[0] * cg
        br2[0, 2] = -0.5 * a[2]
        br2[1, 1] = a[1]
        br2[2, 0] = 0.5 * a[0] * sg
        br2[2, 1] = 0.5 * a[0] * cg
        br2[2, 2] = 0.5 * a[2]
        br1[0, 0] = a[0] * sg
        br1[0, 1] = a[0] * cg
        br1[1, 1] = a[1]
        br1[2, 2] = a[2]
        ortho = False
    else:
        raise ValueError(f"unknown WIEN lattice type {lattic!r}")
    out["br1"], out["br2"], out["ortho"] = br1, br2, ortho
    out["br3"] = np.linalg.inv(br1)

    # atoms
    idx = 4
    pos, iatnr = [], []
    multw = np.zeros(nat, dtype=int)
    jri = np.zeros(nat, dtype=int)
    rnot = np.zeros(nat)
    rmt = np.zeros(nat)
    znuc = np.zeros(nat)
    rotloc = np.zeros((nat, 3, 3))
    names = []
    for jatom in range(nat):
        ln = lines[idx]
        iatnr.append(_i(ln[4:8]))
        pos.append([_f(ln[12:22]), _f(ln[25:35]), _f(ln[38:48])])
        idx += 1
        multw[jatom] = _i(lines[idx][15:17])
        idx += 1
        for _ in range(multw[jatom] - 1):
            ln = lines[idx]
            iatnr.append(_i(ln[4:8]))
            pos.append([_f(ln[12:22]), _f(ln[25:35]), _f(ln[38:48])])
            idx += 1
        ln = lines[idx]
        names.append(ln[0:10].strip())
        jri[jatom] = _i(ln[15:20])
        rnot[jatom] = _f(ln[25:35])
        rmt[jatom] = _f(ln[40:50])
        znuc[jatom] = _f(ln[55:60])
        idx += 1
        for j in range(3):      # 1051: each line is COLUMN j of rotloc
            ln = lines[idx]
            for i in range(3):
                rotloc[jatom, i, j] = _f(ln[20 + 10 * i:30 + 10 * i])
            idx += 1
    out["pos_frac"] = np.asarray(pos)
    out["iatnr"] = np.asarray(iatnr, dtype=int)
    out["multw"], out["jri"] = multw, jri
    out["rnot"], out["rmt"], out["znuc"] = rnot, rmt, znuc
    out["rotloc"], out["names"] = rotloc, names
    out["dx"] = np.log(rmt / rnot) / (jri - 1)

    # symmetry operations (iz columns per file record, like the
    # reference's implied-do read order)
    niord = _i(lines[idx][0:4])
    idx += 1
    iz = np.zeros((niord, 3, 3), dtype=int)
    tau = np.zeros((niord, 3))
    for op in range(niord):
        for j in range(3):
            ln = lines[idx]
            for i in range(3):
                iz[op, i, j] = _i(ln[2 * i:2 * i + 2])
            tau[op, j] = _f(ln[6:16])
            idx += 1
        idx += 1                # op index line
    out["niord"], out["iz"], out["tau"] = niord, iz, tau

    out["iop"] = _rotdef(out)
    out["pos_cart"] = out["pos_frac"] @ br1      # v_i = sum_j br1[j,i] x_j
    return out


def _rotdef(st: dict) -> np.ndarray:
    """Per equivalent atom: index of the symmetry op mapping it onto the
    first atom of its class (reference rotdef,
    src/wien_private@proc.f90:945-1050)."""
    toler = 1e-4
    lattic = st["lattic"]
    pos = st["pos_frac"]
    iop = np.zeros(len(pos), dtype=int)
    index = 0
    for jatom in range(st["nat"]):
        first = index
        for _ in range(st["multw"][jatom]):
            p = pos[index]
            found = False
            for i in range(st["niord"]):
                x = st["iz"][i].T @ p + st["tau"][i]
                x = np.mod(x + toler / 2.0 + 5.0, 1.0) - toler / 2.0
                d = np.abs(x - pos[first])
                d = np.minimum(d, np.abs(d - 1.0))
                shifts = [np.zeros(3)]
                if lattic[0] == "B":
                    shifts.append(np.array([0.5, 0.5, 0.5]))
                if lattic[0] == "F" or lattic[:3] == "CXY":
                    shifts.append(np.array([0.5, 0.5, 0.0]))
                if lattic[0] == "F" or lattic[:3] == "CXZ":
                    shifts.append(np.array([0.5, 0.0, 0.5]))
                if lattic[0] == "F" or lattic[:3] == "CYZ":
                    shifts.append(np.array([0.0, 0.5, 0.5]))
                for sh in shifts:
                    ds = np.mod(d + sh + 1e-9, 1.0)
                    ds = np.minimum(ds, np.abs(ds - 1.0))
                    if np.all(ds < toler):
                        iop[index] = i
                        found = True
                        break
                if found:
                    break
            if not found:
                raise ValueError(
                    f"rotdef: no symmetry op maps atom {index} onto its "
                    "class representative")
            index += 1
    return iop


# ---------------------------------------------------------------------
# clmsum file
# ---------------------------------------------------------------------

def read_clmsum(path: str, st: dict) -> dict:
    """Parse the clmsum: MT lm radial tables + plane-wave part
    (reference readslm/readk, src/wien_private@proc.f90:733-918)."""
    lines = open(path, errors="replace").read().splitlines()
    pos = 3                              # FORMAT(//) skips 3 records
    nat = st["nat"]
    lmlist, slm = [], []
    for jatom in range(nat):
        jrj = int(st["jri"][jatom])
        pos += 1                         # leading / of format 118
        ll = _i(lines[pos][15:18])
        pos += 3                         # the read line + trailing //
        lms = []
        tab = np.zeros((ll, jrj))
        for l in range(ll):
            l1 = _i(lines[pos][15:18])
            l2 = _i(lines[pos][23:25])
            pos += 2                     # read line + trailing /
            lms.append((l1, l2))
            vals = []
            nlines = (jrj + 3) // 4
            for k in range(nlines):
                ln = lines[pos + k]
                for c in range(4):
                    s = ln[3 + 19 * c:3 + 19 * (c + 1)]
                    if s.strip():
                        vals.append(float(s.replace("D", "E")))
            pos += nlines
            tab[l, :] = np.asarray(vals[:jrj])
            pos += 2                     # FORMAT(/) skips 2 records
            if l == 0:
                tab[0] /= _SQFP         # density normalization (cnorm)
        pos += 4                         # FORMAT(///) skips 4 records
        lmlist.append(lms)
        slm.append(tab)

    # plane waves: FORMAT(//,13X,I6)
    pos += 2
    nwav = _i(lines[pos][13:19])
    pos += 1
    k2 = np.zeros((nwav, 3), dtype=int)
    sk = np.zeros(nwav)
    ski = np.zeros(nwav)
    cmpl = False
    for i in range(nwav):
        ln = lines[pos + i]
        k2[i] = [_i(ln[3 + 5 * j:8 + 5 * j]) for j in range(3)]
        sk[i] = float(ln[18:37].replace("D", "E"))
        s2 = ln[37:56].strip()
        ski[i] = float(s2.replace("D", "E")) if s2 else 0.0
        if abs(ski[i]) > _PWCUT:
            cmpl = True
    return {"lmlist": lmlist, "slm": slm, "k2": k2, "sk": sk,
            "ski": ski, "cmpl": cmpl, "nwav": nwav}


def _expand_stars(st: dict, pw: dict):
    """Symmetry-star expansion of the plane-wave list (reference
    sternb + readk postprocessing, src/wien_private@proc.f90:860-918).

    Returns (krec (K,3) float, a_re (K,), a_im (K,)) such that
    rho_I(v) = sum_K a_re cos(2 pi phi) - a_im sin(2 pi phi), with
    phi = krec . (v scaled by 1/a for ortho lattices, cartesian else).
    """
    iz, tau, niord = st["iz"], st["tau"], st["niord"]
    krec_l, are_l, aim_l = [], [], []
    for iw in range(pw["nwav"]):
        k1 = pw["k2"][iw]
        istg = np.einsum("oij,j->oi", iz, k1)           # row J: iz@k1
        tk = 2.0 * math.pi * (tau @ k1)
        # dedup members, averaging phases over coincident images
        uniq: dict[tuple, list] = {}
        for o in range(niord):
            key = tuple(int(v) for v in istg[o])
            uniq.setdefault(key, []).append(tk[o])
        nst = len(uniq)
        s_re = pw["sk"][iw] / nst
        s_im = pw["ski"][iw] / nst
        if abs(s_re) < _PWCUT and abs(s_im) < _PWCUT:
            continue
        for key, tks in uniq.items():
            taup = float(np.mean(np.cos(tks)))
            taupi = float(np.mean(np.sin(tks))) if pw["cmpl"] else 0.0
            # roc = (s_re + i s_im)(taup + i taupi)
            are_l.append(s_re * taup - s_im * taupi)
            aim_l.append(s_re * taupi + s_im * taup)
            krec_l.append(np.asarray(key, dtype=float))
    krec = np.asarray(krec_l) if krec_l else np.zeros((0, 3))
    if not st["ortho"] and len(krec):
        krec = krec @ st["br3"]          # krec_j = sum_i br3[i,j] k_i
    return krec, np.asarray(are_l), np.asarray(aim_l)


def _fold_terms(st: dict, pw: dict, jatom: int):
    """Fold the LM list (with Kara-Kurki-Suonio cubic pairs/triples for
    iatnr > 0, reference charge :1291-1521) into dense (T, jri) radial
    rows and (T, nY) angular coefficient rows over real solid
    harmonics S_lm (ops/rlm ordering: per l, m = -l..l)."""
    first = int(np.sum(st["multw"][:jatom]))
    cubic = st["iatnr"][first] > 0
    lms = pw["lmlist"][jatom]
    tab = pw["slm"][jatom]
    ck = _c_kub()
    nY = (LMAX2 + 1) ** 2

    def yidx(l: int, m_signed: int) -> int:
        return l * l + l + m_signed

    def ang_entry(l1: int, m: int) -> tuple[int, int]:
        """(l, signed m index) of the real harmonic for LM entry
        (l1, m): l1 >= 0 -> cosine (+m), l1 < 0 -> sine (-m)."""
        l = abs(l1)
        return l, (m if l1 >= 0 else -m) if m != 0 else 0

    rad_rows, ang_rows, lpow = [], [], []

    def add_term(radial, pieces):
        row = np.zeros(nY)
        l0 = None
        for (l1, m), cc in pieces:
            l, ms = ang_entry(l1, m)
            row[yidx(l, ms)] += cc
            l0 = l
        rad_rows.append(radial)
        ang_rows.append(row)
        lpow.append(l0)

    i = 0
    while i < len(lms):
        l1, m = lms[i]
        if not cubic:
            add_term(tab[i], [((l1, m), 1.0)])
            i += 1
            continue
        if l1 == 0 and m == 0:
            add_term(tab[i], [((0, 0), 1.0)])
            i += 1
        elif l1 == -3 and m == 2:
            add_term(tab[i], [((-3, 2), 1.0)])
            i += 1
        elif l1 in (4, 6, -7, -9):
            c1 = ck[abs(l1), m]
            c2 = ck[abs(l1), m + 4]
            rad = c1 * tab[i] + c2 * tab[i + 1]
            add_term(rad, [((l1, m), c1), ((l1, m + 4), c2)])
            i += 2
        elif l1 in (8, 10):
            c1, c2, c3 = ck[l1, m], ck[l1, m + 4], ck[l1, m + 8]
            rad = c1 * tab[i] + c2 * tab[i + 1] + c3 * tab[i + 2]
            add_term(rad, [((l1, m), c1), ((l1, m + 4), c2),
                           ((l1, m + 8), c3)])
            i += 3
        else:
            raise ValueError(
                f"invalid LM list for cubic structure: l={l1} m={m}")
    return (np.asarray(rad_rows), np.asarray(ang_rows),
            np.asarray(lpow, dtype=int))


# ---------------------------------------------------------------------
# the field
# ---------------------------------------------------------------------

class WienField:
    """Batched LAPW density evaluator.

    grd(points_cart, nder) evaluates rho (and derivatives via forward
    autodiff) at Cartesian bohr points in the WIEN frame (lattice
    vectors = rows of br1; a Crystal built by the .struct seed reader
    uses the same frame).
    """

    def __init__(self, st: dict, pw: dict):
        import jax.numpy as jnp

        self.st = st
        self.cmpl = pw["cmpl"]
        nat = st["nat"]
        # per-equivalent-atom data
        ndat = len(st["pos_frac"])
        jatom_of = np.concatenate(
            [np.full(st["multw"][j], j) for j in range(nat)])
        self.jatom_of = jnp.asarray(jatom_of, dtype=jnp.int32)
        self.pos_cart = jnp.asarray(st["pos_cart"])
        # local map M = rotloc . (linear part of the symmetry op): for
        # ortho lattices iz acts directly on cartesian displacements,
        # else M = rotloc . br1^T . iz^T . br3 (reference rho2 `mat`)
        M = np.zeros((ndat, 3, 3))
        for iat in range(ndat):
            j = jatom_of[iat]
            izt = st["iz"][st["iop"][iat]].T.astype(float)
            if st["ortho"]:
                lin = izt
            else:
                lin = st["br1"].T @ izt @ st["br3"]
            M[iat] = st["rotloc"][j] @ lin
        self.M = jnp.asarray(M)

        # primitive lattice (rows of br2 are the primitive vectors):
        # v_cart = br2^T @ n  for integer n
        self.P = jnp.asarray(st["br2"].T)
        self.Pinv = jnp.asarray(np.linalg.inv(st["br2"].T))

        self.rmt_of = jnp.asarray(st["rmt"][jatom_of])
        self.rnot = jnp.asarray(st["rnot"])
        self.dxs = jnp.asarray(st["dx"])
        self.jri = st["jri"]

        # muffin-tin tables, padded over atom types
        terms = [_fold_terms(st, pw, j) for j in range(nat)]
        self.mt = []
        for j, (rad, angm, lpow) in enumerate(terms):
            lm = int(lpow.max())                 # trim unused harmonics
            self.mt.append({
                "CRT": jnp.asarray(rad.T),       # (jri, T)
                "A": jnp.asarray(angm[:, :(lm + 1) ** 2]),
                "lpow": jnp.asarray(lpow, dtype=jnp.float64),
                "rnot": float(st["rnot"][j]),
                "dx": float(st["dx"][j]),
                "jri": int(st["jri"][j]),
            })

        krec, a_re, a_im = _expand_stars(st, pw)
        self.krec = jnp.asarray(krec)
        self.a_re = jnp.asarray(a_re)
        self.a_im = jnp.asarray(a_im)
        factor = 1.0 / st["a"] if st["ortho"] else np.ones(3)
        self.factor = jnp.asarray(factor)
        self.zpsp = None

    @classmethod
    def from_files(cls, clmsum_path: str, struct_path: str) -> "WienField":
        st = read_struct(struct_path)
        pw = read_clmsum(clmsum_path, st)
        return cls(st, pw)

    # -- components ----------------------------------------------------
    def _interstitial(self, vT):
        """rho_I at cartesian points vT (3, N) (reference rhoout)."""
        import jax.numpy as jnp

        ph = (2.0 * math.pi) * (self.krec @ (vT * self.factor[:, None]))
        return (self.a_re @ jnp.cos(ph)) - (self.a_im @ jnp.sin(ph))

    def _mt_type(self, j: int, vtT, r):
        """MT density of atom type j at local coords vtT (3,N), radii
        r (N,) (reference charge/radial)."""
        import jax.numpy as jnp

        from ..ops.rlm import solid_harmonics

        p = self.mt[j]
        rnot, dx, jri = p["rnot"], p["dx"], p["jri"]
        rc = jnp.maximum(r, rnot)
        # 1-based ir = 1 + int(log(r/rnot)/dx), clamped to [2, jri-2];
        # nodes (1-based) temp_ir-1 .. temp_ir+2  ->  0-based ii0-1+k
        ir = jnp.clip(1 + jnp.floor(jnp.log(rc / rnot) / dx).astype(
            jnp.int32), 2, jri - 2)
        ii = (ir[:, None] - 2) + jnp.arange(4)[None, :]       # (N,4) 0-based
        r1 = rnot * jnp.exp(ii * dx)                          # (N,4)
        # Lagrange weights over the 4 nodes (smooth in rc)
        dr = rc[:, None] - r1                                 # (N,4)
        w = []
        for a in range(4):
            num = 1.0
            for b in range(4):
                if b != a:
                    num = num * dr[:, b] / (r1[:, a] - r1[:, b])
            w.append(num)
        W = jnp.stack(w, axis=1)                              # (N,4)
        import jax
        cn = jnp.take(p["CRT"], jax.lax.stop_gradient(ii), axis=0)  # (N,4,T)
        g = jnp.einsum("na,nat->nt", W / (r1 * r1), cn)       # rho_lm(r)
        # angular: S_lm(x^) = solid_lm(vt)/r^l
        nY = p["A"].shape[1]
        lmax = int(math.isqrt(nY)) - 1
        S = solid_harmonics(vtT, lmax)                        # (nY, N)
        ang = p["A"] @ S                                      # (T, N)
        rl = jnp.exp(p["lpow"][:, None] * jnp.log(rc)[None, :])
        return jnp.sum(g.T / rl * ang, axis=0)

    def _assign(self, vT):
        """Nearest-image sphere assignment: returns (iat (N,), d0 (3,N)
        displacement to that atom, r (N,), insphere (N,) bool)."""
        import jax
        import jax.numpy as jnp

        # displacement to every equivalent atom, minimum image over the
        # primitive (br2) lattice
        d = vT[None, :, :] - self.pos_cart[:, :, None]        # (nd,3,N)
        f = jnp.einsum("ij,ajn->ain", self.Pinv, d)
        f = f - jnp.round(jax.lax.stop_gradient(f))
        dc = jnp.einsum("ij,ajn->ain", self.P, f)             # (nd,3,N)
        r2 = jnp.sum(dc * dc, axis=1)                         # (nd,N)
        iat = jnp.argmin(r2 - (self.rmt_of ** 2)[:, None], axis=0)
        rsel = jnp.sqrt(jnp.take_along_axis(
            r2, iat[None, :], axis=0)[0] + 1e-300)
        insphere = rsel < self.rmt_of[iat]
        sel = jnp.broadcast_to(iat[None, None, :], (1, 3, dc.shape[2]))
        d0 = jnp.take_along_axis(dc, sel, axis=0)[0]          # (3,N)
        return iat, d0, rsel, insphere

    def rho(self, vT):
        """Density at cartesian points vT (3, N): smooth branch-masked
        combination of MT and interstitial values (reference rho2)."""
        import jax
        import jax.numpy as jnp

        iat, d0, r, insphere = self._assign(vT)
        iat = jax.lax.stop_gradient(iat)
        insphere = jax.lax.stop_gradient(insphere)
        jat = self.jatom_of[iat]
        vt = jnp.einsum("nij,jn->in", self.M[iat], d0)        # local frame
        out = jnp.where(insphere, 0.0, self._interstitial(vT))
        for j in range(len(self.mt)):
            mask = insphere & (jat == j)
            # evaluate everywhere (cheap, dense); select by mask
            mt = self._mt_type(j, vt, r)
            out = jnp.where(mask, mt, out)
        return out

    def grd(self, points_cart, nder: int = 2):
        """Evaluate (rho, grad (3,N), hess6 (6,N)) at (N,3) points.

        Derivatives are forward-mode autodiff of the evaluation chain.
        At nuclear positions (r < rnot) the reference zeroes the
        gradient and sets the Hessian diagonal to -1e15 (nucleus
        signal); reproduced here.
        """
        import jax
        import jax.numpy as jnp

        x = jnp.atleast_2d(jnp.asarray(points_cart))
        vT = x.T
        f = self.rho(vT)
        if nder <= 0:
            return f, None, None

        basis = [jnp.zeros_like(vT).at[k].set(1.0) for k in range(3)]

        def val(v):
            return self.rho(v)

        grads = []
        for k in range(3):
            _, gk = jax.jvp(val, (vT,), (basis[k],))
            grads.append(gk)
        gf = jnp.stack(grads)                                 # (3,N)
        if nder == 1:
            return f, gf, None

        def gradk(v, k):
            return jax.jvp(val, (v,), (basis[k],))[1]

        h = {}
        for a in range(3):
            for b in range(a, 3):
                _, hab = jax.jvp(lambda v: gradk(v, a), (vT,), (basis[b],))
                h[(a, b)] = hab
        h6 = jnp.stack([h[(0, 0)], h[(0, 1)], h[(0, 2)],
                        h[(1, 1)], h[(1, 2)], h[(2, 2)]])
        # nuclear capture (reference charge :1506-1519)
        iat, _, r, ins = self._assign(vT)
        isnuc = ins & (r < self.rnot[self.jatom_of[iat]] + 1e-10)
        gf = jnp.where(isnuc[None, :], 0.0, gf)
        diag = jnp.asarray([1.0, 0, 0, 1.0, 0, 1.0])[:, None]
        h6 = jnp.where(isnuc[None, :], jnp.where(diag > 0, -1e15, 0.0), h6)
        return f, gf, h6
