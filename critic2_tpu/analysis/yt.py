"""Yu-Trinkle grid basin integration, TPU-native.

Role of the reference yt (src/yt@proc.f90:34-369, JCP 134, 064111): sort
the grid by density descending, walk it once; local maxima become
attractors, points whose uphill flux goes entirely to one basin inherit
it, and boundary points receive fractional weights
w_i(b) = sum_k chi_ik w_k(b), chi_ik ~ A_k (rho_k - rho_i) / l_k over the
Wigner-Seitz facet neighbors of the grid-point lattice.

The reference sweep is strictly sequential in sorted order. The TPU
reformulation is a ROLL FIXPOINT: the uphill flux graph connects fixed
lattice offsets, so one relaxation pass over the whole grid is K
`jnp.roll`s + elementwise math (no gathers, no sequential blocks), and
the flux operator R is nilpotent in sorted order, so the fixpoint is
EXACT after (longest monotone chain) passes — a few hundred even at
256^3, each pass a fused ~K*N-traffic program.  Everything runs inside
a single `lax.while_loop`; convergence is detected by exact bitwise
stationarity (once every path is exhausted the recomputation reproduces
the same floats).

Two directions of the same linear recurrence cover all consumers:

  * integrate(f): the ADJOINT sweep s = f + R^T s pushes f-mass uphill;
    the basin sums are simply s at the attractors.  No weight matrix is
    ever materialized — this replaces the reference's per-basin weight
    regeneration (src/yt@proc.f90:238-369) at O(nprops * N) memory.
  * weights(b)/labels: the FORWARD sweep w = onehot_b + R w floods
    basin-b membership downhill; labels are the running argmax over
    basins, computed lazily (plotting/deloc only — charges never need
    them).

Tie-breaking at plateaus replicates the reference: stable descending
sort with index keying defines ranks; "uphill" means lower rank, and a
point whose positive-flux set is empty attaches all its weight to its
lowest-ranked uphill neighbor (src/yt@proc.f90:149-156).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["yt_integrate", "yt_f32_guarded", "YTResult"]


def _grid_ws_neighbors(crystal, shape):
    """WS facet data of the grid-point lattice (reference yt builds an aux
    'grid lattice' crystal, src/yt@proc.f90:93-103).

    Returns (offsets (K,3) int, wts (K,) = A_k/l_k)."""
    from ..crystal.wscell import wigner_seitz

    m = np.asarray(crystal.m_x2c) @ np.diag(1.0 / np.asarray(shape, dtype=float))
    ws = wigner_seitz(m)
    offs = np.asarray(ws.ineighx, dtype=np.int32)
    lens = np.linalg.norm(ws.ineighc, axis=1)
    return offs, np.asarray(ws.areas) / lens


_AX = (0, 1, 2)


@partial(jax.jit, static_argnames=("offs", "shape"))
def _flux_tensors(rho3, idx3, wts, *, offs, shape):
    """Per-neighbor normalized uphill flux chi' (K,)+shape, plus the
    attractor mask.  chi'_k[x] is the weight fraction point x sends to
    its neighbor x+o_k; rows sum to 1 except at attractors (all-zero).

    "Uphill" is the stable-descending-sort order WITHOUT the sort:
    rank_k < rank_x iff (rho_k, idx_k) >lex (rho_x, -idx_x), i.e.
    rho_k > rho_x, or rho_k == rho_x and idx_k < idx_x — a global
    argsort of the 3D grid (seconds at 256^3 on TPU, plus inverting
    the permutation) collapses to K rolled compares."""
    K = len(offs)
    dt = rho3.dtype
    chis = []
    anyhi = jnp.zeros(shape, bool)
    tot = jnp.zeros(shape, dt)
    # lowest-ranked (= lexicographically highest (rho, -idx)) uphill
    # neighbor: plateau fallback target
    best_rho = jnp.full(shape, -jnp.inf, dt)
    best_idx = jnp.zeros(shape, idx3.dtype)
    best_k = jnp.zeros(shape, jnp.int32)
    for k, o in enumerate(offs):
        sh = (-int(o[0]), -int(o[1]), -int(o[2]))
        rho_k = jnp.roll(rho3, sh, _AX)
        idx_k = jnp.roll(idx3, sh, _AX)
        hi = (rho_k > rho3) | ((rho_k == rho3) & (idx_k < idx3))
        chi = jnp.where(hi, wts[k] * (rho_k - rho3), jnp.zeros((), dt))
        chi = jnp.maximum(chi, 0.0)
        chis.append(chi)
        tot = tot + chi
        anyhi = anyhi | hi
        upd = hi & ((rho_k > best_rho)
                    | ((rho_k == best_rho) & (idx_k < best_idx)))
        best_rho = jnp.where(upd, rho_k, best_rho)
        best_idx = jnp.where(upd, idx_k, best_idx)
        best_k = jnp.where(upd, k, best_k)
    haspos = tot > 0
    inv = jnp.where(haspos, 1.0 / jnp.where(haspos, tot, 1.0),
                    jnp.zeros((), dt))
    out = []
    for k in range(K):
        fallback = jnp.where(anyhi & (best_k == k), jnp.ones((), dt),
                             jnp.zeros((), dt))
        out.append(jnp.where(haspos, chis[k] * inv, fallback))
    return jnp.stack(out), ~anyhi


def _extract_idx(flat, cap: int):
    """(nattr, iattr(cap,)): flat indices of the first `cap` True
    entries, in index order; entries past nattr are garbage (the host
    slices them off).

    Designed around TPU costs: a flat-grid compaction via cumsum +
    scatter runs ~107 ms at 256^3 on a v5e (XLA lowers the 16.7M-index
    scatter serially).  Here nothing big ever scatters or scans:

      1. per-block True counts (one fast reduction pass),
      2. a TINY cumsum over the N/B block counts,
      3. per output slot, binary-search the owning block
         (searchsorted over N/B, vectorized over cap slots),
      4. gather those cap blocks and rank in-block entries with one
         (cap, B) @ (B, B) triangular-ones MXU matmul — exact in f32
         for counts <= B — then match each slot's local rank."""
    N = flat.shape[0]
    B = 512
    pad = (-N) % B
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
    m = flat.reshape(-1, B)
    cnt = m.sum(1, dtype=jnp.int32)                      # (N/B,)
    bcum = jnp.cumsum(cnt)
    nattr = bcum[-1]
    s_arr = jnp.arange(cap, dtype=jnp.int32)
    blk = jnp.clip(jnp.searchsorted(bcum, s_arr + 1, side="left"),
                   0, m.shape[0] - 1).astype(jnp.int32)
    rows = m[blk]                                        # (cap, B)
    ut = jnp.triu(jnp.ones((B, B), jnp.float32))         # k <= j
    loc = jax.lax.dot(rows.astype(jnp.float32), ut,
                      precision=jax.lax.Precision.HIGHEST
                      ).astype(jnp.int32)                # in-block rank
    prev = jnp.where(blk > 0, bcum[jnp.maximum(blk - 1, 0)], 0)
    want = (s_arr + 1 - prev)[:, None]                   # local rank
    hit = rows & (loc == want)
    col = jnp.argmax(hit, axis=1).astype(jnp.int32)
    return nattr, blk * B + col


@partial(jax.jit, static_argnames=("nattr",))
def _extract_attractors(rho3, is_attr, nattr):
    """(flat index, rho) of the attractor points, one fused program.
    i32 throughout (the grid is < 2^31 points)."""
    _, iattr = _extract_idx(is_attr.reshape(-1), nattr)
    return iattr, rho3.reshape(-1)[iattr]


_MAX_ATTR = 8192            # fixed capacity of the fused extraction


@partial(jax.jit, static_argnames=("offs", "shape", "want32"))
def _decompose_dev(rho3, idx3, wts, *, offs, shape, want32):
    """Whole YT decomposition in ONE device program: flux tensors +
    capacity-padded attractor extraction + (optionally) the f32
    shifted-chi cast for the Pallas adjoint sweeps.  The split version
    paid three dispatch round-trips plus an 805 MB f64 chiP re-read for
    the cast (measured at 256^3 through the remote tunnel: flux 50 ms,
    extraction 172 ms, cast 121 ms -> fused ~110 ms).

    Returns (chiP, chiP32s | zeros, nattr (i32), iattr (MAX_ATTR,),
    rho_at (MAX_ATTR,)); entries past nattr are padding (host slices).
    If nattr > _MAX_ATTR the caller re-extracts with the exact-size
    program."""
    chiP, is_attr = _flux_tensors(rho3, idx3, wts, offs=offs, shape=shape)
    if want32:
        # cast BEFORE rolling: the roll then moves 4-byte planes, not
        # 8-byte ones (the shifted copy is only ever consumed in f32)
        chi32 = jnp.stack([jnp.roll(chiP[k].astype(jnp.float32), o,
                                    (0, 1, 2))
                           for k, o in enumerate(offs)])
    else:
        chi32 = jnp.zeros((1,), jnp.float32)
    nattr, iattr = _extract_idx(is_attr.reshape(-1), _MAX_ATTR)
    return chiP, chi32, nattr, iattr, rho3.reshape(-1)[iattr]


@partial(jax.jit, static_argnames=("offs", "adjoint"))
def _apply_R(chiP, s, *, offs, adjoint=True):
    """One application of the flux operator (XLA rolls, any dtype).
    adjoint: out[x] = sum_k roll(chi_k * s, +o_k) (mass pushed uphill);
    forward: out[x] = sum_k chi_k * roll(s, -o_k) (membership downhill).

    An optimization barrier after every accumulate keeps XLA from
    mega-fusing the K multiply-roll-adds: the fused f64 loop runs 24x
    slower than its parts on the v5e's emulated f64 ALU (measured 359
    vs ~15 ms f32 at 256^3; unfused f64 steps are only ~1.5x f32)."""
    acc = jnp.zeros_like(s)
    for k, o in enumerate(offs):
        sh = (int(o[0]), int(o[1]), int(o[2]))
        if adjoint:
            acc = acc + jnp.roll(chiP[k] * s, sh, (1, 2, 3))
        else:
            acc = acc + chiP[k] * jnp.roll(s, (-sh[0], -sh[1], -sh[2]),
                                           (1, 2, 3))
        if acc.dtype == jnp.float64:
            acc = jax.lax.optimization_barrier(acc)
    return acc


@partial(jax.jit, static_argnames=("offs", "adjoint"))
def _xla_sweep(chiP, f3, *, offs, adjoint=True):
    """Exact fixpoint of s = f + R s via XLA rolls.  R is nilpotent in
    sorted order -> exact bitwise convergence after depth passes."""
    def body(carry):
        s, _ = carry
        s_new = f3 + _apply_R(chiP, s, offs=offs, adjoint=adjoint)
        return s_new, jnp.all(s_new == s)

    def cond(carry):
        return ~carry[1]

    s, _ = jax.lax.while_loop(cond, body, (f3, jnp.asarray(False)))
    return s


# module-level jit (a nested closure would be a fresh function object
# per call -> full recompile, ~2 s each through the remote tunnel)
@partial(jax.jit, static_argnames=("offs", "adjoint", "npair"))
def _gs_pairs(chiP32, s, f3, *, offs, adjoint, npair):
    """npair forward+backward GS sweep pairs; returns (s, last pair's
    changed-anything flag).  The OUTER convergence loop runs on the
    host with one i32 readback per batch: a device-side lax.while_loop
    costs ~380 ms per iteration through the remote tunnel
    (host-stepped), 10x the two sweeps it wraps."""
    from ..ops.yt_pass import yt_gs_pass

    def body(_, carry):
        s, _ = carry
        s1, c1 = yt_gs_pass(chiP32, s, f3, offs=offs,
                            adjoint=adjoint, backward=False)
        s2, c2 = yt_gs_pass(chiP32, s1, f3, offs=offs,
                            adjoint=adjoint, backward=True)
        return s2, c1[0, 0] + c2[0, 0]
    return jax.lax.fori_loop(0, npair, body, (s, jnp.int32(1)))


def _pallas_sweep(chiP32, f3, offs, adjoint):
    """f32 fixpoint via the fused Pallas Gauss-Seidel sweeps
    (ops/yt_pass.yt_gs_pass): alternate forward/backward plane-ordered
    sweeps with exact in-plane sub-solves until bitwise stationarity —
    a handful of sweeps instead of ~grid-diameter Jacobi passes.
    Chunked over the property axis to bound per-step VMEM."""
    H = max(1, max(abs(int(o[0])) for o in offs))
    K = len(offs)
    pmax = max(1, (40 - K) // (2 * H + 3))     # ~40 f32 planes of VMEM

    run_pairs = _gs_pairs

    def run(chiP32, f3, *, offs, adjoint):
        # 4 pairs resolve typical atomic-basin fields (measured: NaCl
        # 256^3 and random 64^3 both converge in 4); the flag is the
        # LAST pair's changed-anything count, so convergence inside the
        # batch is detected without extra sweeps
        s, flag = run_pairs(chiP32, f3, f3, offs=offs, adjoint=adjoint,
                            npair=4)
        npairs = 4
        maxpair = sum(f3.shape[1:]) + 16
        while int(flag) != 0 and npairs < maxpair:
            s, flag = run_pairs(chiP32, s, f3, offs=offs,
                                adjoint=adjoint, npair=2)
            npairs += 2
        return s

    if f3.shape[0] <= pmax:
        return run(chiP32, f3, offs=offs, adjoint=adjoint)
    return jnp.concatenate(
        [run(chiP32, f3[lo:lo + pmax], offs=offs, adjoint=adjoint)
         for lo in range(0, f3.shape[0], pmax)])


def _solve_sweep(chiP, chiP32, f3, offs, adjoint=True, nrefine=1,
                 rtol=1e-11):
    """Solve (I - R) s = f at f64 accuracy.

    On TPU (where f64 vector ops are emulated ~10x off f32 and XLA
    rolls run ~10x off roofline) the solve runs in f32 through the
    fused Pallas pass with f64 iterative refinement: the residual
    r = f + R s - s is evaluated with the exact f64 operator (one XLA
    pass), and each correction solve shrinks the error by the f32
    roundoff of one preconditioner application.  Measured at 256^3:
    one correction takes the relative residual 5e-6 -> 6e-13, after
    which it stalls at the f32-correction floor — so the default is
    ONE refinement with a 1e-11 relative exit bar (charges bar is
    1e-6 e absolute).  Elsewhere: plain f64 XLA fixpoint."""
    if chiP32 is None:
        return _xla_sweep(chiP, f3, offs=offs, adjoint=adjoint)
    H = max(1, max(abs(int(o[0])) for o in offs))
    pmax = max(1, (40 - len(offs)) // (2 * H + 3))
    if nrefine == 1 and f3.shape[0] <= pmax:
        # optimistic pipelined path: queue solve + f64 residual +
        # correction solve + combine WITHOUT reading the convergence
        # flags in between - each host readback of the changed-flag
        # costs a ~25 ms tunnel round-trip that stalls the device
        # queue.  4 forward/backward GS pairs resolve typical atomic
        # fields (see _pallas_sweep); the two flags verify that at the
        # end, falling back to the flag-stepped loop when they trip.
        try:
            f32a = f3.astype(jnp.float32)
            s1, flag1 = _gs_pairs(chiP32, f32a, f32a, offs=offs,
                                  adjoint=adjoint, npair=4)
            s1 = s1.astype(f3.dtype)
            r = f3 + _apply_R(chiP, s1, offs=offs, adjoint=adjoint) - s1
            r32 = r.astype(jnp.float32)
            e, flag2 = _gs_pairs(chiP32, r32, r32, offs=offs,
                                 adjoint=adjoint, npair=4)
            out = s1 + e.astype(f3.dtype)
            f1, f2 = jax.device_get((flag1, flag2))  # one round-trip
            if int(f1) == 0 and int(f2) == 0:
                return out
        except ValueError:  # no valid plane blocking for this grid
            return _xla_sweep(chiP, f3, offs=offs, adjoint=adjoint)
    try:
        s = _pallas_sweep(chiP32, f3.astype(jnp.float32), offs,
                          adjoint).astype(f3.dtype)
    except ValueError:      # no valid plane blocking for this grid
        return _xla_sweep(chiP, f3, offs=offs, adjoint=adjoint)
    for i in range(nrefine):
        r = f3 + _apply_R(chiP, s, offs=offs, adjoint=adjoint) - s
        if i > 0:
            # round 1 is unconditional (measured: it always fires and
            # takes the relative residual 5e-6 -> 6e-13); only further
            # rounds pay a host sync to decide
            fscale = float(jnp.max(jnp.abs(f3))) + 1e-300
            if float(jnp.max(jnp.abs(r))) <= rtol * fscale:
                break
        s = s + _pallas_sweep(chiP32, r.astype(jnp.float32), offs,
                              adjoint).astype(f3.dtype)
    return s


@dataclass
class YTResult:
    crystal: object
    shape: tuple
    nattr: int
    xattr: np.ndarray            # (nattr, 3) fractional attractor positions
    iattr: np.ndarray            # (nattr,) flat grid index of each attractor
    # device internals
    _chiP: jnp.ndarray = None    # (K,)+shape normalized uphill flux
    _offs: tuple = None          # K x (3,) neighbor offsets (static)
    _labels: np.ndarray = None   # lazy (n1,n2,n3) int32 argmax-weight basin
    _nboundary: int = None       # lazy count of fractional-weight points
    _chiP32s: jnp.ndarray = None  # lazy f32 shifted flux (Pallas adjoint)
    _chiP32f: jnp.ndarray = None  # lazy f32 flux (Pallas forward)

    def _pallas_ok(self) -> bool:
        from ..ops.yt_pass import supported
        return supported() and self._chiP.dtype == jnp.float64

    def _chi32_adjoint(self):
        if not self._pallas_ok():
            return None
        if self._chiP32s is None:
            self._chiP32s = jnp.stack([
                jnp.roll(self._chiP[k].astype(jnp.float32), o, (0, 1, 2))
                for k, o in enumerate(self._offs)])
        return self._chiP32s

    def _chi32_forward(self):
        if not self._pallas_ok():
            return None
        if self._chiP32f is None:
            self._chiP32f = self._chiP.astype(jnp.float32)
        return self._chiP32f

    @property
    def labels(self) -> np.ndarray:
        """Basin per point by max weight (reference sweep assignment,
        src/yt@proc.f90:160).  Lazy: charges never need labels."""
        if self._labels is None:
            self._compute_labels()
        return self._labels

    @property
    def nboundary(self) -> int:
        if self._nboundary is None:
            self._compute_labels()
        return self._nboundary

    def _basin_chunk(self, b0: int, nb: int) -> jnp.ndarray:
        """(nb,)+shape weight grids of basins b0..b0+nb-1 (forward sweep)."""
        dt = self._chiP.dtype
        seed = jnp.zeros((nb,) + self.shape, dt)
        i_at = self.iattr[b0:b0 + nb]
        i1, i2, i3 = np.unravel_index(i_at, self.shape)
        seed = seed.at[np.arange(nb), i1, i2, i3].set(1.0)
        return _solve_sweep(self._chiP, self._chi32_forward(), seed,
                            self._offs, adjoint=False)

    def _compute_labels(self, chunk: int = 8):
        wmax = jnp.full(self.shape, -1.0, self._chiP.dtype)
        lab = jnp.zeros(self.shape, jnp.int32)
        frac = jnp.zeros(self.shape, bool)
        for b0 in range(0, self.nattr, chunk):
            nb = min(chunk, self.nattr - b0)
            w = self._basin_chunk(b0, nb)
            cmax = w.max(0)
            carg = b0 + jnp.argmax(w, 0).astype(jnp.int32)
            upd = cmax > wmax
            lab = jnp.where(upd, carg, lab)
            wmax = jnp.where(upd, cmax, wmax)
            frac = frac | ((w > 1e-15) & (w < 1.0 - 1e-12)).any(0)
        self._labels = np.asarray(lab)
        self._nboundary = int(np.asarray(frac).sum())

    def integrate(self, field_flat) -> np.ndarray:
        """sum_i w_i(b) f_i for each basin (NOT scaled by Omega/N).

        Accepts one integrand (N,) or a stack (nprops, N); the adjoint
        sweep batches all integrands in one device program."""
        f = jnp.asarray(field_flat)
        # a (1, N) stack also has size N: detect stacks by ndim, not size
        single = f.ndim == 1 or f.shape == self.shape
        f3 = f.reshape((1 if single else f.shape[0],) + self.shape)
        if not jnp.issubdtype(f3.dtype, jnp.floating):
            f3 = f3.astype(self._chiP.dtype)
        s = _solve_sweep(self._chiP, self._chi32_adjoint(), f3,
                         self._offs, adjoint=True)
        i1, i2, i3 = np.unravel_index(self.iattr, self.shape)
        q = np.asarray(s[:, i1, i2, i3])
        return q[0] if single else q

    def weights(self, b: int) -> np.ndarray:
        """Full weight grid of basin b (dense; for WCUBE-style output)."""
        return np.asarray(self._basin_chunk(int(b), 1)[0])

    def basin_support(self, a: int, tol: float = 1e-15):
        """(flat indices, weights) of every point with weight > tol in
        basin `a` (deloc Sij support; reference yt_weights consumers)."""
        w = self.weights(a).reshape(-1)
        idx = np.where(w > tol)[0]
        return idx, w[idx]


def yt_integrate(crystal, rho, block: int | None = None):
    """Run the YT decomposition of grid `rho` ((n1,n2,n3), device array).

    Returns a YTResult; pair with `attractor_match` to map attractors to
    atoms and `integrate` for the basin sums.  `block` is accepted for
    backward compatibility and ignored (the roll fixpoint is unblocked).
    """
    shape = tuple(int(s) for s in rho.shape)
    N = int(np.prod(shape))
    offs_np, wts_np = _grid_ws_neighbors(crystal, shape)
    offs = tuple(tuple(int(v) for v in o) for o in offs_np)

    rho3 = jnp.asarray(rho)
    wts = jnp.asarray(wts_np, dtype=rho3.dtype)
    idx3 = jnp.arange(N, dtype=jnp.int32).reshape(shape)

    from ..ops.yt_pass import supported
    want32 = supported() and rho3.dtype == jnp.float64

    # ONE fused device program: flux tensors + attractor extraction +
    # f32 shifted-chi cast; only the attractor (index, rho) pairs and
    # one count cross the host link, never a grid.  i32 cumsum-scatter,
    # not jnp.nonzero: under x64 nonzero runs an i64 (emulated) cumsum
    # over the whole grid.
    chiP, chi32, nattr_d, iattr_d, rho_at_d = _decompose_dev(
        rho3, idx3, wts, offs=offs, shape=shape, want32=want32)
    # ONE host round-trip for all three small outputs (each np.asarray
    # pays a full tunnel RTT on its own)
    nattr, iattr, rho_at = jax.device_get((nattr_d, iattr_d, rho_at_d))
    nattr = int(nattr)
    if nattr > _MAX_ATTR:      # noisy grid: exact-size re-extraction
        is_attr = chiP.sum(0) == 0.0
        iattr_d, rho_at_d = _extract_attractors(rho3, is_attr, nattr)
        iattr, rho_at = jax.device_get((iattr_d, rho_at_d))
    else:
        iattr = iattr[:nattr]
        rho_at = rho_at[:nattr]
    iattr = iattr[np.lexsort((iattr, -rho_at))]

    i1, i2, i3 = np.unravel_index(iattr, shape)
    xattr = np.stack([i1 / shape[0], i2 / shape[1], i3 / shape[2]], axis=1)

    return YTResult(crystal=crystal, shape=shape, nattr=nattr,
                    xattr=xattr, iattr=iattr, _chiP=chiP, _offs=offs,
                    _chiP32s=chi32 if want32 else None)


def yt_f32_guarded(crystal, rho, guard_tol: float = 1e-6,
                   trip_frac: float = 0.25):
    """YT with an f32-CONSTRUCTED basin decomposition, audited against
    f64 drift.

    f32 construction (flux tensors + partition built from an f32 cast
    of the grid) is the fast path on TPU, but its basin-charge drift
    vs the f64 partition is grid-dependent (measured 2e-9 .. 5.8e-7 e
    on benign grids; adversarial near-plateau grids can rewire whole
    boundary regions).  This wrapper runs the audit the round-3 review
    asked for instead of trusting the cast:

      * s = adjoint mass flow of rho through the f32 partition (the
        exact solve `integrate` uses for charges, f64-accumulated);
      * per-basin drift estimate
            e = (I - R32^T)^{-1} (R64^T - R32^T) s,
        read at the attractors: the exact q64 - q32 up to terms second
        order in the routing difference (the resolvent identity with
        the f32 resolvent substituted on the outside), with signed
        cancellation - one extra operator application + one adjoint
        solve, no f64 basin construction.

    Falls back to the f64 construction when the attractor sets differ
    or max_b |e_b| > trip_frac * guard_tol (default: a quarter of the
    1e-6 e basin-charge parity bar).  Where the routing difference is
    O(1) - plateau rewiring - the first-order term is itself
    macroscopic, so the estimate still trips.

    Returns (YTResult, audit dict with keys dtype/drift_est_e/nattr32/
    nattr64/tripped/reason).
    """
    rho64 = jnp.asarray(rho, jnp.float64)
    shape = tuple(int(s) for s in rho64.shape)
    N = int(np.prod(shape))
    res32 = yt_integrate(crystal, rho64.astype(jnp.float32))

    offs_np, wts_np = _grid_ws_neighbors(crystal, shape)
    offs = tuple(tuple(int(v) for v in o) for o in offs_np)
    idx3 = jnp.arange(N, dtype=jnp.int32).reshape(shape)
    chi64, isattr64 = _flux_tensors(rho64, idx3, jnp.asarray(wts_np),
                                    offs=offs, shape=shape)
    nattr64 = int(jnp.sum(isattr64))

    vol = float(np.abs(np.linalg.det(np.asarray(crystal.m_x2c))))
    dv = vol / N
    audit = {"dtype": "f32", "nattr32": res32.nattr, "nattr64": nattr64,
             "tripped": False, "reason": "",
             "drift_est_e": float("nan")}

    def fallback(reason):
        audit["tripped"] = True
        audit["reason"] = reason
        audit["dtype"] = "f64"
        return yt_integrate(crystal, rho64), audit

    if nattr64 != res32.nattr:
        return fallback(f"attractor count changed "
                        f"({res32.nattr} f32 vs {nattr64} f64)")

    # adjoint mass flow of rho through the f32 partition (what
    # integrate() would compute for the charge), full grid
    f3 = rho64.reshape((1,) + shape)
    s = _solve_sweep(res32._chiP, res32._chi32_adjoint(), f3,
                     res32._offs, adjoint=True)
    dRs = (_apply_R(chi64, s, offs=offs, adjoint=True)
           - _apply_R(res32._chiP.astype(jnp.float64), s, offs=offs,
                      adjoint=True))
    e3 = _solve_sweep(res32._chiP, res32._chi32_adjoint(), dRs,
                      res32._offs, adjoint=True)[0]
    i1, i2, i3 = np.unravel_index(res32.iattr, shape)
    drift = float(np.max(np.abs(np.asarray(e3[i1, i2, i3])))) * dv
    audit["drift_est_e"] = drift
    if drift > trip_frac * guard_tol:
        return fallback(f"estimated basin-charge drift {drift:.3e} e > "
                        f"{trip_frac:g} * {guard_tol:g} e")
    return res32, audit
