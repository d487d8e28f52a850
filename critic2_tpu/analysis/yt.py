"""Yu-Trinkle grid basin integration, TPU-native.

Role of the reference yt (src/yt@proc.f90:34-369, JCP 134, 064111): sort
the grid by density descending, walk it once; local maxima become
attractors, points whose uphill flux goes entirely to one basin inherit
it, and boundary points receive fractional weights
w_i(b) = sum_k chi_ik w_k(b), chi_ik ~ A_k (rho_k - rho_i) / l_k over the
Wigner-Seitz facet neighbors of the grid-point lattice.

The reference sweep is strictly sequential in sorted order. The TPU
reformulation exploits that dependencies only point uphill (to earlier
sorted ranks): process the sorted order in BLOCKS; all cross-block
dependencies are already resolved, and intra-block chains resolve with a
masked fixpoint iteration (jax.lax.while_loop) - each pass labels every
point whose uphill neighbors are all labeled, so the iteration count is
the longest monotone chain inside one block, not N.

Memory: interior points (the vast majority) never store weights - their
weight row is one-hot(label), reconstructed on gather. Only boundary
points (uphill flux into >1 basin) get dense weight rows (nattr, Nb).
The reference stores the same information as its on-demand weight
recurrence (src/yt@proc.f90:238-369); here it is held on device so every
integrand is one weighted reduction.

Tie-breaking at plateaus replicates the reference: the sort is stable
with index keying, "uphill" means earlier sorted rank, and a point whose
positive-flux set is empty attaches to its earliest-ranked uphill
neighbor (src/yt@proc.f90:149-156).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["yt_integrate", "YTResult"]


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


@dataclass
class YTResult:
    crystal: object
    shape: tuple
    nattr: int
    xattr: np.ndarray            # (nattr, 3) fractional attractor positions
    iattr: np.ndarray            # (nattr,) flat grid index of each attractor
    labels: np.ndarray           # (n1,n2,n3) int32 basin per point (argmax)
    # device internals for integration
    _interior_label: jnp.ndarray = None   # (N,) int32; -1 where boundary
    _bidx: jnp.ndarray = None             # (N,) int32 index into Wb cols
    _Wb: jnp.ndarray = None               # (nattr, Nb) boundary weights
    nboundary: int = 0

    def integrate(self, field_flat) -> np.ndarray:
        """sum_i w_i(b) f_i for each basin (NOT scaled by Omega/N)."""
        f = jnp.asarray(field_flat).reshape(-1)
        lab = self._interior_label
        interior = lab >= 0
        qi = jax.ops.segment_sum(jnp.where(interior, f, 0.0),
                                 jnp.where(interior, lab, 0),
                                 num_segments=self.nattr)
        if self.nboundary:
            fb = jnp.where(~interior, f, 0.0)
            qb = jax.ops.segment_sum(
                fb, jnp.where(interior, self.nboundary, self._bidx),
                num_segments=self.nboundary + 1)[:-1]
            qi = qi + self._Wb @ qb
        return np.asarray(qi)

    def weights(self, b: int) -> np.ndarray:
        """Full weight grid of basin b (dense; for WCUBE-style output)."""
        lab = self._interior_label
        w = jnp.where(lab == b, 1.0, 0.0)
        if self.nboundary:
            w = jnp.where(lab < 0, self._Wb[b][jnp.clip(self._bidx, 0,
                                                        self._Wb.shape[1] - 1)], w)
        return np.asarray(w).reshape(self.shape)


def _neighbor_flat(idx, offs, shape):
    """Flat indices (K, B) of the WS neighbors of flat indices idx (B,)."""
    n1, n2, n3 = shape
    x1 = idx // (n2 * n3)
    r = idx - x1 * (n2 * n3)
    x2 = r // n3
    x3 = r - x2 * n3
    o1 = (x1[None, :] + offs[:, 0:1]) % n1
    o2 = (x2[None, :] + offs[:, 1:2]) % n2
    o3 = (x3[None, :] + offs[:, 2:3]) % n3
    return o1 * (n2 * n3) + o2 * n3 + o3


def yt_integrate(crystal, rho, block: int = 1 << 16):
    """Run the YT decomposition of grid `rho` ((n1,n2,n3), device array).

    Returns a YTResult; pair with `attractor_match` to map attractors to
    atoms and `integrate` for the basin sums.
    """
    shape = tuple(int(s) for s in rho.shape)
    N = int(np.prod(shape))
    offs_np, wts_np = _grid_ws_neighbors(crystal, shape)
    offs = jnp.asarray(offs_np)
    wts = jnp.asarray(wts_np)
    K = offs.shape[0]

    rho_flat = jnp.asarray(rho).reshape(-1)
    # stable descending sort with index tie-break (reference qcksort order)
    order = jnp.argsort(-rho_flat, stable=True)        # rank -> flat idx
    rank = jnp.argsort(order, stable=True)             # flat idx -> rank

    # ---- vectorized attractor detection ------------------------------
    # (blocked to bound the (K, N) temporaries)
    nblk = (N + block - 1) // block
    pad = nblk * block - N
    all_idx = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def attr_block(idx):
        nbr = _neighbor_flat(idx, offs, shape)
        return ~(rank[nbr] < rank[idx][None, :]).any(0)

    is_attr = jnp.concatenate(
        [attr_block(all_idx[b * block:(b + 1) * block]) for b in range(nblk)])

    iattr_sorted = np.asarray(order)[np.asarray(is_attr)[np.asarray(order)]]
    nattr = len(iattr_sorted)
    # labels of attractors: order of appearance in the sorted sweep
    attr_label = jnp.full((N,), -1, jnp.int32).at[
        jnp.asarray(iattr_sorted)].set(jnp.arange(nattr, dtype=jnp.int32))

    # ---- pass 1: interior labels / boundary flags --------------------
    # state[i]: -9 unprocessed, >=0 interior label, -2 boundary
    UNSET, BND = jnp.int32(-9), jnp.int32(-2)
    state0 = jnp.where(is_attr, attr_label, UNSET)

    order_pad = jnp.concatenate([order, jnp.full((pad,), N - 1, order.dtype)])
    blocks = order_pad.reshape(nblk, block)

    @jax.jit
    def label_block(state, pts):
        nbr = _neighbor_flat(pts, offs, shape)           # (K, B)
        rnk_p = rank[pts][None, :]
        hi = rank[nbr] < rnk_p
        drho = rho_flat[nbr] - rho_flat[pts][None, :]
        chi = jnp.where(hi, wts[:, None] * drho, 0.0)
        pos = chi > 0.0
        haspos = pos.any(0)
        # plateau fallback: earliest-ranked uphill neighbor only
        rnk_hi = jnp.where(hi, rank[nbr], N)
        kmin = jnp.argmin(rnk_hi, axis=0)
        fallback = jax.nn.one_hot(kmin, K, dtype=bool).T
        sel = jnp.where(haspos[None, :], pos, fallback & hi)

        def body(st):
            s = st
            ls = s[nbr]                                   # (K, B)
            known = jnp.where(sel, ls != UNSET, True).all(0)
            cur = s[pts]
            todo = (cur == UNSET) & known
            # first selected neighbor label as the candidate
            cand_k = jnp.argmax(sel, axis=0)
            cand = ls[cand_k, jnp.arange(pts.shape[0])]
            same = jnp.where(sel, ls == cand[None, :], True).all(0)
            newlab = jnp.where(same & (cand >= 0), cand, BND)
            return s.at[pts].set(jnp.where(todo, newlab, cur))

        def cond(st):
            return (st[pts] == UNSET).any()

        return jax.lax.while_loop(cond, body, state)

    state = state0
    for b in range(nblk):
        state = label_block(state, blocks[b])

    interior_label = state                                # -2 marks boundary
    is_bnd = np.asarray(state == BND)
    nb = int(is_bnd.sum())

    # boundary column index per flat point (sorted order for determinism)
    bnd_sorted = np.asarray(order)[is_bnd[np.asarray(order)]]
    bidx_np = np.full(N, nb, dtype=np.int32)
    bidx_np[bnd_sorted] = np.arange(nb, dtype=np.int32)
    bidx = jnp.asarray(bidx_np)

    # ---- pass 2: boundary weight rows --------------------------------
    Wb = jnp.zeros((nattr, nb + 1))
    done0 = jnp.zeros((nb + 1,), bool).at[nb].set(True)
    ilab = jnp.where(state == BND, -1, state)

    @jax.jit
    def weight_block(carry, pts):
        Wb, done = carry
        nbr = _neighbor_flat(pts, offs, shape)
        rnk_p = rank[pts][None, :]
        hi = rank[nbr] < rnk_p
        drho = rho_flat[nbr] - rho_flat[pts][None, :]
        chi = jnp.where(hi, wts[:, None] * drho, 0.0)
        chi = jnp.maximum(chi, 0.0)
        haspos = chi.sum(0) > 0.0
        rnk_hi = jnp.where(hi, rank[nbr], N)
        kmin = jnp.argmin(rnk_hi, axis=0)
        fallback = jax.nn.one_hot(kmin, K, dtype=rho_flat.dtype).T
        chi = jnp.where(haspos[None, :], chi, fallback * hi)
        chi = chi / jnp.maximum(chi.sum(0), 1e-300)[None, :]

        mybnd = ilab[pts] < 0
        myb = bidx[pts]
        nlab = ilab[nbr]                                  # (K, B)
        nbix = bidx[nbr]

        def body(carry):
            Wb, done = carry
            nb_int = nlab >= 0
            ready = jnp.where(chi > 0, nb_int | done[nbix], True).all(0)
            todo = mybnd & ~done[myb] & ready
            # w row = sum_k chi_k * (one-hot or Wb column)
            wnbr = jnp.where(nb_int[None, :, :],
                             (jnp.arange(Wb.shape[0])[:, None, None] ==
                              nlab[None, :, :]),
                             Wb[:, nbix])                 # (nattr, K, B)
            row = (wnbr * chi[None, :, :]).sum(1)          # (nattr, B)
            col = jnp.where(todo, myb, nb)
            Wb = Wb.at[:, col].set(jnp.where(todo[None, :], row, Wb[:, col]))
            Wb = Wb.at[:, nb].set(0.0)
            done = done.at[col].set(True)
            done = done.at[nb].set(True)
            return Wb, done

        def cond(carry):
            _, done = carry
            return ~done[jnp.where(mybnd, myb, nb)].all()

        return jax.lax.while_loop(cond, body, (Wb, done))

    if nb:
        carry = (Wb, done0)
        for b in range(nblk):
            carry = weight_block(carry, blocks[b])
        Wb = carry[0][:, :nb]
    else:
        Wb = Wb[:, :0]

    # integer labels for reporting: argmax weight for boundary points
    if nb:
        argmaxb = jnp.argmax(Wb, axis=0).astype(jnp.int32)
        labels_full = jnp.where(state == BND,
                                argmaxb[jnp.clip(bidx, 0, nb - 1)], state)
    else:
        labels_full = state

    i_at = np.asarray(iattr_sorted)
    x1 = i_at // (shape[1] * shape[2])
    r = i_at - x1 * (shape[1] * shape[2])
    x2 = r // shape[2]
    x3 = r - x2 * shape[2]
    xattr = np.stack([x1 / shape[0], x2 / shape[1], x3 / shape[2]], axis=1)

    return YTResult(
        crystal=crystal, shape=shape, nattr=nattr, xattr=xattr,
        iattr=i_at, labels=np.asarray(labels_full).reshape(shape),
        _interior_label=ilab, _bidx=bidx, _Wb=Wb, nboundary=nb)
