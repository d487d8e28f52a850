"""Batched promolecular density evaluation on device.

Role of the reference environ%promolecular (src/environmod@proc.f90:1202):
the sum of spherical atomic densities (and its gradient/Hessian) at a
batch of points. The reference walks a spatial-hash neighbor list per
point; the TPU formulation is a dense masked points x atom-images
contraction - every (point, image) pair evaluates the radial table with a
distance mask, which vectorizes perfectly on the VPU and needs no dynamic
shapes.

The radial interpolation is the reference's 4-node, 3rd-order Lagrange on
the log grid (src/grid1mod@proc.f90:84-135), evaluated for all pairs at
once via gathers into the stacked RadialTableSet arrays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .grid1 import RadialTableSet

__all__ = ["promol_tables", "promolecular_batch", "PromolEnv"]


def _radial_interp(tab, s, r0):
    """Batched Lagrange-4 log-grid interpolation.

    tab: dict of device arrays from RadialTableSet; s: (...,) int32 table
    index per evaluation; r0: (...,) radius. Returns (f, fp, fpp) with
    zeros beyond rmax (reference interp, src/grid1mod@proc.f90:84-135).
    """
    a = tab["a"][s]
    b = tab["b"][s]
    ngrid = tab["ngrid"][s]
    rmax = tab["rmax"][s]
    r1 = tab["r"][s, 0]

    # reference: if r0 <= r(1) evaluate AT r(1); else at r0
    below = r0 <= r1
    r = jnp.where(below, r1, r0)
    ir = jnp.where(
        below, 1, 1 + jnp.floor(jnp.log(jnp.maximum(r0, 1e-300) / a) / b).astype(jnp.int32)
    )
    base = jnp.clip(ir, 2, ngrid - 2) - 2  # 1-based start-1 => 0-based node0-? see below

    # nodes ii = base + i for i=1..4 (1-based) -> 0-based: base + (0..3)
    offs = jnp.arange(4, dtype=jnp.int32)
    nodes = base[..., None] + offs  # 0-based node indices (base is 1-based-1)
    rr = tab["r"][s[..., None], nodes]         # (..., 4)
    dr1 = r[..., None] - rr

    # lagrange basis: prod_{j != i} dr1_j / (rr_i - rr_j)
    diff = rr[..., :, None] - rr[..., None, :]          # (...,4,4)
    diff = jnp.where(jnp.eye(4, dtype=bool), 1.0, diff)
    terms = dr1[..., None, :] / diff                     # (...,4,4): j-index last
    terms = jnp.where(jnp.eye(4, dtype=bool), 1.0, terms)
    w = jnp.prod(terms, axis=-1)                         # (...,4)

    fv = (tab["f"][s[..., None], nodes] * w).sum(-1)
    fpv = (tab["fp"][s[..., None], nodes] * w).sum(-1)
    fppv = (tab["fpp"][s[..., None], nodes] * w).sum(-1)

    valid = (r0 < rmax) & (ngrid > 0)
    zero = jnp.zeros_like(fv)
    return (
        jnp.where(valid, fv, zero),
        jnp.where(valid, fpv, zero),
        jnp.where(valid, fppv, zero),
    )


def promol_tables(ts: RadialTableSet, dtype=jnp.float64) -> dict:
    """Push a RadialTableSet to device arrays."""
    return {
        "a": jnp.asarray(ts.a, dtype),
        "b": jnp.asarray(ts.b, dtype),
        "ngrid": jnp.asarray(ts.ngrid, jnp.int32),
        "rmax": jnp.asarray(ts.rmax, dtype),
        "cutoff": jnp.asarray(ts.cutoff, dtype),
        "r": jnp.asarray(ts.r, dtype),
        "f": jnp.asarray(ts.f, dtype),
        "fp": jnp.asarray(ts.fp, dtype),
        "fpp": jnp.asarray(ts.fpp, dtype),
    }


@partial(jax.jit, static_argnames=("nder",))
def promolecular_batch(points, atpos, atspc, tab, nder: int = 2):
    """Promolecular density/gradient/Hessian at Cartesian points.

    points: (N, 3); atpos: (M, 3) Cartesian atom-image positions;
    atspc: (M,) int32 index into the table set; tab: promol_tables output.
    Returns (f (N,), fp (N,3), fpp (N,3,3)).

    Semantics follow reference promolecular (environmod@proc.f90:1284-1323):
    per-pair distance clamped to max(r, r_table(1), 1e-14); per-atom density
    clamped to >= 0; contribution dropped beyond min(cutrad(z), rmax).
    """
    points = jnp.asarray(points)
    xx = points[:, None, :] - atpos[None, :, :]          # (N, M, 3)
    r2 = (xx * xx).sum(-1)
    r = jnp.sqrt(jnp.maximum(r2, 1e-28))                 # (N, M)

    s = jnp.broadcast_to(atspc[None, :], r.shape)
    cut = tab["cutoff"][atspc][None, :]
    within = r <= cut

    rho, rhop, rhopp = _radial_interp(tab, s, r)
    rho = jnp.maximum(rho, 0.0)
    rho = jnp.where(within, rho, 0.0)
    f = rho.sum(axis=1)
    if nder < 1:
        z3 = jnp.zeros((points.shape[0], 3), points.dtype)
        return f, z3, jnp.zeros((points.shape[0], 3, 3), points.dtype)

    rinv = 1.0 / r
    rp = jnp.where(within, rhop, 0.0) * rinv            # rhop / r
    fp = (xx * rp[..., None]).sum(axis=1)
    if nder < 2:
        return f, fp, jnp.zeros((points.shape[0], 3, 3), points.dtype)

    rfac = (jnp.where(within, rhopp, 0.0) - rp) * rinv * rinv
    # H = sum_m [ rp * I + rfac * xx xx^T ]
    hiso = rp.sum(axis=1)
    hout = jnp.einsum("nm,nmi,nmj->nij", rfac, xx, xx)
    fpp = hout + hiso[:, None, None] * jnp.eye(3, dtype=points.dtype)
    return f, fp, fpp


class PromolEnv:
    """Host-side wrapper: crystal -> candidate atom images + tables.

    The all-electron variant is the promolecular field (field 0); passing
    zpsp builds the core-augmentation variant (cgrid tables).
    """

    def __init__(self, crystal, zpsp: dict | None = None, fragment=None,
                 dtype=jnp.float64):
        from .. import param

        self.crystal = crystal
        zs = crystal.zatoms
        if zpsp is None:
            zq = sorted({(int(z), 0) for z in zs})
        else:
            # core tables: q = pseudopotential charge per element; atoms of
            # elements without a zpsp entry contribute nothing
            zq = sorted({(int(z), int(zpsp.get(int(z), -1))) for z in zs})
        self.ts = RadialTableSet.build(zq)
        self.tab = promol_tables(self.ts, dtype=dtype)
        zq_index = {t: i for i, t in enumerate(zq)}

        rmax = float(np.max(self.ts.cutoff)) if len(self.ts.cutoff) else 0.0
        pos, spc, cidx = crystal.atomic_environment(rmax)
        if fragment is not None:
            keep = np.isin(cidx, np.asarray(fragment, dtype=int))
            pos, spc, cidx = pos[keep], spc[keep], cidx[keep]
        if zpsp is None:
            tidx = np.array([zq_index[(crystal.species[s].z, 0)] for s in spc],
                            dtype=np.int32)
        else:
            tidx = np.array(
                [zq_index[(crystal.species[s].z,
                           int(zpsp.get(int(crystal.species[s].z), -1)))]
                 for s in spc], dtype=np.int32)
            # drop images whose element has no valid core table (q <= 0)
            valid = np.array([self.ts.zq[t][1] > 0 and
                              (self.ts.zq[t][0] - self.ts.zq[t][1]) > 0
                              for t in tidx])
            if not valid.all():
                pos, tidx, cidx = pos[valid], tidx[valid], cidx[valid]
        self.atpos = jnp.asarray(pos, dtype=dtype)
        self.atspc = jnp.asarray(tidx)
        self.cellidx = cidx

    def eval(self, points_cart, nder: int = 2):
        if self.atpos.shape[0] == 0:
            n = jnp.atleast_2d(points_cart).shape[0]
            dt = self.atpos.dtype
            return (jnp.zeros((n,), dt), jnp.zeros((n, 3), dt),
                    jnp.zeros((n, 3, 3), dt))
        return promolecular_batch(
            jnp.atleast_2d(jnp.asarray(points_cart, self.atpos.dtype)),
            self.atpos, self.atspc, self.tab, nder=nder
        )
