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

__all__ = ["promol_tables", "promolecular_batch", "promolecular_soa",
           "PromolEnv"]


def _radial_interp(tab, s, r0):
    """Batched Lagrange-4 log-grid interpolation.

    tab: dict of device arrays from RadialTableSet; s: (...,) int32 table
    index per evaluation; r0: (...,) radius. Returns (f, fp, fpp) with
    zeros beyond rmax (reference interp, src/grid1mod@proc.f90:84-135).

    TPU layout: the 4-node axis LEADS every intermediate ((4, ...) and
    (4, 4, ...)) so the big trailing batch axes stay lane-dense.
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
    base = jnp.clip(ir, 2, ngrid - 2) - 2  # 0-based first node

    # nodes: (4, ...) leading stencil axis
    nd = r0.ndim
    offs = jnp.arange(4, dtype=jnp.int32).reshape((4,) + (1,) * nd)
    nodes = base[None] + offs                        # (4, ...)
    sb = jnp.broadcast_to(s[None], nodes.shape)
    rr = tab["r"][sb, nodes]                         # (4, ...)
    dr1 = r[None] - rr

    # lagrange basis: w_i = prod_{j != i} dr1_j / (rr_i - rr_j)
    diff = rr[:, None] - rr[None, :]                 # (4, 4, ...)
    eye = jnp.eye(4, dtype=bool).reshape((4, 4) + (1,) * nd)
    diff = jnp.where(eye, 1.0, diff)
    terms = jnp.where(eye, 1.0, dr1[None, :] / diff)  # j-index = axis 1
    w = jnp.prod(terms, axis=1)                       # (4, ...)

    fv = (tab["f"][sb, nodes] * w).sum(0)
    fpv = (tab["fp"][sb, nodes] * w).sum(0)
    fppv = (tab["fpp"][sb, nodes] * w).sum(0)

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
def promolecular_soa(pointsT, atpos, atspc, tab, nder: int = 2):
    """Promolecular density/gradient/Hessian, batch-last SoA.

    pointsT: (3, N) Cartesian points; atpos: (M, 3) atom-image positions;
    atspc: (M,) int32 index into the table set; tab: promol_tables output.
    Returns (f (N,), fp (3, N), fpp6 (6, N)) with fpp6 in SYM6 order
    (xx, yy, zz, xy, xz, yz).

    Semantics follow reference promolecular (environmod@proc.f90:1284-1323):
    per-pair distance clamped to max(r, r_table(1), 1e-14); per-atom density
    clamped to >= 0; contribution dropped beyond min(cutrad(z), rmax).
    The pair tensors are (N, M) with the coordinate axis leading - both
    trailing axes are large, so nothing tile-pads on TPU.
    """
    pT = jnp.asarray(pointsT)
    aT = jnp.asarray(atpos).T                            # (3, M)
    xx = pT[:, :, None] - aT[:, None, :]                 # (3, N, M)
    r2 = (xx * xx).sum(0)
    r = jnp.sqrt(jnp.maximum(r2, 1e-28))                 # (N, M)
    N = pT.shape[1]

    s = jnp.broadcast_to(atspc[None, :], r.shape)
    cut = tab["cutoff"][atspc][None, :]
    within = r <= cut

    rho, rhop, rhopp = _radial_interp(tab, s, r)
    rho = jnp.maximum(rho, 0.0)
    rho = jnp.where(within, rho, 0.0)
    f = rho.sum(axis=-1)
    z3 = jnp.zeros((3, N), pT.dtype)
    z6 = jnp.zeros((6, N), pT.dtype)
    if nder < 1:
        return f, z3, z6

    rinv = 1.0 / r
    rp = jnp.where(within, rhop, 0.0) * rinv            # rhop / r, (N, M)
    fp = (xx * rp[None]).sum(axis=-1)                    # (3, N)
    if nder < 2:
        return f, fp, z6

    rfac = (jnp.where(within, rhopp, 0.0) - rp) * rinv * rinv
    # H = sum_m [ rp * I + rfac * xx xx^T ], symmetric components
    hiso = rp.sum(axis=-1)
    hxx = (rfac * xx[0] * xx[0]).sum(-1) + hiso
    hyy = (rfac * xx[1] * xx[1]).sum(-1) + hiso
    hzz = (rfac * xx[2] * xx[2]).sum(-1) + hiso
    hxy = (rfac * xx[0] * xx[1]).sum(-1)
    hxz = (rfac * xx[0] * xx[2]).sum(-1)
    hyz = (rfac * xx[1] * xx[2]).sum(-1)
    return f, fp, jnp.stack([hxx, hyy, hzz, hxy, hxz, hyz])


def promolecular_batch(points, atpos, atspc, tab, nder: int = 2):
    """Batch-first wrapper over promolecular_soa: points (N, 3) ->
    (f (N,), fp (N, 3), fpp (N, 3, 3))."""
    from ..ops.interp import sym6_to_mat

    f, fpT, fpp6 = promolecular_soa(jnp.asarray(points).T, atpos, atspc,
                                    tab, nder=nder)
    return f, fpT.T, sym6_to_mat(fpp6)


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
