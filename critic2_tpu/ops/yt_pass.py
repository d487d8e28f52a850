"""Pallas TPU kernel for the Yu-Trinkle flux-propagation pass.

One YT relaxation pass applies the uphill flux operator R to a stack of
scalar grids (analysis/yt.py):

  adjoint (charges):  out[p, x] = f[p, x] + sum_k chi'_k[x] s[p, x - o_k]
  forward (weights):  out[p, x] = f[p, x] + sum_k chi_k[x]  s[p, x + o_k]

where chi'_k = roll(chi_k, o_k) is the shifted flux tensor.  In plain
XLA the K rolls per pass materialize ~10x the necessary HBM traffic
(measured 13.5 ms/pass f32 at 256^3 on a v5e vs the ~1.3 ms roofline);
this kernel reads every operand once per pass:

  - axis 0 is pipelined plane by plane; the +-H halo comes from feeding
    the once-per-pass axis-0-padded s with 2H+1 plane-offset BlockSpecs
    (affine index maps only — modular index maps break Mosaic under
    x64).
  - in-plane offsets are pltpu.roll on VMEM-resident planes (free wrap).

f64 operands are rejected by the TPU custom-call path under x64
(BASELINE.md), so the kernel is f32-only; analysis/yt.py wraps it in
f64 iterative refinement (the fixpoint solves the nilpotent triangular
system (I-R)s = f, so each refinement round multiplies the error by
the f32 roundoff of one solve).

Workload contract: reference src/yt@proc.f90:238-369 (weight
recurrence); the adjoint direction is this rebuild's own formulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["yt_pass", "yt_gs_pass", "supported"]


def supported(platform: str | None = None) -> bool:
    """True when the Mosaic TPU path is available."""
    if platform is None:
        platform = jax.devices()[0].platform
    return platform in ("tpu", "axon")


@partial(jax.jit, static_argnames=("offs", "adjoint"))
def yt_pass(chiP, s, f3, *, offs, adjoint: bool = True):
    """One relaxation pass out = f + R s on a (P, n1, n2, n3) stack.

    chiP: (K, n1, n2, n3) f32 — ALREADY shifted (chi'_k) for the
    adjoint direction, unshifted chi_k for the forward direction.
    offs: static tuple of K (o0, o1, o2) neighbor offsets.

    Grid steps process R planes each (R chosen to fill ~11 MB of VMEM):
    one-plane steps leave the kernel DMA-latency-bound (measured 10.8
    ms/pass at 256^3 vs ~3 ms with R=4).  The axis-0 halo of width H <=
    R comes from feeding the axis-0-padded s three times at consecutive
    R-plane blocks.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, n1, n2, n3 = s.shape
    K = len(offs)
    sgn = -1 if adjoint else 1
    H = max(1, max(abs(int(o[0])) for o in offs))

    # planes per grid step: 3 s-blocks + K chi + f + out live per step,
    # double-buffered, inside a ~96 MB VMEM budget (v5e: 128 MB; f32
    # 256^2 plane = 0.26 MB)
    budget = max(1, int(96e6 / (n2 * n3 * 4) / 2))
    R = max(H, min(8, budget // (3 * P + K + 2 * P)))
    while R > 1 and n1 % R:
        R -= 1
    if R < H or n1 % R:
        raise ValueError(f"no valid plane block for n1={n1}, halo {H}")
    G = n1 // R

    # once-per-pass axis-0 periodic pad to (n1 + 2R) planes: G + 2
    # R-blocks, so the three windows use affine block maps i, i+1, i+2
    # (modular maps break Mosaic's i32 lowering under x64)
    s_pad = jnp.concatenate([s[:, -R:], s, s[:, :R]], axis=1)

    def kernel(sm, s0, sp, chi_ref, f_ref, out_ref):
        acc = f_ref[...]                          # (P, R, n2, n3)
        for k, o in enumerate(offs):
            d = sgn * int(o[0])                   # window planes [R+d, 2R+d)
            if d == 0:
                pk = s0[...]
            elif d == R:
                pk = sp[...]
            elif d == -R:
                pk = sm[...]
            elif d > 0:
                pk = jnp.concatenate([s0[:, d:], sp[:, :d]], axis=1)
            else:
                pk = jnp.concatenate([sm[:, R + d:], s0[:, :R + d]], axis=1)
            r1 = (-sgn) * int(o[1]) % n2
            r2 = (-sgn) * int(o[2]) % n3
            if r1:
                pk = pltpu.roll(pk, np.int32(r1), 2)
            if r2:
                pk = pltpu.roll(pk, np.int32(r2), 3)
            acc = acc + chi_ref[k:k + 1] * pk
        out_ref[...] = acc

    # index maps derive every component from the i32 grid index (i * 0,
    # not literal 0): Python int literals lower to i64 under x64 and
    # Mosaic rejects mixed-width index tuples
    win = lambda d: pl.BlockSpec((P, R, n2, n3),
                                 (lambda i, d=d: (i * 0, i + d, i * 0,
                                                  i * 0)),
                                 memory_space=pltpu.VMEM)
    in_specs = [win(0), win(1), win(2),
                pl.BlockSpec((K, R, n2, n3),
                             lambda i: (i * 0, i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, R, n2, n3),
                             lambda i: (i * 0, i, i * 0, i * 0),
                             memory_space=pltpu.VMEM)]
    out_spec = pl.BlockSpec((P, R, n2, n3),
                            lambda i: (i * 0, i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((P, n1, n2, n3), s.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110e6)),
    )(s_pad, s_pad, s_pad, chiP, f3)


@partial(jax.jit, static_argnames=("offs", "adjoint", "backward"))
def yt_gs_pass(chiP, s, f3, *, offs, adjoint: bool = True,
               backward: bool = False):
    """One plane-ordered Gauss-Seidel sweep of s = f + R s.

    Planes along axis 0 are processed sequentially (the TPU grid is
    sequential, so updated planes flow through a VMEM carry scratch);
    WITHIN each plane the in-plane sub-system is solved EXACTLY by a
    VMEM-resident while-loop (the in-plane flux operator is nilpotent,
    so bitwise fixpoint in <= chain-length iterations at zero HBM
    cost).  One forward + one backward sweep therefore resolve every
    uphill chain up to its axis-0 direction reversals — a handful of
    sweeps replace the ~grid-diameter Jacobi passes of yt_pass
    (measured at 256^3: 384 Jacobi passes -> 4 GS sweeps).

    Conventions match yt_pass: chiP is shifted chi' for the adjoint
    direction, plain chi for the forward one; the neighbor displacement
    is d_k = -o_k (adjoint) / +o_k (forward), and the value needed at x
    is s[x + d_k].

    Returns (out, nchanged) with nchanged a (1, 1) i32 count of points
    whose value changed this sweep — a full GS sweep changes nothing
    iff s is the exact fixpoint, so the caller's loop terminates on one
    scalar instead of an extra whole-grid equality reduction.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, n1, n2, n3 = s.shape
    K = len(offs)
    sgn = -1 if adjoint else 1
    disp = [(sgn * int(o[0]), sgn * int(o[1]), sgn * int(o[2]))
            for o in offs]
    H = max(1, max(abs(d[0]) for d in disp))

    budget = max(1, int(96e6 / (n2 * n3 * 4) / 2))
    R = max(H, min(8, budget // (3 * P + K + 2 * P)))
    while R > 1 and n1 % R:
        R -= 1
    if R < H or n1 % R:
        raise ValueError(f"no valid plane block for n1={n1}, halo {H}")
    G = n1 // R

    s_pad = jnp.concatenate([s[:, -R:], s, s[:, :R]], axis=1)

    def roll2(pk, d1, d2):
        r1 = (-d1) % n2
        r2 = (-d2) % n3
        if r1:
            pk = pltpu.roll(pk, np.int32(r1), 1)
        if r2:
            pk = pltpu.roll(pk, np.int32(r2), 2)
        return pk

    inplane = [(k, d) for k, d in enumerate(disp) if d[0] == 0]
    below = [(k, d) for k, d in enumerate(disp) if d[0] < 0]
    above = [(k, d) for k, d in enumerate(disp) if d[0] > 0]

    def kernel(sm, s0, sp, chi_ref, f_ref, out_ref, cnt_ref, carry):
        step = pl.program_id(0)

        # initialize the carry with OLD wrapped values at the first step
        # (the periodic boundary enters with pre-sweep values; later
        # sweeps converge it — bitwise stationarity is still exact)
        @pl.when(step == 0)
        def _():
            cnt_ref[0, 0] = jnp.int32(0)
            if not backward:
                carry[...] = sm[:, R - H:R]     # planes just below start
            else:
                carry[...] = sp[:, :H]          # planes just above start

        order = range(R) if not backward else range(R - 1, -1, -1)
        planes = {}
        for r in order:
            base = f_ref[:, r]
            # cross-plane neighbors
            for k, d in below + above:
                rr = r + d[0]
                if not backward:
                    if d[0] < 0:                # updated side
                        nb = planes[rr] if rr >= 0 else carry[:, H + rr]
                    else:                       # old side: s0 / sp
                        nb = s0[:, rr] if rr < R else sp[:, rr - R]
                else:
                    if d[0] > 0:                # updated side
                        nb = planes[rr] if rr < R else carry[:, rr - R]
                    else:                       # old side: sm / s0
                        nb = s0[:, rr] if rr >= 0 else sm[:, R + rr]
                base = base + chi_ref[k, r][None] * roll2(nb, d[1], d[2])
            # exact in-plane solve (nilpotent -> bitwise fixpoint),
            # warm-started from the plane's pre-sweep value: on late
            # sweeps most planes are already at the fixpoint, so the
            # loop exits after ONE verification iteration instead of
            # the full in-plane chain length (the fixpoint of the
            # nilpotent recurrence is unique, so any start converges
            # to the same bits)
            if inplane:
                cks = [(chi_ref[k, r][None], d) for k, d in inplane]

                def body(cu):
                    u, _ = cu
                    un = base
                    for ck, d in cks:
                        un = un + ck * roll2(u, d[1], d[2])
                    # bitwise-stationarity flag via an i32 min (the
                    # bool-all reduction proxy promotes to f64 under
                    # x64, which Mosaic rejects for scalars)
                    same = jnp.min((un == u).astype(jnp.int32)) == 1
                    return un, same

                def cond(cu):
                    return ~cu[1]

                u, _ = jax.lax.while_loop(cond, body,
                                          (s0[:, r], jnp.asarray(False)))
            else:
                u = base
            planes[r] = u
            out_ref[:, r] = u
            # stationarity metadata: any-changed flag vs the pre-sweep
            # value, accumulated in SMEM via i32 max (sum lowering
            # promotes to i64 under x64) — the caller's loop reads ONE
            # scalar instead of re-reducing the whole grid
            chg = jnp.max((u != s0[:, r]).astype(jnp.int32))
            cnt_ref[0, 0] = jnp.maximum(cnt_ref[0, 0], chg)
        # hand the updated boundary planes to the next grid step
        if not backward:
            for j in range(H):
                carry[:, j] = planes[R - H + j]
        else:
            for j in range(H):
                carry[:, j] = planes[j]

    if not backward:
        bidx = lambda i: i
    else:
        bidx = lambda i: (G - 1) - i
    win = lambda d: pl.BlockSpec(
        (P, R, n2, n3),
        (lambda i, d=d: (i * 0, bidx(i) + d, i * 0, i * 0)),
        memory_space=pltpu.VMEM)
    in_specs = [win(0), win(1), win(2),
                pl.BlockSpec((K, R, n2, n3),
                             lambda i: (i * 0, bidx(i), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, R, n2, n3),
                             lambda i: (i * 0, bidx(i), i * 0, i * 0),
                             memory_space=pltpu.VMEM)]
    out_specs = [pl.BlockSpec((P, R, n2, n3),
                              lambda i: (i * 0, bidx(i), i * 0, i * 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                              memory_space=pltpu.SMEM)]

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, n1, n2, n3), s.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((P, H, n2, n3), s.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110e6)),
    )(s_pad, s_pad, s_pad, chiP, f3)
