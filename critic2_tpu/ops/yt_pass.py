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
    (affine index maps only — modular maps break Mosaic under x64, see
    ops/pallas_sweep.py).
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

__all__ = ["yt_pass", "supported"]


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
    # Mosaic rejects mixed-width index tuples (see ops/pallas_sweep.py)
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
