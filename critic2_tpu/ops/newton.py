"""Batched damped-free Newton search for critical points (device).

TPU-native replacement for the reference's per-seed Newton loop
(src/fieldmod@proc.f90:1832-1868 `newton`): all seeds advance in lockstep
with per-seed convergence/failure masks; the LINPACK dgeco/dgedi 3x3
Hessian solve becomes the closed-form adjugate solve on symmetric
components (critic2_tpu/ops/eig3.py solve3s).

Layout: batch-last SoA throughout the loop - positions (3, N), gradients
(3, N), Hessians (6, N) - so every loop-carried array is lane-dense on
TPU (see ops/interp.py docstring). The public interface stays (N, 3).

Loop structure: a lax.while_loop with on-device early exit runs the
whole iteration budget in one device program. History: until
2026-08-16 the v5e backend in this environment miscompiled loop bodies
whose gather indices evolve with the carried state (the field evaluator
inside the loop returned values inconsistent with the same graph
outside; post-hoc |grad| up to 3e-2 at points the in-loop check claimed
converged to 1e-12), which forced Python-unrolled chunks for grid
fields. On the 2026-08-19 stack the loop steppers bit-match the
unrolled ones on hardware (both interp paths, ODE and Newton), while
the unrolled form now OOM-kills the remote compile helper at >=16
inlined evals over a 64^3 f64 grid; the unrolled steppers remain as
a fallback (CRITIC2_TPU_UNROLL_LOOPS=1).

Semantics mirror the reference exactly: stop when |grad f| < gfnormeps
(success), when |det H| < 1e-30 (singular failure), or after maxit
iterations (failure).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .eig3 import solve3s

__all__ = ["newton_batch"]


@partial(jax.jit, static_argnames=("eval_fn", "nsteps"))
def _newton_chunk(eval_fn, consts, xT, conv, failed, gfnormeps,
                  nsteps: int):
    """Advance all active seeds nsteps Newton iterations (masked,
    Python-unrolled - see module docstring).  `consts` carries the
    evaluator's device constants as a real jit argument (closure
    capture would inline them into the lowered IR - 134 MB of MLIR for
    a 256^3 f64 grid; fields/field.py _build_eval_fn)."""

    def check(xT):
        f, gf, h6 = (eval_fn(xT) if consts is None
                     else eval_fn(consts, xT))
        gfmod2 = (gf * gf).sum(0)
        cnow = gfmod2 < gfnormeps * gfnormeps
        nan = ~jnp.isfinite(xT).all(0) | ~jnp.isfinite(gf).all(0)
        return gf, h6, cnow, nan

    for _ in range(nsteps):
        gf, h6, cnow, nan = check(xT)
        step_num, det = solve3s(h6, gf)
        sing = jnp.abs(det) < 1e-30
        conv = conv | cnow
        failed = failed | ((sing | nan) & ~conv)
        active = ~(conv | failed)
        step = step_num / jnp.where(sing, 1.0, det)[None, :]
        xT = jnp.where(active[None, :], xT - step, xT)

    # convergence state of the final positions
    _, _, cfin, _ = check(xT)
    conv = conv | (cfin & ~failed)
    return xT, conv, failed


@partial(jax.jit, static_argnames=("eval_fn", "nsteps"))
def _newton_chunk_fori(eval_fn, consts, xT, conv, failed, gfnormeps,
                       nsteps: int):
    """Same semantics as _newton_chunk via lax.fori_loop: the body
    compiles ONCE instead of nsteps inlined copies.  Only safe for
    evaluators with no data-dependent gathers (wfn/dense fields): the
    v5e loop miscompile this module's docstring describes is specific
    to gather indices that evolve with the carried state; the wfn eval
    is matmuls + selects, which round-trip correctly (verified vs the
    unrolled path in tests/test_autocp.py)."""

    def body(carry):
        i, xT, conv, failed = carry
        f, gf, h6 = (eval_fn(xT) if consts is None
                     else eval_fn(consts, xT))
        gfmod2 = (gf * gf).sum(0)
        cnow = gfmod2 < gfnormeps * gfnormeps
        nan = ~jnp.isfinite(xT).all(0) | ~jnp.isfinite(gf).all(0)
        step_num, det = solve3s(h6, gf)
        sing = jnp.abs(det) < 1e-30
        conv = conv | cnow
        failed = failed | ((sing | nan) & ~conv)
        active = ~(conv | failed)
        step = step_num / jnp.where(sing, 1.0, det)[None, :]
        xT = jnp.where(active[None, :], xT - step, xT)
        return i + 1, xT, conv, failed

    def cond(carry):
        i, _, conv, failed = carry
        return (i < nsteps) & ~(conv | failed).all()

    _, xT, conv, failed = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), xT, conv, failed))
    f, gf, h6 = eval_fn(xT) if consts is None else eval_fn(consts, xT)
    cfin = (gf * gf).sum(0) < gfnormeps * gfnormeps
    conv = conv | (cfin & ~failed)
    return xT, conv, failed


def newton_batch(eval_fn, x0, gfnormeps: float = 1e-12, maxit: int = 200,
                 chunk: int = 10, loop: str | None = None,
                 compact: bool = True):
    """Run Newton iterations from a batch of Cartesian seeds.

    eval_fn: SoA evaluator (3, N) -> (f (N,), gf (3, N), h6 (6, N));
    must be jittable. x0: (N, 3) Cartesian seeds.
    loop: "unroll" (safe for gather-based fields, see module docstring)
    or "fori" (one compiled body - use for gather-free evaluators like
    molecular wavefunctions, whose unrolled compile is superlinear in
    chunk); None reads eval_fn._c2t_loop (set by Field._build_eval_fn).

    compact: between iteration segments, pack the still-active lanes
    into a pow-2 bucket and scatter results back.  Lockstep width is
    the large-batch Newton's wall: most seeds converge in ~10-30
    iterations while a handful of oscillating lanes run to maxit, and
    without compaction EVERY lane pays every straggler iteration
    (measured in-bench on the 39312-seed 256^3 heavy AUTO leg: 11.4 s
    one-shot -> 3.3 s compacted, identical results - the grid-AUTO
    CP-parity gate stays at 3.2e-12 bohr).  Disabled for small batches
    where the extra dispatches cost more than the width saves.
    Returns (x (N, 3) final positions, conv (N,) success mask, nit).
    """
    import numpy as np

    if loop is None:
        loop = getattr(eval_fn, "_c2t_loop", "unroll")
    raw = getattr(eval_fn, "_c2t_raw", eval_fn)
    consts = getattr(eval_fn, "_c2t_consts", None)
    xT = jnp.asarray(x0).T
    N = xT.shape[1]
    conv = jnp.zeros(N, bool)
    failed = jnp.zeros(N, bool)
    compact = compact and N >= 4096
    if loop == "fori":
        # early-exit while_loop: converged batches stop on device.
        # Without compaction the whole maxit budget runs in ONE
        # dispatch; with it, bounded segments let the host shrink the
        # lane width between dispatches.
        stepper = _newton_chunk_fori
        chunk = max(chunk, 32) if compact else max(chunk, maxit)
    else:
        stepper = _newton_chunk
    it = 0
    idx = None                      # None = all lanes active, unpacked
    while it < maxit:
        n = min(chunk, maxit - it)
        if idx is not None:
            nb = max(256, 1 << int(np.ceil(np.log2(len(idx)))))
            pidx = np.concatenate(
                [idx, np.repeat(idx[-1:], nb - len(idx))])
            pj = jnp.asarray(pidx)
            xs, cs, fs = stepper(raw, consts, xT[:, pj], conv[pj],
                                 failed[pj], gfnormeps, n)
            # duplicate scatter indices all carry the same lane's
            # result, so last-wins is deterministic here
            xT = xT.at[:, pj].set(xs)
            conv = conv.at[pj].set(cs)
            failed = failed.at[pj].set(fs)
        else:
            xT, conv, failed = stepper(raw, consts, xT, conv, failed,
                                       gfnormeps, n)
        it += n
        state = np.asarray(conv | failed)
        if state.all():
            break
        if compact:
            active = np.nonzero(~state)[0]
            # pack once the active set is down to half the bucket that
            # would serve it (avoids thrashing shapes near full width)
            if len(active) <= N // 2:
                idx = active
    return xT.T, conv, it
