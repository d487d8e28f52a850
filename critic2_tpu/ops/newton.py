"""Batched damped-free Newton search for critical points (device).

TPU-native replacement for the reference's per-seed Newton loop
(src/fieldmod@proc.f90:1832-1868 `newton`): all seeds advance in lockstep
under jax.lax.while_loop with per-seed convergence/failure masks; the
LINPACK dgeco/dgedi 3x3 Hessian solve becomes the closed-form adjugate
solve on symmetric components (critic2_tpu/ops/eig3.py solve3s).

Layout: batch-last SoA throughout the loop - positions (3, N), gradients
(3, N), Hessians (6, N) - so every loop-carried array is lane-dense on
TPU (see ops/interp.py docstring). The public interface stays (N, 3).

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


@partial(jax.jit, static_argnames=("eval_fn", "maxit"))
def newton_batch(eval_fn, x0, gfnormeps: float = 1e-12, maxit: int = 200):
    """Run Newton iterations from a batch of Cartesian seeds.

    eval_fn: SoA evaluator (3, N) -> (f (N,), gf (3, N), h6 (6, N));
    must be jittable. x0: (N, 3) Cartesian seeds.
    Returns (x (N, 3) final positions, conv (N,) success mask, nit).
    """
    xT0 = jnp.asarray(x0).T
    N = xT0.shape[1]

    def check(xT):
        f, gf, h6 = eval_fn(xT)
        gfmod2 = (gf * gf).sum(0)
        conv = gfmod2 < gfnormeps * gfnormeps
        nan = ~jnp.isfinite(xT).all(0) | ~jnp.isfinite(gf).all(0)
        return gf, h6, conv, nan

    def cond(state):
        it, xT, conv, failed = state
        return (it < maxit) & ~(conv | failed).all()

    def body(state):
        it, xT, conv, failed = state
        gf, h6, cnow, nan = check(xT)
        step_num, det = solve3s(h6, gf)
        sing = jnp.abs(det) < 1e-30
        conv = conv | cnow
        failed = failed | ((sing | nan) & ~conv)
        active = ~(conv | failed)
        step = step_num / jnp.where(sing, 1.0, det)[None, :]
        xT = jnp.where(active[None, :], xT - step, xT)
        return it + 1, xT, conv, failed

    state = (jnp.zeros((), jnp.int32), xT0, jnp.zeros(N, bool),
             jnp.zeros(N, bool))
    it, xT, conv, failed = jax.lax.while_loop(cond, body, state)
    # final convergence check for points that reached the answer on the
    # last allowed step
    _, _, cfin, _ = check(xT)
    conv = conv | (cfin & ~failed)
    return xT.T, conv, it
