"""Batched damped-free Newton search for critical points (device).

TPU-native replacement for the reference's per-seed Newton loop
(src/fieldmod@proc.f90:1832-1868 `newton`): all seeds advance in lockstep
under jax.lax.while_loop with per-seed convergence/failure masks; the
LINPACK dgeco/dgedi 3x3 Hessian solve becomes the closed-form adjugate
inverse (critic2_tpu/ops/eig3.py).

Semantics mirror the reference exactly: stop when |grad f| < gfnormeps
(success), when |det H| < 1e-30 (singular failure), or after maxit
iterations (failure).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .eig3 import det3, inv3

__all__ = ["newton_batch"]


@partial(jax.jit, static_argnames=("eval_fn", "maxit"))
def newton_batch(eval_fn, x0, gfnormeps: float = 1e-12, maxit: int = 200):
    """Run Newton iterations from a batch of Cartesian seeds.

    eval_fn: (N,3) -> (f (N,), gf (N,3), hf (N,3,3)); must be jittable.
    Returns (x (N,3) final positions, conv (N,) bool success mask, nit (N,)).
    """
    x0 = jnp.asarray(x0)
    N = x0.shape[0]

    def check(x):
        f, gf, hf = eval_fn(x)
        gfmod2 = (gf * gf).sum(-1)
        conv = gfmod2 < gfnormeps * gfnormeps
        sing = jnp.abs(det3(hf)) < 1e-30
        nan = ~jnp.isfinite(x).all(-1) | ~jnp.isfinite(gf).all(-1)
        return gf, hf, conv, sing | nan

    def cond(state):
        it, x, conv, failed = state
        return (it < maxit) & ~(conv | failed).all()

    def body(state):
        it, x, conv, failed = state
        gf, hf, cnow, fnow = check(x)
        conv = conv | cnow
        failed = failed | (fnow & ~conv)
        active = ~(conv | failed)
        step = jnp.einsum("nij,nj->ni", inv3(hf), gf)
        x = jnp.where(active[:, None], x - step, x)
        return it + 1, x, conv, failed

    state = (jnp.zeros((), jnp.int32), x0, jnp.zeros(N, bool), jnp.zeros(N, bool))
    it, x, conv, failed = jax.lax.while_loop(cond, body, state)
    # final convergence check for points that reached the answer on the
    # last allowed step
    _, _, cfin, _ = check(x)
    conv = conv | (cfin & ~failed)
    return x, conv, it
