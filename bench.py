"""Benchmark harness: batched tricubic rho/grad/Hessian evaluation rate.

The operative BASELINE.json metric is "256^3 rho/grad/Hess evals/sec"
(the reference's own apparatus is the BENCHMARK keyword timing `grd`
calls, src/fieldmod@proc.f90:1734-1830). This harness times the full
batched field evaluation pipeline — fractional wrap, 4^3 tricubic stencil
gather, value + gradient + Hessian, Cartesian rotation — on a 256^3 grid.

Baseline: critic2's tricubic `grd` measured via its BENCHMARK keyword runs
at ~0.6e6 evals/s/core on a modern x86 core; the 32-thread OpenMP
reference figure used for `vs_baseline` is 2.0e7 evals/s (ideal scaling,
favoring the reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_EVALS_PER_S = 2.0e7  # 32-thread OpenMP critic2 estimate (see above)


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.crystal.crystal import Crystal, Species

    small = "--small" in sys.argv
    n = 64 if small else 256
    npts = 1 << (16 if small else 20)     # 1M points per timed call

    a = 12.0
    c = Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90.0, 90.0, 90.0]),
                x_frac=np.array([[0.0, 0.0, 0.0]]),
                species_of=np.array([0]), species=[Species("O", 8)])
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    grid = np.asarray(
        2.0 + np.cos(2 * np.pi * i / n) * np.cos(2 * np.pi * j / n)
        + 0.5 * np.cos(2 * np.pi * k / n), dtype=np.float64)
    rng = np.random.default_rng(7)
    pts = rng.random((npts, 3))

    from critic2_tpu.ops.eig3 import sym6_rotation
    from critic2_tpu.ops.interp import interp_soa

    m_c2x = jnp.asarray(c.m_c2x)
    r6 = jnp.asarray(sym6_rotation(c.m_c2x))
    gridj = jnp.asarray(grid)
    ptsj = jnp.asarray((pts @ np.asarray(c.m_x2c).T).T)   # (3, N) SoA

    @jax.jit
    def evalstep(g, pT):
        wx = m_c2x @ pT
        y, yp, ypp6 = interp_soa(g, wx, mode="tricubic", nder=2)
        gf = m_c2x.T @ yp
        h6 = r6 @ ypp6
        return y, gf, h6

    # warmup/compile
    jax.block_until_ready(evalstep(gridj, ptsj))
    nrep = 3 if small else 5
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = evalstep(gridj, ptsj)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rate = nrep * npts / dt

    print(json.dumps({
        "metric": f"tricubic rho/grad/Hess evals/sec ({n}^3 grid, f64)",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / BASELINE_EVALS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
