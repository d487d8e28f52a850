"""Benchmark harness: 256^3 tricubic rho/grad/Hessian evaluation rate.

The operative BASELINE.json metric is "256^3 rho/grad/Hess evals/sec"
(the reference's own apparatus is the BENCHMARK keyword timing `grd`
calls, src/fieldmod@proc.f90:1734-1830). This harness times the full
field-derivative evaluation - tricubic value + gradient + Hessian +
Cartesian rotation - over an entire 256^3 grid, the workload shape of the
NCI/CUBE/property-grid drivers, using the separable regular-grid path
(ops/interp.interp_grid_soa).

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
    npts = n ** 3                        # one full-grid sweep per call

    a = 12.0
    c = Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90.0, 90.0, 90.0]),
                x_frac=np.array([[0.0, 0.0, 0.0]]),
                species_of=np.array([0]), species=[Species("O", 8)])
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    grid = np.asarray(
        2.0 + np.cos(2 * np.pi * i / n) * np.cos(2 * np.pi * j / n)
        + 0.5 * np.cos(2 * np.pi * k / n), dtype=np.float64)

    from critic2_tpu.ops.eig3 import linmap, sym6_rotation
    from critic2_tpu.ops.interp import interp_grid_soa

    m_c2x_np = np.asarray(c.m_c2x)
    r6_np = sym6_rotation(c.m_c2x)
    gridj = jnp.asarray(grid)
    # evaluate on the grid shifted by half a step: a genuine interpolation
    # workload (on-node evaluation would shortcut the stencil)
    shift = 0.5 / n

    @jax.jit
    def evalstep(g):
        y, yp, ypp6 = interp_grid_soa(g, (n, n, n),
                                      origin=(shift, shift, shift), nder=2)
        gf = linmap(m_c2x_np.T, yp)
        h6 = linmap(r6_np, ypp6)
        return y.sum(), gf.sum(), h6.sum()

    # warmup/compile (also absorbs the one-time device warmup)
    out = evalstep(gridj)
    print(f"warmup value: {float(out[0]):.3f}", file=sys.stderr)
    nrep = 3 if small else 5
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = evalstep(gridj)
        r = float(out[0])                # force full execution + readback
    dt = time.perf_counter() - t0
    rate = nrep * npts / dt

    print(json.dumps({
        "metric": f"tricubic rho/grad/Hess evals/sec (full {n}^3 sweep, f64)",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / BASELINE_EVALS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
