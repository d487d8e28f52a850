"""TPU perf probe: where does the 256^3 sweep time actually go?

Separates (a) per-dispatch tunnel/roundtrip latency, (b) steady-state
compute, by timing K sweeps inside ONE jit (lax.fori_loop) vs K separate
dispatches, for the XLA separable path and the Pallas fused path, in f64
and f32. Run on the real chip:

    python -u tools/perf_probe.py [n]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.ops.eig3 import linmap, sym6_rotation
    from critic2_tpu.ops.interp import interp_grid_soa

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    npts = n ** 3
    print(f"devices: {jax.devices()}  n={n}", flush=True)

    a = 12.0
    m_x2c = m_x2c_from_cellpar([a, a, a], [90.0, 90.0, 90.0])
    m_c2x = np.linalg.inv(m_x2c)
    r6 = sym6_rotation(m_c2x)
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    grid = np.asarray(2.0 + np.cos(2 * np.pi * i / n)
                      * np.cos(2 * np.pi * j / n)
                      + 0.5 * np.cos(2 * np.pi * k / n))
    sh = 0.5 / n

    def step_xla(g):
        y, yp, ypp6 = interp_grid_soa(g, (n, n, n), origin=(sh, sh, sh),
                                      nder=2)
        gf = linmap(m_c2x.T, yp)
        h6 = linmap(r6, ypp6)
        return y.sum() + gf.sum() + h6.sum()

    def loopK(step, K):
        @jax.jit
        def fn(g):
            def body(it, acc):
                # i-dependent perturbation prevents hoisting the
                # loop-invariant sweep out of the loop
                return acc + step(g + it * 1e-300)
            return jax.lax.fori_loop(0, K, body, 0.0)
        return fn

    def time_once(fn, g, label):
        t0 = time.perf_counter()
        r = float(fn(g))
        t1 = time.perf_counter()
        print(f"  {label}: first(incl compile) {t1 - t0:.2f}s "
              f"val={r:.3e}", flush=True)
        t0 = time.perf_counter()
        r = float(fn(g))
        dt = time.perf_counter() - t0
        return dt

    for dtype, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        g = jnp.asarray(grid, dtype)

        f1 = jax.jit(step_xla)
        dt = time_once(f1, g, f"xla single {tag}")
        print(f"xla single {tag}: {dt*1e3:.1f} ms -> "
              f"{npts/dt/1e6:.1f}M evals/s", flush=True)

        # K queued dispatches, one block at the end (does the tunnel
        # pipeline async dispatches?)
        K = 8
        t0 = time.perf_counter()
        outs = [f1(g) for _ in range(K)]
        rs = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / K
        print(f"xla queued x{K} {tag}: {dt*1e3:.1f} ms/sweep -> "
              f"{npts/dt/1e6:.1f}M evals/s", flush=True)

        fK = loopK(step_xla, K)
        dt = time_once(fK, g, f"xla fori{K} {tag}") / K
        print(f"xla fori{K} {tag}: {dt*1e3:.1f} ms/sweep -> "
              f"{npts/dt/1e6:.1f}M evals/s", flush=True)


if __name__ == "__main__":
    main()
