"""Measure the CPU-reference walls recorded in parity_bench.CPU_MEASURED.

No Fortran compiler exists in this image, so the reference executable
cannot be built; the C++ ports in native/critic2_native.cpp implement
the same algorithms (sequential Yu-Trinkle sweep, src/yt@proc.f90:
106-190; Lekien-Marsden tricubic value/grad/Hess, src/grid3mod) and
stand in for it. Single run, single core (the box has `nproc` = 1);
BASELINE.md keeps the 2.0e7 evals/s 32-thread ideal-scaling figure as
the headline divisor, which is ~3x ABOVE the measured-rate x32
extrapolation, i.e. conservative against this repo.

Usage: JAX_PLATFORMS=cpu python tools/measure_cpu_baseline.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "tools")
    from parity_bench import _nacl_system

    from critic2_tpu import native
    from critic2_tpu.analysis.yt import _grid_ws_neighbors

    if not native.available():
        native.build()
    out = {"omp_threads": native.omp_threads()}

    # tricubic value/grad/Hess sweep rate (the reference grdall loop)
    n = 96
    rng = np.random.default_rng(0)
    f = rng.random((n, n, n))
    x = (np.indices((n, n, n)).reshape(3, -1).T + 0.5) / n
    t0 = time.perf_counter()
    native.tricubic_batch(f, x)
    dt = time.perf_counter() - t0
    out["tricubic_cpu_evals_per_s"] = round(n ** 3 / dt, 1)

    # sequential YT walls at the BASELINE grid sizes
    for n in (48, 128, 256):
        s, g = _nacl_system((n, n, n), cache=(n == 256))
        offs, wts = _grid_ws_neighbors(s.crystal, g.shape)
        t0 = time.perf_counter()
        native.yt_charges(g, offs, wts, g)
        out[f"yt{n}_cpu_seq_wall_s"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
