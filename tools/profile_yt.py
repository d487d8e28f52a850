"""Per-stage YT wall profiler at 256^3 (VERDICT r2 #6: push YT under
0.33 s = 50x the measured 16.26 s single-core sequential C++ sweep).

Stages timed separately (each after its own warmup):
  flux:     _flux_tensors (K rolled compares + chi build, f64)
  attr:     attractor count + extraction + host sort
  chi32:    the f32 shifted-chi cast for the Pallas adjoint
  solve:    _pallas_sweep f32 GS pairs only
  refine:   one f64 residual (_apply_R) + correction solve
  total:    end-to-end yt_integrate + integrate(rho)
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main(n: int = 256):
    from tools.parity_bench import _nacl_system
    from critic2_tpu.analysis import yt as Y

    s, g = _nacl_system((n, n, n), cache=True)
    c = s.crystal
    rho3 = jnp.asarray(g)
    shape = rho3.shape
    N = int(np.prod(shape))
    offs_np, wts_np = Y._grid_ws_neighbors(c, shape)
    offs = tuple(tuple(int(v) for v in o) for o in offs_np)
    wts = jnp.asarray(wts_np, dtype=rho3.dtype)
    idx3 = jnp.arange(N, dtype=jnp.int32).reshape(shape)
    print(f"K = {len(offs)} WS neighbors", file=sys.stderr)

    def t(label, fn, reps=3):
        fn()                                   # warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:10s} {dt*1e3:9.1f} ms", file=sys.stderr, flush=True)
        return out, dt

    (chiP, is_attr), _ = t("flux", lambda: jax.block_until_ready(
        Y._flux_tensors(rho3, idx3, wts, offs=offs, shape=shape)))

    def attr():
        nattr = int(is_attr.sum())
        iattr_d, rho_at_d = Y._extract_attractors(rho3, is_attr, nattr)
        iattr = np.asarray(iattr_d)
        rho_at = np.asarray(rho_at_d)
        return iattr[np.lexsort((iattr, -rho_at))]
    iattr, _ = t("attr", attr)

    from critic2_tpu.ops.yt_pass import supported
    if supported():
        def chi32():
            shifted = jnp.stack([jnp.roll(chiP[k], o, (0, 1, 2))
                                 for k, o in enumerate(offs)])
            return jax.block_until_ready(shifted.astype(jnp.float32))
        chiP32s, _ = t("chi32", chi32)

        f3 = rho3[None]
        f32 = f3.astype(jnp.float32)
        t("solve32", lambda: jax.block_until_ready(
            Y._pallas_sweep(chiP32s, f32, offs, True)))

        s0 = Y._pallas_sweep(chiP32s, f32, offs, True).astype(jnp.float64)

        def refine():
            r = f3 + Y._apply_R(chiP, s0, offs=offs, adjoint=True) - s0
            return jax.block_until_ready(
                Y._pallas_sweep(chiP32s, r.astype(jnp.float32), offs, True))
        t("refine", refine)

    def total():
        res = Y.yt_integrate(c, rho3)
        return res.integrate(rho3)
    t("total", total, reps=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
