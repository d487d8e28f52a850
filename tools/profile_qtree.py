"""Per-stage qtree wall profiler (VERDICT r2 #3: the bench leg records
41 s at maxl=4 on NaCl 256^3 and 165 s for the maxl=5 exact-half cell).

Monkeypatch-times the device-facing primitives inside qtree_integrate:
  trace:   ops.ode.trace_paths (gradient-path color traces)
  fval:    field value evals (the Keast cubature's field reads)
  sphere:  _sphere_mask_dev chunks
  keast:   keast_points host-side node generation
plus the end-to-end wall; the residual is host python (cache keys,
np.add.at, subdivision).
"""
from __future__ import annotations

import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

ACC = defaultdict(float)
CNT = defaultdict(int)


def wrap(mod, name, label):
    import jax
    orig = getattr(mod, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        jax.block_until_ready(out)
        ACC[label] += time.perf_counter() - t0
        CNT[label] += 1
        return out
    setattr(mod, name, timed)
    return orig


def main(which: str = "nacl"):
    from tools.parity_bench import _nacl_system, _two_gauss_system
    from critic2_tpu.analysis import qtree as Q
    from critic2_tpu.ops import ode as ODE

    wrap(ODE, "trace_paths", "trace")
    wrap(Q, "_sphere_mask_dev", "sphere")
    wrap(Q, "_masked_keast_reduce", "keast_red")
    import critic2_tpu.ops.quadrature as QU
    wrap(QU, "keast_points", "keast_pts")

    if which == "nacl":
        s, _ = _nacl_system((256, 256, 256), cache=True)
        s.iref = 1
        kw = dict(maxl=4, sphfactor=0.9)
    else:
        s = _two_gauss_system()
        kw = dict(maxl=5)

    # field-eval timing: wrap the eval_fn the driver builds
    from critic2_tpu.fields.field import Field
    orig_eval_fn = Field.eval_fn

    def timed_eval_fn(self, nder=0, **k):
        fn = orig_eval_fn(self, nder=nder, **k)

        def timed(*a, **kk):
            import jax
            t0 = time.perf_counter()
            out = fn(*a, **kk)
            jax.block_until_ready(out)
            ACC[f"eval{nder}"] += time.perf_counter() - t0
            CNT[f"eval{nder}"] += 1
            return out
        # trace_paths reads the device-constant plumbing off the
        # evaluator (_c2t_raw/_c2t_consts); dropping it would inline
        # the whole grid into the lowered MLIR (134 MB at 256^3 f64 -
        # the compile helper OOMs)
        for attr in ("_c2t_raw", "_c2t_consts"):
            if hasattr(fn, attr):
                setattr(timed, attr, getattr(fn, attr))
        return timed
    Field.eval_fn = timed_eval_fn

    for rep in range(2):           # rep 0 = compile warmup
        for k in list(ACC):
            del ACC[k], CNT[k]
        t0 = time.perf_counter()
        qt = Q.qtree_integrate(s, **kw)
        total = time.perf_counter() - t0
        print(f"--- rep {rep} ({which}) total {total:8.2f} s  "
              f"ntraced={qt.ntraced} nrefined={qt.nrefined}",
              file=sys.stderr)
        other = total - sum(ACC.values())
        for k in sorted(ACC, key=ACC.get, reverse=True):
            print(f"  {k:10s} {ACC[k]:8.2f} s  x{CNT[k]}",
                  file=sys.stderr)
        print(f"  {'host/other':10s} {other:8.2f} s", file=sys.stderr,
              flush=True)
    print(qt.table(), file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nacl")
