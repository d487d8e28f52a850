"""Benchmark harness: 256^3 tricubic rho/grad/Hessian evaluation rate.

The operative BASELINE.json metric is "256^3 rho/grad/Hess evals/sec"
(the reference's own apparatus is the BENCHMARK keyword timing `grd`
calls, src/fieldmod@proc.f90:1734-1830). This harness times the full
field-derivative evaluation - tricubic value + gradient + Hessian +
Cartesian rotation - over an entire 256^3 grid, the workload shape of the
NCI/CUBE/property-grid drivers, using the separable regular-grid path
(ops/interp.interp_grid_soa).

Timing method: K sweeps inside ONE jit (lax.fori_loop) - the tunnel
dispatch latency in this environment is ~27 ms/call, which is NOT part of
the steady-state compute rate (measured: single-dispatch 256^3 f64 is
126 M evals/s, K-batched 255 M; f32 560 M vs 2.7 G).

Baseline: critic2's tricubic `grd` measured via its BENCHMARK keyword runs
at ~0.6e6 evals/s/core on a modern x86 core; the 32-thread OpenMP
reference figure used for `vs_baseline` is 2.0e7 evals/s (ideal scaling,
favoring the reference).

Headline is the f32 sweep - the production evaluation precision
(SURVEY section 7: "f32 eval + f64 Newton polish"); the parity harness
demonstrates that f32 basin construction with f64 accumulation stays
inside the 1e-6 e basin-charge bar (yt_f32_parity_max_dq_e; measured
5.8e-7 at 48^3, grid-dependent - production basin sums are f64).
The f64 sweep rate (the v5e emulates the f64 vector ALU ~10x below
f32) is reported in "extra" along with end-to-end YT / AUTO
wall-clocks and parity checks on promolecular analogues of the
BASELINE configs (see tools/parity_bench.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_EVALS_PER_S = 2.0e7  # 32-thread OpenMP critic2 estimate (see above)


def _sweep_rate(n: int, dtype_name: str, nrep: int) -> float:
    import jax
    import jax.numpy as jnp

    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.ops.eig3 import linmap, sym6_rotation

    from critic2_tpu.ops.interp import interp_grid_soa

    a = 12.0
    m_x2c = m_x2c_from_cellpar([a, a, a], [90.0, 90.0, 90.0])
    m_c2x_np = np.linalg.inv(m_x2c)
    r6_np = sym6_rotation(m_c2x_np)
    i, j, k = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    grid = np.asarray(
        2.0 + np.cos(2 * np.pi * i / n) * np.cos(2 * np.pi * j / n)
        + 0.5 * np.cos(2 * np.pi * k / n))
    gridj = jnp.asarray(grid, dtype=jnp.float64 if dtype_name == "f64"
                        else jnp.float32)
    shift = 0.5 / n

    def step(g):
        # evaluate on the grid shifted by half a step: a genuine
        # interpolation workload (on-node evaluation would shortcut the
        # stencil)
        y, yp, ypp6 = interp_grid_soa(g, (n, n, n),
                                      origin=(shift, shift, shift), nder=2)
        gf = linmap(m_c2x_np.T, yp)
        h6 = linmap(r6_np, ypp6)
        return y.sum() + gf.sum() + h6.sum()

    @jax.jit
    def stepK(g):
        def body(it, acc):
            # it-dependent perturbation prevents hoisting the
            # loop-invariant sweep out of the loop
            return acc + step(g + it * 1e-300)
        return jax.lax.fori_loop(0, nrep, body, jnp.zeros((), g.dtype))

    r = float(stepK(gridj))          # compile + device warmup
    print(f"warmup[{dtype_name}] value: {r:.3f}", file=sys.stderr)
    t0 = time.perf_counter()
    r = float(stepK(gridj))          # scalar readback forces execution
    dt = time.perf_counter() - t0
    return nrep * n ** 3 / dt


_partial = {"extra": {}}
# fd 1 saved before the whole-process stdout->stderr redirect; the JSON
# line is written HERE so no library log can share the stream (round-2
# post-mortem: a multi-KB jax exception string inside `extra` plus
# libtpu C-level stdout chatter made the emitted line unparseable)
_stdout_fd = {"fd": None}

_MAX_STR = 120          # longest string value allowed inside extra
# The driver records only the LAST ~2000 characters of stdout; the
# emitted line must fit INSIDE that window or the artifact parses to
# null (round-4 post-mortem: embedding the five-config table pushed the
# line past the tail capture and the whole round's numbers were lost;
# the old 32768 bound guarded the wrong limit).  The FULL unbounded
# payload goes to BENCH_full_last.json in the repo instead.
_MAX_LINE = 1800
# Overridable so the --emit-test harness (hostile filler payloads)
# cannot clobber the committed full record of a real run - round-5
# post-mortem: a test run overwrote BENCH_full_last.json with 200
# filler keys and the fixture got committed as if it were the record.
_FULL_PATH = os.environ.get("BENCH_FULL_PATH",
                            "/root/repo/BENCH_full_last.json")

# Scalar keys in information-value order: the headline denominators and
# the five BASELINE-config walls/parities (what the verdict reads) pack
# into the bounded line first; whatever still fits follows.
_PRIORITY_KEYS = [
    # config 3 - YT
    "yt256_wall_s", "yt256_cpu_seq_wall_s", "yt_parity_max_dq_e",
    "yt256_punity_err_e",
    # config 1 - NCI
    "nci256_wall_s", "nci256_cpu_driver_wall_s",
    # config 2 - grid AUTO (heavy-seed leg is the batched-Newton story)
    "auto256h_wall_s", "auto256h_cpu_driver_wall_s", "auto256_wall_s",
    "auto_grid_cp_parity_bohr", "auto256h_ph", "auto256h_nseeds",
    # config 5 - qtree
    "qtree_wall_s", "qtree256_cpu_seq_wall_s", "qtree_exact_half_dev_e",
    "qtree_vs_yt_max_dq_e", "qtree_maxl",
    # config 4 - wfn mesh
    "wfn_mesh_ultra_wall_s", "wfn_mesh_cpu_implied_s",
    "wfn_nelec_err_ultra", "wfn_mesh_ultra_build_s",
    # config 5b/5c - cps_large nameplate scale
    "cps_auto_wall_s", "cps_auto_cpu_wall_s",
    "cps_auto_cpu_matched_frac", "cps_auto_morse", "cps_nelec_err_e",
    "cps_engine_sub_dev_e", "cps_engine_max_drho",
    "cps_mesh_wall_s", "cps_mesh_cpu_wall_implied_s", "cps_nat",
    "cps_npri", "cps_eval2_evals_per_s", "cps_large_error",
    # headline secondary
    "f64_sweep_evals_per_s", "f64_vs_baseline", "platform", "truncated",
    "big_error", "parity_error",
]


def _sanitize(obj, max_str: int = _MAX_STR):
    """Bound every string inside the JSON payload: exception reprs from
    jax embed full compiler/tunnel logs (kilobytes), which is what broke
    the round-2 artifact."""
    if isinstance(obj, str):
        return obj if len(obj) <= max_str else obj[:max_str] + "...[cut]"
    if isinstance(obj, dict):
        return {str(k)[:80]: _sanitize(v, max_str) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v, max_str) for v in obj[:64]]
    if isinstance(obj, float):
        return obj if np.isfinite(obj) else str(obj)
    return obj


def _emit(rate32, n, extra):
    import os

    def payload_for(ex):
        return {
            "metric": (f"tricubic rho/grad/Hess evals/s ({n}^3 f32 "
                       "sweep; full payload in BENCH_full_last.json)"),
            "value": round(rate32, 1),
            "unit": "evals/s",
            "vs_baseline": round(rate32 / BASELINE_EVALS_PER_S, 3),
            "extra": ex,
        }

    clean = _sanitize(extra, max_str=300)
    try:        # the full record, unbounded, committed with the repo
        with open(_FULL_PATH, "w") as fh:
            json.dump(payload_for(clean), fh, indent=1, default=str)
            fh.write("\n")
    except Exception:
        pass

    # pack the bounded line: priority scalars first, then the rest by
    # ascending size while the line still fits (a 40-byte reserve keeps
    # room for the overflow marker)
    compact: dict = {}
    rest = [k for k in clean if k not in _PRIORITY_KEYS]
    rest.sort(key=lambda k: len(json.dumps(clean[k], default=str)))
    for k in [k for k in _PRIORITY_KEYS if k in clean] + rest:
        compact[k] = _sanitize(clean[k])
        trial = json.dumps(payload_for(compact), separators=(",", ":"),
                           allow_nan=False, default=str)
        if len(trial) > _MAX_LINE - 40:
            del compact[k]
            compact["more"] = "BENCH_full_last.json"
    line = json.dumps(payload_for(compact), separators=(",", ":"),
                      allow_nan=False, default=str)
    fd = _stdout_fd["fd"]
    if fd is None:
        print(line, flush=True)
    else:
        os.write(fd, line.encode() + b"\n")


def main():
    import os
    import signal
    import jax

    # whole-process stdout -> stderr: libtpu / absl / tunnel chatter can
    # write to fd 1 at the C level, which corrupted the round-2 artifact.
    # The final JSON line is written to the SAVED fd, guaranteed to be
    # the only stdout content.
    _stdout_fd["fd"] = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))

    # hard-deadline backstop: if any single leg overshoots the budget
    # (remote-compile stall, host-core contention), emit whatever has
    # been measured so far instead of dying output-less under the
    # driver's outer timeout
    def _on_alarm(signum, frame):  # pragma: no cover
        extra = dict(_partial["extra"])
        extra["truncated"] = "hard budget deadline hit mid-leg"
        try:
            from tools.parity_bench import (CPU_MEASURED, ckpt_fill,
                                            ckpt_update)
            # checkpoint everything measured BEFORE the cut: run_parity
            # only checkpoints at its own end, so an alarm mid-leg would
            # otherwise lose every completed parity leg of this run
            ckpt_update(extra)
            for k, v in CPU_MEASURED.items():
                extra.setdefault(k, v)
            ckpt_fill(extra)
        except Exception:
            pass
        _emit(_partial.get("rate32", 0.0), _partial.get("n", 256), extra)
        os._exit(0)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(budget * 1.15))

    if "--emit-test" in sys.argv:
        # exercise the emission path under hostile conditions: C-level
        # stdout chatter + oversized strings + non-finite floats inside
        # extra.  tests/test_bench_emit.py asserts the last stdout line
        # parses and is bounded.  The hostile payload must never reach
        # the committed record of a real run.
        global _FULL_PATH
        if "BENCH_FULL_PATH" not in os.environ:
            _FULL_PATH = "/tmp/BENCH_full_emit_test.json"
        os.write(1, b"FAKE LIBTPU LOG LINE ON FD1\n")
        print("python-level stdout print")
        _emit(1.0e9, 64, {
            "big_error": "x" * 5000,
            "nested": {"log": "y" * 5000, "ok": 1.5},
            "nan_val": float("nan"),
            "inf_val": float("inf"),
            "wall_s": 0.123,
        })
        return

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the remote TPU compile service has high
    # load variance; reruns (and the driver's run after a warm session)
    # reuse compiled programs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/critic2_tpu_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    # tunnel health check: the axon TPU backend can be transiently
    # unavailable, and jax.devices() HANGS rather than raising while the
    # tunnel retries - so probe in a subprocess with a timeout. A CPU
    # fallback with honest labeling beats a crashed bench (the driver
    # records whatever this prints).
    platform_note = None
    if "--cpu" not in sys.argv:
        import subprocess
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices()"],
                timeout=float(os.environ.get("BENCH_TPU_PROBE_S", "120")),
                capture_output=True)
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            jax.config.update("jax_platforms", "cpu")
            platform_note = "cpu fallback (TPU tunnel unavailable)"
            print("bench: TPU probe failed, falling back to CPU",
                  file=sys.stderr, flush=True)

    small = "--small" in sys.argv or platform_note is not None
    n = 64 if small else 256
    nrep = 4 if small else 16
    _partial["n"] = n

    # headline first: if the remote compile service is slow, the f32
    # number still lands before the budget runs out
    rate32 = _sweep_rate(n, "f32", nrep)
    _partial["rate32"] = rate32
    extra = _partial["extra"]
    if time.perf_counter() - t_start < 0.6 * budget:
        rate64 = _sweep_rate(n, "f64", nrep)
        extra.update({"f64_sweep_evals_per_s": round(rate64, 1),
                      "f64_vs_baseline": round(rate64 / BASELINE_EVALS_PER_S,
                                               3)})
    else:
        extra["f64_skipped"] = "compile budget exhausted"

    # BASELINE-scale (256^3) end-to-end driver wall-clocks: YT, NCI,
    # grid-AUTO, qtree (BASELINE configs 1/2/3/5 shapes). Ratios are
    # against the measured single-core CPU walls of the same reference
    # algorithms (tools/parity_bench.CPU_MEASURED; no Fortran compiler
    # exists in this image, so the C++ ports in native/ stand in for
    # the reference executable - same algorithm, same workload).
    if "--small" not in sys.argv:
        # full scale on TPU; reduced 128^3 scale on the CPU fallback so
        # a tunnel outage still records driver-level wall-clocks
        nbig = 128 if platform_note else 256
        try:
            from tools.parity_bench import run_big, CPU_MEASURED
            remaining = max(60.0, budget - (time.perf_counter() - t_start))
            # run_big gets at most 55% of the whole budget: round-4
            # post-mortem - its enlarged legs starved the never-measured
            # wfn/cps legs in run_parity (which now also run FIRST there)
            big = run_big(deadline_s=min(remaining, 0.55 * budget),
                          n=nbig, sink=extra)
            # ratios only where the CPU stand-in runs the same whole
            # workload (YT: exact sequential sweep; NCI: the FULL
            # driver stand-in - interp + eig + cutoffs). The auto
            # Newton-drain stand-in is Newton-only, not the full
            # driver - reported raw, never as a ratio.  Each ratio is
            # "vs measured 1-core stand-in"; the _x32 column divides by
            # 32 (ideal 32-thread scaling of the stand-in, favoring the
            # reference - the BASELINE target is vs 32-thread critic2).
            for leg in ("yt", "nci"):
                key = f"{leg}{nbig}_wall_s"
                cpu_key = (f"yt{nbig}_cpu_seq_wall_s" if leg == "yt"
                           else f"{leg}{nbig}_cpu_driver_wall_s")
                if key in big and cpu_key in CPU_MEASURED:
                    r1 = CPU_MEASURED[cpu_key] / big[key]
                    big[f"{leg}{nbig}_vs_cpu_1core"] = round(r1, 1)
                    big[f"{leg}{nbig}_vs_cpu_x32"] = round(r1 / 32.0, 2)
        except Exception as exc:  # pragma: no cover
            extra["big_error"] = f"{type(exc).__name__}: {exc}"

    # 48^3 parity legs + molecular-config legs run with what remains
    # of the budget (the big legs above are the operative metric)
    try:
        from tools.parity_bench import run_parity
        remaining = max(60.0, budget - (time.perf_counter() - t_start))
        # sink=extra: legs land incrementally so the SIGALRM backstop
        # emits everything measured up to the stall
        run_parity(small=small, deadline_s=remaining, sink=extra)
    except Exception as exc:  # pragma: no cover
        extra["parity_error"] = f"{type(exc).__name__}: {exc}"

    # the measured single-core denominators land in the artifact so
    # the five-config BASELINE table materializes offline from the
    # emitted scalars via tools/baseline_table.py.  The table itself is
    # NOT embedded (round-4 post-mortem: it pushed the line past the
    # driver's ~2000-char tail capture and the artifact parsed to null)
    try:
        from tools.parity_bench import (CPU_MEASURED, ckpt_fill,
                                        ckpt_update)
        ckpt_update(extra)      # persist THIS run's legs for later runs
        for k, v in CPU_MEASURED.items():
            extra.setdefault(k, v)
        # fill legs this run could not reach from the freshest prior
        # run's checkpoint (age labeled via ckpt_age_h) - a
        # budget-starved run reports recent measurements, not nulls
        ckpt_fill(extra)
    except Exception as exc:  # pragma: no cover
        extra["table_error"] = f"{type(exc).__name__}: {exc}"

    # headline = the f32 sweep: the production eval precision (SURVEY
    # section 7 "f32 eval + f64 Newton polish"); the harness itself
    # demonstrates mixed-precision parity (yt_f32_parity_max_dq_e, vs
    # the 1e-6 e bar), and the f64 rate is in extra
    if platform_note:
        extra["platform"] = platform_note
    signal.alarm(0)
    _emit(rate32, n, extra)


if __name__ == "__main__":
    main()
