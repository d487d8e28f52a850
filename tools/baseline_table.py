"""The five-config BASELINE table, materialized from bench JSON fields
alone (round-3 verdict #8).

Each row of BASELINE.md's operative metric gets: the TPU wall, the
measured full-workload single-core denominator (the C++ sequential
stand-ins in native/critic2_native.cpp - no Fortran compiler exists in
this image), the ratio, the parity column, and a one-line physical
note stating which bound applies where the ratio is under the 50x bar.

Usage: python tools/baseline_table.py BENCH_r04.json   (or any bench
JSON; also embedded into the bench output as extra["baseline_table"]).
"""
from __future__ import annotations

import json
import sys


def _get(d: dict, *keys):
    for k in keys:
        if k in d and d[k] is not None:
            return d[k]
    return None


def build_table(extra: dict) -> list[dict]:
    """Rows for the five BASELINE configs from bench `extra` fields."""
    rows = []

    def row(config, workload, tpu_s, cpu_s, parity, note):
        ratio = (round(cpu_s / tpu_s, 1)
                 if isinstance(tpu_s, (int, float)) and tpu_s
                 and isinstance(cpu_s, (int, float)) else None)
        rows.append({"config": config, "workload": workload,
                     "tpu_wall_s": tpu_s, "cpu_1core_s": cpu_s,
                     "ratio_vs_1core": ratio, "parity": parity,
                     "note": note})

    # 1 - NCI (nciplot_thymine shape): fused device RDG program
    row(1, "NCI 256^3 grid (rho+RDG+lambda2 cubes, dat selection)",
        _get(extra, "nci256_wall_s"),
        _get(extra, "nci256_cpu_driver_wall_s"),
        {"ndat": _get(extra, "nci256_ndat")},
        "HBM-bandwidth-bound: one fused f32 pass reads the grid and "
        "writes both cubes; the 1-core ratio is the physical headroom "
        "(x32 ideal CPU scaling leaves ~4.6x)")

    # 2 - grid AUTO (grid_cps shape): batched Newton; the heavy-seed
    # leg is where batching shows (the 2071-seed leg is latency-bound)
    tpu_h = _get(extra, "auto256h_wall_s")
    row(2, f"grid AUTO 256^3, WS depth-2 seeds "
           f"(n={_get(extra, 'auto256h_nseeds')})",
        tpu_h, _get(extra, "auto256h_cpu_driver_wall_s"),
        {"poincare_hopf": _get(extra, "auto256h_ph", "auto256_ph"),
         "cp_parity_bohr": _get(extra, "auto_grid_cp_parity_bohr")},
        "CPU denominator is the FULL sequential driver (Newton + dedup "
        "+ classify, c2n_auto_drain) on the same seeds; the default "
        "2071-seed leg (auto256_wall_s) is dispatch-latency-bound and "
        "reported raw")

    # 3 - YT (electride_yt shape)
    row(3, "YT 256^3 decompose + integrate",
        _get(extra, "yt256_wall_s"),
        _get(extra, "yt256_cpu_seq_wall_s"),
        {"max_dq_vs_sequential_e": _get(extra, "yt_parity_max_dq_e"),
         "punity_err_e": _get(extra, "yt256_punity_err_e")},
        "reference sweep is strictly sequential (only property "
        "integration threads), so the 1-core ratio is the honest "
        "column; the flux pass is HBM-bound (Pallas kernel)")

    # 4 - wfn mesh + molcalc (benzene-631gs shape)
    row(4, "benzene wfn mesh NELEC (ultra, 2.55M pts)",
        _get(extra, "wfn_mesh_ultra_wall_s"),
        _get(extra, "wfn_mesh_cpu_implied_s"),
        {"nelec_err_e": _get(extra, "wfn_nelec_err_ultra")},
        "CPU denominator = measured sequential screened-GTO rate "
        "(c2n_wfn_eval) x point count; MXU-bound on device "
        "(points x primitives matmuls)")

    # 5 - qtree + flux (cps_large shape): the grid-qtree leg plus the
    # nameplate-scale molecular assembly
    row(5, "qtree maxl=4 (grid interpolant, 4-atom cell)",
        _get(extra, "qtree_wall_s"),
        _get(extra, "qtree256_cpu_seq_wall_s"),
        {"exact_half_dev_e": _get(extra, "qtree_exact_half_dev_e"),
         "vs_yt_max_dq_e": _get(extra, "qtree_vs_yt_max_dq_e")},
        "trace-latency-bound: gradient-path batches shrink as basins "
        "resolve, leaving small dispatches; the CPU stand-in runs the "
        "same subdivide+trace+cubature loop sequentially")
    row("5b", f"cps_large-scale AUTO: {_get(extra, 'cps_nat')}-atom / "
              f"{_get(extra, 'cps_npri')}-primitive GTO assembly, "
              f"{_get(extra, 'cps_auto_nseeds')} pair seeds",
        _get(extra, "cps_auto_wall_s"),
        _get(extra, "cps_auto_cpu_wall_s"),
        {"cp_match_frac_vs_seq": _get(extra, "cps_auto_cpu_matched_frac"),
         "morse": _get(extra, "cps_auto_morse")},
        "the BASELINE nameplate scale (insulin-class primitive count); "
        "screened/blocked batched Newton vs the sequential per-seed "
        "drain on the same screened evaluator")
    row("5c", "cps_large-scale mesh NELEC "
              f"({_get(extra, 'cps_mesh_npts')} pts)",
        _get(extra, "cps_mesh_wall_s"),
        _get(extra, "cps_mesh_cpu_wall_implied_s"),
        {"engine_dev_e": _get(extra, "cps_engine_sub_dev_e"),
         "nelec_err_e_mesh_level": _get(extra, "cps_nelec_err_e")},
        "CPU denominator = measured sequential screened-GTO rate x "
        "point count; nelec_err is good-LEVEL quadrature error shared "
        "with the reference mesh (engine parity is engine_dev: "
        "screened vs dense MO closure on the same weighted points)")
    return rows


def render(rows: list[dict]) -> str:
    out = ["config | TPU wall s | 1-core s | ratio | parity | note",
           "---|---|---|---|---|---"]
    for r in rows:
        par = "; ".join(f"{k}={v}" for k, v in (r["parity"] or {}).items())
        out.append(f"{r['config']} {r['workload']} | {r['tpu_wall_s']} | "
                   f"{r['cpu_1core_s']} | {r['ratio_vs_1core']} | {par} | "
                   f"{r['note']}")
    return "\n".join(out)


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r04.json"
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    extra = d.get("extra", d)
    print(render(build_table(extra)))
