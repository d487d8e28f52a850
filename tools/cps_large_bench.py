"""cps_large-scale benchmark: the BASELINE config-5 nameplate workload
(examples/cps_large/insulin.cri: ~800 atoms, HF wfx, 10^4+ primitives).

The reference wavefunction data is not shipped, so the workload is a
machine-checkable analogue at the same scale: a 4x4x4 tile of the
benzene 6-31G* wavefunction (768 atoms, 12288 primitives, 1344
occupied MOs) whose copies do not overlap electronically - NELEC is
EXACTLY 64x the monomer value (Wavefunction.tile), and the CP list is
matched point-by-point between the two engines on the same seeds.

Two sides, same work:
  - TPU: the screened/blocked GTO engine (fields/wfn.py
    rho_eval_screened + autocp's _newton_screened batch Newton +
    molcalc mesh NELEC).
  - CPU (single core): the native sequential screened evaluator
    (native/critic2_native.cpp c2n_wfn_eval / c2n_wfn_auto_drain - the
    reference per-point near-primitive loop,
    src/wfn_private@proc.F90:2032-2228 + per-seed AUTO drain,
    src/autocp@proc.f90:694-723).  The mesh-integral denominator is a
    measured per-point RATE on a random subset times the point count
    (the work is uniform per point; timed subsets of 2 sizes must agree
    within 10% or the run refuses to extrapolate).

Usage:
  CPU legs:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
                 python tools/cps_large_bench.py cpu
  TPU legs:  python tools/cps_large_bench.py tpu
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

_REF_FCHK = "/root/reference/tests_cint/benzene-631gs.fchk"

# monomer truth (benzene 6-31G*): 42 electrons.  4x4x4 copies = 768
# atoms / 12288 primitives / 1344 occupied MOs - the insulin-class
# scale of examples/cps_large/insulin.cri (~800 atoms, 10^4+
# primitives).  NELEC is exactly NCOPY x 42 (non-interacting copies);
# the CP topology is NOT a clean multiple (inter-copy bond/ring/cage
# CPs in the vdW-contact regions are physical), so AUTO parity is a
# direct CP-list match between the two engines on the same seeds.
MONO_NELEC = 42.0
REPS = (4, 4, 4)
NCOPY = REPS[0] * REPS[1] * REPS[2]
CPU_CPS_NPZ = "/root/repo/tools/cps_cpu_cps.npz"

_Z2NAME = {1: "H", 6: "C", 7: "N", 8: "O"}


def build_assembly(reps=REPS, gap: float = 4.0):
    """(System, internal-frame Wavefunction) for the tiled assembly."""
    from critic2_tpu import System
    from critic2_tpu.crystal.seed import CrystalSeed
    from critic2_tpu.crystal.crystal import Species
    from critic2_tpu.fields.field import Field
    from critic2_tpu.fields.wfn import Wavefunction

    w = Wavefunction.read_fchk(_REF_FCHK).tile(reps, gap=gap)
    zs = sorted(set(int(z) for z in w.atz))
    species = [Species(_Z2NAME.get(z, f"Z{z}"), z) for z in zs]
    spof = np.array([zs.index(int(z)) for z in w.atz])
    seed = CrystalSeed(x_frac=np.asarray(w.atpos, dtype=float),
                       species_of=spof, species=species,
                       ismolecule=True, border=10.0)
    c = seed.to_crystal()
    # move the wavefunction into the crystal's internal frame
    w.atpos = w.atpos - np.asarray(c.molx0)
    w._dev = {}
    s = System.from_structure(c)
    s.load_field(Field(crystal=c, type="wfn", wfn=w, name="assembly"))
    s.iref = 1
    return s, w


def pair_seeds_cart(system):
    """The molecular AUTO seed set (reference pair strategy) AFTER the
    driver's pruning - wrap, molcell-border clip, uniqc-style dedup
    (the reference prunes identically, src/autocp@proc.f90:594-655) -
    Cartesian internal frame, identical on both sides.  (The r5 first
    CPU drain ran the 105672 RAW pair seeds while the TPU driver
    pruned to 22543: a 4.7x inflated denominator; both sides now get
    the pruned list.)"""
    from critic2_tpu.analysis.autocp import Seed, gen_seeds

    c = system.crystal
    xf = np.mod(gen_seeds(c, [Seed(typ="pair")]), 1.0)
    if c.ismolecule:
        b = c.molborder
        xf = xf[np.all((xf >= b) & (xf <= 1.0 - b), axis=1)]
    xf = np.unique(np.round(xf, 10), axis=0)
    return np.asarray(c.x2c(xf))


def _log(out: dict, *keys):
    print(json.dumps({k: out[k] for k in keys if k in out}),
          file=sys.stderr, flush=True)


def run_cpu(out: dict, mesh_sub: int = 8000) -> dict:
    from critic2_tpu import native
    from critic2_tpu.analysis.mesh import _becke_mesh_points, _LVL

    if not native.available():
        native.build()
    t0 = time.perf_counter()
    s, w = build_assembly()
    out["cps_build_s"] = round(time.perf_counter() - t0, 2)
    out["cps_nat"] = int(len(w.atz))
    out["cps_npri"] = int(w.npri)
    out["cps_nmo"] = int(w.nmo)
    _log(out, "cps_build_s", "cps_nat", "cps_npri", "cps_nmo")

    # --- AUTO drain (sequential, full driver work) -------------------
    # Chunked (seed order preserved) so a multi-hour run logs progress
    # and survives interruption: each chunk's CPs/wall checkpoint to
    # CPU_CPS_NPZ + '.part.npz', and a restart resumes after the last
    # completed chunk.  The native drain dedupes within its call;
    # cross-chunk duplicates are merged on host with the same cpeps -
    # identical work to the single-call drain up to the (negligible vs
    # the 10^2-ms/seed Newton evals) dedup-list scans.
    seeds = pair_seeds_cart(s)
    out["cps_auto_nseeds"] = int(len(seeds))
    _log(out, "cps_auto_nseeds")
    part_path = CPU_CPS_NPZ + ".part.npz"
    nchunk = 16
    bounds = np.linspace(0, len(seeds), nchunk + 1).astype(int)
    start_chunk, wall, all_cps, all_sig, nev = 0, 0.0, [], [], 0
    import os as _os
    if _os.path.exists(part_path):
        part = np.load(part_path)
        if int(part["nseeds"]) == len(seeds) and int(part["nchunk"]) == nchunk:
            start_chunk = int(part["done"])
            wall = float(part["wall_s"])
            nev = int(part["nev"])
            all_cps = [np.asarray(part["cps"])]
            all_sig = [np.asarray(part["sig"])]
            print(f"resuming after chunk {start_chunk}/{nchunk}",
                  file=sys.stderr, flush=True)
    for ic in range(start_chunk, nchunk):
        sl = slice(bounds[ic], bounds[ic + 1])
        t0 = time.perf_counter()
        cps_c, sig_c, nev_c = native.wfn_auto_drain(w, seeds[sl])
        wall += time.perf_counter() - t0
        nev += int(nev_c)
        all_cps.append(np.asarray(cps_c).reshape(-1, 3))
        all_sig.append(np.asarray(sig_c))
        cps_sofar = np.concatenate(all_cps) if all_cps else np.zeros((0, 3))
        sig_sofar = np.concatenate(all_sig) if all_sig else np.zeros(0, int)
        np.savez_compressed(part_path, cps=cps_sofar, sig=sig_sofar,
                            done=ic + 1, nchunk=nchunk, wall_s=wall,
                            nev=nev, nseeds=len(seeds))
        print(json.dumps({"chunk": ic + 1, "of": nchunk,
                          "wall_s": round(wall, 1), "nev": nev,
                          "ncp_raw": int(len(cps_sofar))}),
              file=sys.stderr, flush=True)
    # cross-chunk dedup at the native drain's cpeps (first wins, the
    # same rule as the in-call dedup)
    cps_raw = np.concatenate(all_cps)
    sig_raw = np.concatenate(all_sig)
    keep: list = []
    for i in range(len(cps_raw)):
        ok = True
        for j in keep:
            d = cps_raw[i] - cps_raw[j]
            if (d @ d) < 1e-2 ** 2:
                ok = False
                break
        if ok:
            keep.append(i)
    cps = cps_raw[keep]
    sig = sig_raw[keep]
    out["cps_auto_cpu_wall_s"] = round(wall, 2)
    out["cps_auto_cpu_ncp"] = int(len(cps))
    out["cps_auto_cpu_nev"] = int(nev)
    out["cps_auto_cpu_counts"] = [int((sig == -3).sum()),
                                  int((sig == -1).sum()),
                                  int((sig == 1).sum()),
                                  int((sig == 3).sum())]
    _log(out, "cps_auto_cpu_wall_s", "cps_auto_cpu_ncp",
         "cps_auto_cpu_nev", "cps_auto_cpu_counts")
    # persist the CP list: the TPU bench leg matches its AUTO result
    # against this (same seeds, same field - direct engine parity)
    np.savez_compressed(CPU_CPS_NPZ, cps=cps, sig=sig, reps=REPS,
                        wall_s=out["cps_auto_cpu_wall_s"],
                        nseeds=len(seeds), nev=nev)

    # --- mesh NELEC rate (value-only screened eval) ------------------
    # points only: the denominator is the density sweep; the Becke
    # weight stage is shared preprocessing on both sides
    mx, _, _ = _becke_mesh_points(s.crystal, _LVL["good"])
    out["cps_mesh_npts"] = int(len(mx))
    rng = np.random.default_rng(7)
    rates = []
    for nsub in (mesh_sub // 2, mesh_sub):
        idx = rng.choice(len(mx), size=nsub, replace=False)
        t0 = time.perf_counter()
        rho, _, _, nvis = native.wfn_eval_seq(w, mx[idx], nder=0)
        dt = time.perf_counter() - t0
        rates.append(nsub / dt)
    r1, r2 = rates
    if abs(r1 - r2) > 0.10 * max(r1, r2):
        # unstable (contended host): record raw rates, publish no
        # denominator - rerun on an idle core
        out["cps_mesh_cpu_rate_unstable"] = [round(r1), round(r2)]
    else:
        rate = max(r1, r2)         # conservative (anti-us): faster CPU
        out["cps_mesh_cpu_evals_per_s"] = round(rate, 1)
        out["cps_mesh_cpu_wall_implied_s"] = round(len(mx) / rate, 1)
    _log(out, "cps_mesh_npts", "cps_mesh_cpu_evals_per_s",
         "cps_mesh_cpu_wall_implied_s")
    return out


def run_tpu(out: dict) -> dict:
    import jax.numpy as jnp

    from critic2_tpu.analysis.autocp import autocp
    from critic2_tpu.analysis.molcalc import molcalc_nelec

    tstart = time.perf_counter()

    def stage(msg):
        print(f"[cps_tpu +{time.perf_counter() - tstart:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    s, w = build_assembly()
    out["cps_build_s"] = round(time.perf_counter() - t0, 2)
    out["cps_nat"] = int(len(w.atz))
    out["cps_npri"] = int(w.npri)
    stage("assembly built")

    # --- AUTO (screened batch Newton) --------------------------------
    seeds = pair_seeds_cart(s)
    out["cps_auto_nseeds"] = int(len(seeds))
    cpl = autocp(s, verbose=False)             # warmup/compile
    stage("auto warm")
    t0 = time.perf_counter()
    cpl = autocp(s, verbose=False)
    out["cps_auto_wall_s"] = round(time.perf_counter() - t0, 2)
    stage("auto timed")
    n_, b_, r_, c_ = cpl.counts()
    out["cps_auto_counts"] = [n_, b_, r_, c_]
    out["cps_auto_morse"] = n_ - b_ + r_ - c_

    # parity: direct CP-list match against the sequential native
    # drain's saved result (same pruned seeds, same field).
    # Restricted to CPs with rho >= 1e-8: in the inter-copy vdW voids
    # the density is numerically flat and both engines legitimately
    # find (or skip) micro-CPs below any chemical meaning.  NUCLEAR
    # maxima (sig = -3) are matched against the ATOM positions at the
    # no-cusp offset scale (a Gaussian-basis density maximum sits
    # ~1e-2 bohr off an H nucleus; the TPU driver seats nuclei at the
    # exact atom positions via init_cplist, like the reference) -
    # matching them against non-nuclear CPs at 1e-3 bohr structurally
    # failed 288 H-nucleus maxima in the r5 first run.
    import os
    if os.path.exists(CPU_CPS_NPZ):
        ref = np.load(CPU_CPS_NPZ)
        if tuple(ref["reps"]) == REPS:
            # the sequential drain's measured wall rides along in the
            # npz so the artifact carries the config-5b denominator
            # even when CPU_MEASURED lags the latest CPU run
            out.setdefault("cps_auto_cpu_wall_s", float(ref["wall_s"]))
            cpu_cps = np.asarray(ref["cps"])
            cpu_sig = np.asarray(ref["sig"])
            rho_cpu = np.asarray(
                w.rho_eval_screened(jnp.asarray(cpu_cps.T), nder=0)[0])
            keep = rho_cpu >= 1e-8
            cpu_cps, cpu_sig = cpu_cps[keep], cpu_sig[keep]
            tpu_cps = np.array([cp.r for cp in cpl.cps
                                if not cp.isnuc], dtype=float)
            nonnuc = cpu_sig != -3
            if len(tpu_cps) and nonnuc.any():
                d = np.linalg.norm(cpu_cps[nonnuc][:, None, :]
                                   - tpu_cps[None, :, :], axis=2)
                out["cps_auto_cpu_matched_frac"] = round(float(
                    (d.min(1) < 1e-3).mean()), 4)
                out["cps_auto_cp_parity_bohr"] = float(
                    np.quantile(d.min(1), 0.99))
                out["cps_auto_cpu_ncp_sig"] = int(nonnuc.sum())
            if (~nonnuc).any():
                dn = np.linalg.norm(
                    cpu_cps[~nonnuc][:, None, :]
                    - np.asarray(w.atpos)[None, :, :], axis=2)
                out["cps_auto_nucmax_matched_frac"] = round(float(
                    (dn.min(1) < 0.05).mean()), 4)

    # --- mesh NELEC (one device sweep) -------------------------------
    t0 = time.perf_counter()
    nelec = molcalc_nelec(s, lvl="good")       # warmup: mesh+compile
    out["cps_mesh_build_s"] = round(time.perf_counter() - t0, 2)
    stage("mesh warm")
    t0 = time.perf_counter()
    nelec = molcalc_nelec(s, lvl="good")
    out["cps_mesh_wall_s"] = round(time.perf_counter() - t0, 2)
    # ABSOLUTE error is good-LEVEL quadrature error of the assembly
    # mesh (measured -0.0208 e at 12 copies with BOTH engines and both
    # weight precisions agreeing; the reference's genmesh at the same
    # level shares it).  Engine parity - the 1e-6-class claim - is
    # cps_engine_* below: the screened kernel vs the dense MO closure
    # on the same weighted mesh points.
    out["cps_nelec_err_e"] = round(abs(nelec - MONO_NELEC * NCOPY), 8)
    stage("mesh timed")

    # --- engine parity: screened vs dense on a weighted mesh subset --
    from critic2_tpu.analysis.mesh import becke_mesh

    m = becke_mesh(s.crystal, "good", weights_dtype=np.float32)  # cached
    rng = np.random.default_rng(11)
    sub = rng.choice(m.n, size=1 << 18, replace=False)
    xs_ = m.x[sub]
    rho_s = np.asarray(w.rho_eval_screened(jnp.asarray(xs_.T), nder=0)[0])
    dense = w._jitted(0)          # dense MO closure, chunked small
    blk = 2048
    rho_d = np.empty(len(xs_))
    for lo in range(0, len(xs_), blk):
        ch = xs_[lo:lo + blk]
        if len(ch) < blk:
            ch = np.concatenate(
                [ch, np.broadcast_to(ch[-1:], (blk - len(ch), 3))])
        rho_d[lo:lo + blk] = np.asarray(
            dense(jnp.asarray(ch.T))[0])[:len(xs_) - lo][:blk]
    out["cps_engine_max_drho"] = float(np.abs(rho_s - rho_d).max())
    out["cps_engine_sub_dev_e"] = float(
        np.abs(np.asarray(m.w, np.float64)[sub] @ (rho_s - rho_d)))
    stage("engine parity")

    # --- screened eval throughput (nder=2, the AUTO/trace shape) -----
    rng = np.random.default_rng(5)
    pts = w.atpos[rng.integers(0, len(w.atpos), 1 << 16)] + rng.normal(
        scale=1.2, size=(1 << 16, 3))
    f, g, h = w.rho_eval_screened(jnp.asarray(pts.T), nder=2)  # warmup
    f.block_until_ready()
    t0 = time.perf_counter()
    f, g, h = w.rho_eval_screened(jnp.asarray(pts.T), nder=2)
    f.block_until_ready()
    dt = time.perf_counter() - t0
    out["cps_eval2_evals_per_s"] = round(len(pts) / dt, 1)

    # --- gradient-path flux at scale (the config-5 trace half) -------
    from critic2_tpu.analysis.flux import fluxprint

    u = rng.normal(size=(64, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    fseeds = w.atpos[0] + 0.3 * u
    scene = fluxprint(s, fseeds, iup=-1)       # warmup (downhill)
    t0 = time.perf_counter()
    scene = fluxprint(s, fseeds, iup=-1)
    out["cps_flux_wall_s"] = round(time.perf_counter() - t0, 2)
    out["cps_flux_nseg"] = int(len(scene.seg))
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    res: dict = {}
    if which == "cpu":
        run_cpu(res)
    else:
        run_tpu(res)
    print(json.dumps(res, indent=1))
