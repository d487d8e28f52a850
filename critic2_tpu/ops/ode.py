"""Batched gradient-path tracing (device).

Role of the reference gradient/adaptive_stepper
(src/fieldmod@proc.f90:2076-2399): trace dx/ds = +-grad f / |grad f| with
the Bogacki-Shampine 2(3) embedded pair (the reference default,
src/global@proc.f90:104-107: step 0.3, maxerr 1e-4, gradeps 1e-7),
terminating at attractor points (nuclei / CPs of the right type, within
min(0.1, h/2)), at new CPs (|grad| < gradeps), on step collapse, or on
leaving the molecular cell.

TPU decomposition: the reference traces one path at a time inside OpenMP
loops; here ALL paths advance in lockstep with per-trajectory step
sizes, accept/reject masks and termination states - each iteration is
one BS23 attempt costing three batched field evaluations for every live
trajectory. Iterations run inside a lax.while_loop with on-device
early exit (all-done), so a whole trace batch is typically one device
program; Python-unrolled chunk steppers remain as a fallback
(CRITIC2_TPU_UNROLL_LOOPS; see fields/field.py _c2t_loop for the v5e
gather-in-loop miscompile history that once forced them).

Status codes: 0 = reached attractor (termid >= 0), 1 = converged to a
gradient zero away from the list, 2 = step collapse/bounce, 3 = left the
molecular cell, 4 = ran out of steps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["trace_paths"]

STAT_ATTRACTOR = 0
STAT_NEWCP = 1
STAT_STUCK = 2
STAT_ESCAPED = 3
STAT_MAXSTEP = 4
STAT_OOR = 5      # left the screened chunk's validity sphere: RESUMABLE
                  # (trace_paths_screened re-plans and continues)


def _make_body(eval_fn, consts, tT, rt, m_c2x, molborder, hini, maxerr,
               gradeps, iup, have_t, havemol, ecent=None, erad=None,
               have_esc=False):
    """One BS23 attempt over the whole batch: st -> st (shared by the
    plain, recorded, and fori steppers).  `consts` is the evaluator's
    device-constant pytree (fields' _c2t_consts) passed as a REAL jit
    argument - closure-captured grids inline into the lowered StableHLO
    (a 256^3 f64 grid = 134 MB of MLIR per compile; see
    fields/field.py _build_eval_fn)."""
    sgn = float(iup)

    def direction(xT):
        _, gf, _ = (eval_fn(xT) if consts is None
                    else eval_fn(consts, xT))
        gmod = jnp.sqrt((gf * gf).sum(0))
        return sgn * gf / (gmod + 1e-80)[None, :], gmod

    def nearest_target(xT):
        d2 = ((xT[:, :, None] - tT[:, None, :]) ** 2).sum(0)   # (N, K)
        k = jnp.argmin(d2, axis=1).astype(jnp.int32)
        return k, jnp.sqrt(d2[jnp.arange(xT.shape[1]), k])

    def body(st):
        xT, h, done, status, termid, plen, d1, gmod = st

        # termination: gradient zero (new CP)
        cp_now = (gmod < gradeps) & ~done
        status = jnp.where(cp_now, STAT_NEWCP, status)
        done = done | cp_now

        # termination: attractor proximity
        if have_t:
            k, dist = nearest_target(xT)
            hit = (dist <= jnp.maximum(rt[k], 0.5 * jnp.abs(h))) & ~done
            xT = jnp.where(hit[None, :], tT[:, k], xT)
            plen = jnp.where(hit, plen + dist, plen)
            termid = jnp.where(hit, k, termid)
            status = jnp.where(hit, STAT_ATTRACTOR, status)
            done = done | hit

        # termination: left the molecular cell (downhill only)
        if havemol and iup == -1:
            wx = m_c2x @ xT
            out = ((wx < molborder[:, None]) |
                   (wx > 1.0 - molborder[:, None])).any(0) & ~done
            status = jnp.where(out, STAT_ESCAPED, status)
            done = done | out

        # pause: left the screened chunk's validity sphere (the block
        # table no longer covers the field here) - resumable
        if have_esc:
            oor = (((xT - ecent[:, None]) ** 2).sum(0)
                   > erad * erad) & ~done
            status = jnp.where(oor, STAT_OOR, status)
            done = done | oor

        # BS23 attempt (FSAL: d1 is the direction at xT)
        d2_, _ = direction(xT + 0.5 * h[None, :] * d1)
        d3_, _ = direction(xT + 0.75 * h[None, :] * d2_)
        xnew = xT + h[None, :] * (2.0 / 9.0 * d1 + 1.0 / 3.0 * d2_
                                  + 4.0 / 9.0 * d3_)
        d4_, gmod4 = direction(xnew)
        errv = h[None, :] * (-5.0 / 72.0 * d1 + 1.0 / 12.0 * d2_
                             + 1.0 / 9.0 * d3_ - 1.0 / 8.0 * d4_)
        nerr = jnp.sqrt((errv * errv).sum(0))

        accept = (nerr < maxerr) & ~done
        grow = accept & (nerr < maxerr / 10.0)
        step_len = jnp.sqrt(((xnew - xT) ** 2).sum(0))
        plen = jnp.where(accept, plen + step_len, plen)
        xT = jnp.where(accept[None, :], xnew, xT)
        d1 = jnp.where(accept[None, :], d4_, d1)
        gmod = jnp.where(accept, gmod4, gmod)
        h = jnp.where(grow, jnp.minimum(jnp.abs(1.6 * h), hini), h)
        h = jnp.where(~accept & ~done,
                      0.9 * h * maxerr / jnp.maximum(nerr, 1e-30), h)

        # step collapse
        stuck = (jnp.abs(h) < 1e-12) & ~done
        status = jnp.where(stuck, STAT_STUCK, status)
        done = done | stuck

        return xT, h, done, status, termid, plen, d1, gmod

    return body


@partial(jax.jit,
         static_argnames=("eval_fn", "iup", "nsteps", "have_t",
                          "havemol", "have_esc"))
def _ode_chunk(eval_fn, consts, st, tT, rt, m_c2x, molborder, hini, maxerr,
               gradeps, iup, have_t, havemol, nsteps, ecent=None,
               erad=None, have_esc=False):
    """Advance all trajectories nsteps BS23 attempts (Python-unrolled)."""
    body = _make_body(eval_fn, consts, tT, rt, m_c2x, molborder, hini,
                      maxerr, gradeps, iup, have_t, havemol,
                      ecent, erad, have_esc)
    for _ in range(nsteps):
        st = body(st)
    return st


@partial(jax.jit,
         static_argnames=("eval_fn", "iup", "nsteps", "have_t",
                          "havemol", "have_esc"))
def _ode_chunk_fori(eval_fn, consts, st, tT, rt, m_c2x, molborder, hini, maxerr,
                    gradeps, iup, have_t, havemol, nsteps, ecent=None,
                    erad=None, have_esc=False):
    """_ode_chunk via lax.while_loop with ON-DEVICE early exit: the BS23
    body (3 eval_fn calls) compiles ONCE instead of nsteps inlined
    copies, and the loop stops as soon as every trajectory is done - so
    a whole trace batch is typically ONE device program regardless of
    how unevenly the paths terminate (the round-2 flux leg paid one
    dispatch per 16-step chunk through the remote tunnel: 32 s for 64
    paths)."""
    body = _make_body(eval_fn, consts, tT, rt, m_c2x, molborder, hini,
                      maxerr, gradeps, iup, have_t, havemol,
                      ecent, erad, have_esc)

    def cond(c):
        i, s = c
        return (i < nsteps) & ~s[2].all()

    return jax.lax.while_loop(cond, lambda c: (c[0] + 1, body(c[1])),
                              (jnp.asarray(0, jnp.int32), st))[1]


@partial(jax.jit,
         static_argnames=("eval_fn", "iup", "nsteps", "have_t",
                          "havemol", "have_esc"))
def _ode_chunk_rec(eval_fn, consts, st, tT, rt, m_c2x, molborder, hini, maxerr,
                   gradeps, iup, have_t, havemol, nsteps, ecent=None,
                   erad=None, have_esc=False):
    """_ode_chunk that also RECORDS the position after every step:
    returns (st, xrec (nsteps, 3, N)).  One device program per chunk
    instead of one dispatch (plus host sync) per step - the recorded
    tracer's wall is dispatch-latency-bound through the remote tunnel."""
    body = _make_body(eval_fn, consts, tT, rt, m_c2x, molborder, hini,
                      maxerr, gradeps, iup, have_t, havemol,
                      ecent, erad, have_esc)
    recs = []
    for _ in range(nsteps):
        st = body(st)
        recs.append(st[0])
    return st, jnp.stack(recs)


@partial(jax.jit,
         static_argnames=("eval_fn", "iup", "nsteps", "have_t",
                          "havemol", "have_esc"))
def _ode_chunk_rec_scan(eval_fn, consts, st, tT, rt, m_c2x, molborder,
                        hini, maxerr, gradeps, iup, have_t, havemol,
                        nsteps, ecent=None, erad=None, have_esc=False):
    """Recorded chunk via lax.scan (one compiled body; gather-free
    evaluators only, same caveat as _ode_chunk_fori)."""
    body = _make_body(eval_fn, consts, tT, rt, m_c2x, molborder, hini,
                      maxerr, gradeps, iup, have_t, havemol,
                      ecent, erad, have_esc)

    def step(s, _):
        s = body(s)
        return s, s[0]

    return jax.lax.scan(step, st, None, length=nsteps)


@partial(jax.jit, static_argnames=("eval_fn", "iup"))
def _ode_init(eval_fn, consts, xT0, iup):
    """Initial FSAL direction/gradient (jitted: an eager eval_fn call
    here would run op-by-op through the remote-dispatch tunnel)."""
    _, gf0, _ = eval_fn(xT0) if consts is None else eval_fn(consts, xT0)
    gmod0 = jnp.sqrt((gf0 * gf0).sum(0))
    return float(iup) * gf0 / (gmod0 + 1e-80)[None, :], gmod0


def trace_paths(eval_fn, x0, iup: int = 1, targets=None, rterm=None,
                hini: float = 0.3, maxerr: float = 1e-4,
                gradeps: float = 1e-7, mstep: int = 4000,
                m_c2x=None, molborder=None, h0=None, chunk: int = 16,
                loop: str | None = None, compact: bool = True,
                escape=None, plen0=None):
    """Trace gradient paths from Cartesian seeds x0 (N, 3).

    eval_fn: SoA evaluator (3, N) -> (f, gf (3, N), h6).
    iup: +1 uphill (to maxima), -1 downhill.
    targets: (K, 3) Cartesian attractor points incl. periodic images, or
    None; rterm: (K,) termination radius per target (reference
    min(rbetadef, h/2) when no beta sphere is set).
    m_c2x/molborder: enable molecular-cell escape detection (iup == -1).

    h0: optional per-trajectory initial step (resume support).
    compact: between chunks, gather still-live trajectories into a
    power-of-2-sized batch once fewer than half the lanes are live.
    Straggler paths (separatrix ridge crawlers whose step collapses to
    the local feature size) otherwise keep the FULL batch evaluating
    for the whole mstep budget - a handful of crawlers in an 8192-lane
    batch cost 8192-lane field evals per iteration.  Pow-2 bucketing
    bounds the set of compiled stepper shapes.
    Returns (x (N, 3), status (N,), termid (N,), plen (N,), h (N,)).
    """
    import numpy as np

    xT0 = jnp.asarray(x0).T
    N = xT0.shape[1]
    have_t = targets is not None and targets.shape[0] > 0
    tT = jnp.asarray(targets).T if have_t else jnp.zeros((3, 1))
    rt = jnp.asarray(rterm) if have_t else jnp.zeros((1,))
    havemol = m_c2x is not None
    m_c2x_j = jnp.asarray(m_c2x) if havemol else jnp.zeros((3, 3))
    molb_j = jnp.asarray(molborder) if havemol else jnp.zeros((3,))
    have_esc = escape is not None
    ecent = jnp.asarray(escape[0]) if have_esc else jnp.zeros((3,))
    erad = float(escape[1]) if have_esc else 0.0

    raw = getattr(eval_fn, "_c2t_raw", eval_fn)
    consts = getattr(eval_fn, "_c2t_consts", None)
    d1_0, gmod0 = _ode_init(raw, consts, xT0, iup)
    hstart = jnp.full((N,), hini) if h0 is None else jnp.asarray(h0)
    pstart = jnp.zeros(N) if plen0 is None else jnp.asarray(plen0)
    st = (xT0, hstart,
          jnp.zeros(N, bool), jnp.full((N,), STAT_MAXSTEP, jnp.int32),
          jnp.full((N,), -1, jnp.int32), pstart, d1_0, gmod0)
    if loop is None:
        loop = getattr(eval_fn, "_c2t_loop", "unroll")
    if loop == "fori":
        # early-exit while_loop: a chunk costs only as many iterations
        # as its slowest LIVE lane, so dispatch count stays small - but
        # the chunk must stay moderate so the between-chunk straggler
        # COMPACTION still fires: separatrix crawlers otherwise keep
        # the full lane batch evaluating for the whole mstep budget
        # (measured: chunk 512 on the qtree trace load ran 4x slower
        # than chunk 64 for exactly this reason)
        stepper, chunk = _ode_chunk_fori, max(chunk, 64)
    else:
        stepper = _ode_chunk

    # final results for lanes compacted out of the working batch
    out_x = np.empty((3, N))
    out_h = np.empty(N)
    out_stat = np.empty(N, np.int32)
    out_term = np.empty(N, np.int32)
    out_plen = np.empty(N)
    order = np.arange(N)            # original index per working lane

    def flush(sel_np, st_np):
        xT, h, done, status, termid, plen = st_np
        idx = order[sel_np]
        keep = idx >= 0             # padding lanes carry order -1
        idx = idx[keep]
        out_x[:, idx] = xT[:, sel_np][:, keep]
        out_h[idx] = h[sel_np][keep]
        out_stat[idx] = status[sel_np][keep]
        out_term[idx] = termid[sel_np][keep]
        out_plen[idx] = plen[sel_np][keep]

    it = 0
    while it < mstep:
        n = min(chunk, mstep - it)
        st = stepper(raw, consts, st, tT, rt, m_c2x_j, molb_j, hini,
                     maxerr, gradeps, iup, have_t, havemol, n,
                     ecent, erad, have_esc)
        it += n
        done_np = np.asarray(st[2])
        if done_np.all():
            break
        nlive = int((~done_np & (order >= 0)).sum())
        if (compact and it < mstep and len(done_np) > 256
                and nlive <= len(done_np) // 2):
            st_np = (np.asarray(st[0]), np.asarray(st[1]), done_np,
                     np.asarray(st[3]), np.asarray(st[4]),
                     np.asarray(st[5]))
            flush(done_np, st_np)
            live = np.nonzero(~done_np & (order >= 0))[0]
            nbatch = max(256, 1 << int(np.ceil(np.log2(max(nlive, 1)))))
            pad = nbatch - len(live)
            rows = np.concatenate([live, np.repeat(live[:1], pad)])
            d1_np = np.asarray(st[6])
            gmod_np = np.asarray(st[7])
            st = (jnp.asarray(st_np[0][:, rows]),
                  jnp.asarray(st_np[1][rows]),
                  jnp.asarray(np.concatenate(
                      [np.zeros(len(live), bool), np.ones(pad, bool)])),
                  jnp.asarray(st_np[3][rows]),
                  jnp.asarray(st_np[4][rows]),
                  jnp.asarray(st_np[5][rows]),
                  jnp.asarray(d1_np[:, rows]),
                  jnp.asarray(gmod_np[rows]))
            order = np.concatenate([order[live], np.full(pad, -1)])
    st_np = (np.asarray(st[0]), np.asarray(st[1]), np.asarray(st[2]),
             np.asarray(st[3]), np.asarray(st[4]), np.asarray(st[5]))
    flush(np.ones(len(order), bool), st_np)
    return (out_x.T, jnp.asarray(out_stat), jnp.asarray(out_term),
            jnp.asarray(out_plen), jnp.asarray(out_h))


def trace_paths_recorded(eval_fn, x0, nrec: int = 400, iup: int = 1,
                         targets=None, rterm=None, hini: float = 0.3,
                         maxerr: float = 1e-4, gradeps: float = 1e-7,
                         m_c2x=None, molborder=None, chunk: int = 50,
                         loop: str | None = None):
    """Like trace_paths but records the trajectory (host-side pruning of
    repeated tail points). Returns (paths list of (L_i, 3) arrays, status,
    termid). Runs nrec bounded steps; use for plotting (FLUXPRINT/GRDVEC),
    not for termination-critical work.

    Positions are recorded ON DEVICE in `chunk`-step batches (one
    dispatch per chunk): the previous one-step-per-dispatch form spent
    ~30 s of pure tunnel latency on a 400-step trace."""
    import numpy as np

    xT0 = jnp.asarray(x0).T
    N = xT0.shape[1]
    have_t = targets is not None and targets.shape[0] > 0
    tT = jnp.asarray(targets).T if have_t else jnp.zeros((3, 1))
    rt = jnp.asarray(rterm) if have_t else jnp.zeros((1,))
    havemol = m_c2x is not None
    m_c2x_j = jnp.asarray(m_c2x) if havemol else jnp.zeros((3, 3))
    molb_j = jnp.asarray(molborder) if havemol else jnp.zeros((3,))

    raw = getattr(eval_fn, "_c2t_raw", eval_fn)
    consts = getattr(eval_fn, "_c2t_consts", None)
    d1_0, gmod0 = _ode_init(raw, consts, xT0, iup)
    st = (xT0, jnp.full((N,), hini),
          jnp.zeros(N, bool), jnp.full((N,), STAT_MAXSTEP, jnp.int32),
          jnp.full((N,), -1, jnp.int32), jnp.zeros(N), d1_0, gmod0)
    if loop is None:
        loop = getattr(eval_fn, "_c2t_loop", "unroll")
    stepper = _ode_chunk_rec_scan if loop == "fori" else _ode_chunk_rec
    if loop == "fori":
        chunk = max(chunk, 100)

    recs = [np.asarray(xT0)[None]]
    it = 0
    while it < nrec:
        n = min(chunk, nrec - it)
        st, xrec = stepper(raw, consts, st, tT, rt, m_c2x_j, molb_j, hini,
                           maxerr, gradeps, iup, have_t, havemol, n)
        recs.append(np.asarray(xrec))
        it += n
        if bool(st[2].all()):
            break
    status, termid = st[3], st[4]
    arr = np.concatenate(recs).transpose(0, 2, 1)   # (steps+1, N, 3)
    paths = []
    for i in range(N):
        p = arr[:, i, :]
        keep = np.ones(len(p), bool)
        keep[1:] = np.linalg.norm(np.diff(p, axis=0), axis=1) > 1e-12
        paths.append(p[keep])
    return paths, np.asarray(status), np.asarray(termid)


def trace_paths_screened(wfn, x0, iup: int = 1, targets=None, rterm=None,
                         hini: float = 0.3, maxerr: float = 1e-4,
                         gradeps: float = 1e-7, mstep: int = 4000,
                         m_c2x=None, molborder=None, n_chunk: int = 256,
                         margin: float = 8.0, max_rounds: int = 12,
                         dtype=None):
    """trace_paths through the screened GTO kernel (large molecules).

    Seeds are grouped spatially (fields/wfn.screen_plan); each group
    traces with its own block table (a jit argument - one compiled
    stepper for all groups) inside an ESCAPE SPHERE of radius
    chunk_radius + margin, where the truncated field is exact to the
    screening threshold. Paths that leave their sphere pause with
    STAT_OOR and are re-grouped at their current positions for the next
    round, carrying step size and path length - the batch analogue of
    the reference rebuilding its near-atom list every evaluation
    (src/wfn_private@proc.F90:2070). Bond/ring paths are a few bohr
    long, so almost everything finishes in round one.

    Returns (x (N, 3), status, termid, plen, h) like trace_paths."""
    import numpy as np

    x = np.array(np.asarray(x0, float), copy=True).reshape(-1, 3)
    N = len(x)
    h = np.full(N, float(hini))
    plen = np.zeros(N)
    stat = np.full(N, STAT_OOR, np.int32)
    term = np.full(N, -1, np.int32)
    pend = np.arange(N)
    tgt = None if targets is None else np.asarray(targets)
    rt = None if rterm is None else np.asarray(rterm)

    for _ in range(max_rounds):
        if len(pend) == 0:
            break
        order, xstack, bidx, Np = wfn.screen_plan(x[pend],
                                                  n_chunk=n_chunk,
                                                  margin=margin)
        nxt = []
        for i in range(len(xstack)):
            lo = i * n_chunk
            js = np.arange(lo, min(lo + n_chunk, Np))
            rows = order[js]                   # indices into pend
            gidx = pend[rows]
            pts = xstack[i].T                  # (n, 3) padded
            ecent = pts.mean(0)
            rc = np.linalg.norm(pts - ecent, axis=1).max()
            shim = wfn.screened_shim(bidx[i], nder=1, dtype=dtype)
            h0 = np.full(len(pts), hini)
            p0 = np.zeros(len(pts))
            h0[:len(js)] = h[gidx]
            p0[:len(js)] = plen[gidx]
            xx, ss, tt, pp, hh = trace_paths(
                shim, pts, iup=iup,
                targets=tgt, rterm=rt, hini=hini, maxerr=maxerr,
                gradeps=gradeps, mstep=mstep, m_c2x=m_c2x,
                molborder=molborder, h0=jnp.asarray(h0),
                plen0=jnp.asarray(p0),
                escape=(ecent, rc + margin - min(1.0, 0.25 * margin)))
            ss = np.asarray(ss)[:len(js)]
            x[gidx] = np.asarray(xx)[:len(js)]
            h[gidx] = np.asarray(hh)[:len(js)]
            plen[gidx] = np.asarray(pp)[:len(js)]
            stat[gidx] = ss
            term[gidx] = np.asarray(tt)[:len(js)]
            nxt.append(gidx[ss == STAT_OOR])
        pend = np.concatenate(nxt) if nxt else np.zeros(0, int)
    return (x, jnp.asarray(stat), jnp.asarray(term),
            jnp.asarray(plen), jnp.asarray(h))
