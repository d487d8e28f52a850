"""STM images (Tersoff-Hamann approximation).

Role of the reference stm (src/stm@proc.f90:28-545): from the reference
field (usually a local DOS grid), produce constant-height (field value on
a plane) or constant-current (isodensity height by bisection) images over
the surface cell; auto-detect the vacuum position as the minimum-density
plane; gnuplot output.

TPU decomposition: constant-height is one batched plane evaluation;
constant-current runs the per-pixel bisection as a masked lockstep
while_loop over the whole image.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stm", "STMResult"]


@partial(jax.jit, static_argnames=("fn",))
def _stm_bisect(fn, fxj, fyj, m, ztop, level):
    """Constant-current bisection for one pixel block."""
    lo = jnp.full(fxj.shape, ztop - 0.5)     # half a cell below vacuum
    hi = jnp.full(fxj.shape, ztop)

    def rho_at(z):
        frac = jnp.stack([fxj, fyj, z % 1.0])
        return fn(m @ frac)[0]

    def body(st):
        lo, hi = st
        mid = 0.5 * (lo + hi)
        rmid = rho_at(mid)
        # density decreases toward vacuum (increasing z up to ztop):
        # if rho(mid) > level, the isosurface is above mid
        above = rmid > level
        return jnp.where(above, mid, lo), jnp.where(above, hi, mid)

    # unrolled (40 halvings): lax loops with gather indices that
    # evolve with the carried state miscompile on the v5e backend
    # here (see ops/newton.py docstring)
    st = (lo, hi)
    for _ in range(40):
        st = body(st)
    lo, hi = st
    return 0.5 * (lo + hi)


@dataclass
class STMResult:
    mode: str
    image: np.ndarray           # (nx, ny)
    extent: tuple               # cell-plane lengths (bohr)
    ztop: float                 # vacuum/reference fractional z
    value: float                # height (const current) or current level


def _detect_vacuum(field):
    """Fractional z of minimum plane-averaged density (reference
    detect_vacuum, src/stm@proc.f90:122)."""
    g = np.asarray(field.grid.f)
    prof = g.mean(axis=(0, 1))
    k = int(np.argmin(prof))
    return k / g.shape[2], float(prof[k])


def stm(system, mode: str = "current", level: float | None = None,
        npts=(96, 96), top: float | None = None, block: int = 1 << 14):
    """Compute an STM image from the reference field (grid required for
    vacuum detection; any field evaluates)."""
    sy = system
    f = sy.ref
    c = sy.crystal
    if f.type != "grid":
        raise ValueError("STM needs a grid reference field")
    if top is None:
        top, vmin = _detect_vacuum(f)
    nx, ny = (int(v) for v in npts)

    fn = f.eval_fn(nder=0)
    m = np.asarray(c.m_x2c)
    # (module-level jit _stm_bisect: a fresh per-call closure would
    # retrace/recompile every call)

    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    fx = i.ravel() / nx
    fy = j.ravel() / ny

    if mode == "height":
        z = top if level is None else level
        frac = np.stack([fx, fy, np.full(fx.shape, z)])
        cart = m @ frac
        out = np.empty(fx.size)
        for lo in range(0, fx.size, block):
            out[lo:lo + block] = np.asarray(
                fn(jnp.asarray(cart[:, lo:lo + block]))[0])
        img = out.reshape(nx, ny)
        return STMResult(mode=mode, image=img,
                         extent=(float(np.linalg.norm(m[:, 0])),
                                 float(np.linalg.norm(m[:, 1]))),
                         ztop=top, value=z)

    if mode != "current":
        raise ValueError(f"unknown STM mode {mode}")

    # constant current: for each pixel, find z in [zsurf, ztop] with
    # rho(z) == level, by bisection from the vacuum downward
    g = np.asarray(f.grid.f)
    if level is None:
        level = float(np.percentile(g, 75)) * 1e-3 + g.mean() * 1e-3
        level = max(level, 1e-6)

    mj = jnp.asarray(m)
    out = np.empty(fx.size)
    for lo_i in range(0, fx.size, block):
        sl = slice(lo_i, lo_i + block)
        out[sl] = np.asarray(_stm_bisect(fn, jnp.asarray(fx[sl]),
                                         jnp.asarray(fy[sl]), mj,
                                         float(top), float(level)))
    img = out.reshape(nx, ny)
    return STMResult(mode=mode, image=img,
                     extent=(float(np.linalg.norm(m[:, 0])),
                             float(np.linalg.norm(m[:, 1]))),
                     ztop=top, value=level)
