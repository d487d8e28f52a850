"""FLUXPRINT: 3D gradient-path plotting, and CPREPORT scene output.

Role of the reference flux (src/flux@proc.f90:59-135) and the CPREPORT
file writers (src/autocp@proc.f90:787-957): emit ball-and-stick scenes of
the structure, the CP list, and gradient paths to obj/ply/off.
"""
from __future__ import annotations

import numpy as np

from ..io.graphics import Scene
from ..ops.ode import trace_paths_recorded

__all__ = ["fluxprint", "cpreport_scene"]

_CPCOLOR = {-3: (0.2, 0.7, 0.2), -1: (0.9, 0.1, 0.1),
            1: (0.9, 0.9, 0.1), 3: (0.2, 0.2, 0.9)}


def _add_structure(scene, crystal, ballsize=0.5):
    from .. import param

    cart = np.asarray(crystal.x_cart)
    zs = crystal.zatoms
    for r, z in zip(cart, zs):
        rad = max(0.3, 0.6 * param.covalent_radius(int(z)))
        grey = 0.3 + 0.5 * (z % 5) / 5.0
        scene.ball(r, r=rad, color=(grey, 0.4, 1.0 - grey))
    for i, j, lvec in crystal.bonds():
        p0 = cart[i]
        p1 = crystal.x2c(crystal.x_frac[j] + lvec)
        scene.stick(p0, p1)


def cpreport_scene(system, cpl, file: str, graph: bool = True,
                   cpballsize: float = 0.25):
    """Write the CP list (+ structure, + bond paths) as a 3D scene."""
    scene = Scene()
    c = system.crystal
    _add_structure(scene, c)
    for cp in cpl.cps:
        if cp.isnuc:
            continue
        scene.ball(cp.r, r=cpballsize, color=_CPCOLOR[cp.typ])
    if graph:
        bcps = [cp for cp in cpl.cps if cp.typ == -1]
        if bcps:
            fn = system.ref.eval_fn(nder=2)
            import jax.numpy as jnp
            for cp in bcps:
                if cp.brvec is None:
                    continue
                seeds = np.stack([cp.r + 0.01 * cp.brvec,
                                  cp.r - 0.01 * cp.brvec])
                paths, _, _ = trace_paths_recorded(
                    fn, jnp.asarray(seeds), nrec=200, iup=1)
                for p in paths:
                    scene.path(p)
    scene.write(file)
    return scene


def fluxprint(system, seeds_cart, iup: int = 1, file: str | None = None,
              nrec: int = 300, structure: bool = True) -> Scene:
    """Trace and plot gradient paths from Cartesian seed points
    (reference fluxprint, src/flux@proc.f90:59)."""
    import jax.numpy as jnp

    scene = Scene()
    if structure:
        _add_structure(scene, system.crystal)
    fn = system.ref.eval_fn(nder=2)
    paths, status, termid = trace_paths_recorded(
        fn, jnp.asarray(np.atleast_2d(seeds_cart)), nrec=nrec, iup=iup)
    for p in paths:
        scene.path(p, color=(0.9, 0.4, 0.1) if iup > 0 else (0.1, 0.4, 0.9))
    if file:
        scene.write(file)
    return scene
