"""Device-mesh construction for sharded grid analysis.

The reference scales with OpenMP threads over a shared-memory grid
(reference README.md:78-90; no MPI/distributed layer exists, SURVEY.md
S2.4). The TPU-native equivalent is a 2-D `jax.sharding.Mesh`:

  - axis "space":  the volumetric grid is slab-sharded along its first
    axis; tricubic interpolation needs a halo of width 2 (stencil offsets
    -1..+2, reference src/grid3mod@proc.f90:1996-2006) exchanged over ICI
    with `lax.ppermute`.
  - axis "points": evaluation batches (seeds, mesh nodes, basin samples)
    are data-parallel; basin/property sums are `lax.psum` reductions.

Both axes ride ICI inside a slice; nothing here assumes a device count.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "mesh_shape_for"]


def mesh_shape_for(n_devices: int) -> tuple[int, int]:
    """Pick a (space, points) factorization of n_devices.

    Favors the space axis (grids are the large object); falls back to
    (n, 1) for primes.
    """
    best = (n_devices, 1)
    for p in range(2, n_devices + 1):
        if n_devices % p:
            continue
        q = n_devices // p
        if p >= q:
            best = (p, q)
            break
    return best


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, str] = ("space", "points")) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"asked for {n_devices} devices, have {len(devs)}")
    space, points = mesh_shape_for(n_devices)
    arr = np.array(devs[:n_devices]).reshape(space, points)
    return Mesh(arr, axis_names)
