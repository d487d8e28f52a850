"""Global JAX configuration for critic2-tpu.

Imported first by ``critic2_tpu/__init__.py``. Enables 64-bit mode: basin
charges must accumulate in f64 to hit the 1e-6 e parity bar (SURVEY.md §7),
and CP positions are converged to ~1e-8 bohr by the Newton polish.

Hot evaluation paths (tricubic interpolation, NCI, promolecular sums) take an
explicit ``dtype`` argument so that the TPU MXU/VPU can run them in f32 with
f64 accumulation where profitable; f64 is the default for correctness.
"""
import jax

jax.config.update("jax_enable_x64", True)

# Default dtypes for the two precision tiers used throughout.
import numpy as _np

FDTYPE = _np.float64  # accumulation / host-parity tier
EDTYPE = _np.float32  # throughput tier for device eval (opt-in)

# Cube-file write precision (reference `precisecube`, default true,
# src/global@proc.f90:90: E22.14 body values; STANDARDCUBE switches the
# reference to 1p,e12.5). Toggled by the PRECISECUBE/STANDARDCUBE CLI
# keywords; consumed by io/cube.write_cube.
PRECISECUBE = True
