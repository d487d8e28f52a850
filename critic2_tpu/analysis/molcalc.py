"""MOLCALC: expression integrals over molecular meshes.

Role of the reference molcalc (src/molcalc@proc.F90:30-110): integrate an
arithmetic expression over the Becke mesh of the current molecule; NELEC
integrates the reference density. (PEACH and the libCINT HF energy arrive
with the integrals milestone.)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .mesh import becke_mesh

__all__ = ["molcalc_integral", "molcalc_nelec"]


def molcalc_integral(system, expr: str, lvl: str = "good",
                     block: int = 1 << 14) -> float:
    """Integral of `expr` over the Becke mesh of the system's molecule."""
    from ..arithmetic import compile_expr

    m = becke_mesh(system.crystal, lvl)
    fn = compile_expr(expr, system, periodic=False)
    out = np.empty(m.n)
    for lo in range(0, m.n, block):
        xT = jnp.asarray(m.x[lo:lo + block].T)
        out[lo:lo + xT.shape[1]] = np.asarray(fn(xT))
    return m.integrate(out)


def molcalc_nelec(system, lvl: str = "good") -> float:
    """Integrated number of electrons of the reference field."""
    ref = system.iref if system.iref is not None else 0
    return molcalc_integral(system, f"${ref}", lvl=lvl)


def molcalc_hf(system, block: int = 96) -> dict:
    """Hartree-Fock total energy of the reference wavefunction
    (reference molcalc_hfenergy via libCINT,
    src/molcalc@proc.F90:238-404; here via ops/mdint McMurchie-Davidson
    integrals, validated against tests_cint/ref.txt to ~5e-8 Ha)."""
    from ..ops.mdint import rhf_energy

    f = system.ref
    if f.type != "wfn":
        raise ValueError("MOLCALC HF needs a wavefunction reference field")
    return rhf_energy(f.wfn, block=block)
