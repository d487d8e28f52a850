"""Fragments (atom subsets with lattice translations) and molecule
identification from covalent connectivity.

Role of the reference fragmentmod (src/fragmentmod.f90: fragment type
with merge/append) and crystalmod's listmolecules
(src/crystalmod@proc.f90, built on the covalent asterisms): walk the
bond graph with periodic image vectors, collect each connected
component as a fragment whose atoms carry the lattice translation that
makes the molecule whole, and report whether the full crystal is a
molecular crystal (no component connects to its own translate)."""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np

__all__ = ["Fragment", "list_molecules"]


@dataclass
class Fragment:
    """A set of (cell atom, lattice vector) sites of a crystal."""

    crystal: object
    at_idx: np.ndarray           # (n,) cell-atom indices
    lvec: np.ndarray             # (n, 3) integer lattice translations
    discrete: bool = True        # False if it connects to its translate

    @property
    def n(self):
        return len(self.at_idx)

    @property
    def x_frac(self):
        return np.asarray(self.crystal.x_frac)[self.at_idx] + self.lvec

    @property
    def x_cart(self):
        return self.x_frac @ np.asarray(self.crystal.m_x2c).T

    @property
    def z(self):
        zs = np.asarray(self.crystal.zatoms)
        return zs[self.at_idx]

    def centroid_cart(self):
        return self.x_cart.mean(axis=0)

    def append(self, other: "Fragment") -> "Fragment":
        """Concatenate two fragments, dropping duplicate sites
        (reference fragment merge/append, src/fragmentmod.f90)."""
        keys = {(int(a), tuple(int(v) for v in l))
                for a, l in zip(self.at_idx, self.lvec)}
        idx = list(self.at_idx)
        lv = list(map(tuple, self.lvec))
        for a, l in zip(other.at_idx, other.lvec):
            k = (int(a), tuple(int(v) for v in l))
            if k not in keys:
                keys.add(k)
                idx.append(int(a))
                lv.append(k[1])
        return Fragment(crystal=self.crystal,
                        at_idx=np.asarray(idx, dtype=int),
                        lvec=np.asarray(lv, dtype=int),
                        discrete=self.discrete and other.discrete)

    @classmethod
    def merge(cls, frags) -> "Fragment":
        out = frags[0]
        for f in frags[1:]:
            out = out.append(f)
        return out


def list_molecules(crystal, bondfactor: float = 1.4):
    """Connected molecular fragments of a crystal (reference
    listmolecules / fill_molecular_fragments). Returns
    (fragments, ismolecular): each fragment's lvec places its atoms so
    the molecule is geometrically whole; `discrete` is False for
    components that bond to their own periodic translate (polymeric /
    framework directions), and ismolecular is True only when every
    component is discrete."""
    n = crystal.ncel
    adj = [[] for _ in range(n)]
    for i, j, lvec in crystal.bonds(bondfactor):
        adj[i].append((j, np.asarray(lvec, dtype=int)))

    assigned = np.full(n, -1, dtype=int)
    frags = []
    for start in range(n):
        if assigned[start] >= 0:
            continue
        comp = {start: np.zeros(3, dtype=int)}
        stack = [start]
        discrete = True
        while stack:
            a = stack.pop()
            la = comp[a]
            for b, lv in adj[a]:
                lb = la + lv
                if b in comp:
                    if not np.array_equal(comp[b], lb):
                        # bonds back to its own translate: periodic chain
                        discrete = False
                else:
                    comp[b] = lb
                    stack.append(b)
        idx = np.asarray(sorted(comp), dtype=int)
        lv = np.asarray([comp[i] for i in idx], dtype=int)
        for i in idx:
            assigned[i] = len(frags)
        frags.append(Fragment(crystal=crystal, at_idx=idx, lvec=lv,
                              discrete=discrete))
    ismolecular = all(f.discrete for f in frags) and len(frags) > 0
    return frags, ismolecular
