"""Fragments and molecule identification (reference fragmentmod +
listmolecules)."""
import numpy as np

from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.crystal.fragment import Fragment, list_molecules


def _co2_crystal():
    # two CO2 molecules in a big cell, one crossing the cell boundary
    a = 20.0
    xf = np.array([
        [0.50, 0.50, 0.50],            # C1
        [0.50, 0.50, 0.61],            # O
        [0.50, 0.50, 0.39],            # O
        [0.98, 0.20, 0.20],            # C2 near boundary
        [0.09, 0.20, 0.20],            # O (wraps through x=1)
        [0.87, 0.20, 0.20],            # O
    ])
    return Crystal(m_x2c=np.diag([a, a, a]), x_frac=xf,
                   species_of=np.array([0, 1, 1, 0, 1, 1]),
                   species=[Species("C", 6), Species("O", 8)])


def test_list_molecules_two_co2():
    c = _co2_crystal()
    frags, ismol = list_molecules(c)
    assert ismol and len(frags) == 2
    for f in frags:
        assert f.n == 3 and sorted(f.z) == [6, 8, 8]
        # geometrically whole: O-C-O spans ~4.4 bohr, not a cell width
        ext = np.linalg.norm(f.x_cart - f.x_cart.mean(0), axis=1).max()
        assert ext < 4.0


def test_polymer_not_discrete():
    # infinite chain along x: atoms bond to their own translates
    a = 2.6
    c = Crystal(m_x2c=np.diag([a, 15.0, 15.0]),
                x_frac=np.array([[0.0, 0.5, 0.5]]),
                species_of=np.array([0]), species=[Species("C", 6)])
    frags, ismol = list_molecules(c)
    assert not ismol and not frags[0].discrete


def test_fragment_append_dedupes():
    c = _co2_crystal()
    frags, _ = list_molecules(c)
    merged = frags[0].append(frags[0]).append(frags[1])
    assert merged.n == 6
    both = Fragment.merge(frags)
    assert both.n == 6
