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


def test_listatoms_sphcub_counts():
    """Sphere/cube atom selections match a brute-force image scan
    (reference listatoms_sphcub, src/crystalmod@proc.f90:1033)."""
    from critic2_tpu.crystal.fragment import listatoms_sphcub

    a = 5.0
    c = Crystal(m_x2c=np.diag([a, a, a]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("C", 6)])
    r = 7.3
    fr = listatoms_sphcub(c, rsph=r, xsph=(0.0, 0.0, 0.0))
    # brute force over a generous image range
    cnt = 0
    for i in range(-3, 4):
        for j in range(-3, 4):
            for k in range(-3, 4):
                for x in c.x_frac:
                    d = np.linalg.norm((np.asarray(x) + [i, j, k]) @ np.diag([a, a, a]))
                    cnt += d < r
    assert fr.n == cnt
    # all selected atoms are inside the sphere
    assert (np.linalg.norm(fr.x_cart, axis=1) < r).all()
    # cube: half-side h keeps |x|,|y|,|z| <= h
    h = 6.1
    frc = listatoms_sphcub(c, rcub=h, xcub=(0.0, 0.0, 0.0))
    assert (np.abs(frc.x_cart) <= h + 1e-12).all()
    nc = sum(1 for i in range(-3, 4) for j in range(-3, 4)
             for k in range(-3, 4) for x in c.x_frac
             if np.all(np.abs((np.asarray(x) + [i, j, k]) * a) <= h))
    assert frc.n == nc


def test_listatoms_cells_border():
    """ix supercell enumeration + border atoms (reference
    listatoms_cells, src/crystalmod@proc.f90:975)."""
    from critic2_tpu.crystal.fragment import listatoms_cells

    c = Crystal(m_x2c=np.diag([4.0, 4.0, 4.0]),
                x_frac=np.array([[0.0, 0.0, 0.0]]),
                species_of=np.array([0]), species=[Species("C", 6)])
    fr = listatoms_cells(c, (2, 2, 2), doborder=False)
    assert fr.n == 8
    # corner atom at origin: border adds every face/edge/corner copy
    # of the 2x2x2 block surface that sits within 0.01 of it
    frb = listatoms_cells(c, (2, 2, 2), doborder=True)
    assert frb.n == 27  # full 3x3x3 corner lattice of the supercell


def test_complete_molmotif():
    from critic2_tpu.crystal.fragment import (Fragment,
                                              complete_molmotif)

    c = _co2_crystal()
    # select only the boundary-crossing C2 atom
    fr = Fragment(crystal=c, at_idx=np.array([3]),
                  lvec=np.zeros((1, 3), dtype=int))
    full = complete_molmotif(c, fr)
    assert full.n == 3
    zs = sorted(full.z)
    assert zs == [6, 8, 8]
    # the completed molecule is geometrically whole (O-C-O span ~4.4 bohr)
    ext = np.linalg.norm(full.x_cart.max(0) - full.x_cart.min(0))
    assert ext < 5.0
