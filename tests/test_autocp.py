import numpy as np
import pytest

from critic2_tpu.analysis.autocp import Seed, autocp, gen_seeds, seed_ws
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.fields.grid3 import Grid3
from critic2_tpu.fields.field import Field
from critic2_tpu.system import System


def cosine_system(n=24, a=6.0):
    """f = cos(2pi x) + cos(2pi y) + cos(2pi z) on a cubic cell: known
    topology - 1 max, 3+3 saddles, 1 min, Poincare-Hopf = 0."""
    c = Crystal(m_x2c=np.eye(3) * a, x_frac=np.zeros((0, 3)),
                species_of=np.zeros(0, dtype=int), species=[])
    i, j, k = np.meshgrid(*[np.arange(n) / n] * 3, indexing="ij")
    f = np.cos(2 * np.pi * i) + np.cos(2 * np.pi * j) + np.cos(2 * np.pi * k)
    s = System(crystal=c)
    s.fields[0] = Field.from_grid(c, Grid3(__import__("jax.numpy", fromlist=["asarray"]).asarray(f)))
    s.iref = 0
    return s


def test_seed_ws_counts():
    c = Crystal(m_x2c=np.eye(3) * 4.0, x_frac=np.zeros((1, 3)),
                species_of=np.zeros(1, dtype=int), species=[Species("C", 6)])
    seeds = seed_ws(c, depth=1)
    assert len(seeds) > 500  # 24 tetrahedra x 75 seeds


def test_autocp_cosine_grid():
    s = cosine_system()
    cpl = autocp(s, seeds=[Seed(typ="ws", depth=1)])
    n, b, r, c = cpl.counts()
    assert (n, b, r, c) == (1, 3, 3, 1)
    assert cpl.poincare_hopf() == 0
    # positions: max at origin, min at body center
    maxima = [cp for cp in cpl.cps if cp.typ == -3]
    minima = [cp for cp in cpl.cps if cp.typ == 3]
    np.testing.assert_allclose(
        np.minimum(maxima[0].x, 1 - maxima[0].x), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(minima[0].x, [0.5, 0.5, 0.5], atol=1e-6)
    # CP values
    assert maxima[0].f == pytest.approx(3.0, abs=1e-3)
    assert minima[0].f == pytest.approx(-3.0, abs=1e-3)


@pytest.mark.slow
def test_autocp_nacl_promolecular():
    c = Crystal(
        m_x2c=np.eye(3) * 10.658,
        x_frac=np.array([
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.5, 0.5, 0.5], [0, 0, 0.5], [0, 0.5, 0], [0.5, 0, 0],
        ], dtype=float),
        species_of=np.array([0, 0, 0, 0, 1, 1, 1, 1]),
        species=[Species("Na", 11), Species("Cl", 17)],
    )
    s = System.from_structure(c)
    cpl = autocp(s, seeds=[Seed(typ="ws", depth=1), Seed(typ="pair")])
    n, b, r, cc = cpl.counts()
    assert n == 8  # all atoms are maxima
    assert cpl.poincare_hopf() == 0
    assert b >= 8 and r >= 8 and cc >= 1
    # every bcp gradient is tiny
    for cp in cpl.cps:
        assert cp.gfmod < 1e-10


def test_autocp_water_molecule():
    from critic2_tpu.crystal.seed import CrystalSeed

    cart = np.array([[0.0, 0.0, 0.22], [0.0, 1.43, -0.89], [0.0, -1.43, -0.89]])
    seed = CrystalSeed(
        x_frac=cart, species_of=np.array([0, 1, 1]),
        species=[Species("O", 8), Species("H", 1)], ismolecule=True,
    )
    s = System.from_structure(seed.to_crystal())
    cpl = autocp(s)  # default: pair seeds
    n, b, r, cc = cpl.counts()
    assert n == 3
    assert b == 2  # two O-H bonds
    # molecule PH: n - b + r - c = 1
    assert cpl.poincare_hopf() == 1


def test_autocp_clip_and_mesh_seed():
    """CLIP seed filtering (reference iclip, src/autocp@proc.f90:594-655)
    and the molecular-mesh seed strategy (styp_mesh :498)."""
    import numpy as np

    from critic2_tpu.analysis.autocp import Seed, autocp, critshell
    from critic2_tpu.crystal.seed import read_structure
    from critic2_tpu.system import System
    import os, tempfile

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "h2o.xyz"), "w") as fh:
        fh.write("3\nwater\nO 0.0 0.0 0.1173\nH 0.0 0.7572 -0.4692\n"
                 "H 0.0 -0.7572 -0.4692\n")
    s = System.from_structure(os.path.join(d, "h2o.xyz"), mol=True)
    cpl = autocp(s, seeds=[Seed(typ="mesh")])
    counts = cpl.counts()
    assert counts[0] == 3 and counts[1] >= 2    # nuclei + O-H bonds
    # clip to an empty cube -> no new CPs beyond the nuclei
    cpl2 = autocp(s, seeds=[Seed(typ="mesh")],
                  clip=("cube", [0.0, 0.0, 0.0], [0.01, 0.01, 0.01]))
    assert cpl2.counts()[1] == 0
    # shell distances are symmetric for the two equivalent O-H bond CPs
    dist, nneig, wcp = critshell(s, cpl, 3)
    bonds = [i for i, cp in enumerate(cpl.cps) if cp.typ == -1]
    if len(bonds) == 2:
        np.testing.assert_allclose(dist[bonds[0], 0], dist[bonds[1], 0],
                                   atol=1e-6)


def test_cpreport_long_verylong():
    """LONG expands the cell CP list by symmetry with op provenance;
    VERYLONG prints per-CP property blocks and the flatness
    (reference cp_long_report/cp_vlong_report,
    src/autocp@proc.f90:1567-1664)."""
    from critic2_tpu.analysis.autocp import (cell_cp_list, cp_long_report,
                                             cp_vlong_report)

    s = cosine_system()
    cpl = autocp(s, seeds=[Seed(typ="ws", depth=1)])
    cel = cell_cp_list(s, cpl)
    # cell list size = sum of multiplicities (1+3+3+1 = 8 for cosine)
    assert len(cel) == sum(cp.mult for cp in cpl.cps)
    # first image of every orbit is the identity op
    firsts = {}
    for ineq, x, op in cel:
        if ineq not in firsts:
            firsts[ineq] = op
            assert op == 0
            np.testing.assert_allclose(
                (np.asarray(x) - cpl.cps[ineq].x + 0.5) % 1.0 - 0.5,
                0.0, atol=1e-8)
    rep = cp_long_report(s, cpl)
    assert "Complete CP list" in rep and "connectivity" in rep
    assert len(rep.splitlines()) >= len(cel) + 4
    vrep = cp_vlong_report(s, cpl)
    assert "Flatness" in vrep
    assert "Hessian eigenvalues" in vrep
    for cp in cpl.cps:
        assert cp.name in vrep
