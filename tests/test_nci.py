"""NCIPLOT: RDG math, box logic, cutoffs, file outputs."""
import numpy as np
import pytest

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.nci import nciplot, _CONST


@pytest.fixture(scope="module")
def mol_system():
    # an H2 'dimer' molecule: two atoms 1.4 bohr apart
    c = Crystal(m_x2c=m_x2c_from_cellpar([20.0, 20.0, 20.0], [90, 90, 90]),
                x_frac=np.array([[0.46, 0.5, 0.5], [0.54, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("H", 1)],
                ismolecule=True)
    return System.from_structure(c)


def test_nci_promolecular_molecule(mol_system, tmp_path):
    res = nciplot(mol_system, nstep=(24, 20, 20), write_files=True,
                  outdir=str(tmp_path), oname="h2")
    # RDG is positive, and the dat scatter is within the cutoffs
    assert res.cgrad_raw.min() >= 0
    assert len(res.dat) > 0
    assert (res.dat[:, 1] < 2.0 + 1e-12).all()
    assert (np.abs(res.dat[:, 0]) < 0.2 + 1e-12).all()
    # between two closed-shell H atoms there is a low-rho low-RDG region
    assert res.dat[:, 1].min() < 0.7
    import os
    for fn in res.files:
        assert os.path.exists(fn)
    # cube roundtrip: our own reader parses the cube we wrote
    from critic2_tpu.fields.grid3 import Grid3
    g = Grid3.read_cube(os.path.join(tmp_path, "h2-dens.cube"))
    np.testing.assert_allclose(np.asarray(g.f),
                               res.crho, rtol=2e-4, atol=2e-4)


def test_nci_rdg_formula(mol_system):
    # spot-check RDG against a direct promolecular evaluation
    res = nciplot(mol_system, nstep=(12, 10, 10))
    s = mol_system
    i, j, k = 6, 5, 5
    x = res.x0 + res.xmat @ np.array([i, j, k], dtype=float)
    out = s.ref.grd(x[None, :])
    rho = float(out.f[0])
    rdg = float(out.gfmod[0]) / (_CONST * max(rho, 1e-40) ** (4 / 3))
    assert abs(res.cgrad_raw[i, j, k] - rdg) < 1e-10
    assert abs(abs(res.crho[i, j, k]) / 100.0 - rho) < 1e-12


def test_nci_periodic_box():
    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0, 8.0, 8.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0]]),
                species_of=np.array([0]), species=[Species("Ne", 10)])
    s = System.from_structure(c)
    res = nciplot(s, xinc=0.5)
    assert res.crho.shape == (16, 16, 16)
    # sign(lambda2)*rho is negative at the density peak (all eigs < 0)
    assert res.crho[0, 0, 0] < 0


def test_nci_cell_xyz_and_molmotif(tmp_path):
    """_cell.xyz geometry emission + MOLMOTIF molecule completion
    (reference src/nci@proc.f90:625-668)."""
    from critic2_tpu.analysis.nci import nciplot
    from critic2_tpu.crystal.library import load_library_entry
    from critic2_tpu.system import System

    c = load_library_entry("benzene").to_crystal()
    s = System.from_structure(c)
    nciplot(s, nstep=(10, 10, 10), write_files=True, oname="p",
            outdir=str(tmp_path))
    n_plain = int((tmp_path / "p_cell.xyz").read_text().split("\n")[0])
    nciplot(s, nstep=(10, 10, 10), write_files=True, oname="m",
            outdir=str(tmp_path), molmotif=True)
    n_mot = int((tmp_path / "m_cell.xyz").read_text().split("\n")[0])
    assert n_mot >= n_plain > 0
    assert n_mot % 12 == 0          # whole benzene molecules only
