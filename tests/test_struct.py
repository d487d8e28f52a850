"""POWDER / RDF / COMPARE / writers / CIF / Hirshfeld."""
import numpy as np
import pytest

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.crystal.seed import read_structure
from critic2_tpu import param
from critic2_tpu.analysis.struct import compare, packing_ratio, powder, rdf
from critic2_tpu.analysis.hirshfeld import hirshfeld_charges
from critic2_tpu.io import writers


def _nacl(a_ang=5.6402):
    a = a_ang * param.ANGSTROM_TO_BOHR
    # rocksalt conventional cell
    base = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    na = base
    cl = (base + [.5, .5, .5]) % 1.0
    return Crystal(m_x2c=m_x2c_from_cellpar([a, a, a], [90, 90, 90]),
                   x_frac=np.vstack([na, cl]),
                   species_of=np.array([0] * 4 + [1] * 4),
                   species=[Species("Na", 11), Species("Cl", 17)])


def test_powder_nacl_peaks():
    pat = powder(_nacl(), th2ini=10, th2end=60, npts=2001)
    assert pat.ih.max() == pytest.approx(100.0)
    # strongest peak: (200) at 2theta = 31.7 deg for CuKa
    imax = pat.peaks_i.argmax()
    assert abs(pat.peaks_t[imax] - 31.70) < 0.1
    # (111) reflection near 27.37
    assert np.min(np.abs(pat.peaks_t - 27.37)) < 0.1


def test_rdf_first_shell():
    pat = rdf(_nacl(), rend=12.0, npts=2001)
    a = 5.6402 * param.ANGSTROM_TO_BOHR
    # nearest-neighbor Na-Cl distance a/2
    peaks = pat.t[1:-1][(pat.ih[1:-1] > pat.ih[:-2])
                        & (pat.ih[1:-1] > pat.ih[2:])]
    assert np.min(np.abs(peaks - a / 2)) < 0.05


def test_compare_same_vs_strained():
    c1 = _nacl()
    c2 = _nacl()
    c3 = _nacl(a_ang=6.2)
    d = compare([c1, c2, c3], th2ini=10, th2end=60, npts=2001)
    assert d[0, 1] < 1e-8           # identical structures
    assert d[0, 2] > 0.1            # strained lattice differs
    assert np.allclose(d, d.T)


def test_writers_roundtrip(tmp_path):
    c = _nacl()
    p = tmp_path / "out.vasp"
    writers.write_poscar(c, str(p))
    c2 = read_structure(str(p))
    assert abs(c2.volume - c.volume) < 1e-6
    assert c2.ncel == 8

    pc = tmp_path / "out.cif"
    writers.write_cif(c, str(pc))
    c3 = read_structure(str(pc))
    assert abs(c3.volume - c.volume) < 1e-4
    assert c3.ncel == 8

    px = tmp_path / "out.xyz"
    writers.write_xyz(c, str(px))
    assert px.read_text().splitlines()[0] == "8"


def test_cif_with_symops(tmp_path):
    # NaCl with symmetry-generated sites
    cif = """data_nacl
_cell_length_a 5.6402
_cell_length_b 5.6402
_cell_length_c 5.6402
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_symmetry_equiv_pos_as_xyz
'x,y,z'
'x,y+1/2,z+1/2'
'x+1/2,y,z+1/2'
'x+1/2,y+1/2,z'
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Na1 0.0 0.0 0.0
Cl1 0.5 0.5 0.5
"""
    p = tmp_path / "nacl.cif"
    p.write_text(cif)
    c = read_structure(str(p))
    assert c.ncel == 8
    zs = sorted(c.zatoms)
    assert zs == [11, 11, 11, 11, 17, 17, 17, 17]


def test_cif_messy(tmp_path):
    """ciftbx-coverage behaviors (reference src/ciftbx/ + read_cif,
    src/crystalseedmod@proc.f90): multiple data blocks, H-M-symbol-only
    symmetry via the spgs DB, '?'/'.' unknowns, uncertainty suffixes,
    semicolon text fields, label-only species."""
    from critic2_tpu.io.cif import read_cif

    cif = """data_publication
_journal_name 'Acta Mess.'
_publ_author_name
;
 A. Author
;
data_NaCl
_cell_length_a 5.6402(12)
_cell_length_b 5.6402(12)
_cell_length_c 5.6402(12)
_cell_angle_alpha 90
_cell_angle_beta 90.0
_cell_angle_gamma 90
_symmetry_space_group_name_H-M 'F m -3 m'
_chemical_formula_sum ?
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
_atom_site_occupancy
Na1 ? 0.0 0.0 0.0 1.0
Cl1 Cl 0.5 0.5 0.5 1.0
X9 ? ? ? ? 0.0
"""
    p = tmp_path / "messy.cif"
    p.write_text(cif)
    seed = read_cif(str(p))               # first block WITH a cell
    assert len(seed.x_frac) == 8          # Fm-3m expands 2 sites to 8
    assert sorted(s.z for s in seed.species) == [11, 17]
    seed2 = read_cif(str(p), block="NaCl")  # by-name selection
    assert len(seed2.x_frac) == 8
    with pytest.raises(ValueError):
        read_cif(str(p), block="absent")


def test_cif_mmcif_dialect(tmp_path):
    """mmCIF-style dotted tag names fold onto the classic underscore
    form, and a 'data_' line inside a semicolon text field must not
    split the block (ciftbx treats text fields as opaque values)."""
    from critic2_tpu.io.cif import read_cif

    cif = """data_block1
_struct.title
;
 notes: this text mentions
data_fake and loop_ markers
;
_cell.length_a 4.0
_cell.length_b 4.0
_cell.length_c 4.0
_cell.angle_alpha 90
_cell.angle_beta 90
_cell.angle_gamma 90
loop_
_atom_site.label
_atom_site.type_symbol
_atom_site.fract_x
_atom_site.fract_y
_atom_site.fract_z
PO1 O2- 0.0 0.0 0.0
"""
    p = tmp_path / "mm.cif"
    p.write_text(cif)
    seed = read_cif(str(p))
    assert len(seed.x_frac) == 1
    assert seed.species[seed.species_of[0]].z == 8      # 'O2-' -> O


def test_cif_ita_number_fallback(tmp_path):
    from critic2_tpu.io.cif import read_cif

    cif = """data_x
_cell_length_a 5.0
_cell_length_b 5.0
_cell_length_c 5.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
_space_group_IT_number 229
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Fe1 0.0 0.0 0.0
"""
    p = tmp_path / "im3m.cif"
    p.write_text(cif)
    seed = read_cif(str(p))
    assert len(seed.x_frac) == 2          # Im-3m body-centering


def test_packing_ratio():
    assert 0 < packing_ratio(_nacl()) < 100


def test_hirshfeld_nacl():
    # shift atoms off the grid nodes so no node samples a nuclear cusp
    c0 = _nacl(a_ang=5.6402)
    c = Crystal(m_x2c=c0.m_x2c, x_frac=(c0.x_frac + 0.013) % 1.0,
                species_of=c0.species_of, species=c0.species)
    s = System.from_structure(c)
    from critic2_tpu.analysis.integration import _rasterize_field
    from critic2_tpu.fields.field import Field
    from critic2_tpu.fields.grid3 import Grid3

    # 8^3 keeps the assertions exact (partition of unity and the
    # symmetry equalities hold on any grid) at 1/8 the 16^3 wall
    g = _rasterize_field(s.fields[0], (8, 8, 8))
    s.load_field(Field.from_grid(s.crystal, Grid3(g)))
    res = hirshfeld_charges(s)
    # partition of unity: populations sum exactly to the grid integral
    assert abs(res.pops.sum() - float(np.asarray(g).sum())
               * s.crystal.volume / np.asarray(g).size) < 1e-8
    # symmetry: all Na alike, all Cl alike; Cl basin holds more
    np.testing.assert_allclose(res.pops[:4], res.pops[0], rtol=1e-6)
    np.testing.assert_allclose(res.pops[4:], res.pops[4], rtol=1e-6)
    assert res.pops[4] > res.pops[0] > 0


def test_bincube_siesta_roundtrip(tmp_path):
    import jax.numpy as jnp
    from critic2_tpu.fields.grid3 import Grid3

    c = _nacl()
    g = Grid3(jnp.asarray(np.random.default_rng(0).random((6, 5, 4))))
    p = tmp_path / "f.bincube"
    g.write_bincube(str(p), crystal=c)
    g2 = Grid3.read_bincube(str(p))
    np.testing.assert_array_equal(np.asarray(g2.f), np.asarray(g.f))

    ps = tmp_path / "f.RHO"
    with open(ps, "wb") as fh:
        def rec(raw):
            fh.write(np.int32(len(raw)).tobytes())
            fh.write(raw)
            fh.write(np.int32(len(raw)).tobytes())
        rec(np.eye(3).tobytes())
        rec(np.asarray([6, 5, 4, 1], np.int32).tobytes())
        f = np.asarray(g.f)
        for iz in range(4):
            for iy in range(5):
                rec(f[:, iy, iz].astype(np.float32).tobytes())
    g3 = Grid3.read_siesta(str(ps))
    np.testing.assert_allclose(np.asarray(g3.f), np.asarray(g.f),
                               atol=1e-6)


def test_compare_molecules_rmsd():
    """Molecular COMPARE uses least-RMSD superposition (reference
    struct_compare molecules branch,
    src/struct_drivers@proc.f90:1267-1284)."""
    from critic2_tpu.analysis.struct import compare
    from critic2_tpu.crystal.crystal import Crystal, Species

    def mol(coords):
        coords = np.asarray(coords, dtype=float)
        return Crystal(m_x2c=np.diag([30.0] * 3),
                       x_frac=(coords + 15.0) / 30.0,
                       species_of=np.arange(len(coords)) % 2,
                       species=[Species("O", 8), Species("H", 1)],
                       ismolecule=True)

    a = [[0, 0, 0], [0, 0, 1.8], [0, 1.7, -0.5], [1.2, 0, -0.6]]
    th = 0.9
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    b = (np.asarray(a) @ R.T) + [2.0, 1.0, -1.0]
    d = compare([mol(a), mol(b)])
    assert d[0, 1] < 1e-8
    c = np.asarray(a) + [[0, 0, 0], [0, 0, 0.3], [0, 0, 0], [0, 0, 0]]
    d2 = compare([mol(a), mol(c)])
    assert 0.05 < d2[0, 1] < 0.3


def test_new_writers(tmp_path):
    """abinit/elk/GULP/LAMMPS/DFTB-gen writers (reference write_abinit/
    write_elk/write_gulp/write_lammps, src/crystalmod.f90:546-590); the
    .gen output round-trips through the dftb-gen reader."""
    import os

    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.crystal.seed import read_structure
    from critic2_tpu.io.writers import write_structure

    c = Crystal(m_x2c=np.diag([6.0, 7.0, 8.0]),
                x_frac=np.array([[0, 0, 0], [0.5, 0.5, 0.5]],
                                dtype=float),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    for fn, marker in (("s.abin", "acell"), ("s.elk.in", "avec"),
                       ("s.gin", "fractional"), ("s.lammps", "Masses")):
        p = os.path.join(tmp_path, fn)
        write_structure(c, p)
        assert marker in open(p).read()
    # gen round-trip
    p = os.path.join(tmp_path, "s.gen")
    write_structure(c, p)
    c2 = read_structure(p)
    assert c2.ncel == 2
    np.testing.assert_allclose(np.asarray(c2.m_x2c),
                               np.asarray(c.m_x2c), atol=1e-8)
    np.testing.assert_allclose(np.sort(np.asarray(c2.x_frac), axis=0),
                               np.sort(np.asarray(c.x_frac), axis=0),
                               atol=1e-8)


def test_round2_writers(tmp_path):
    """d12/escher/db/tessel/siesta fdf+STRUCT_IN/dftbp hsd/3dmodel
    writers (reference write_d12/write_escher/write_db/write_tessel/
    write_siesta_fdf/write_siesta_in/write_dftbp_hsd/write_3dmodel,
    src/crystalmod.f90:179-201); STRUCT_IN round-trips through the
    siesta reader."""
    import os

    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.crystal.seed import read_structure
    from critic2_tpu.io.writers import write_structure

    c = Crystal(m_x2c=np.diag([6.0, 7.0, 8.0]),
                x_frac=np.array([[0, 0, 0], [0.5, 0.5, 0.5]],
                                dtype=float),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    for fn, marker in (("s.d12", "CRYSTAL"), ("s.m", "cr.ztyp"),
                       ("s.db", "crystal_energy"),
                       ("s.tess", "endsymmatrix"),
                       ("s.fdf", "Chemical_Species_Label"),
                       ("s.hsd", "HubbardDerivs")):
        p = os.path.join(tmp_path, fn)
        write_structure(c, p)
        assert marker in open(p).read(), fn
    # d12 orthorhombic: 3 cell parameters on the cell line
    d12 = open(os.path.join(tmp_path, "s.d12")).read().splitlines()
    ncellpar = len(d12[4].split())
    assert ncellpar == 3          # orthorhombic holohedry (Pmmm-class)
    # STRUCT_IN round-trip
    p = os.path.join(tmp_path, "s.STRUCT_IN")
    write_structure(c, p)
    c2 = read_structure(p)
    assert c2.ncel == 2
    np.testing.assert_allclose(np.asarray(c2.m_x2c),
                               np.asarray(c.m_x2c), atol=1e-8)
    # 3dmodel scene
    p = os.path.join(tmp_path, "s.obj")
    write_structure(c, p)
    txt = open(p).read()
    assert txt.count("v ") > 20 and "f " in txt


def test_cif_dictionary_validation(tmp_path):
    """validate_cif checks tags and numb-typed values against the core
    dictionary extracted from the reference's dat/cif/cif_core.dic
    (the ciftbx dict_ role, src/ciftbx/)."""
    from critic2_tpu.io.cif import validate_cif

    clean = """data_NaCl
_cell_length_a 5.6402(12)
_cell_length_b 5.6402
_cell_length_c 5.6402
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
_symmetry_space_group_name_H-M 'F m -3 m'
loop_
_atom_site_label
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
Na 0 0 0
Cl 0.5 0.5 0.5
"""
    p = tmp_path / "clean.cif"
    p.write_text(clean)
    assert validate_cif(str(p)) == []

    messy = """data_bad
_cell_length_a abc
_my_private_tag 1.0
loop_
_atom_site_label
_atom_site_fract_x
Na xyz
"""
    p2 = tmp_path / "messy.cif"
    p2.write_text(messy)
    warns = validate_cif(str(p2))
    assert any("non-numeric value 'abc'" in w for w in warns)
    assert any("non-numeric value 'xyz'" in w for w in warns)
    assert any("_my_private_tag" in w and "not in the CIF core" in w
               for w in warns)
    # exactly the three problems, nothing spurious
    assert len(warns) == 3
