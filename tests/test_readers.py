"""Structure/grid reader breadth: SHELX, QE pw.x in/out, DFTB+ gen,
abinit binary header + _DEN (reference crystalseedmod readers,
src/crystalseedmod.f90:62-96, and abinit_private hdr_io)."""
import numpy as np
import pytest

from critic2_tpu.crystal.seed import (read_shelx, read_qe_in, read_qe_out,
                                      read_dftb_gen, read_structure,
                                      detect_format)
from critic2_tpu import param


SHELX_NACL = """TITL NaCl
CELL 0.71073 5.64 5.64 5.64 90 90 90
ZERR 4 0.001 0.001 0.001 0 0 0
LATT 4
SFAC NA CL
UNIT 4 4
NA1 1 0.0 0.0 0.0
CL1 2 0.5 0.5 0.5
END
"""

QE_IN = """&control
 calculation='scf'
/
&system
 ibrav=0, nat=2, ntyp=2,
/
CELL_PARAMETERS bohr
 10.66 0.0 0.0
 0.0 10.66 0.0
 0.0 0.0 10.66
ATOMIC_SPECIES
 Na 22.99 Na.UPF
 Cl 35.45 Cl.UPF
ATOMIC_POSITIONS crystal
 Na 0.0 0.0 0.0
 Cl 0.5 0.5 0.5
"""

QE_OUT = """     Program PWSCF
     lattice parameter (alat)  =      10.6600  a.u.
     crystal axes: (cart. coord. in units of alat)
               a(1) = (   1.000000   0.000000   0.000000 )
               a(2) = (   0.000000   1.000000   0.000000 )
               a(3) = (   0.000000   0.000000   1.000000 )

     site n.     atom                  positions (alat units)
         1        Na  tau(   1) = (   0.0000000   0.0000000   0.0000000  )
         2        Cl  tau(   2) = (   0.5000000   0.5000000   0.5000000  )
"""

DFTB_GEN = """2 S
Na Cl
1 1 0.0 0.0 0.0
2 2 2.82 2.82 2.82
0.0 0.0 0.0
5.64 0.0 0.0
0.0 5.64 0.0
0.0 0.0 5.64
"""


def test_shelx(tmp_path):
    p = tmp_path / "nacl.res"
    p.write_text(SHELX_NACL)
    assert detect_format(str(p)) == "shelx"
    c = read_structure(str(p))
    # F-centering x 2 sites = 8 atoms; rock salt
    assert c.ncel == 8
    zs = sorted(c.zatoms)
    assert zs == [11] * 4 + [17] * 4
    a = 5.64 * param.ANGSTROM_TO_BOHR
    assert c.volume == pytest.approx(a ** 3, rel=1e-10)
    # nearest Na-Cl distance = a/2
    d = c.distance([0, 0, 0], [0.5, 0.0, 0.0])
    assert d == pytest.approx(a / 2, rel=1e-10)


def test_qe_in(tmp_path):
    p = tmp_path / "nacl.in"
    p.write_text(QE_IN)
    c = read_structure(str(p))
    assert c.ncel == 2
    assert c.volume == pytest.approx(10.66 ** 3, rel=1e-10)
    assert sorted(c.zatoms) == [11, 17]


def test_qe_in_ibrav2(tmp_path):
    p = tmp_path / "si.in"
    p.write_text("""&system
 ibrav=2, celldm(1)=10.2, nat=2, ntyp=1
/
ATOMIC_POSITIONS crystal
 Si 0.0 0.0 0.0
 Si 0.25 0.25 0.25
""")
    c = read_structure(str(p))
    assert c.volume == pytest.approx(10.2 ** 3 / 4, rel=1e-10)


def test_qe_out(tmp_path):
    p = tmp_path / "nacl.out"
    p.write_text(QE_OUT)
    c = read_structure(str(p))
    assert c.ncel == 2
    assert c.volume == pytest.approx(10.66 ** 3, rel=1e-6)
    d = c.distance([0, 0, 0], [0.5, 0.5, 0.5])
    assert d == pytest.approx(10.66 * np.sqrt(3) / 2, rel=1e-6)


def test_dftb_gen(tmp_path):
    p = tmp_path / "nacl.gen"
    p.write_text(DFTB_GEN)
    c = read_structure(str(p))
    assert c.ncel == 2
    a = 5.64 * param.ANGSTROM_TO_BOHR
    assert c.volume == pytest.approx(a ** 3, rel=1e-9)
    np.testing.assert_allclose(c.x_frac[1], [0.5, 0.5, 0.5], atol=1e-9)


# ------------------------------------------------------------------- abinit

def _write_abinit_den(path, rprimd, xred, znucl, typat, ngfft, grid,
                      headform=80):
    """Synthetic abinit _DEN with a modern (headform>=80) header."""
    from critic2_tpu.fields.qe import FortranFile

    natom = len(xred)
    ntypat = len(znucl)
    nkpt, nsym, npsp, nsppol, mband = 1, 1, ntypat, 1, 4
    bantot = mband * nkpt * nsppol
    with FortranFile(str(path), "wb") as fh:
        fh.write_record(b"10.0.0  ", np.int32(headform), np.int32(52))
        fh.write_record(
            np.array([bantot, 20260101, 0, 1, natom] + list(ngfft)
                     + [nkpt, 1, 1, nsppol, nsym, npsp, ntypat, 1, 0, 0],
                     np.int32),
            np.zeros(4), np.zeros(3),
            np.asarray(rprimd, float).flatten(order="F"),
            np.zeros(3), np.int32(0), np.array([1, 1, mband], np.int32))
        fh.write_record(
            np.ones(nkpt, np.int32),                    # istwfk
            np.full(nkpt * nsppol, mband, np.int32),    # nband
            np.full(nkpt, 100, np.int32),               # npwarr
            np.ones(npsp, np.int32),                    # so_psp
            np.ones(nsym, np.int32),                    # symafm
            np.eye(3, dtype=np.int32).reshape(-1),      # symrel
            np.asarray(typat, np.int32),
            np.zeros(3 * nkpt),                         # kptns
            np.zeros(mband * nkpt * nsppol),            # occ3d
            np.zeros(3 * nsym),                         # tnons
            np.asarray(znucl, float),
            np.ones(nkpt))                              # wtk
        fh.write_record(np.zeros(1),
                        np.asarray(xred, float).reshape(-1),
                        np.array([-10.0, -0.1]),        # etot, fermie
                        np.ones(ntypat) * 20.0)         # amu
        fh.write_record(np.zeros(5), np.zeros(9, np.int32),
                        np.zeros(9, np.int32), np.zeros(3), np.zeros(3))
        for _ in range(npsp):
            fh.write_record(b" " * 132, np.zeros(2),
                            np.zeros(5, np.int32), b"0" * 32)
        fh.write_record(np.asarray(grid, float).flatten(order="F"))


def test_abinit_den(tmp_path):
    rng = np.random.default_rng(0)
    ngfft = (6, 8, 10)
    grid = rng.random(ngfft)
    rprimd = np.diag([10.0, 11.0, 12.0])
    xred = [[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]
    p = tmp_path / "nacl_DEN"
    _write_abinit_den(p, rprimd, xred, [11.0, 17.0], [1, 2], ngfft, grid)

    assert detect_format(str(p)) == "abinit"
    c = read_structure(str(p))
    assert c.ncel == 2
    assert c.volume == pytest.approx(10.0 * 11.0 * 12.0)
    assert sorted(c.zatoms) == [11, 17]

    from critic2_tpu.fields.grid3 import Grid3, detect_grid_format

    assert detect_grid_format(str(p)) == "abinit"
    g = Grid3.from_file(str(p))
    assert tuple(g.n) == ngfft
    np.testing.assert_allclose(np.asarray(g.f), grid, atol=0)


def test_abinit_cli_roundtrip(tmp_path):
    """CRYSTAL + LOAD of an abinit _DEN through the REPL."""
    import io
    from critic2_tpu.cli import Repl

    ngfft = (6, 6, 6)
    i = np.arange(6) / 6
    grid = (np.cos(2 * np.pi * i)[:, None, None]
            + np.cos(2 * np.pi * i)[None, :, None]
            + np.cos(2 * np.pi * i)[None, None, :] + 3.01)
    p = tmp_path / "o_DEN"
    _write_abinit_den(p, np.eye(3) * 8.0, [[0.0, 0.0, 0.0]], [8.0], [1],
                      ngfft, grid)
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    r.run_script(f"crystal {p}\nload {p}\n")
    assert r.sy.field(1).type == "grid"
    assert tuple(r.sy.field(1).grid.n) == ngfft


def test_parse_crystal_env_inline():
    """Inline CRYSTAL/MOLECULE environments (reference parse_crystal_env
    / parse_molecule_env, src/crystalseedmod@proc.f90:40-460): CELL+NEQ,
    SPG orbit expansion, SYMM triplets, and molecular input."""
    import numpy as np
    from critic2_tpu.crystal.seed import parse_crystal_env

    # CELL + SPG expands NaCl representatives to the 8-atom cell
    txt = """ cell 10.658 10.658 10.658 90 90 90
 spg f m -3 m
 neq 0. 0. 0. na
 neq 0.5 0.5 0.5 cl
endcrystal"""
    seed = parse_crystal_env(iter(txt.splitlines()))
    assert len(seed.x_frac) == 8
    c = seed.to_crystal()
    assert c.spacegroup.nops == 192
    zs = sorted(c.species[s].z for s in c.species_of)
    assert zs == [11] * 4 + [17] * 4

    # SYMM Jones-faithful triplet expansion
    txt2 = """ cell 8 8 8 90 90 90
 symm -x,-y,z
 symm -x,y,-z
 C 0.1 0.2 0.3
end"""
    # SYMM lines are a complete operator list (CIF-style), applied as
    # given (the reference stores sline and expands once per op, no
    # group closure — that is find_symmetry's job)
    s2 = parse_crystal_env(iter(txt2.splitlines()))
    assert len(s2.x_frac) == 3
    got = {tuple(np.round(x, 6)) for x in s2.x_frac}
    assert (0.9, 0.8, 0.3) in got and (0.9, 0.2, 0.7) in got

    # CARTESIAN frame + angstrom atom coords
    txt3 = """ cartesian
 bohr
 8 0 0
 0 8 0
 0 0 8
 endcartesian
 He 4.0 4.0 4.0 bohr
endcrystal"""
    s3 = parse_crystal_env(iter(txt3.splitlines()))
    np.testing.assert_allclose(s3.x_frac[0], [0.5, 0.5, 0.5], atol=1e-12)

    # molecule: coordinates in angstrom by default
    txtm = """ O 0.0 0.0 0.1173
 H 0.0 0.7572 -0.4692
 H 0.0 -0.7572 -0.4692
endmolecule"""
    sm = parse_crystal_env(iter(txtm.splitlines()), mol=True)
    assert sm.ismolecule and len(sm.x_frac) == 3
    d = np.linalg.norm(sm.x_frac[1] - sm.x_frac[0])
    assert abs(d - 0.9578 * 1.8897261246) < 1e-3


def test_structure_library():
    """CRYSTAL/MOLECULE LIBRARY entries (reference dat/lib/*.dat +
    read_library): every shipped entry must parse; spot-check MgO and
    wurtzite (quoted '1/3' fractional tokens)."""
    import numpy as np
    from critic2_tpu.crystal.library import (library_entries,
                                             load_library_entry)

    for e in library_entries(mol=False):
        s = load_library_entry(e[0], mol=False)
        assert len(s.x_frac) >= 1, e
    mgo = load_library_entry("mgo").to_crystal()
    assert mgo.ncel == 8
    b4 = load_library_entry("zincite").to_crystal()
    assert b4.ncel == 4          # wurtzite: 2 Zn + 2 O
    bz = load_library_entry("benzene", mol=True)
    assert bz.ismolecule and len(bz.x_frac) == 12


# ---------------------------------------------------------------------------
# round-2 reader breadth: bincube, pwc, siesta STRUCT, axsf, CRYSTAL out,
# gaussian log (reference read_bincube/read_pwc/read_siesta/read_axsf/
# read_crystalout, src/crystalseedmod@proc.f90)
# ---------------------------------------------------------------------------

def test_bincube_roundtrip(tmp_path):
    import jax.numpy as jnp

    from critic2_tpu.crystal.cell import m_x2c_from_cellpar
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.fields.grid3 import Grid3

    m = m_x2c_from_cellpar([10.0, 11.0, 12.0], [90.0, 80.0, 95.0])
    c = Crystal(m_x2c=m,
                x_frac=np.array([[0.0, 0.0, 0.0], [0.4, 0.5, 0.6]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    g = Grid3(jnp.asarray(np.arange(24.0).reshape(2, 3, 4)))
    p = tmp_path / "t.bincube"
    g.write_bincube(str(p), crystal=c)

    g2 = Grid3.read_bincube(str(p))
    np.testing.assert_allclose(np.asarray(g2.f), np.asarray(g.f))

    c2 = read_structure(str(p))
    np.testing.assert_allclose(np.asarray(c2.m_x2c), m, atol=1e-12)
    d = np.asarray(c2.x_frac) - np.asarray(c.x_frac)
    d -= np.round(d)
    assert np.abs(d).max() < 1e-12
    assert [sp.z for sp in c2.species] == [11, 17]


def test_pwc_structure(tmp_path):
    from critic2_tpu.fields.qe import FortranFile
    from critic2_tpu.crystal.seed import read_pwc_structure

    at = np.array([[10.0, 0, 0], [0, 12.0, 0], [0, 0, 14.0]]).T
    tau = np.array([[0.0, 0.0, 0.0], [5.0, 6.0, 7.0]]).T   # (3, nat) cart
    p = tmp_path / "t.pwc"
    with FortranFile(str(p), "wb") as fh:
        fh.write_record(np.int32(2))
        fh.write_record(np.int32([2, 2]))
        fh.write_record(np.frombuffer(b"Na Cl ", dtype="S1"))
        fh.write_record(np.int32([1, 2]))
        fh.write_record(np.asarray(tau, order="F").tobytes(order="F"))
        fh.write_record(np.asarray(at, order="F").tobytes(order="F"))
    seed = read_pwc_structure(str(p))
    c = seed.to_crystal()
    assert c.ncel == 2
    np.testing.assert_allclose(np.asarray(c.m_x2c), at, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c.x_frac)[1], [0.5, 0.5, 0.5],
                               atol=1e-12)
    assert [sp.z for sp in c.species] == [11, 17]


SIESTA_STRUCT = """  5.640000  0.000000  0.000000
  0.000000  5.640000  0.000000
  0.000000  0.000000  5.640000
  2
  1  11  0.000000  0.000000  0.000000
  2  17  0.500000  0.500000  0.500000
"""


def test_siesta_struct(tmp_path):
    p = tmp_path / "t.STRUCT_OUT"
    p.write_text(SIESTA_STRUCT)
    assert detect_format(str(p)) == "siesta"
    c = read_structure(str(p))
    assert c.ncel == 2
    assert c.volume == pytest.approx((5.64 * param.ANGSTROM_TO_BOHR) ** 3,
                                     rel=1e-8)
    assert [c.species[i].z for i in c.species_of] == [11, 17]


AXSF = """ANIMSTEPS 2
CRYSTAL
PRIMVEC
  5.0 0.0 0.0
  0.0 5.0 0.0
  0.0 0.0 5.0
PRIMCOORD 1
2 1
Na 0.0 0.0 0.0
Cl 2.5 2.5 2.5
PRIMCOORD 2
2 1
Na 0.5 0.0 0.0
Cl 3.0 2.5 2.5
"""


def test_axsf(tmp_path):
    from critic2_tpu.crystal.seed import read_axsf_structure

    p = tmp_path / "t.axsf"
    p.write_text(AXSF)
    assert detect_format(str(p)) == "axsf"
    c = read_structure(str(p))
    np.testing.assert_allclose(np.asarray(c.x_frac)[1], [0.5, 0.5, 0.5],
                               atol=1e-12)
    c2 = read_axsf_structure(str(p), step=2).to_crystal()
    np.testing.assert_allclose(np.asarray(c2.x_frac)[0], [0.1, 0.0, 0.0],
                               atol=1e-12)


CRYSTAL_OUT = """ EEEEEEEEEE STARTING  DATE 01 01 2020
 CRYSTAL CALCULATION
 SOME OTHER LINE

 DIRECT LATTICE VECTORS CARTESIAN COMPONENTS (ANGSTROM)
          X                    Y                    Z
   0.282000000000E+01   0.282000000000E+01   0.000000000000E+00
   0.000000000000E+00   0.282000000000E+01   0.282000000000E+01
   0.282000000000E+01   0.000000000000E+00   0.282000000000E+01

 CARTESIAN COORDINATES - PRIMITIVE CELL
 ***************************************************
   ATOM          X(ANGSTROM)         Y(ANGSTROM)         Z(ANGSTROM)
 ***************************************************
   1   11 NA    0.000000000000E+00   0.000000000000E+00   0.000000000000E+00
   2   17 CL    2.820000000000E+00   2.820000000000E+00   2.820000000000E+00

 DONE
"""


def test_crystal_out(tmp_path):
    p = tmp_path / "nacl.out"
    p.write_text(CRYSTAL_OUT)
    assert detect_format(str(p)) == "crystal-out"
    c = read_structure(str(p))
    assert c.ncel == 2
    a = 2.82 * param.ANGSTROM_TO_BOHR
    assert c.volume == pytest.approx(abs(np.linalg.det(
        np.array([[a, a, 0], [0, a, a], [a, 0, a]]))), rel=1e-8)
    assert sorted(sp.z for sp in c.species) == [11, 17]


GAUSSIAN_LOG = """ Entering Gaussian System
 ...
                         Standard orientation:
 ---------------------------------------------------------------------
 Center     Atomic      Atomic             Coordinates (Angstroms)
 Number     Number       Type             X           Y           Z
 ---------------------------------------------------------------------
      1          8           0        0.000000    0.000000    0.119262
      2          1           0        0.000000    0.763239   -0.477047
      3          1           0        0.000000   -0.763239   -0.477047
 ---------------------------------------------------------------------
 Rotational constants
"""


def test_gaussian_log(tmp_path):
    p = tmp_path / "h2o.log"
    p.write_text(GAUSSIAN_LOG)
    assert detect_format(str(p)) == "gaussian-log"
    c = read_structure(str(p))
    assert c.ismolecule and c.ncel == 3
    assert sorted(c.species[i].z for i in c.species_of) == [1, 1, 8]


def test_qe_ibrav_variants():
    """QE ibrav -5 (trigonal, 3-fold axis along 111) and -12
    (monoclinic unique axis b) produce the same cell volume as their
    positive-setting counterparts (reference qe_latgen,
    src/crystalseedmod@proc.f90:4851,4927)."""
    import numpy as np

    from critic2_tpu.crystal.seed import _qe_ibrav_cell

    cd = {1: 10.0, 2: 1.2, 3: 1.5, 4: 0.3, 5: 0.4, 6: 0.2}
    for a, b in ((5, -5), (12, -12)):
        va = abs(np.linalg.det(_qe_ibrav_cell(a, cd)))
        vb = abs(np.linalg.det(_qe_ibrav_cell(b, cd)))
        assert va == pytest.approx(vb, rel=1e-12)
    # every supported setting is non-degenerate
    for ib in (1, 2, 3, 4, 5, -5, 6, 7, 8, 9, 10, 11, 12, -12, 13, 14):
        assert abs(np.linalg.det(_qe_ibrav_cell(ib, cd))) > 1.0


def test_vasp4_poscar_with_potcar(tmp_path):
    """VASP-4 POSCAR (counts-only line 6) takes species names from the
    sibling POTCAR (reference read_potcar,
    src/crystalseedmod@proc.f90:3277-3326)."""
    from critic2_tpu.crystal.seed import read_poscar, read_potcar

    (tmp_path / "POTCAR").write_text(
        "PAW_PBE Na 08Apr2002\n"
        "junk line\n"
        "End of Dataset\n"
        "PAW_PBE Cl 06Sep2000\n"
        "End of Dataset\n")
    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "NaCl v4\n"
        "5.64\n"
        "1.0 0.0 0.0\n"
        "0.0 1.0 0.0\n"
        "0.0 0.0 1.0\n"
        "4 4\n"
        "Direct\n"
        "0.0 0.0 0.0\n0.5 0.5 0.0\n0.5 0.0 0.5\n0.0 0.5 0.5\n"
        "0.5 0.5 0.5\n0.0 0.0 0.5\n0.0 0.5 0.0\n0.5 0.0 0.0\n")
    assert read_potcar(str(tmp_path / "POTCAR")) == ["Na", "Cl"]
    seed = read_poscar(str(poscar))
    assert [s.name for s in seed.species] == ["Na", "Cl"]
    assert sorted(seed.species[i].z for i in seed.species_of) == \
        [11] * 4 + [17] * 4
