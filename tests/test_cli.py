"""CLI: reference-style .cri scripts through the keyword REPL."""
import io
import os

import numpy as np
import pytest

from critic2_tpu.cli import Repl

POSCAR = """NaCl
5.64
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
Na Cl
1 1
Direct
0.0 0.0 0.0
0.5 0.5 0.5
"""


@pytest.fixture
def poscar(tmp_path):
    p = tmp_path / "POSCAR"
    p.write_text(POSCAR)
    return str(p)


def run(script):
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    try:
        r.run_script(script)
    except StopIteration:
        pass
    return out.getvalue(), r


def test_crystal_point_auto(poscar):
    text, r = run(f"""
crystal {poscar}
point 0.25 0.25 0.25
auto
cpreport
""")
    assert "crystal" in text
    assert "POINT" in text
    assert "Poincare-Hopf sum = 0" in text
    assert "(3,-1)" in text      # bond CPs reported
    assert r.nwarns == 0


def test_load_as_and_reductions(poscar):
    text, r = run(f"""
crystal {poscar}
load as "$0" 16 16 16 id rho
sum 1
mean 1
""")
    assert "field 1" in text
    assert "SUM(1)" in text
    assert r.nwarns == 0


def test_yt_from_cli(poscar, tmp_path):
    text, r = run(f"""
crystal {poscar}
load as "$0" 20 20 20
yt
""")
    assert "attractors" in text
    assert "Na" in text and "Cl" in text
    assert r.nwarns == 0


def test_unknown_keyword_soft_error(poscar):
    text, r = run(f"""
crystal {poscar}
frobnicate 1 2 3
point 0.1 0.1 0.1
""")
    assert r.nwarns == 1
    assert "POINT" in text     # continues after the bad line


def test_variable_assignment(poscar):
    text, r = run(f"""
crystal {poscar}
athr = 2^2
""")
    assert "athr = 4.0" in text
    assert r.sy.vars["athr"] == 4.0


def test_molecule_wfx_molcalc():
    if not os.path.exists("/root/reference/tests_libxc/h2o.wfx"):
        pytest.skip("no reference data")
    text, r = run("""
molecule /root/reference/tests_libxc/h2o.wfx
load /root/reference/tests_libxc/h2o.wfx
molcalc nelec
""")
    assert "NELEC" in text
    v = float(text.split("NELEC =")[1].split()[0])
    assert abs(v - 10.0) < 1e-3


def test_checkpoints_and_scene(poscar, tmp_path):
    import os
    chk = tmp_path / "cps.npz"
    obj = tmp_path / "cps.obj"
    text, r = run(f"""
crystal {poscar}
auto
auto_chk save {chk}
auto_chk load {chk}
cpreport {obj}
""")
    assert r.nwarns == 0
    assert chk.exists() and obj.exists()
    assert "28 CPs" in text or "CPs" in text


def test_load_as_computed_fields(poscar):
    """LOAD AS LAP/GRAD/HXX/CLM/PROMOLECULAR/COPY + ZPSP/AS CORE
    (reference ifformat_as_* formats, src/param.F90:132-165)."""
    text, r = run(f"""
crystal {poscar}
load as "$0" 12 12 12
load as lap 1
load as grad 1
load as hxx1 1
load as clm add 1 1
load as clm sub 1 1
load as promolecular 10 10 10
load copy 1
zpsp na 1 cl 7
load as core sizeof 1
""")
    sy = r.sy
    assert all(sy.field(i).type == "grid" for i in range(1, 9))
    assert tuple(sy.field(7).grid.n) == (10, 10, 10)
    assert tuple(sy.field(9).grid.n) == (12, 12, 12)
    import numpy as np

    # clm add = 2x, clm sub = 0
    np.testing.assert_allclose(np.asarray(sy.field(5).grid.f),
                               2 * np.asarray(sy.field(1).grid.f), rtol=1e-12)
    assert float(np.abs(np.asarray(sy.field(6).grid.f)).max()) == 0.0
    # core density present and positive somewhere
    assert float(np.asarray(sy.field(9).grid.f).max()) > 0.1
    # laplacian grid integrates to ~0 over the periodic cell
    lap = np.asarray(sy.field(2).grid.f)
    assert abs(lap.mean()) < 1e-8 * np.abs(lap).max()


def test_settings_newcell_identify(poscar):
    """Settings keywords + NEWCELL + IDENTIFY (reference
    critic_setvariables src/global@proc.f90; NEWCELL
    src/crystalmod.f90:163-167)."""
    text, r = run(f"""
crystal {poscar}
symprec 1e-4
bondfactor 1.3
int_radial type qags abserr 1e-9
meshtype franchini good
newcell 2 1 1
identify
0.0 0.0 0.0
0.25 0.5 0.5
0.1 0.1 0.1
endidentify
""")
    assert r.opts["symprec"] == 1e-4
    assert r.opts["int_radquad"] == "qags"
    assert r.opts["meshtype"] == "franchini"
    assert r.sy.crystal.ncel == 4            # 2x1x1 NaCl supercell
    # identify matched the two atoms and missed the third
    lines = [ln for ln in text.splitlines() if ln.strip().startswith(("1", "2", "3"))]
    assert "Na" in text and "-1" in text


def test_newcell_primitive_roundtrip(tmp_path):
    """Conventional NaCl -> NEWCELL PRIMITIVE gives the 2-atom cell."""
    p = tmp_path / "POSCAR"
    p.write_text("""NaCl conventional
5.64
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
Na Cl
4 4
Direct
0.0 0.0 0.0
0.5 0.5 0.0
0.5 0.0 0.5
0.0 0.5 0.5
0.5 0.5 0.5
0.0 0.0 0.5
0.0 0.5 0.0
0.5 0.0 0.0
""")
    text, r = run(f"crystal {p}\nnewcell primitive\n")
    assert r.sy.crystal.ncel == 2
    import numpy as np
    assert r.sy.crystal.volume == pytest.approx(
        (5.64 / 0.529177210903) ** 3 / 4, rel=1e-8)


def test_auto_options(poscar):
    text, r = run(f"""
crystal {poscar}
auto dry seed ws depth 2
auto gradeps 1e-10 cpeps 0.01
""")
    assert "AUTO DRY" in text and "seeds generated" in text
    assert "Poincare-Hopf" in text


def test_load_post_options(tmp_path):
    """LOAD ... NORMALIZE n / TYPNUC / NOCORE post-options (reference
    fieldseed_parse_options, src/fieldseedmod@proc.f90:463-)."""
    import io

    import numpy as np

    from critic2_tpu.cli import Repl

    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    r.run_script("crystal library mgo\n"
                 'load as "$0" 8 8 8 normalize 20.0 typnuc -1\n')
    f = r.sy.field(1)
    assert f.typnuc == -1
    tot = float(np.asarray(f.grid.f).sum()) * r.sy.crystal.volume \
        / f.grid.f.size
    assert abs(tot - 20.0) < 1e-9


def test_identify_and_nci_fragments_molecule_frame():
    """Cartesian user inputs for molecules are in the input frame and
    must be shifted by molx0 before atom matching (reference
    struct_identify / nci FRAGMENT); regression for the frame offset."""
    import io

    from critic2_tpu.cli import Repl

    script = """molecule
 O 0.0 0.0 0.0
 H 0.0 0.76 0.59
 H 0.0 -0.76 0.59
 O 0.0 0.0 2.95
 H 0.0 0.76 3.54
 H 0.0 -0.76 3.54
endmolecule
identify 0.0 0.76 0.59
nciplot
 nstep 20 20 20
 fragment
  0.0 0.0 0.0
  0.0 0.76 0.59
  0.0 -0.76 0.59
 endfragment
 fragment
  0.0 0.0 2.95
  0.0 0.76 3.54
  0.0 -0.76 3.54
 endfragment
endnciplot
"""
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    import os, tempfile
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as d:
        os.chdir(d)
        try:
            r.run_script(script)
        finally:
            os.chdir(cwd)
    txt = out.getvalue()
    assert " H " in txt and "0.000000" in txt        # identified atom
    import re
    m = re.search(r"NCIPLOT: grid .*?, (\d+) dat points", txt)
    assert m and 0 < int(m.group(1)) < 8000 * 3      # inter-fragment only


def test_environ_shells():
    """ENVIRON SHELLS groups rock-salt neighbors correctly (reference
    struct_environ): MgO first shells 6 O @ a/2, 12 Mg @ a/sqrt2."""
    import io

    from critic2_tpu.cli import Repl

    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    r.run_script("crystal library mgo\nenviron dist 6.0 shells\n")
    txt = out.getvalue()
    assert "3.978818        O   6" in txt
    assert "5.626899       Mg  12" in txt


def test_runlog(tmp_path, monkeypatch):
    """CRITIC2_RUNLOG: one JSON line per dispatched keyword (the
    metrics/logging role of SURVEY section 5; reference apparatus is
    the tictac section clocks, src/tools_io@proc.F90:1276)."""
    import json

    log = tmp_path / "run.jsonl"
    monkeypatch.setenv("CRITIC2_RUNLOG", str(log))
    r = Repl(out=io.StringIO())
    r.run_script("crystal library mgo\nbogus_keyword 1 2\n")
    recs = [json.loads(l) for l in log.read_text().splitlines()]
    assert [x["kw"] for x in recs] == ["crystal"]  # unknown kw warns, no rec
    assert recs[0]["wall_s"] >= 0 and recs[0]["nwarns"] == 0


def test_clearsymm_and_system(tmp_path):
    """CLEARSYM drops to P1 (reference struct_clearsym,
    src/struct_drivers.f90:54); SYSTEM is the shell escape
    (src/critic2.F90:535)."""
    out = io.StringIO()
    r = Repl(out=out)
    r.run_script("crystal library mgo\nclearsymm\nsystem echo marker42\n")
    assert "now P1" in out.getvalue()
    assert "marker42" in out.getvalue()
    assert r.sy.crystal.spacegroup.nops == 1
    assert r.nwarns == 0
