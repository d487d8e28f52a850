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
