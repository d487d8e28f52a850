"""Reference example scripts run VERBATIM through the CLI.

The hermetic examples (no external data files; see
examples/examples.txt in the reference) exercise the same keyword
surface end-to-end: the structure library, nanoparticle WRITE
(SPHERE/CUBE), NEWCELL with fraction expressions and INVERSE, inline
CRYSTAL environments with a space-group, and IDENTIFY of a written
xyz (reference examples/structures/*.cri,
examples/auto_simple_promolecular/pyrazole.cri)."""
import io
import os

import numpy as np
import pytest

from critic2_tpu.cli import Repl

EXDIR = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXDIR), reason="reference examples not mounted")


def run_example(path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    r = Repl(out=out, quiet=True)
    with open(path) as f:
        r.run_script(f.read())
    return out.getvalue(), r


def test_structures_library(tmp_path, monkeypatch):
    txt, _ = run_example(f"{EXDIR}/structures/library.cri",
                         tmp_path, monkeypatch)
    assert "warning" not in txt
    # nanoparticle sizes grow with radius and match the density order
    sizes = {}
    for f in ("zns_np_20.xyz", "zns_np_30.xyz", "zns_np_40.xyz",
              "caf2_np_20.xyz", "caf2_np_30.xyz", "caf2_np_40.xyz"):
        with open(tmp_path / f) as fh:
            sizes[f] = int(fh.readline())
    assert sizes["zns_np_20.xyz"] < sizes["zns_np_30.xyz"] \
        < sizes["zns_np_40.xyz"]
    # sphere of r=20 A in zincblende (a=5.41 A, 8 atoms/cell):
    # (4/3) pi r^3 * 8/a^3 ~ 1693 atoms
    assert 1500 < sizes["zns_np_20.xyz"] < 1900
    # cube of half-side 20 A in fluorite (a=5.46 A, 12 atoms/cell):
    # (2*20)^3 * 12/a^3 ~ 4716
    assert 4200 < sizes["caf2_np_20.xyz"] < 5200
    # newcell chain: cubic (8 at) -> primitive (2) -> inverse (8) ->
    # 2x2x2 (64)
    assert "NEWCELL: 2 atoms" in txt
    assert "NEWCELL: 8 atoms" in txt
    assert "NEWCELL: 64 atoms" in txt
    for f in ("mgo_cubic1.scf.in", "mgo_prim.scf.in",
              "mgo_cubic2.scf.in"):
        assert (tmp_path / f).exists()


def test_structures_identify(tmp_path, monkeypatch):
    txt, _ = run_example(f"{EXDIR}/structures/identify.cri",
                         tmp_path, monkeypatch)
    assert "warning" not in txt
    with open(tmp_path / "cds_np_20.xyz") as fh:
        nat = int(fh.readline())
    # wurtzite CdS sphere r=20 A: (4/3) pi 20^3 * 4 / (41.3*6.75 A^3
    # hex cell volume 99.9 A^3) ~ 1340 atoms
    assert 1200 < nat < 1500
    # IDENTIFY must resolve every nanoparticle atom to a lattice site
    assert txt.count("not identified") == 0


@pytest.mark.slow
def test_auto_simple_promolecular(tmp_path, monkeypatch):
    txt, r = run_example(
        f"{EXDIR}/auto_simple_promolecular/pyrazole.cri",
        tmp_path, monkeypatch)
    assert "warning" not in txt
    # the scripted WS+pair seeding recovers a zero Morse sum (the
    # point of the example; reference examples.txt)
    assert r.cpl is not None
    ncp, b, ring, cage = r.cpl.counts()
    assert ncp - b + ring - cage == 0
    assert (tmp_path / "pyrazole.cml").exists()
