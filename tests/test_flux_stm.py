"""FLUXPRINT scenes, graphics writers, STM images."""
import numpy as np
import pytest

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.flux import cpreport_scene, fluxprint
from critic2_tpu.analysis.stm import stm
from critic2_tpu.analysis.autocp import autocp
from critic2_tpu.io.graphics import Scene


@pytest.fixture(scope="module")
def s():
    c = Crystal(m_x2c=m_x2c_from_cellpar([9.0, 9.0, 9.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("Ar", 18)])
    return System.from_structure(c)


def test_scene_writers(tmp_path):
    sc = Scene()
    sc.ball([0, 0, 0], r=1.0)
    sc.stick([0, 0, 0], [2, 0, 0])
    sc.path(np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2.0]]))
    for ext in ("obj", "ply", "off"):
        p = tmp_path / f"scene.{ext}"
        sc.write(str(p))
        assert p.exists() and p.stat().st_size > 100


def test_fluxprint(s, tmp_path):
    # seeds mid-basin: uphill paths must run to the nucleus and CAPTURE
    # there (termination targets, reference src/fieldmod@proc.f90:2194)
    seeds = s.crystal.x_cart[0] + np.array([[2.0, 0, 0], [0, 2.0, 0]])
    scene = fluxprint(s, seeds, iup=1, file=str(tmp_path / "flux.obj"),
                      nrec=80)
    assert (tmp_path / "flux.obj").exists()
    assert len(scene.seg) > 4
    # every path's last point sits at the capture radius of atom 0
    for pth in scene.pathpts:
        d = np.linalg.norm(pth[-1] - np.asarray(s.crystal.x_cart[0]))
        assert d < 0.35


@pytest.mark.slow
def test_cpreport_scene(s, tmp_path):
    cpl = autocp(s)
    from critic2_tpu.analysis.autocp import makegraph
    makegraph(s, cpl)
    cpreport_scene(s, cpl, str(tmp_path / "cps.ply"))
    assert (tmp_path / "cps.ply").stat().st_size > 500


@pytest.mark.slow
def test_stm_slab():
    # a 'slab': one atom layer at z=0.2 in a tall cell, vacuum above
    c = Crystal(m_x2c=m_x2c_from_cellpar([6.0, 6.0, 20.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.2], [0.5, 0.5, 0.2]]),
                species_of=np.array([0, 0]), species=[Species("C", 6)])
    s = System.from_structure(c)
    from critic2_tpu.analysis.integration import _rasterize_field
    from critic2_tpu.fields.field import Field
    from critic2_tpu.fields.grid3 import Grid3

    g = _rasterize_field(s.fields[0], (16, 16, 48))
    s.load_field(Field.from_grid(s.crystal, Grid3(g)))

    rh = stm(s, mode="height", npts=(24, 24))
    assert rh.image.shape == (24, 24)
    # vacuum is far from the layer
    assert abs(rh.ztop - 0.2) > 0.2

    rc = stm(s, mode="current", level=1e-4, npts=(16, 16))
    # isodensity height varies over the surface and lies above the layer
    assert rc.image.min() > 0.2
    assert rc.image.max() <= rc.ztop + 1e-9
    assert rc.image.std() > 1e-4


def test_fluxprint_cml(tmp_path):
    """CML gradient-path output (reference flux cml writer,
    src/flux@proc.f90:683-691)."""
    import os

    import numpy as np

    from critic2_tpu.analysis.flux import fluxprint
    from critic2_tpu.crystal.crystal import Crystal, Species
    from critic2_tpu.system import System

    c = Crystal(m_x2c=np.diag([6.0, 6.0, 6.0]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 1]),
                species=[Species("Na", 11), Species("Cl", 17)])
    s = System.from_structure(c)
    out = os.path.join(tmp_path, "paths.cml")
    fluxprint(s, np.array([[1.0, 1.0, 1.0]]), iup=1, file=out, nrec=40)
    text = open(out).read()
    assert "<molecule>" in text and "</molecule>" in text
    assert 'elementType="Na"' in text and 'elementType="Xz"' in text
    assert text.count("xFract") >= 3
