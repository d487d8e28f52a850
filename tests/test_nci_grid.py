"""NCI grid fast path vs generic chunked evaluation."""
import numpy as np
import jax.numpy as jnp

from critic2_tpu import System
from critic2_tpu.crystal.cell import m_x2c_from_cellpar
from critic2_tpu.crystal.crystal import Crystal, Species
from critic2_tpu.analysis.nci import nciplot
from critic2_tpu.analysis.integration import _rasterize_field
from critic2_tpu.fields.field import Field
from critic2_tpu.fields.grid3 import Grid3


def test_fastpath_matches_generic():
    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0, 8.0, 8.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("Ne", 10)])
    s = System.from_structure(c)
    g = _rasterize_field(s.fields[0], (16, 16, 16))
    fid = s.load_field(Field.from_grid(c, Grid3(g)))

    # incommensurate output grid: no output node coincides with an input
    # node (exact-node floor ties would legitimately differ in stencil
    # choice between the two paths)
    nstep = (15, 14, 13)
    res_fast = nciplot(s, nstep=nstep, precision="f64")

    # generic chunked path on the SAME grid field: usecore=True with an
    # empty zpsp disables the fast-path branch but adds no core density,
    # so the two paths must agree to roundoff
    s.field(fid).usecore = True
    res_gen = nciplot(s, nstep=nstep)
    s.field(fid).usecore = False

    sel = np.ones(nstep, bool)
    sel[0, 0, 0] = False                  # the one shared node
    np.testing.assert_allclose(res_fast.crho[sel], res_gen.crho[sel],
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(res_fast.cgrad_raw[sel],
                               res_gen.cgrad_raw[sel],
                               rtol=1e-7, atol=1e-10)


def test_f32_fastpath_parity_vs_f64():
    """The production fast path computes in f32 (the YT precision recipe:
    nothing in NCI is accumulated, so f32 throughput is free); parity vs
    the f64 path must hold to plot precision."""
    c = Crystal(m_x2c=m_x2c_from_cellpar([8.0, 8.0, 8.0], [90, 90, 90]),
                x_frac=np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
                species_of=np.array([0, 0]), species=[Species("Ne", 10)])
    s = System.from_structure(c)
    g = _rasterize_field(s.fields[0], (24, 24, 24))
    s.load_field(Field.from_grid(c, Grid3(g)))

    nstep = (23, 22, 21)
    r32 = nciplot(s, nstep=nstep)                      # default f32
    r64 = nciplot(s, nstep=nstep, precision="f64")
    assert r32.crho.dtype == jnp.float32
    assert r64.crho.dtype == jnp.float64

    # crho = 100 * sign(lam2) * rho: absolute agreement to ~1e-2
    # (rho to ~1e-4) except where lam2 crosses zero and the sign flips
    dcr = np.abs(np.asarray(r32.crho) - np.asarray(r64.crho))
    lam2_mag = np.abs(np.asarray(r64.crho))            # |100 rho|
    signflip = dcr > 1.9 * lam2_mag - 1e-6             # sign differs
    assert np.mean(signflip) < 2e-3                    # rare, near lam2=0
    assert np.max(dcr[~signflip] / (lam2_mag[~signflip] + 1e-3)) < 1e-4

    # RDG where it matters (under the plot cutoff in both): rel 1e-3
    m = (np.asarray(r32.cgrad) < 99.0) & (np.asarray(r64.cgrad) < 99.0)
    dg = np.abs(np.asarray(r32.cgrad)[m] - np.asarray(r64.cgrad)[m])
    assert np.max(dg / (np.asarray(r64.cgrad)[m] + 1e-3)) < 1e-3

    # dat selections agree except at cutoff-boundary points
    s32 = np.asarray(r32.dat_sel)
    s64 = np.asarray(r64.dat_sel)
    assert np.mean(s32 != s64) < 1e-3
