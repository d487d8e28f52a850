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
    res_fast = nciplot(s, nstep=nstep)

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
