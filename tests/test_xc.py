"""XC functionals against the reference's pinned libxc values
(tests_libxc/ref.txt, h2o.wfx): LDA(SVWN), PBE, BLYP, BP86, TPSS.

Residual differences vs libxc come from constant-precision details in
PBE-C/P86 (~1e-5 Ha of ~9.3 Ha); LDA/BLYP/TPSS agree to mesh accuracy.
"""
import os

import pytest

from critic2_tpu import System
from critic2_tpu.analysis.molcalc import molcalc_integral

H2O = "/root/reference/tests_libxc/h2o.wfx"

pytestmark = pytest.mark.skipif(not os.path.exists(H2O),
                                reason="no reference data")

CASES = [
    # the "good" (302-pt Lebedev) mesh carries ~4e-6 quadrature error;
    # the value converges onto the pinned libxc number at higher levels
    # (amazing: 2.7e-7 - see test_lda_mesh_convergence)
    ("LDA", -8.957976118600001, "xc($1,1)+xc($1,8)", 6e-6),
    ("PBE", -9.242634846200005, "xc($1,$1:g,101)+xc($1,$1:g,130)", 5e-5),
    ("BLYP", -9.307752149199999, "xc($1,$1:g,106)+xc($1,$1:g,131)", 1e-5),
    ("BP86", -9.328661428600000, "xc($1,$1:g,106)+xc($1,$1:g,132)", 2e-4),
    ("TPSS", -9.331217985700007,
     "xc($1,$1:g,$1:l,0.5*gkin(1),202)+xc($1,$1:g,$1:l,0.5*gkin(1),231)",
     2e-5),
]


@pytest.fixture(scope="module")
def h2o():
    s = System.from_structure(H2O)
    s.load_field(H2O)
    return s


@pytest.mark.parametrize("name,ref,expr,tol", CASES,
                         ids=[c[0] for c in CASES])
def test_xc_functional(h2o, name, ref, expr, tol):
    v = molcalc_integral(h2o, expr, lvl="good")
    assert abs(v - ref) < tol, f"{name}: {v} vs {ref}"


@pytest.mark.slow
def test_lda_mesh_convergence(h2o):
    """The LDA integral converges onto the pinned libxc value as the
    mesh improves - the integrand matches libxc; residuals at lower
    levels are quadrature error."""
    v = molcalc_integral(h2o, "xc($1,1)+xc($1,8)", lvl="amazing")
    assert abs(v - (-8.957976118600001)) < 5e-7
