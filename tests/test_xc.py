"""XC functionals against the reference's pinned libxc values
(tests_libxc/ref.txt, h2o.wfx): LDA(SVWN), PBE, BLYP, BP86, TPSS.

All five agree to <=6.5e-6 Ha at the converged ("amazing") mesh — the
same order as the pinned values' own quadrature uncertainty.  Matching
at this level required the constants of the libxc build behind the
pinned numbers: PBE mu = 0.21951 / beta = 0.066725 (the PRL 77, 3865
published roundings) and P86 1.745*ftilde = 0.192.
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
    ("PBE", -9.242634846200005, "xc($1,$1:g,101)+xc($1,$1:g,130)", 1e-5),
    ("BLYP", -9.307752149199999, "xc($1,$1:g,106)+xc($1,$1:g,131)", 1e-5),
    ("BP86", -9.328661428600000, "xc($1,$1:g,106)+xc($1,$1:g,132)", 2e-5),
    ("TPSS", -9.331217985700007,
     "xc($1,$1:g,$1:l,0.5*gkin(1),202)+xc($1,$1:g,$1:l,0.5*gkin(1),231)",
     1.2e-5),
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
