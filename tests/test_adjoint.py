"""Derivative machinery tests.

Reference analogues: tests/reg_tests/test_jacVecProdFWD.py,
test_jacVecProdBWDFast.py (dot-product consistency, dot_prod_tol=1e-10) and
test_adjoint.py (adjoint totals). Here totals verify against finite
differences of full re-solves instead of golden files.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import naca0012_omesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {
    "equationType": "euler",
    "ANKSwitchTol": 1.5,
    "L2Convergence": 1e-12,
    "printIterations": False,
    "printTiming": False,
    "nCycles": 300,
}


def make_solver():
    return ADFLOW(options=OPTS, mesh=naca0012_omesh(ni=64, nj=24))


@pytest.fixture(scope="module")
def solved():
    s = make_solver()
    ap = AeroProblem(name="n12", mach=0.5, alpha=2.0, evalFuncs=["cl", "cd"])
    s(ap)
    return s, ap


def test_dot_product_consistency(solved):
    """<J v, u> == <v, J^T u> to near machine precision (the reference
    accepts 1e-10; jax.jvp/vjp share one linearization so we get eps)."""
    s, ap = solved
    rng = np.random.default_rng(0)
    wvec, xvec = s._wx_vecs()
    wd = jnp.asarray(rng.normal(size=wvec.shape))
    xd = jnp.asarray(rng.normal(size=xvec.shape))
    rbar = jnp.asarray(rng.normal(size=wvec.shape))
    rdot = s.computeJacobianVectorProductFwd(
        wDot=wd, xVDot=xd, residualDeriv=True)
    gw, gx = s.computeJacobianVectorProductBwd(
        resBar=rbar, wDeriv=True, xVDeriv=True)
    lhs = float(jnp.asarray(rdot) @ rbar)
    rhs = float(gw @ wd) + float(gx @ xd)
    assert abs(lhs - rhs) / abs(lhs) < 1e-12


def test_func_jvp_vjp_consistency(solved):
    s, ap = solved
    rng = np.random.default_rng(1)
    wvec, xvec = s._wx_vecs()
    wd = jnp.asarray(rng.normal(size=wvec.shape))
    fdot = s.computeJacobianVectorProductFwd(wDot=wd, funcDeriv=True)
    gw = s.computeJacobianVectorProductBwd(funcsBar={"cl": 1.0}, wDeriv=True)
    assert abs(fdot["cl"] - float(gw @ wd)) / abs(fdot["cl"]) < 1e-12


def test_adjoint_dcl_dalpha(solved):
    """Adjoint total vs central finite difference of full re-solves."""
    s, ap = solved
    sens = {}
    s.evalFunctionsSens(ap, sens, evalFuncs=["cl"])
    adj = sens["n12_cl"]["alpha"]

    eps = 1e-4
    cls = {}
    for da in (eps, -eps):
        s2 = make_solver()
        ap2 = AeroProblem(name="fd", mach=0.5, alpha=2.0 + da,
                          evalFuncs=["cl"])
        s2(ap2)
        f = {}
        s2.evalFunctions(ap2, f, evalFuncs=["cl"])
        cls[da] = f["fd_cl"]
    fd = (cls[eps] - cls[-eps]) / (2 * eps)
    assert abs(adj - fd) / abs(fd) < 1e-5


def test_adjoint_shape_sensitivity_shape(solved):
    """Shape (volume-coordinate) totals come out with the right layout and
    are finite — the MPhys/DVGeo coupling surface (reference:
    adflow_vol_coords, mphys_adflow.py:72-80)."""
    s, ap = solved
    sens = {}
    s.evalFunctionsSens(ap, sens, evalFuncs=["cd"])
    xv = sens["n12_cd"]["xv"]
    assert xv.shape == (sum(x.size for x in s.x_list),)
    assert np.all(np.isfinite(xv))
    assert np.abs(xv).max() > 0.0


def test_extra_dv_xref_sensitivity():
    """d(cmz)/d(xref) from the adjoint path matches finite differences of
    the functional (the state is xref-independent, so FD needs no re-solve).
    Reference: the extra-DV set, pyADflow.py:6444-6461."""
    from adflow_tpu.meshgen.analytic import naca0012_omesh

    mesh = naca0012_omesh(ni=48, nj=16)
    solver = ADFLOW(options=dict(OPTS), mesh=mesh)
    ap = AeroProblem(name="dv", mach=0.5, alpha=2.0, xRef=0.25,
                     evalFuncs=["cmz"])
    solver(ap)
    sens = {}
    solver.evalFunctionsSens(ap, sens, evalFuncs=["cmz"])
    g = sens["dv_cmz"]["xref"]
    assert np.all(np.isfinite(g))
    # analytic identity: M = sum (xc - xref) x F, so
    # d(cmz)/d(xref_x) = -sum Fy / (q S c) = -cl / chordRef
    funcs = {}
    solver.evalFunctions(ap, funcs, evalFuncs=["cl", "cd"])
    a = np.radians(ap.alpha)
    # body-frame y force = L cos(a) + D sin(a) (wind-frame cl/cd)
    expect = -(funcs["dv_cl"] * np.cos(a)
               + funcs["dv_cd"] * np.sin(a)) / ap.chordRef
    assert abs(g[0] - expect) < 1e-9 * max(abs(expect), 1.0), (g[0], expect)
    # d(cmz)/d(xref_y) = +sum Fx / (q S c) = +cd-direction force / chord
    # (exact for the body-axis force decomposition)
    # T sensitivity exists and is zero for Euler (no viscosity chain)
    assert abs(sens["dv_cmz"]["T"]) < 1e-12


def test_extra_dv_p_rho_sensitivity():
    """Freestream P / rho totals (reference iDV['p']/iDV['rho'],
    pyADflow.py:6450-6451). The nondim state is P-independent, so the
    dimensional-lift total has the exact analytic value
    d(lift)/dP = lift/P (lift = cl * 0.5*gamma*P*M^2 * Aref), and the
    gas-law chain gives d(lift)/drho|_T = R T lift/P = lift/rho."""
    from adflow_tpu.meshgen.analytic import naca0012_omesh

    solver = ADFLOW(options=dict(OPTS), mesh=naca0012_omesh(ni=48, nj=16))
    ap = AeroProblem(name="pr", mach=0.5, alpha=2.0, evalFuncs=["lift"])
    solver(ap)
    funcs, sens = {}, {}
    solver.evalFunctions(ap, funcs, evalFuncs=["lift"])
    solver.evalFunctionsSens(ap, sens, evalFuncs=["lift"])
    lift = funcs["pr_lift"]
    gP = sens["pr_lift"]["P"]
    grho = sens["pr_lift"]["rho"]
    assert abs(gP - lift / ap.P) < 1e-6 * abs(lift / ap.P), (gP, lift / ap.P)
    assert abs(grho - lift / ap.rho) < 1e-6 * abs(lift / ap.rho)
    # cl is a coefficient: P must not move it
    sens2 = {}
    solver.evalFunctionsSens(ap, sens2, evalFuncs=["cl"])
    assert abs(sens2["pr_cl"]["P"]) < 1e-12


def test_grid_motion_dvs_fd():
    """machGrid and rotRate adjoint totals vs central finite differences
    of full re-solves (reference extra DVs machgrid/rotx..rotz/rotcen*,
    pyADflow.py:6447-6457; grid velocities solverUtils.F90:358,414).
    Also covers the traced-metrics grid-motion attach in the adjoint
    _prep — without it these totals are silently zero/wrong."""
    from adflow_tpu.meshgen.analytic import naca0012_omesh

    MG0, RZ0 = 0.05, 5.0   # grid translation Mach; z rotation rate rad/s

    def solve(mg, rz):
        s = ADFLOW(options=dict(OPTS), mesh=naca0012_omesh(ni=48, nj=16))
        ap = AeroProblem(name="gm", mach=0.5, alpha=2.0, machGrid=mg,
                         rotRate=(0.0, 0.0, rz),
                         rotCenter=(0.25, 0.0, 0.0), evalFuncs=["cl"])
        s(ap)
        return s, ap

    s, ap = solve(MG0, RZ0)
    sens = {}
    s.evalFunctionsSens(ap, sens, evalFuncs=["cl"])
    g_mg = sens["gm_cl"]["machGrid"]
    g_rz = sens["gm_cl"]["rotRate"][2]

    def cl_at(mg, rz):
        s2, ap2 = solve(mg, rz)
        f = {}
        s2.evalFunctions(ap2, f, evalFuncs=["cl"])
        return f["gm_cl"]

    eps = 2e-3
    fd_mg = (cl_at(MG0 + eps, RZ0) - cl_at(MG0 - eps, RZ0)) / (2 * eps)
    assert abs(g_mg - fd_mg) / max(abs(fd_mg), 1e-12) < 1e-3, (g_mg, fd_mg)
    epsr = 0.5
    fd_rz = (cl_at(MG0, RZ0 + epsr) - cl_at(MG0, RZ0 - epsr)) / (2 * epsr)
    assert abs(g_rz - fd_rz) / max(abs(fd_rz), 1e-12) < 1e-3, (g_rz, fd_rz)
    assert np.all(np.isfinite(sens["gm_cl"]["rotCenter"]))
