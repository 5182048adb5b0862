"""User-defined integration surface tests.

Reference analogue: `tests/reg_tests/test_conic_conv_nozzle.py` +
`addIntegrationSurface` (pyADflow.py:780, userSurfaceIntegrations.F90) —
mass flow / averaged totals on an interior triangulated plane.
"""

import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import channel_mesh, cube_mesh


def _plane(y0z0, y1z1, x0, n=8):
    """Quad grid of an x = x0 plane spanning [y0,y1]x[z0,z1]."""
    y = np.linspace(y0z0[0], y1z1[0], n + 1)
    z = np.linspace(y0z0[1], y1z1[1], n + 1)
    Y, Z = np.meshgrid(y, z, indexing="ij")
    pts = np.stack([np.full(Y.shape, x0), Y, Z], axis=-1).reshape(-1, 3)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    base = (ii * (n + 1) + jj).reshape(-1)
    conn = np.stack([base, base + (n + 1), base + (n + 2), base + 1],
                    axis=1)
    return pts, conn


def test_uniform_freestream_mdot():
    """On a uniform free stream, the interpolated plane integral must
    reproduce rho*u*A to interpolation accuracy (machine-exact here:
    trilinear of a constant field)."""
    mesh = cube_mesh(n=6)
    s = ADFLOW(options={"equationType": "euler", "useANKSolver": False,
                        "useNKSolver": False, "nCycles": 1,
                        "printIterations": False, "printTiming": False},
               mesh=mesh)
    pts, conn = _plane((0.2, 0.2), (0.8, 0.8), 0.5, n=6)
    s.addIntegrationSurface((pts, conn), "midplane", isInflow=True)
    ap = AeroProblem(name="u", mach=0.5, alpha=0.0,
                     evalFuncs=["midplane_mdot", "midplane_area",
                                "midplane_mavgmn"])
    s.setAeroProblem(ap)
    funcs = {}
    s.evalFunctions(ap, funcs)
    area = 0.6 * 0.6
    # nondim: rho_inf=1, |u|=mach; flow along +x, plane normal +x
    np.testing.assert_allclose(funcs["u_midplane_area"], area, rtol=1e-12)
    np.testing.assert_allclose(funcs["u_midplane_mdot"], 0.5 * area,
                               rtol=1e-10)
    np.testing.assert_allclose(funcs["u_midplane_mavgmn"], 0.5,
                               rtol=1e-10)


@pytest.mark.slow
def test_channel_mass_conservation():
    """Converged subsonic channel: mdot through an interior plane matches
    the inflow-family mass flow (conic-nozzle regression concept)."""
    mesh = channel_mesh(ni=32, nj=12, nk=4)
    s = ADFLOW(options={"equationType": "euler", "nCycles": 200,
                        "L2Convergence": 1e-8, "useNKSolver": True,
                        "NKSwitchTol": 1e-3,
                        "printIterations": False, "printTiming": False},
               mesh=mesh)
    # channel spans x in [0,3], y in [0,1], z in [0,0.2]; two interior
    # cross-planes must carry the SAME mass flow (conservation)
    pts1, conn1 = _plane((0.0, 0.0), (1.0, 0.2), 1.0, n=10)
    pts2, conn2 = _plane((0.0, 0.0), (1.0, 0.2), 2.0, n=7)
    s.addIntegrationSurface((pts1, conn1), "planeA", isInflow=True)
    s.addIntegrationSurface((pts2, conn2), "planeB", isInflow=True)
    ap = AeroProblem(name="ch", mach=0.3, alpha=0.0,
                     evalFuncs=["planeA_mdot", "planeA_area",
                                "planeA_mavgptot", "planeB_mdot"])
    s(ap)
    funcs = {}
    s.evalFunctions(ap, funcs)
    assert s.solve_info.converged
    np.testing.assert_allclose(funcs["ch_planeA_area"], 0.2, rtol=1e-12)
    assert funcs["ch_planeA_mdot"] > 0.01   # real through-flow
    # mass conservation between the two interior planes
    np.testing.assert_allclose(funcs["ch_planeA_mdot"],
                               funcs["ch_planeB_mdot"], rtol=2e-3)
    # total pressure preserved in isentropic subsonic channel flow
    pt_inf = (1.0 / 1.4) * (1.0 + 0.2 * 0.3 ** 2) ** 3.5
    np.testing.assert_allclose(funcs["ch_planeA_mavgptot"], pt_inf,
                               rtol=5e-3)


@pytest.mark.slow
def test_user_surface_adjoint_gradient():
    """User-surface functions work as adjoint objectives: d(mdot)/d(alpha)
    via evalFunctionsSens matches finite differences."""
    mesh = cube_mesh(n=6)
    s = ADFLOW(options={"equationType": "euler", "nCycles": 200,
                        "L2Convergence": 1e-10,
                        "printIterations": False, "printTiming": False},
               mesh=mesh)
    pts, conn = _plane((0.2, 0.2), (0.8, 0.8), 0.5, n=4)
    s.addIntegrationSurface((pts, conn), "mp", isInflow=True)
    ap = AeroProblem(name="g", mach=0.5, alpha=2.0,
                     evalFuncs=["mp_mdot"])
    s(ap)
    sens = {}
    s.evalFunctionsSens(ap, sens, evalFuncs=["mp_mdot"])
    da = sens["g_mp_mdot"]["alpha"]
    # FD check
    eps = 1e-3
    f1, f2 = {}, {}
    ap1 = AeroProblem(name="g1", mach=0.5, alpha=2.0 + eps,
                      evalFuncs=["mp_mdot"])
    ap2 = AeroProblem(name="g2", mach=0.5, alpha=2.0 - eps,
                      evalFuncs=["mp_mdot"])
    s(ap1)
    s.evalFunctions(ap1, f1)
    s(ap2)
    s.evalFunctions(ap2, f2)
    fd = (f1["g1_mp_mdot"] - f2["g2_mp_mdot"]) / (2 * eps)
    np.testing.assert_allclose(da, fd, rtol=2e-3, atol=1e-8)
