"""RANS (SA) regressions: turbulent flat plate vs skin-friction correlation.

Reference analogue: the RANS regression cases of tests/reg_tests/test_solve.py
(rans SG DADI+NK tutorial wing). Self-contained: validated against the
0.0576 Re_x^-1/5 turbulent-plate correlation instead of golden meshes.
Kept small so the CPU test suite stays fast; the full-size cases live in
bench/ and examples/.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import cube_mesh, flatplate_mesh
from adflow_tpu.physics.residual import fill_halos

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {
    "equationType": "RANS",
    "ANKSwitchTol": 1.5,
    "L2Convergence": 1e-7,
    "printIterations": False,
    "printTiming": False,
    "nCycles": 150,
}


def test_rans_freestream_preservation():
    mesh = cube_mesh(n=6, perturb=0.2, seed=2)
    solver = ADFLOW(options=dict(OPTS, useANKSolver=False), mesh=mesh)
    ap = AeroProblem(name="fs", mach=0.3, alpha=2.0, reynolds=1e6)
    solver.setAeroProblem(ap)
    r = solver.getResidual(ap)
    assert max(float(jnp.max(jnp.abs(x))) for x in r) < 1e-12


@pytest.fixture(scope="module")
def turb_plate():
    mesh = flatplate_mesh(ni=48, nj=48, wall_spacing=2e-5, height=0.5)
    solver = ADFLOW(options=OPTS, mesh=mesh)
    ap = AeroProblem(name="tplate", mach=0.2, reynolds=2e6,
                     reynoldsLength=1.0, T=288.15)
    solver(ap)
    return solver, ap


def test_turb_plate_converges(turb_plate):
    solver, _ = turb_plate
    assert solver.solve_info.converged
    assert solver.solve_info.total_r_final < 1e-7 * solver.solve_info.total_r0


def test_turb_skin_friction(turb_plate):
    """cf within 15% of the 1/5-power correlation at mid-plate (coarse 48^2
    mesh; the finer 64x56 run matches to 3%)."""
    solver, _ = turb_plate
    w = fill_halos(solver.w_list, solver.metrics_list, solver.topo,
                   solver.ref, solver.winf)[0]
    xc = np.asarray(solver.metrics_list[0].xc_ext)[1:-1, 1:-1, 1:-1]
    wi = np.asarray(w)[2:-2, 2:-2, 2:-2]
    uinf, mu = 0.2, solver.ref.mu_inf
    i_x = np.argmin(np.abs(xc[:, 0, 0, 0] - 0.5))
    x_loc = xc[i_x, 0, 0, 0]
    u1 = wi[i_x, 0, 0, 1] / wi[i_x, 0, 0, 0]
    y1 = xc[i_x, 0, 0, 1]
    cf = mu * u1 / y1 / (0.5 * uinf ** 2)
    rex = uinf * x_loc / mu
    cf_corr = 0.0576 * rex ** -0.2
    assert abs(cf / cf_corr - 1.0) < 0.15


def test_eddy_viscosity_magnitude(turb_plate):
    """Peak mu_t/mu_lam in a Re 2e6 plate BL is O(100)."""
    from adflow_tpu.physics.sa import eddy_viscosity
    from adflow_tpu.physics.thermo import laminar_viscosity, temperature
    solver, _ = turb_plate
    wi = jnp.asarray(np.asarray(solver.w_list[0])[2:-2, 2:-2, 2:-2])
    t = temperature(wi)
    mulam = laminar_viscosity(t, solver.ref.mu_inf, solver.ref.t_inf_dim)
    ratio = float(jnp.max(eddy_viscosity(wi, mulam) / mulam))
    assert 20.0 < ratio < 1000.0
