"""Time-spectral tests — reference analogue:
tests/reg_tests/test_time_spectral_naca64A010.py (pitching airfoil,
alphaMode; spectral matrices from modules/inputTimeSpectral)."""

import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import naca0012_omesh
from adflow_tpu.solvers.timespectral import spectral_deriv_matrix


def test_spectral_matrix_exact_on_harmonics():
    """D differentiates sin/cos exactly at collocation points."""
    for n in (4, 5, 8):
        period = 2.0
        D = spectral_deriv_matrix(n, period)
        t = np.arange(n) * period / n
        om = 2 * np.pi / period
        f = np.sin(om * t)
        df = om * np.cos(om * t)
        np.testing.assert_allclose(D @ f, df, atol=1e-12)
        # constants differentiate to zero
        np.testing.assert_allclose(D @ np.ones(n), 0.0, atol=1e-12)


def test_time_spectral_constant_alpha_matches_steady():
    """With zero pitching amplitude every instance must converge to the
    steady solution (the spectral coupling vanishes at convergence)."""
    mesh = naca0012_omesh(ni=48, nj=16)
    opts = {"equationType": "euler", "equationMode": "time spectral",
            "timeIntervals": 3, "omegaFourier": 2.0 * np.pi,
            "useANKSolver": False, "useNKSolver": False,
            "nCycles": 400, "CFL": 1.2, "L2Convergence": 1e-5,
            "printIterations": False, "printTiming": False}
    s = ADFLOW(options=opts, mesh=mesh)
    ap = AeroProblem(name="ts", mach=0.5, alpha=1.0, evalFuncs=["cl"])
    s(ap)
    assert not s.solve_info.failed
    # all instances identical (same alpha)
    w0 = np.asarray(s.ts_states[0][0])
    w1 = np.asarray(s.ts_states[1][0])
    np.testing.assert_allclose(w0, w1, atol=1e-6)


def test_time_spectral_pitching_runs():
    """Pitching alphaMode: instances differ and the coupled system stays
    finite and reduces the residual."""
    mesh = naca0012_omesh(ni=48, nj=16)
    opts = {"equationType": "euler", "equationMode": "time spectral",
            "timeIntervals": 3, "omegaFourier": 2.0 * np.pi,
            "useANKSolver": False, "useNKSolver": False,
            "nCycles": 250, "CFL": 1.2, "L2Convergence": 1e-4,
            "printIterations": False, "printTiming": False}
    s = ADFLOW(options=opts, mesh=mesh)
    ap = AeroProblem(name="tsp", mach=0.5, alpha=1.0)
    s(ap, alphaAmplitude=1.0)
    assert not s.solve_info.failed
    assert s.solve_info.total_r_final < s.solve_info.total_r0
    w0 = np.asarray(s.ts_states[0][0])
    w1 = np.asarray(s.ts_states[1][0])
    assert np.abs(w0 - w1).max() > 1e-4   # instances genuinely differ
