"""API-level multi-device solve tests (options meshDevices/meshAxisName).

Reference analogue: the MPI domain decomposition that is implicit in
every reference run (partitionAndReadGrid + loadBalanceGrid,
loadBalance.F90:5) — here option-driven: ``meshDevices=N`` splits/orders
blocks over an N-device jax Mesh and the steady solve runs the GSPMD
stacked path (dist/stacked.py). Runs on the 8 virtual CPU devices the
conftest configures.
"""

import jax
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import cube_mesh, naca0012_omesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

BASE = {"equationType": "euler", "useANKSolver": True,
        "useNKSolver": False, "nCycles": 220, "L2Convergence": 1e-6,
        "printIterations": False, "printTiming": False}


def test_mesh_devices_matches_single_device():
    """meshDevices=4 must converge to the same CL as the 1-device solve
    (partition invariance through the API)."""
    ap = AeroProblem(name="md", mach=0.5, alpha=2.0, evalFuncs=["cl"])

    s1 = ADFLOW(options=BASE, mesh=naca0012_omesh(ni=48, nj=16))
    s1(ap)
    f1 = {}
    s1.evalFunctions(ap, f1)

    opts = dict(BASE, meshDevices=4)
    s4 = ADFLOW(options=opts, mesh=naca0012_omesh(ni=48, nj=16))
    assert len(s4.mesh.blocks) >= 4      # balance split happened
    ap4 = AeroProblem(name="md", mach=0.5, alpha=2.0, evalFuncs=["cl"])
    s4(ap4)
    assert s4.solve_info.converged, (
        s4.solve_info.total_r_final / s4.solve_info.total_r0)
    f4 = {}
    s4.evalFunctions(ap4, f4)
    np.testing.assert_allclose(f4["md_cl"], f1["md_cl"], rtol=2e-4)


def test_mesh_devices_state_sharding():
    """The stacked solve actually executes on a multi-device Mesh (the
    virtual CPU devices) and returns finite per-block states."""
    opts = dict(BASE, meshDevices=8, nCycles=30, L2Convergence=1e-1)
    s = ADFLOW(options=opts, mesh=cube_mesh(n=8))
    ap = AeroProblem(name="s8", mach=0.4, alpha=1.0)
    s(ap)
    assert all(np.isfinite(np.asarray(w)).all() for w in s.w_list)
    assert len(jax.devices()) >= 8


def test_ppermute_mode_clear_error():
    opts = dict(BASE, meshDevices=2, haloExchangeMode="ppermute")
    s = ADFLOW(options=opts, mesh=cube_mesh(n=6))
    ap = AeroProblem(name="pp", mach=0.4, alpha=0.0)
    with pytest.raises(NotImplementedError, match="gather"):
        s(ap)
