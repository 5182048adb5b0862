"""Actuator regions + integration adapter — reference analogues:
tests/reg_tests/test_actuator.py (thrust momentum balance) and
adflow/mphys/mphys_adflow.py component contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.integrations.mphys import ADflowBuilder, ImplicitCFDAdapter
from adflow_tpu.meshgen.analytic import channel_mesh, naca0012_omesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {"equationType": "euler", "useANKSolver": False, "useNKSolver": False,
        "nCycles": 400, "CFL": 1.0, "L2Convergence": 1e-8,
        "printIterations": False, "printTiming": False}


def test_actuator_thrust_momentum_balance():
    """Channel with an actuator disk: the converged momentum-flux imbalance
    between outflow and inflow equals the applied thrust (the reference's
    test_actuator heuristic)."""
    mesh = channel_mesh(ni=32, nj=8, nk=2, length=3.0, height=1.0,
                        width=0.2)
    s = ADFLOW(options=OPTS, mesh=mesh)
    ap = AeroProblem(name="act", mach=0.3, evalFuncs=["mdot"])
    s.setAeroProblem(ap)
    thrust = 0.01
    # disk normal to the flow (x) direction, covering the cross-section
    s.addActuatorRegion([1.4, 0.5, 0.1], [1.6, 0.5, 0.1], radius=10.0,
                        thrust=thrust)
    s(ap)
    assert not s.solve_info.failed
    # compare solutions with/without: pressure rises across the disk
    w = np.asarray(s.w_list[0][2:-2, 2:-2, 2:-2])
    ke = 0.5 * np.sum(w[..., 1:4] ** 2, axis=-1) / w[..., 0]
    p = 0.4 * (w[..., 4] - ke)
    p_in = p[2, :, :].mean()
    p_out = p[-3, :, :].mean()
    # disk spans the whole cross-section, area = height*width = 0.2
    dp_expected = thrust / 0.2
    np.testing.assert_allclose(p_out - p_in, dp_expected, rtol=0.25)


def test_implicit_adapter_contract():
    """ImplicitCFDAdapter: residual/state/linear products are consistent
    with the underlying solver (the MPhys ADflowSolver contract)."""
    mesh = naca0012_omesh(ni=48, nj=16)
    s = ADFLOW(options=dict(OPTS, useANKSolver=True, nCycles=200),
               mesh=mesh)
    ap = AeroProblem(name="mp", mach=0.5, alpha=1.0, evalFuncs=["cl"])
    adapter = ImplicitCFDAdapter(s, ap)

    u = adapter.solve_nonlinear()
    r = adapter.apply_nonlinear()
    assert np.abs(r).max() < 1e-6          # converged residual

    funcs = adapter.eval_functions(["cl"])
    assert 0.05 < funcs["cl"] < 0.25

    # fwd/rev linear products: dot-product identity  v^T (J u) == (J^T v)^T u
    rng = np.random.default_rng(3)
    wd = rng.standard_normal(u.size)
    rdot = adapter.apply_linear_fwd(wDot=wd)
    vbar = rng.standard_normal(u.size)
    gw, gx = adapter.apply_linear_rev(vbar)
    np.testing.assert_allclose(vbar @ rdot, gw @ wd, rtol=1e-10)


def test_builder_without_openmdao():
    """Without openmdao importable, component construction must raise a
    clear ImportError (the adapter path stays usable). The miniom stub
    from test_mphys_components may already be registered in this pytest
    process — hide it for the duration of the check."""
    import sys

    builder = ADflowBuilder(dict(OPTS), mesh=naca0012_omesh(ni=48, nj=16))
    builder.initialize()
    assert builder.get_number_of_nodes() > 0
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "openmdao" or k.startswith("openmdao.")}
    try:
        with pytest.raises(ImportError):
            builder.get_coupling_group_subsystem()
    finally:
        sys.modules.update(saved)
