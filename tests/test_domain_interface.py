"""Domain-interface BC tests (reference: constants.F90:276-281,
BCData.F90:2381 DomainInterfaceRhoUVW / :2414 DomainInterfaceTotal —
external-coupling inflow interfaces)."""

import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.mesh import (BCSubface, BCType, Block, Face,
                                  MultiBlockMesh)
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import channel_mesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {"equationType": "euler", "useANKSolver": True,
        "useNKSolver": False, "nCycles": 250, "L2Convergence": 1e-6,
        "printIterations": False, "printTiming": False}


def _channel_with_inflow(bctype):
    base = channel_mesh(ni=24, nj=10, nk=4)
    b = base.blocks[0]
    bcs = [(BCSubface(Face.IMIN, bctype, family="iface")
            if sf.face is Face.IMIN else sf) for sf in b.bcs]
    return MultiBlockMesh([Block("duct", b.x, bcs, b.conns)], name="duct")


def test_domain_interface_rhouvw():
    """Prescribed rho+velocity interface: the converged inflow mass flux
    matches rho * u * A exactly (mass-flow-fixed coupling interface)."""
    mesh = _channel_with_inflow(BCType.DOMAIN_INTERFACE_RHOUVW)
    s = ADFLOW(options=OPTS, mesh=mesh)
    rho_in, u_in = 1.0, 0.35
    s.setBCVar("Density", rho_in, "iface")
    s.setBCVar("VelocityX", u_in, "iface")
    s.setBCVar("VelocityY", 0.0, "iface")
    s.setBCVar("VelocityZ", 0.0, "iface")
    ap = AeroProblem(name="di", mach=0.3, alpha=0.0)
    s(ap)
    assert s.solve_info.converged
    s.addFunction("mdot", "iface", name="mdot_in")
    funcs = {}
    s.evalFunctions(ap, funcs, evalFuncs=["mdot_in"])
    area = 1.0 * 0.2
    np.testing.assert_allclose(funcs["di_mdot_in"], rho_in * u_in * area,
                               rtol=2e-2)


def test_domain_interface_total():
    """Prescribed total-conditions interface behaves as a subsonic
    total-state inflow: Pt at the interface equals the prescription."""
    mesh = _channel_with_inflow(BCType.DOMAIN_INTERFACE_TOTAL)
    s = ADFLOW(options=OPTS, mesh=mesh)
    g = 1.4
    mach = 0.3
    pt = (1.0 / g) * (1 + 0.5 * (g - 1) * mach ** 2) ** (g / (g - 1))
    s.setBCVar("PressureStagnation", pt, "iface")
    s.setBCVar("TemperatureStagnation",
               1 + 0.5 * (g - 1) * mach ** 2, "iface")
    ap = AeroProblem(name="dt", mach=mach, alpha=0.0)
    s(ap)
    assert s.solve_info.converged
    s.addFunction("mavgptot", "iface", name="pt_in")
    funcs = {}
    s.evalFunctions(ap, funcs, evalFuncs=["pt_in"])
    np.testing.assert_allclose(funcs["dt_pt_in"], pt, rtol=5e-3)
