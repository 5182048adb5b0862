"""Multiple-BC / BC-data subsystem tests.

Reference analogue: tests/reg_tests/test_multiple_bc.py (a duct with an
'outflow' family at prescribed Pressure and two inflow families at
different PressureStagnation/TemperatureStagnation, set via setBCVar) +
the BC-data plumbing of src/bcdata/BCData.F90:1403 setBCData (per-subface
prescribed scalars AND arrays).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.mesh import (BCSubface, BCType, Block, Face,
                                  MultiBlockMesh)
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import channel_mesh

import pytest

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow


def _two_inflow_channel(ni=32, nj=16, nk=4):
    """Channel whose inflow face is split into two families (lower/upper
    half) — the reference's multi-inflow duct scenario."""
    base = channel_mesh(ni=ni, nj=nj, nk=nk, width=0.5)
    b = base.blocks[0]
    bcs = []
    for sf in b.bcs:
        if sf.face is Face.IMIN:
            bcs.append(BCSubface(Face.IMIN, BCType.SUBSONIC_INFLOW,
                                 family="inflow1",
                                 rng=((0, nj // 2), (0, nk))))
            bcs.append(BCSubface(Face.IMIN, BCType.SUBSONIC_INFLOW,
                                 family="inflow2",
                                 rng=((nj // 2, nj), (0, nk))))
        else:
            bcs.append(sf)
    return MultiBlockMesh([Block("duct", b.x, bcs, b.conns)], name="duct")


OPTS = {
    "equationType": "euler",
    "useANKSolver": True,
    "useNKSolver": False,
    "nCycles": 250,
    "L2Convergence": 1e-6,
    "printIterations": False,
    "printTiming": False,
}


def test_multi_family_bc_data_solve():
    """Two inflow families at different Pt + prescribed outflow P: solves,
    conserves mass, and the family with higher Pt carries more flow."""
    mesh = _two_inflow_channel()
    solver = ADFLOW(options=OPTS, mesh=mesh)
    ap = AeroProblem(name="duct", mach=0.3, alpha=0.0)
    solver.setAeroProblem(ap)

    gamma = 1.4
    m = 0.3
    pt = solver.ref.p_inf * (1 + 0.2 * m**2) ** (gamma / (gamma - 1))
    tt = 1.0 + 0.2 * m**2
    # setBCVar per family (reference: ap.setBCVar('PressureStagnation', ...))
    solver.setBCVar("PressureStagnation", pt * 1.04, "inflow1")
    solver.setBCVar("PressureStagnation", pt * 1.01, "inflow2")
    solver.setBCVar("TemperatureStagnation", tt * 1.05, "inflow1")
    solver.setBCVar("TemperatureStagnation", tt, "inflow2")
    solver.setBCVar("Pressure", solver.ref.p_inf, "outflow")

    solver(ap)
    assert solver.solve_info.converged, solver.solve_info

    funcs = {}
    solver.addFunction("mdot", "inflow1", name="mdot_in1")
    solver.addFunction("mdot", "inflow2", name="mdot_in2")
    solver.addFunction("mdot", "outflow", name="mdot_out")
    solver.addFunction("aavgptot", "inflow1", name="ptot_in1")
    solver.addFunction("aavgptot", "inflow2", name="ptot_in2")
    solver.evalFunctions(ap, funcs, evalFuncs=[
        "mdot_in1", "mdot_in2", "mdot_out", "ptot_in1", "ptot_in2"])
    m1 = funcs["duct_mdot_in1"]
    m2 = funcs["duct_mdot_in2"]
    mo = funcs["duct_mdot_out"]
    # conservation: in = out (sign conventions: mdot positive into domain)
    assert abs((m1 + m2 + mo) / max(abs(mo), 1e-12)) < 2e-3, (m1, m2, mo)
    # the higher-Pt family pushes more flow
    assert m1 > m2 > 0.0, (m1, m2)
    # achieved boundary total pressures reflect the prescribed split
    np.testing.assert_allclose(funcs["duct_ptot_in1"], pt * 1.04, rtol=2e-2)
    np.testing.assert_allclose(funcs["duct_ptot_in2"], pt * 1.01, rtol=2e-2)


def test_bc_array_profile_and_bleed():
    """Per-subface ARRAY data: a spanwise outflow-pressure profile changes
    the solution accordingly; mass-bleed outflow behaves as prescribed-p
    outflow (BCRoutines.F90:163-168)."""
    ni, nj, nk = 24, 12, 4
    mesh = channel_mesh(ni=ni, nj=nj, nk=nk, width=0.5)
    solver = ADFLOW(options=OPTS, mesh=mesh)
    ap = AeroProblem(name="prof", mach=0.3, alpha=0.0)
    solver.setAeroProblem(ap)
    p0 = solver.ref.p_inf
    # linear pressure profile across j on the outflow face (j, k window)
    prof = p0 * (1.0 + 0.02 * np.linspace(-1, 1, nj))[:, None] \
        * np.ones((1, nk))
    solver.setBCVar("Pressure", prof, "outflow")
    solver(ap)
    assert solver.solve_info.converged
    # achieved static pressure at the outflow varies along j like the
    # prescribed profile: check the boundary-adjacent interior cells
    from adflow_tpu.physics.thermo import pressure as _pres
    wf = solver._filled_w()[0]
    p_edge = np.asarray(_pres(wf))[-3, 2:-2, 2 + nk // 2]
    corr = np.corrcoef(p_edge, prof[:, 0])[0, 1]
    assert corr > 0.9, corr

    # bleed outflow: same scenario through the MASS_BLEED_OUTFLOW enum
    b = mesh.blocks[0]
    bcs = [dataclasses.replace(sf, bc=BCType.MASS_BLEED_OUTFLOW)
           if sf.face is Face.IMAX else sf for sf in b.bcs]
    mesh2 = MultiBlockMesh([Block("duct", b.x, bcs, b.conns)], name="d2")
    s2 = ADFLOW(options=OPTS, mesh=mesh2)
    ap2 = AeroProblem(name="bleed", mach=0.3, alpha=0.0)
    s2.setAeroProblem(ap2)
    s2.setBCVar("Pressure", p0 * 0.99, "outflow")
    s2(ap2)
    assert s2.solve_info.converged


def test_supersonic_inflow_prescribed_state():
    """SUPERSONIC_INFLOW / DOMAIN_INTERFACE_ALL with a prescribed state
    (BCData.F90:2282): uniform prescribed free stream must preserve the
    free stream exactly."""
    from adflow_tpu.core.refstate import make_reference_state
    from adflow_tpu.geom.metrics import compute_metrics
    from adflow_tpu.physics.residual import (ProblemConfig, build_topology,
                                             residual_list)

    ni, nj, nk = 12, 8, 4
    base = channel_mesh(ni=ni, nj=nj, nk=nk, width=0.5)
    b = base.blocks[0]
    ap = AeroProblem(name="ss", mach=2.0, alpha=0.0)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = np.asarray(ref.winf())
    rho = winf[0]
    v = winf[1:4] / rho
    p = 0.4 * (winf[4] - 0.5 * rho * np.dot(v, v))
    bcs = []
    for sf in b.bcs:
        if sf.face is Face.IMIN:
            # prescribed ARRAY state equal to the free stream
            shp = (nj, nk)
            bcs.append(BCSubface(
                Face.IMIN, BCType.DOMAIN_INTERFACE_ALL, family="in",
                data={"rho": np.full(shp, rho), "vx": np.full(shp, v[0]),
                      "vy": np.full(shp, v[1]), "vz": np.full(shp, v[2]),
                      "P": np.full(shp, p)}))
        elif sf.face is Face.IMAX:
            bcs.append(BCSubface(Face.IMAX, BCType.SUPERSONIC_OUTFLOW,
                                 family="out"))
        else:
            bcs.append(sf)
    mesh = MultiBlockMesh([Block("ss", b.x, bcs, b.conns)], name="ss")
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1 / 64,
                        diss_exponent=0.67)
    topo = build_topology(mesh)
    mets = [compute_metrics(jnp.asarray(bb.x)) for bb in mesh.blocks]
    w = [jnp.broadcast_to(jnp.asarray(winf),
                          tuple(d + 4 for d in bb.dims) + (5,))
         for bb in mesh.blocks]
    (r,) = residual_list(w, mets, topo, cfg, ref, jnp.asarray(winf))
    assert float(jnp.max(jnp.abs(r))) < 1e-12
