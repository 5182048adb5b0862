"""Multigrid (AMG-analogue) preconditioner tests.

Reference analogue: tests/reg_tests/test_amg.py (solves with
ANKGlobalPreconditioner='multigrid'); the stencil/Galerkin algebra has no
reference twin because the reference aggregates a PETSc CSR matrix
(amg.F90 setupAMG:75) while this implementation keeps the 7-point block
stencil form (solvers/amg.py).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.meshgen.analytic import naca0012_omesh
from adflow_tpu.physics.residual import (ProblemConfig, build_topology,
                                         fill_halos)
from adflow_tpu.solvers.amg import (_pool, _prolong, amg_pc_apply,
                                    build_amg_pc, build_stencil_jacobian,
                                    coarsen_stencil, stencil_apply,
                                    stencil_transpose)


# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def stencil_setup():
    mesh = naca0012_omesh(ni=48, nj=16)
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1 / 64,
                        diss_exponent=0.67)
    ap = AeroProblem(name="fs", mach=0.5, alpha=2.0)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = jnp.asarray(ref.winf())
    topo = build_topology(mesh)
    metrics = [compute_metrics(jnp.asarray(b.x)) for b in mesh.blocks]
    rng = np.random.default_rng(0)
    w0 = np.broadcast_to(
        np.asarray(winf),
        tuple(d + 4 for d in mesh.blocks[0].dims) + (5,)).copy()
    w0 *= 1.0 + 0.02 * rng.standard_normal(w0.shape)
    (w,) = fill_halos([jnp.asarray(w0)], metrics, topo, ref, winf)
    dims = mesh.blocks[0].dims
    dtinv = jnp.asarray(0.5 + rng.random(dims))
    return w, metrics[0], cfg, ref, dims, dtinv, rng


def test_stencil_transpose_adjoint(stencil_setup):
    """<A v, u> == <v, A^T u> exactly."""
    w, m, cfg, ref, dims, dtinv, rng = stencil_setup
    op = build_stencil_jacobian(w, m, cfg, ref, dtinv, kappa=1.0)
    v = jnp.asarray(rng.standard_normal(dims + (5,)))
    u = jnp.asarray(rng.standard_normal(dims + (5,)))
    a1 = float(jnp.vdot(stencil_apply(op, v), u))
    a2 = float(jnp.vdot(v, stencil_apply(stencil_transpose(op), u)))
    assert abs(a1 - a2) < 1e-10 * abs(a1)


def test_galerkin_exact(stencil_setup):
    """Coarse stencil == R A P with piecewise-constant P, R = P^T."""
    w, m, cfg, ref, dims, dtinv, rng = stencil_setup
    op = build_stencil_jacobian(w, m, cfg, ref, dtinv, kappa=1.0)
    f = tuple(2 if d % 2 == 0 and d > 1 else 1 for d in dims)
    opc = coarsen_stencil(op, f)
    cd = tuple(d // fa for d, fa in zip(dims, f))
    vc = jnp.asarray(rng.standard_normal(cd + (5,)))
    rap = _pool(stencil_apply(op, _prolong(vc, f)), f)
    acv = stencil_apply(opc, vc)
    err = float(jnp.max(jnp.abs(rap - acv)) / jnp.max(jnp.abs(acv)))
    assert err < 1e-12


@pytest.mark.parametrize("disc", ["central plus scalar dissipation",
                                  "upwind"])
def test_vcycle_contracts(stencil_setup, disc):
    """The V-cycle is a convergent stationary iteration for the
    diagonally-dominant (kappa=1 / |A|) splitting."""
    w, m, cfg, ref, dims, dtinv, rng = stencil_setup
    cfg = dataclasses.replace(cfg, discretization=disc)
    op = build_stencil_jacobian(w, m, cfg, ref, dtinv, kappa=1.0)
    data = build_amg_pc(w, m, cfg, ref, dtinv, levels=3, n_smooth=1,
                        axes=(1, 0, 2), kappa=1.0)
    b = jnp.asarray(rng.standard_normal(dims + (5,)))
    z = jnp.zeros_like(b)
    rel = []
    for _ in range(3):
        z = z + amg_pc_apply(data, b - stencil_apply(op, z))
        rel.append(float(jnp.linalg.norm(b - stencil_apply(op, z))
                         / jnp.linalg.norm(b)))
    assert rel[0] < 0.7
    assert rel[2] < 0.25 * rel[0]


def test_amg_solve_matches_line_pc():
    """Full ANK+NK Euler solve with the multigrid PC reaches the same
    converged CL as the line PC (reference test_amg.py scenario)."""
    from adflow_tpu.api.solver import ADFLOW

    mesh = naca0012_omesh(ni=96, nj=32)
    base = {
        "equationType": "euler",
        "useANKSolver": True,
        "useNKSolver": True,
        "NKSwitchTol": 1e-4,
        "printIterations": False,
        "printTiming": False,
        "nCycles": 300,
        "L2Convergence": 1e-10,
    }
    opts = dict(base)
    opts["ANKGlobalPreconditioner"] = "multigrid"
    opts["NKGlobalPreconditioner"] = "multigrid"
    opts["ANKAMGLevels"] = 3
    opts["NKAMGLevels"] = 3
    solver = ADFLOW(options=opts, mesh=mesh)
    ap = AeroProblem(name="amg", mach=0.5, alpha=2.0,
                     evalFuncs=["cl", "cd"])
    solver(ap)
    assert solver.solve_info.converged
    funcs = {}
    solver.evalFunctions(ap, funcs)
    # line-PC JST reference on this mesh (test_solve_euler): cl = 0.26185
    np.testing.assert_allclose(funcs["amg_cl"], 0.26185, rtol=2e-3)
