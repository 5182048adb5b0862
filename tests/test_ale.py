"""ALE / grid-motion tests.

Reference analogue: grid velocities (solverUtils.F90:358-1193) + ALE
(ALEUtils.F90). Checks: (1) freestream preservation under rigid
rotation+translation of the grid (the discrete GCL for the velocity terms);
(2) a normally-moving Euler wall (piston) pumps energy with the right sign;
(3) rotRate through the public API runs and produces finite forces.
"""

import numpy as np
import jax.numpy as jnp

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import add_grid_motion, compute_metrics
from adflow_tpu.meshgen.analytic import cube_mesh, naca0012_omesh
from adflow_tpu.physics.residual import (
    ProblemConfig, build_topology, residual_list)


import pytest

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

def _fs_residual(mesh, omega, center, vtrans):
    topo = build_topology(mesh)
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1 / 64,
                        diss_exponent=0.67)
    ap = AeroProblem(name="fs", mach=0.6, alpha=5.0, beta=2.0)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = jnp.asarray(ref.winf())
    metrics = [add_grid_motion(compute_metrics(jnp.asarray(b.x)),
                               jnp.asarray(b.x), omega, center, vtrans)
               for b in mesh.blocks]
    w_list = [jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims)
                               + (5,)).astype(jnp.float64)
              for b in mesh.blocks]
    r = residual_list(w_list, metrics, topo, cfg, ref, winf)
    return max(float(jnp.max(jnp.abs(rb))) for rb in r)


def test_ale_freestream_translation_perturbed():
    # pure translation: exact GCL on any mesh (sum of S_f = 0 per cell)
    mesh = cube_mesh(n=6, perturb=0.25)
    assert _fs_residual(mesh, (0, 0, 0), (0, 0, 0), (0.3, -0.2, 0.1)) < 1e-12


def test_ale_freestream_rotation_uniform():
    # rigid rotation: velocity divergence telescopes exactly on a uniform
    # grid with centroid-sampled face velocities
    mesh = cube_mesh(n=6)
    assert _fs_residual(mesh, (0.2, -0.4, 0.7), (0.3, 0.4, 0.5),
                        (0.1, 0.0, -0.2)) < 1e-12


def test_ale_piston_mass_signs():
    """Euler-wall box translating along +x with fluid at rest: the +x wall
    recedes from the interior fluid (rarefaction, R_mass > 0 in the
    V dw/dt = -R convention) and the -x wall advances into it (compression,
    R_mass < 0); interior columns telescope to zero; total energy work of
    the two opposing walls cancels."""
    from adflow_tpu.core.mesh import BCType
    mesh = cube_mesh(n=6, bc=BCType.EULER_WALL)
    topo = build_topology(mesh)
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1 / 64,
                        diss_exponent=0.67)
    ap = AeroProblem(name="pis", mach=0.5)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    # fluid at rest at freestream thermodynamic state
    winf_rest = np.array(ref.winf())
    winf_rest[1:4] = 0.0
    winf = jnp.asarray(winf_rest)
    x = jnp.asarray(mesh.blocks[0].x)
    m = add_grid_motion(compute_metrics(x), x, (0, 0, 0),
                        vtrans=(0.2, 0.0, 0.0))
    w = jnp.broadcast_to(winf, (10, 10, 10, 5)).astype(jnp.float64)
    (r,) = residual_list([w], [m], topo, cfg, ref, winf)
    # cells at the +x wall: face work p * sdot > 0 leaving ... net energy
    # flux through the moving wall = p*sdot on the high-x face minus low-x
    # face contributions; interior cells cancel. Total over the box:
    total_E = float(jnp.sum(r[..., 4]))
    assert abs(total_E) < 1e-12          # opposing walls' work cancels
    rm = np.array(r[..., 0])
    assert (rm[-1] > 1e-6).all()         # +x wall cells: rarefaction
    assert (rm[0] < -1e-6).all()         # -x wall cells: compression
    assert np.abs(rm[1:-1]).max() < 1e-12  # interior telescopes exactly


def test_rotrate_api():
    mesh = naca0012_omesh(ni=32, nj=12)
    from adflow_tpu.api.solver import ADFLOW
    solver = ADFLOW(options={"equationType": "euler", "useANKSolver": False,
                             "useNKSolver": False, "nCycles": 5},
                    mesh=mesh)
    ap = AeroProblem(name="rot", mach=0.5, alpha=0.0,
                     rotRate=(0.0, 0.0, 10.0), rotCenter=(0.25, 0.0, 0.0),
                     evalFuncs=["cl", "cd"])
    solver(ap)
    funcs = {}
    solver.evalFunctions(ap, funcs)
    assert np.isfinite(funcs["rot_cl"]) and np.isfinite(funcs["rot_cd"])
