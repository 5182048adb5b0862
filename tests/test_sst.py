"""SST k-omega model tests (reference: src/turbulence/SST.F90; one of the
two supported models, doc/options.yaml turbulenceModel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import cube_mesh, flatplate_mesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow


def test_sst_freestream_meanflow_consistency():
    """Mean-flow residual of uniform free stream must vanish with SST
    (the k/omega residuals themselves carry the physical freestream
    turbulence decay -beta*omega^2 and are NOT zero)."""
    mesh = cube_mesh(n=6, perturb=0.2, seed=2)
    s = ADFLOW(options={"equationType": "RANS", "turbulenceModel": "SST",
                        "useANKSolver": False, "useNKSolver": False},
               mesh=mesh)
    ap = AeroProblem(name="fs", mach=0.3, alpha=2.0, reynolds=1e6)
    s.setAeroProblem(ap)
    r = s.getResidual(ap)[0]
    assert float(jnp.max(jnp.abs(r[..., :5]))) < 1e-12
    # freestream decay term is the analytic -beta2-ish * omega^2 * vol < 0
    assert bool(jnp.all(jnp.isfinite(r)))


def test_sst_eddy_viscosity_freestream():
    """mu_t/mu at the free stream matches eddyVisInfRatio by construction
    of (k_inf, omega_inf)."""
    from adflow_tpu.core.refstate import make_reference_state
    from adflow_tpu.geom.metrics import compute_metrics
    from adflow_tpu.physics.sst import eddy_viscosity
    from adflow_tpu.physics.thermo import pressure

    mesh = cube_mesh(n=6)
    ap = AeroProblem(name="fs", mach=0.3, reynolds=1e6)
    ref = make_reference_state(ap, n_turb=2)
    winf = jnp.asarray(ref.winf())
    b = mesh.blocks[0]
    w = jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims) + (7,))
    m = compute_metrics(jnp.asarray(b.x))
    d_ext = jnp.full(tuple(d + 2 for d in b.dims), 1e3)  # far from any wall
    mut = eddy_viscosity(w, pressure(w), m, ref, d_ext)
    np.testing.assert_allclose(np.asarray(mut) / ref.mu_inf, 0.009,
                               rtol=1e-6)


def test_sst_plate_residual_finite_and_runs():
    """SST on a turbulent flat plate: residual evaluation finite, RK
    iterations stay finite (full deep-convergence SST solves need the
    segregated turbulence scaling — tracked as follow-up work)."""
    mesh = flatplate_mesh(ni=24, nj=24, wall_spacing=1e-4, height=0.5)
    s = ADFLOW(options={"equationType": "RANS", "turbulenceModel": "SST",
                        "useANKSolver": False, "useNKSolver": False,
                        "nCycles": 10, "CFL": 1.0,
                        "printIterations": False, "printTiming": False},
               mesh=mesh)
    ap = AeroProblem(name="fp", mach=0.2, reynolds=1e6)
    s(ap)
    assert np.isfinite(s.solve_info.total_r_final)
