"""Laminar Navier-Stokes regression: flat plate vs the Blasius similarity
solution (reference analogue: the laminar regression cases of
tests/reg_tests/test_solve.py; here validated against theory instead of
golden files — self-contained, no mesh downloads)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import flatplate_mesh
from adflow_tpu.physics.residual import fill_halos

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {
    "equationType": "laminar NS",
    "ANKSwitchTol": 1.5,
    "L2Convergence": 1e-10,
    "printIterations": False,
    "printTiming": False,
    "nCycles": 150,
}


@pytest.fixture(scope="module")
def solved_plate():
    mesh = flatplate_mesh(ni=64, nj=48, wall_spacing=4e-4, height=0.4)
    solver = ADFLOW(options=OPTS, mesh=mesh)
    ap = AeroProblem(name="plate", mach=0.2, reynolds=1e4, reynoldsLength=1.0,
                     T=288.15)
    solver(ap)
    return solver, ap


def blasius_fprime():
    sol = solve_ivp(lambda t, z: [z[1], z[2], -0.5 * z[0] * z[2]],
                    [0, 10], [0, 0, 0.332057], dense_output=True, rtol=1e-10)
    return lambda eta: sol.sol(np.clip(eta, 0, 10))[1]


def test_plate_deep_convergence(solved_plate):
    solver, _ = solved_plate
    assert solver.solve_info.converged
    assert solver.solve_info.total_r_final < 1e-10 * solver.solve_info.total_r0
    assert solver.solve_info.iterations < 100


def test_blasius_profile(solved_plate):
    solver, _ = solved_plate
    w = fill_halos(solver.w_list, solver.metrics_list, solver.topo,
                   solver.ref, solver.winf)[0]
    xc = np.asarray(solver.metrics_list[0].xc_ext)[1:-1, 1:-1, 1:-1]
    wi = np.asarray(w)[2:-2, 2:-2, 2:-2]
    uinf, nu = 0.2, solver.ref.mu_inf
    fprime = blasius_fprime()
    i_x = np.argmin(np.abs(xc[:, 0, 0, 0] - 0.5))
    x_loc = xc[i_x, 0, 0, 0]
    u = wi[i_x, :, 0, 1] / wi[i_x, :, 0, 0]
    y = xc[i_x, :, 0, 1]
    eta = y * np.sqrt(uinf / (nu * x_loc))
    mask = eta < 8
    err = np.abs(u[mask] / uinf - fprime(eta[mask])).max()
    assert err < 0.05, f"u-profile deviates {err:.3f} from Blasius"


def test_skin_friction(solved_plate):
    solver, _ = solved_plate
    w = fill_halos(solver.w_list, solver.metrics_list, solver.topo,
                   solver.ref, solver.winf)[0]
    xc = np.asarray(solver.metrics_list[0].xc_ext)[1:-1, 1:-1, 1:-1]
    wi = np.asarray(w)[2:-2, 2:-2, 2:-2]
    uinf, nu = 0.2, solver.ref.mu_inf
    i_x = np.argmin(np.abs(xc[:, 0, 0, 0] - 0.5))
    x_loc = xc[i_x, 0, 0, 0]
    u1 = wi[i_x, 0, 0, 1] / wi[i_x, 0, 0, 0]
    y1 = xc[i_x, 0, 0, 1]
    cf = nu * u1 / y1 / (0.5 * uinf ** 2)
    cf_blasius = 0.664 / np.sqrt(uinf * x_loc / nu)
    assert abs(cf / cf_blasius - 1.0) < 0.12


def test_viscous_freestream_preservation():
    from adflow_tpu.meshgen.analytic import cube_mesh
    mesh = cube_mesh(n=6, perturb=0.2, seed=2)
    solver = ADFLOW(options=dict(OPTS, useANKSolver=False), mesh=mesh)
    ap = AeroProblem(name="fs", mach=0.3, alpha=2.0, reynolds=1e4)
    solver.setAeroProblem(ap)
    r = solver.getResidual(ap)
    assert max(float(jnp.max(jnp.abs(x))) for x in r) < 1e-12


def test_wall_traction_blasius(solved_plate):
    """Full-gradient viscous traction (physics/surface.py
    wall_viscous_tractions, the round-3 replacement for the thin-layer
    estimate) must reproduce Blasius Cf(x) along the plate and point
    DOWNSTREAM (drag, not thrust)."""
    from adflow_tpu.core.mesh import VISCOUS_WALL_BCS
    from adflow_tpu.physics.surface import wall_viscous_tractions

    solver, _ = solved_plate
    w = fill_halos(solver.w_list, solver.metrics_list, solver.topo,
                   solver.ref, solver.winf)
    uinf, nu = 0.2, solver.ref.mu_inf
    checked = False
    for patch in solver.wall_patches:
        if patch.bc not in VISCOUS_WALL_BCS:
            continue
        m = solver.metrics_list[patch.block]
        df = np.asarray(wall_viscous_tractions(
            w[patch.block], m, solver.cfg, solver.ref, patch))
        s = (m.si, m.sj, m.sk)[patch.axis]
        da = np.linalg.norm(np.asarray(s[patch.face_sl]), axis=-1)
        # face-center x positions along the plate
        from adflow_tpu.physics.surface import _patch_face_centers
        fc = np.asarray(_patch_face_centers(
            solver.x_list[patch.block], patch))
        x_face = fc[:, 0, 0]
        cf = df[..., 0] / da / (0.5 * uinf ** 2)
        cf_line = cf[:, 0]
        cf_blasius = 0.664 / np.sqrt(np.maximum(uinf * x_face / nu, 1e-30))
        # compare where the BL is thin vs the domain height (downstream the
        # finite-height blockage accelerates the outer flow and Cf sits
        # ~10% above Blasius — measured, physical, not a traction error)
        sel = (x_face > 0.05) & (x_face < 0.35)
        assert np.all(cf_line[x_face > 0.05] > 0), "traction points upstream"
        rel = np.abs(cf_line[sel] / cf_blasius[sel] - 1.0).max()
        assert rel < 0.06, f"Cf deviates {rel:.3f} from Blasius"
        checked = True
    assert checked


def test_getforces_sums_to_integrated(solved_plate):
    """Nodal getForces (pressure + viscous) must sum to the integrated
    force vector including CDv (reference: getForces.F90:2 conservation of
    the cell->node transfer)."""
    from adflow_tpu.physics.residual import fill_halos as _fh
    from adflow_tpu.physics.surface import integrate_forces

    solver, _ = solved_plate
    nodal = solver.getForces()
    wf = _fh(solver.w_list, solver.metrics_list, solver.topo, solver.ref,
             solver.winf)
    f = integrate_forces(wf, solver.x_list, solver.metrics_list,
                         solver.wall_patches, solver.ref, solver.cfg,
                         extras_list=solver.extras_list)
    # getForces returns dimensional Newtons (p_ref_dim scale)
    total = np.asarray(f["force_p"] + f["force_v"]) * solver.ref.p_ref_dim
    got = nodal.sum(axis=0)
    assert np.allclose(got, total, rtol=1e-10, atol=1e-14), (got, total)
    # viscous drag must be positive and dominate on a flat plate
    fv = np.asarray(f["force_v"])
    assert fv[0] > 0.0
