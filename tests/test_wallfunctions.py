"""Wall functions (reference: useWallFunctions, computeUtau
solverUtils.F90:2483, curve fits turbCurveFits.F90): a y+ ~ 30 turbulent
flat plate must produce sane Cf with wall functions on, where the resolved
linear gradient would badly underpredict the shear."""

import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import flatplate_mesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow


def _cf_profile(solver):
    import jax.numpy as jnp
    from adflow_tpu.core.mesh import VISCOUS_WALL_BCS
    from adflow_tpu.physics.residual import fill_halos
    from adflow_tpu.physics.surface import (_patch_face_centers,
                                            wall_viscous_tractions)

    w = fill_halos(solver.w_list, solver.metrics_list, solver.topo,
                   solver.ref, solver.winf)
    for patch in solver.wall_patches:
        if patch.bc not in VISCOUS_WALL_BCS:
            continue
        m = solver.metrics_list[patch.block]
        ex = (solver.extras_list[patch.block]
              if solver.extras_list else None)
        df = np.asarray(wall_viscous_tractions(
            w[patch.block], m, solver.cfg, solver.ref, patch, extras=ex))
        s = (m.si, m.sj, m.sk)[patch.axis]
        da = np.linalg.norm(np.asarray(s[patch.face_sl]), axis=-1)
        fc = np.asarray(_patch_face_centers(solver.x_list[patch.block],
                                            patch))
        return fc[:, 0, 0], (df[..., 0] / da)[:, 0]
    raise AssertionError("no viscous wall patch")


def test_spalding_utau_limits():
    """Sublayer limit: u_tau -> sqrt(nu u / d); log-layer: u+ matches the
    log law within a few %."""
    import jax.numpy as jnp
    from adflow_tpu.physics.bc import B_WF, KARMAN_WF, spalding_utau

    # resolved: y+ ~ 0.5
    nu, d1, u = 1e-5, 1e-5, 0.5
    ut = float(spalding_utau(jnp.asarray(u), jnp.asarray(d1),
                             jnp.asarray(nu)))
    assert abs(ut / np.sqrt(nu * u / d1) - 1.0) < 0.05
    # log layer: pick u_tau*, build u from the log law at y+ = 100
    ut_star, yp = 0.05, 100.0
    d1 = yp * nu / ut_star
    u = ut_star * (np.log(yp) / KARMAN_WF + B_WF)
    ut = float(spalding_utau(jnp.asarray(u), jnp.asarray(d1),
                             jnp.asarray(nu)))
    assert abs(ut / ut_star - 1.0) < 0.05, ut / ut_star


@pytest.mark.slow
def test_turbulent_plate_wall_functions():
    mesh = flatplate_mesh(ni=48, nj=24, wall_spacing=6e-4, height=0.3)
    opts = {
        "equationType": "RANS",
        "useWallFunctions": True,
        "ANKSwitchTol": 1.5,
        "L2Convergence": 1e-7,
        "printIterations": False,
        "printTiming": False,
        "nCycles": 250,
    }
    solver = ADFLOW(options=opts, mesh=mesh)
    ap = AeroProblem(name="tp", mach=0.2, reynolds=2e6, reynoldsLength=1.0,
                     T=288.15)
    solver(ap)
    assert solver.solve_info.total_r_final < 1e-5 * solver.solve_info.total_r0
    x, tau = _cf_profile(solver)
    uinf = 0.2
    cf = tau / (0.5 * uinf ** 2)
    rex = np.maximum(uinf * x / solver.ref.mu_inf, 1.0)
    cf_turb = 0.0576 * rex ** (-0.2)    # 1/5-power-law flat plate
    sel = (x > 0.3) & (x < 0.8)
    assert np.all(cf[sel] > 0)
    rel = np.abs(cf[sel] / cf_turb[sel] - 1.0).max()
    # y+ ~ 30 single-point wall model vs correlation: generous band
    assert rel < 0.35, f"wall-function Cf off by {rel:.2f}"


def test_qcr_changes_stresses_preserves_freestream():
    """SA-QCR2000 (useQCR, fluxes.F90:2742): zero effect on a uniform
    stream (no gradients), measurable effect on a sheared turbulent
    solution's forces."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from adflow_tpu.core.refstate import AeroProblem, make_reference_state
    from adflow_tpu.meshgen.analytic import cube_mesh, wing_omesh
    from adflow_tpu.physics.residual import (ProblemConfig, build_topology,
                                             residual_list)
    from adflow_tpu.geom.metrics import compute_metrics
    from adflow_tpu.geom.walldist import compute_wall_distances

    cfg = ProblemConfig(equation_type="rans", vis2=0.25, vis4=1 / 64,
                        diss_exponent=0.67, turbulence_model="sa",
                        turb_res_scale=1e4, use_qcr=True)
    mesh = cube_mesh(n=6, perturb=0.2, seed=3)
    ap = AeroProblem(name="fs", mach=0.5, alpha=2.0, reynolds=1e6)
    ref = make_reference_state(ap, lift_index=2, n_turb=1)
    winf = jnp.asarray(ref.winf())
    topo = build_topology(mesh)
    mets = [compute_metrics(jnp.asarray(b.x)) for b in mesh.blocks]
    xs = [jnp.asarray(b.x) for b in mesh.blocks]
    ds = compute_wall_distances(mesh, xs, xs[0].dtype)
    extras = [{"walldist": d} for d in ds]
    w = [jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims) + (6,))
         for b in mesh.blocks]
    (r,) = residual_list(w, mets, topo, cfg, ref, winf, extras)
    assert float(jnp.max(jnp.abs(r[..., :5]))) < 1e-12

    # sheared state: QCR changes the residual, no-QCR path unchanged
    mesh2 = wing_omesh(ni=24, nj=10, nk=6, viscous=True)
    topo2 = build_topology(mesh2)
    mets2 = [compute_metrics(jnp.asarray(b.x)) for b in mesh2.blocks]
    xs2 = [jnp.asarray(b.x) for b in mesh2.blocks]
    ds2 = compute_wall_distances(mesh2, xs2, xs2[0].dtype)
    ex2 = [{"walldist": d} for d in ds2]
    rng = np.random.default_rng(0)
    w0 = np.broadcast_to(
        np.asarray(winf),
        tuple(d + 4 for d in mesh2.blocks[0].dims) + (6,)).copy()
    w0[..., 1] *= 1.0 + 0.1 * rng.standard_normal(w0.shape[:-1])
    wj = [jnp.asarray(w0)]
    (r_q,) = residual_list(wj, mets2, topo2, cfg, ref, winf, ex2)
    cfg0 = dataclasses.replace(cfg, use_qcr=False)
    (r_0,) = residual_list(wj, mets2, topo2, cfg0, ref, winf, ex2)
    dmax = float(jnp.max(jnp.abs(r_q - r_0)))
    assert dmax > 1e-8, dmax
    assert np.all(np.isfinite(np.asarray(r_q)))
