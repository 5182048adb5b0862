"""Explicit smoothers: multistage Runge-Kutta (DADI variant later).

Reference analogue: ``RungeKuttaSmoother`` / ``executeRkStage``
(`/root/reference/src/solver/smoothers.F90:4,90`): 5-stage scheme with local
time stepping. The reference freezes dissipation between stages via rFil
blending (residuals.F90:58-66); here the full residual is evaluated per stage
(simpler, still the classic JST stage coefficients) — cheap on TPU where the
whole stage fuses into one kernel launch.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from adflow_tpu.physics.residual import (
    MeshTopology, ProblemConfig, fill_halos, block_residual)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.physics.timestep import local_timestep

RK_COEFFS = (0.25, 1.0 / 6.0, 0.375, 0.5, 1.0)  # JST 5-stage (smoothers.F90)


def residual_averaging(r, eps: float):
    """Implicit residual smoothing: (I - eps d^2)^-1 r per direction
    (reference: residualAveraging, residuals.F90:1785) — extends the RK
    stability region so MG can run higher CFL on stretched meshes.
    r: (ni, nj, nk, nv); constant coefficient eps ~ ((cfl/cfl*)^2 - 1)/4."""
    from adflow_tpu.solvers.dadi import tridiag_solve
    for axis in range(3):
        n = r.shape[axis]
        if n < 3:
            continue
        rm = jnp.moveaxis(r, axis, 0)
        shp = rm.shape[:-1]
        lo = jnp.full(shp, -eps, r.dtype).at[0].set(0.0)
        up = jnp.full(shp, -eps, r.dtype).at[-1].set(0.0)
        dg = jnp.full(shp, 1.0 + 2.0 * eps, r.dtype)
        dg = dg.at[0].set(1.0 + eps).at[-1].set(1.0 + eps)
        rm = tridiag_solve(lo, dg, up, rm)
        r = jnp.moveaxis(rm, 0, axis)
    return r


def residual_norms(r_list: Sequence[jnp.ndarray], n_mean: int = 5):
    """(||R_meanflow||_2, ||R_turb||_2) over all blocks — the reference's
    totalR / resrho / resturb monitors (solvers.F90 convergenceInfo)."""
    s_mean = 0.0
    s_turb = 0.0
    for r in r_list:
        s_mean = s_mean + jnp.sum(r[..., :n_mean] ** 2)
        if r.shape[-1] > n_mean:
            s_turb = s_turb + jnp.sum(r[..., n_mean:] ** 2)
    return jnp.sqrt(s_mean), jnp.sqrt(s_turb)


def dadi_iteration(w_list, metrics_list, topo: MeshTopology,
                   cfg: ProblemConfig, ref, winf, cfl, extras_list=None):
    """One diagonalized-ADI implicit smoother iteration on all blocks.

    Reference analogue: ``DADISmoother`` / ``executeDADIStep``
    (`/root/reference/src/solver/smoothers.F90:383,425`): factored implicit
    update (D + A_i)(D + A_j)(D + A_k) dz = R with D = V/dt, allowing much
    higher CFL than explicit RK. TPU-native design: the factors are the
    line-implicit operators of solvers/linpc.py — EXACT signed 5x5 flux
    Jacobians with spectral-radius splitting per direction, solved by
    batched block-Thomas (the unsigned scalar model in solvers/dadi.py is a
    valid GMRES preconditioner but diverges as a Richardson smoother on
    convective problems). Same in/out contract as rk_iteration (halos
    unfilled outside); scaled turbulence rows handled by the PC itself.
    """
    from adflow_tpu.physics.fluxes import spectral_radii
    from adflow_tpu.physics.timestep import viscous_spectral_radii
    from adflow_tpu.solvers.linpc import build_line_pc, line_pc_apply

    w0_list = fill_halos(w_list, metrics_list, topo, ref, winf)

    r_list = [block_residual(w, m, cfg, ref,
                             extras_list[i] if extras_list else None,
                             por=topo.blocks[i].por)
              for i, (w, m) in enumerate(zip(w0_list, metrics_list))]
    new = []
    for i, (w, m, r) in enumerate(zip(w0_list, metrics_list, r_list)):
        p = pressure(w)
        rI, rJ, rK = spectral_radii(w, jnp.maximum(p, 1e-10), m,
                                    cfg.ls_precon_mach)
        rs = (rI + rJ + rK)[1:-1, 1:-1, 1:-1]
        if cfg.viscous:
            rv = viscous_spectral_radii(w, m, cfg, ref)
            rs = rs + 4.0 * (rv[0] + rv[1] + rv[2])
        dtinv = rs / cfl                           # V/dt per cell
        if r.shape[-1] > 5 and cfg.turbulence_model == "sa" and extras_list:
            # fold the stiff SA destruction diagonal into the turbulence
            # rows (the PC's turb operator has only advection + dt)
            from adflow_tpu.physics.sa import sa_destruction_diag
            diag = sa_destruction_diag(w, m, extras_list[i]["walldist"])
            rt = r[..., 5:] / (1.0 + diag / dtinv)[..., None]
            r = jnp.concatenate([r[..., :5], rt], axis=-1)
        data = build_line_pc(w, m, cfg, ref, dtinv, axes=(0, 1, 2))
        dz = line_pc_apply(data, r)
        upd = w[2:-2, 2:-2, 2:-2] - dz
        new.append(w.at[2:-2, 2:-2, 2:-2].set(upd))
    return new, r_list


def rk_iteration(w_list, metrics_list, topo: MeshTopology, cfg: ProblemConfig,
                 ref, winf, cfl, extras_list=None,
                 coeffs: Sequence[float] = RK_COEFFS):
    """One multistage RK iteration on all blocks.

    Returns (new w_list, first-stage residual list). States enter and leave
    with halos *unfilled* (interior authoritative); halos are (re)filled
    internally before each residual evaluation.
    """
    w0_list = fill_halos(w_list, metrics_list, topo, ref, winf)
    # frozen local dt over the stages
    dt_list = []
    for w, m in zip(w0_list, metrics_list):
        p = pressure(w)
        dt = local_timestep(w, p, m, cfl, cfg, ref)
        dt_list.append(dt / m.vol[2:-2, 2:-2, 2:-2])

    # point-implicit diagonal for the stiff SA destruction term (frozen over
    # the stages like dt); see sa.sa_destruction_diag for the rationale
    diag_list = [None] * len(w0_list)
    if cfg.rans and cfg.turbulence_model == "sa" and extras_list:
        from adflow_tpu.physics.sa import sa_destruction_diag
        diag_list = [
            sa_destruction_diag(w, m, extras_list[i]["walldist"])
            for i, (w, m) in enumerate(zip(w0_list, metrics_list))]

    nmf = 5  # mean-flow channel count
    # residuals come back with turbResScale-scaled turbulence rows (for
    # norm/Newton balance); the explicit update must undo that scaling
    inv_ts = None
    if cfg.rans and any(s != 1.0 for s in cfg.turb_scales):
        inv_ts = jnp.asarray([1.0 / s for s in cfg.turb_scales],
                             w0_list[0].dtype)

    r0_list = None
    wk_list = w0_list
    for alpha in coeffs:
        r_list = [block_residual(w, m, cfg, ref,
                                 extras_list[i] if extras_list else None,
                                 por=topo.blocks[i].por)
                  for i, (w, m) in enumerate(zip(wk_list, metrics_list))]
        if r0_list is None:
            r0_list = r_list
        new = []
        for w0, r, dtv, diag in zip(w0_list, r_list, dt_list, diag_list):
            if r.shape[-1] > nmf and (diag is not None or inv_ts is not None):
                rt = r[..., nmf:]
                if inv_ts is not None:
                    rt = rt * inv_ts
                if diag is not None:
                    rt = rt / (1.0 + alpha * dtv * diag)[..., None]
                r = jnp.concatenate([r[..., :nmf], rt], axis=-1)
            upd = w0[2:-2, 2:-2, 2:-2] - alpha * dtv[..., None] * r
            new.append(w0.at[2:-2, 2:-2, 2:-2].set(upd))
        wk_list = fill_halos(new, metrics_list, topo, ref, winf)
    return wk_list, r0_list
