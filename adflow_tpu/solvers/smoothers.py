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
        for w0, r, dtv in zip(w0_list, r_list, dt_list):
            upd = w0[2:-2, 2:-2, 2:-2] - alpha * dtv[..., None] * r
            new.append(w0.at[2:-2, 2:-2, 2:-2].set(upd))
        wk_list = fill_halos(new, metrics_list, topo, ref, winf)
    return wk_list, r0_list
