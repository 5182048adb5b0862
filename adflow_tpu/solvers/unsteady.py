"""Time-accurate solvers: BDF1/2 dual-time stepping and explicit RK.

Reference analogues (`/root/reference/src/solver/solvers.F90`):
- ``solverUnsteadyInit/Step`` (:124,317) — BDF dual time: the unsteady
  residual R* = V/dt (c0 w + c1 w^n + c2 w^{n-1}) + R(w) enters the steady
  machinery through ``initres_block`` (residuals.F90:427) and is driven to
  zero in pseudo-time each physical step; ``setCoefTimeIntegrator``
  (utils/utils.F90:1535) picks the BDF coefficients.
- ``solverUnsteadyExplicitRK`` (:486) — global-time-step RK4.
- ``shiftSolution`` (solverUtils.F90:2267) — history shift between steps.

TPU-first: one physical step = one jitted function; the pseudo-time loop is
a lax.scan chunk; history states are carried as explicit pytrees (no
flowDoms 'old solution levels' mutation).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.physics.residual import (
    MeshTopology, ProblemConfig, block_residual, fill_halos)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.physics.timestep import local_timestep
from adflow_tpu.solvers.smoothers import RK_COEFFS, residual_norms


class UnsteadyInfo(NamedTuple):
    n_steps: int
    times: np.ndarray
    inner_res: np.ndarray       # final pseudo-time residual per step
    failed: bool


def bdf_coefficients(order: int, first_step: bool):
    """(c0, c1, c2): V/dt (c0 w^{n+1} + c1 w^n + c2 w^{n-1})."""
    if order == 1 or first_step:
        return 1.0, -1.0, 0.0
    return 1.5, -2.0, 0.5


def unsteady_residual_list(w_list, wn_list, wnm1_list, metrics_list,
                           topo: MeshTopology, cfg, ref, winf, dt,
                           coefs, extras_list=None):
    """R*(w) = R(w) + V/dt (c0 w + c1 w^n + c2 w^{n-1}) per block
    (residuals.F90 initres_block BDF terms)."""
    c0, c1, c2 = coefs
    wf = fill_halos(w_list, metrics_list, topo, ref, winf)
    rsv = cfg.row_scale(w_list[0].dtype)
    out = []
    for i, (w, m) in enumerate(zip(wf, metrics_list)):
        ex = extras_list[i] if extras_list else None
        r = block_residual(w, m, cfg, ref, ex, por=topo.blocks[i].por)
        vol = m.vol[2:-2, 2:-2, 2:-2][..., None]
        acc = (c0 * w[2:-2, 2:-2, 2:-2]
               + c1 * wn_list[i][2:-2, 2:-2, 2:-2]
               + c2 * wnm1_list[i][2:-2, 2:-2, 2:-2])[..., :r.shape[-1]]
        if rsv is not None:
            # turbulence rows of R carry turbResScale — scale the BDF time
            # term identically so R* = S * (V/dt acc + R) row-scales the
            # physical unsteady equations (same zero set)
            acc = acc * rsv
        out.append(r + vol / dt * acc)
    return out


def make_dual_time_step(metrics_list, topo, cfg, ref, winf, dt,
                        order: int, extras_list=None, cfl: float = 2.0,
                        n_inner: int = 50):
    """Jitted: advance one physical step by pseudo-time RK on R*."""

    def step(w_list, wn_list, wnm1_list, first_step):
        coefs = bdf_coefficients(order, False)
        coefs1 = bdf_coefficients(order, True)

        def inner(carry, _):
            w_list = carry

            def resid(w_list, coefs):
                return unsteady_residual_list(
                    w_list, wn_list, wnm1_list, metrics_list, topo, cfg,
                    ref, winf, dt, coefs, extras_list)

            w0 = fill_halos(w_list, metrics_list, topo, ref, winf)
            dt_list = []
            for w, m in zip(w0, metrics_list):
                p = pressure(w)
                dtl = local_timestep(w, p, m, cfl, cfg, ref)
                vol = m.vol[2:-2, 2:-2, 2:-2]
                # bound the pseudo-step by the physical step (dual-time rule)
                dt_list.append(jnp.minimum(dtl, 0.75 * dt) / vol)
            wk = w0
            r_first = None
            rsv = cfg.row_scale(w0[0].dtype)
            inv_rsv = None if rsv is None else 1.0 / rsv
            for alpha in RK_COEFFS:
                c = jax.lax.cond(first_step, lambda: jnp.asarray(coefs1),
                                 lambda: jnp.asarray(coefs))
                r_list = unsteady_residual_list(
                    wk, wn_list, wnm1_list, metrics_list, topo, cfg, ref,
                    winf, dt, (c[0], c[1], c[2]), extras_list)
                if r_first is None:
                    r_first = r_list
                if inv_rsv is not None:
                    # explicit pseudo-update needs the PHYSICAL residual
                    r_list = [r * inv_rsv for r in r_list]
                wk = [w0b.at[2:-2, 2:-2, 2:-2].set(
                          w0b[2:-2, 2:-2, 2:-2]
                          - alpha * dtv[..., None] * r)
                      for w0b, r, dtv in zip(w0, r_list, dt_list)]
                wk = fill_halos(wk, metrics_list, topo, ref, winf)
            nm, _ = residual_norms(r_first)
            return wk, nm

        w_list, hist = jax.lax.scan(inner, w_list, None, length=n_inner)
        return w_list, hist

    return jax.jit(step)


def solve_unsteady_bdf(w_list, metrics_list, topo, cfg, ref, winf,
                       n_steps: int, dt: float, order: int = 2,
                       extras_list=None, cfl: float = 2.0,
                       n_inner: int = 50,
                       callback: Optional[Callable] = None):
    """BDF dual-time march (solvers.F90 solverUnsteadyStep loop).
    Returns (w_list, UnsteadyInfo)."""
    step = make_dual_time_step(metrics_list, topo, cfg, ref, winf,
                               jnp.asarray(dt), order, extras_list, cfl,
                               n_inner)
    wn = [w.copy() for w in w_list]
    wnm1 = [w.copy() for w in w_list]
    inner_res = []
    times = []
    failed = False
    for n in range(n_steps):
        w_new, hist = step(w_list, wn, wnm1, jnp.asarray(n == 0))
        wnm1 = wn
        wn = [w.copy() for w in w_new]
        w_list = w_new
        rfin = float(np.asarray(hist)[-1])
        inner_res.append(rfin)
        times.append((n + 1) * dt)
        if not np.isfinite(rfin):
            failed = True
            break
        if callback:
            callback(n, (n + 1) * dt, w_list)
    return w_list, UnsteadyInfo(
        n_steps=len(times), times=np.asarray(times),
        inner_res=np.asarray(inner_res), failed=failed)


def solve_unsteady_explicit_rk(w_list, metrics_list, topo, cfg, ref, winf,
                               n_steps: int, dt: float, extras_list=None,
                               callback: Optional[Callable] = None):
    """Explicit global-time-step RK4 (solvers.F90:486
    solverUnsteadyExplicitRK): classical 4-stage on dw/dt = -R/V."""

    def rhs(w_list):
        wf = fill_halos(w_list, metrics_list, topo, ref, winf)
        rsv = cfg.row_scale(w_list[0].dtype)
        out = []
        for i, (w, m) in enumerate(zip(wf, metrics_list)):
            ex = extras_list[i] if extras_list else None
            r = block_residual(w, m, cfg, ref, ex, por=topo.blocks[i].por)
            if rsv is not None:
                r = r / rsv    # physical residual for explicit marching
            vol = m.vol[2:-2, 2:-2, 2:-2][..., None]
            out.append(-r / vol)
        return out

    @jax.jit
    def step(w_list):
        def add(ws, ks, fac):
            return [w.at[2:-2, 2:-2, 2:-2].add(fac * k)
                    for w, k in zip(ws, ks)]

        k1 = rhs(w_list)
        k2 = rhs(add(w_list, k1, 0.5 * dt))
        k3 = rhs(add(w_list, k2, 0.5 * dt))
        k4 = rhs(add(w_list, k3, dt))
        new = w_list
        for k, fac in ((k1, dt / 6), (k2, dt / 3), (k3, dt / 3),
                       (k4, dt / 6)):
            new = add(new, k, fac)
        nm, _ = residual_norms(k1)
        return new, nm

    inner_res = []
    times = []
    failed = False
    for n in range(n_steps):
        w_list, nm = step(w_list)
        rfin = float(nm)
        inner_res.append(rfin)
        times.append((n + 1) * dt)
        if not np.isfinite(rfin):
            failed = True
            break
        if callback:
            callback(n, (n + 1) * dt, w_list)
    return w_list, UnsteadyInfo(
        n_steps=len(times), times=np.asarray(times),
        inner_res=np.asarray(inner_res), failed=failed)
