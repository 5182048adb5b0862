"""Time-spectral method: N coupled time instances of a periodic flow.

Reference analogues:
- spectral coupling terms entering the residual via ``initres_block``
  (`/root/reference/src/solver/residuals.F90:427`) with the
  time-spectral matrices from `src/initFlow`/`modules/inputTimeSpectral`
  (options ``timeIntervals``, ``omegaFourier``, ``alphaMode`` —
  `modules/inputParam.F90:639` inputTimeSpectral).
- regression: tests/reg_tests/test_time_spectral_naca64A010.py (pitching
  airfoil, alphaMode).

TPU-first: the N instances are a stacked leading axis solved as ONE coupled
steady problem — vmap over instances for the spatial residual (one compiled
kernel, N-fold batch feeding the MXU), plus the dense N x N spectral
derivative applied along the instance axis (a tiny matmul). Pseudo-time RK
marches all instances jointly.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.physics.residual import (
    MeshTopology, ProblemConfig, block_residual, fill_halos)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.physics.timestep import local_timestep
from adflow_tpu.solvers.smoothers import RK_COEFFS, residual_norms


class TSInfo(NamedTuple):
    converged: bool
    failed: bool
    iterations: int
    total_r0: float
    total_r_final: float
    history: np.ndarray


def spectral_deriv_matrix(n: int, period: float) -> np.ndarray:
    """Standard time-spectral differentiation matrix D (n x n):
    (dw/dt)_q = sum_r D[q, r] w_r for n equally-spaced instances."""
    D = np.zeros((n, n))
    for q in range(n):
        for r in range(n):
            m = q - r
            if m == 0:
                continue
            if n % 2 == 0:
                D[q, r] = 0.5 * (-1.0) ** m / np.tan(np.pi * m / n)
            else:
                D[q, r] = 0.5 * (-1.0) ** m / np.sin(np.pi * m / n)
    return D * (2.0 * np.pi / period)


def instance_refstates(ap: AeroProblem, n: int, omega: float,
                       alpha_amplitude: float, lift_index: int,
                       n_turb: int):
    """Per-instance reference states for alphaMode pitching:
    alpha_q = alpha + amp * sin(omega t_q) (inputTSStabDeriv alphaMode)."""
    period = 2.0 * np.pi / omega if omega > 0 else 1.0
    refs = []
    base_alpha = ap.alpha
    for q in range(n):
        t_q = q * period / n
        a_q = base_alpha + alpha_amplitude * np.sin(omega * t_q)
        ap_q = AeroProblem(
            name=f"{ap.name}_ts{q}", mach=ap.mach, alpha=a_q, beta=ap.beta,
            reynolds=ap.reynolds, reynoldsLength=ap.reynoldsLength,
            areaRef=ap.areaRef, chordRef=ap.chordRef,
            xRef=ap.xRef, yRef=ap.yRef, zRef=ap.zRef, T=ap.T)
        refs.append(make_reference_state(ap_q, lift_index=lift_index,
                                         n_turb=n_turb))
    return refs, period


def solve_time_spectral(w_inst, metrics_list, topo: MeshTopology,
                        cfg: ProblemConfig, refs, winfs, period: float,
                        extras_list=None, cfl: float = 1.5,
                        n_cycles: int = 2000, l2_conv: float = 1e-8,
                        chunk: int = 25, monitor=None):
    """Pseudo-time RK on the coupled spectral system.

    w_inst: list over instances of per-block state lists.
    Returns (w_inst, TSInfo). The spectral term for instance q is
    V * sum_r D[q, r] w_r (BDF analogue of initres_block)."""
    n = len(w_inst)
    D = jnp.asarray(spectral_deriv_matrix(n, period))
    n_blocks = len(metrics_list)

    def ts_residual(w_inst):
        # stack per block: (n, ni, nj, nk, nw) interiors for the D coupling
        r_inst = []
        for q in range(n):
            wq = fill_halos(w_inst[q], metrics_list, topo, refs[q],
                            winfs[q])
            rq = []
            for i in range(n_blocks):
                ex = extras_list[i] if extras_list else None
                r = block_residual(wq[i], metrics_list[i], cfg, refs[q],
                                   ex, por=topo.blocks[i].por)
                rq.append(r)
            r_inst.append(rq)
        # add spectral coupling: per block, einsum over instances
        rsv = cfg.row_scale(w_inst[0][0].dtype)
        out = []
        for q in range(n):
            rq = []
            for i in range(n_blocks):
                vol = metrics_list[i].vol[2:-2, 2:-2, 2:-2][..., None]
                acc = sum(D[q, r] * w_inst[r][i][2:-2, 2:-2, 2:-2]
                          for r in range(n))
                acc = acc[..., :r_inst[q][i].shape[-1]]
                if rsv is not None:
                    # match the turbResScale rows of block_residual so the
                    # spectral system is an exact row scaling
                    acc = acc * rsv
                rq.append(r_inst[q][i] + vol * acc)
            out.append(rq)
        return out

    # spectral-term contribution to the pseudo-time stability limit:
    # the V * D coupling adds eigenvalues ~ V * sum_r |D[q, r]| that the
    # convective CFL does not see (the reference adds the time-spectral
    # radius inside timeStep, solverUtils.F90) — without it instance
    # differences grow unstably.
    s_abs_d = float(np.abs(np.asarray(spectral_deriv_matrix(n, period)))
                    .sum(axis=1).max())

    def one(carry, _):
        w_inst = carry
        # frozen dt per instance
        dts = []
        w0 = []
        for q in range(n):
            wq = fill_halos(w_inst[q], metrics_list, topo, refs[q],
                            winfs[q])
            w0.append(wq)
            dq = []
            for i in range(n_blocks):
                p = pressure(wq[i])
                vol = metrics_list[i].vol[2:-2, 2:-2, 2:-2]
                dt = local_timestep(wq[i], p, metrics_list[i], cfl, cfg,
                                    refs[q])
                # dtau/V = 1 / (V/dt_conv + V*sum|D|/cfl)
                dq.append(1.0 / (vol / dt + vol * s_abs_d / cfl))
            dts.append(dq)
        wk = w0
        r_first = None
        rsv = cfg.row_scale(w0[0][0].dtype)
        inv_rsv = None if rsv is None else 1.0 / rsv
        for alpha in RK_COEFFS:
            r = ts_residual(wk)
            if r_first is None:
                r_first = r
            if inv_rsv is not None:
                # explicit update marches the PHYSICAL residual
                r = [[rb * inv_rsv for rb in rq] for rq in r]
            new = []
            for q in range(n):
                nq = [w0[q][i].at[2:-2, 2:-2, 2:-2].set(
                          w0[q][i][2:-2, 2:-2, 2:-2]
                          - alpha * dts[q][i][..., None] * r[q][i])
                      for i in range(n_blocks)]
                new.append(fill_halos(nq, metrics_list, topo, refs[q],
                                      winfs[q]))
            wk = new
        flat = [r for rq in r_first for r in rq]
        nm, _ = residual_norms(flat)
        return wk, nm

    @jax.jit
    def run_chunk(w_inst):
        w_inst, hist = jax.lax.scan(one, w_inst, None, length=chunk)
        return w_inst, hist

    hist_all = []
    it = 0
    r0 = None
    failed = converged = False
    while it < n_cycles:
        w_inst, hist = run_chunk(w_inst)
        hist = np.asarray(hist)
        hist_all.append(hist)
        it += len(hist)
        if r0 is None:
            r0 = float(hist[0])
        rnow = float(hist[-1])
        if monitor:
            monitor(it, rnow, 0.0)
        if not np.isfinite(rnow):
            failed = True
            break
        if rnow <= l2_conv * r0:
            converged = True
            break
    h = np.concatenate(hist_all) if hist_all else np.zeros((0,))
    return w_inst, TSInfo(
        converged=converged, failed=failed, iterations=it,
        total_r0=float(r0 or 0.0),
        total_r_final=float(h[-1]) if len(h) else float("nan"),
        history=np.stack([h, np.zeros_like(h)], axis=-1))


def stability_derivatives(coeff_inst: dict, alphas_deg, omega: float,
                          period: float, mach: float,
                          chord_ref: float = 1.0) -> dict:
    """Time-spectral stability derivatives from per-instance coefficients
    (reference: inputTSStabDeriv TSAlphaMode post-processing — the
    cl0/clalpha/clalphadot... cost functions, constants.F90:370-384,
    computed from the converged alpha-oscillation TS solution).

    For alpha(t) = alpha0 + A sin(omega t) each coefficient is fit by
    least squares to  c(t) = c_mean + a sin(omega t) + b cos(omega t):
      c_alpha    = a / A                      (per radian)
      c_alphadot = b / (A * k),  k = omega * chord/(2 V)   (reduced freq;
                   V = Mach in the solver's a_inf-based nondim time)
      c_0        = c_mean - c_alpha * alpha0  (linear extrapolation)

    coeff_inst: {name: array of n per-instance values} (e.g. 'cl', 'cd',
    'cmz'); alphas_deg: per-instance alpha in DEGREES. Returns
    {'cl0', 'clalpha', 'clalphadot', ...} keyed by each input name.
    """
    names = list(coeff_inst)
    n = len(alphas_deg)
    a_rad = np.radians(np.asarray(alphas_deg, float))
    alpha0 = float(a_rad.mean())
    da = a_rad - alpha0
    amp = float(np.max(np.abs(da)))
    t = np.arange(n) * period / n
    X = np.stack([np.ones(n), np.sin(omega * t), np.cos(omega * t)],
                 axis=1)
    k = omega * chord_ref / (2.0 * max(mach, 1e-12))
    out = {}
    for nm in names:
        y = np.asarray(coeff_inst[nm], float)
        cmean, a, b = np.linalg.lstsq(X, y, rcond=None)[0]
        c_alpha = a / max(amp, 1e-30)
        c_adot = b / (max(amp, 1e-30) * max(k, 1e-30))
        out[f"{nm}0"] = cmean - c_alpha * alpha0
        out[f"{nm}alpha"] = c_alpha
        out[f"{nm}alphadot"] = c_adot
    return out
