"""Steady-state solve drivers.

Reference analogue: ``solveState`` (`/root/reference/src/solver/solvers.F90:892`)
— the master nonlinear loop choosing MG / ANK / NK per iteration from the
relative residual, with convergence bookkeeping (convergenceInfo :1238).
Here the smoother loop is a jitted lax.scan executed in host-side chunks so
convergence/divergence checks and monitor printing happen between chunks
without per-iteration device sync.
"""

from __future__ import annotations

import time
from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.physics.residual import MeshTopology, ProblemConfig
from adflow_tpu.solvers.smoothers import (
    dadi_iteration, residual_norms, rk_iteration)


class SolveInfo(NamedTuple):
    converged: bool
    failed: bool
    iterations: int
    total_r0: float
    total_r_final: float
    history: np.ndarray  # (n, 2): mean-flow and turb residual norms


def make_smoother_chunk(metrics_list, topo: MeshTopology, cfg: ProblemConfig,
                        ref, winf, extras_list=None, chunk: int = 25,
                        smoother: str = "runge-kutta"):
    """Build a jitted function advancing `chunk` smoother iterations.

    smoother: 'runge-kutta' (RK5, smoothers.rk_iteration) or 'dadi'
    (diagonalized ADI, smoothers.dadi_iteration — reference DADISmoother,
    smoothers.F90:383)."""
    dadi = smoother.lower().startswith("dadi")

    def one(carry, _):
        w_list, cfl = carry
        if dadi:
            w_list, r_list = dadi_iteration(
                w_list, metrics_list, topo, cfg, ref, winf, cfl, extras_list)
        else:
            w_list, r_list = rk_iteration(
                w_list, metrics_list, topo, cfg, ref, winf, cfl, extras_list)
        nm, nt = residual_norms(r_list)
        return (w_list, cfl), jnp.stack([nm, nt])

    @jax.jit
    def run_chunk(w_list, cfl):
        (w_list, _), hist = jax.lax.scan(
            one, (w_list, cfl), None, length=chunk)
        return w_list, hist

    return run_chunk


# backwards-compatible name
def make_rk_chunk(metrics_list, topo, cfg, ref, winf, extras_list=None,
                  chunk: int = 25):
    return make_smoother_chunk(metrics_list, topo, cfg, ref, winf,
                               extras_list, chunk)


def solve_rk(w_list, metrics_list, topo, cfg, ref, winf,
             cfl: float = 1.5, n_cycles: int = 2000,
             l2_conv: float = 1e-8, l2_conv_rel: float = 1e-16,
             extras_list=None, chunk: int = 25,
             monitor: Optional[Callable] = None,
             total_r0: Optional[float] = None,
             smoother: str = "runge-kutta",
             deadline: Optional[float] = None,
             signal_check=None):
    """Explicit/ADI smoother to steady state. Returns (w_list, SolveInfo).

    deadline: absolute time.time() after which the loop stops (reference:
    timeLimit option checked in solvers.F90:1136)."""
    run_chunk = make_smoother_chunk(metrics_list, topo, cfg, ref, winf,
                                    extras_list, chunk, smoother)
    itertype = "DADI" if smoother.lower().startswith("dadi") else "RK"
    hist_all = []
    it = 0
    r0 = total_r0
    failed = converged = False
    while it < n_cycles:
        w_list, hist = run_chunk(w_list, jnp.asarray(cfl))
        hist = np.asarray(hist)
        hist_all.append(hist)
        it += hist.shape[0]
        if r0 is None:
            r0 = float(hist[0, 0])
        rnow = float(hist[-1, 0])
        if monitor:
            monitor(it, rnow, float(hist[-1, 1]), w_list=w_list, cfl=cfl,
                    itertype=itertype)
        if not np.isfinite(rnow):
            failed = True
            break
        if rnow <= l2_conv * r0 or rnow <= l2_conv_rel:
            converged = True
            break
        if (signal_check is not None
                and signal_check(lambda: w_list) == "stop"):
            break
        if deadline is not None and time.time() >= deadline:
            break
    hist_np = np.concatenate(hist_all) if hist_all else np.zeros((0, 2))
    info = SolveInfo(
        converged=converged, failed=failed, iterations=it,
        total_r0=float(r0 if r0 else 0.0),
        total_r_final=float(hist_np[-1, 0]) if len(hist_np) else float("nan"),
        history=hist_np)
    return w_list, info
