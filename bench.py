"""Benchmark: RANS residual throughput + wall-clock solve on one chip.

Two measurements, one JSON line:

1. **Residual throughput** (headline metric, continuity with r01/r02):
   million cell-residual-evaluations per second for the full RANS (SA)
   residual — the hot function (SURVEY.md §3.2: every smoother stage,
   ANK/NK Krylov iteration and adjoint matvec is one evaluation,
   blocketteRes, /root/reference/src/NKSolver/blockette.F90:70).
   Measured twice: plain-XLA path and (when it survives on the hardware)
   the fused Pallas blockette (ops/pallas_rans.py); the better one is the
   headline. Roofline context: XLA cost-analysis bytes-accessed per eval,
   achieved GB/s, and the fraction of the chip's ~819 GB/s HBM peak
   (TPU v5e). The theoretical minimum traffic for one eval is ~0.2 GB
   (state+metrics+residual once); the gap is spilled intermediates.

2. **Solve probes** (BASELINE.md, doc/performance.rst:39-52): wall-clock
   ANK->NK solves on chip — a deep-convergence turbulent flat plate
   (CPPH = cells * 3600 / seconds; reference bar >1e6 per CPU proc at
   8 orders) and the transonic M6-class wing north star (achieved_rel
   reported honestly; the coarse 24k-cell wing orbits a limit set near
   4e-3 rel in every precision). Probes run float32 on the chip: the
   1e-8-rel mixed-precision pipeline (f32 ANK -> emulated-f64 ANK/NK
   continuation) is CPU-validated, but a single emulated-f64 compile can
   stall past the whole bench budget on tunnel bad windows
   (NOTES_TPU_INFRA.md fact 14).

Baseline derivation for vs_baseline (unchanged from r01): ADflow's
documented CPPH >1e6 on a 450k-cell wing, 4 procs, 400 s implies
~2.0 Mcell-evals/s per CPU proc for the residual pipeline;
vs_baseline = headline Mcell-evals/s / 2.0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

V5E_HBM_PEAK_GBS = 819.0
PALLAS_PROBE = "--pallas-probe" in sys.argv
SOLVE_PROBE = "--solve-probe" in sys.argv


def _enable_compile_cache():
    """Persistent XLA compilation cache: the tunnel has multi-minute
    compile stalls (NOTES_TPU_INFRA.md fact 6) and the solve probe's
    modules are identical run-to-run — caching makes the second attempt
    (and the driver's run after this session's warm-up) skip them.
    Harmless no-op if the backend doesn't support serialization."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/adflow_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _timeit(f, *args, reps: int = 3):
    import jax

    o = f(*args)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _timeit_trials(f, *args, reps: int = 3, trials: int = 3,
                   spacing_s: float = 6.0):
    """Self-defending timing: the tunnel has multi-minute bad windows
    (NOTES_TPU_INFRA.md fact 6) where the same binary runs 2-10x slower,
    so a single measurement is meaningless. Run `trials` measurements
    spaced `spacing_s` apart, publish the BEST plus the spread so a
    regression claim needs all trials slow, not one."""
    times = []
    for t in range(trials):
        if t > 0:
            time.sleep(spacing_s)
        times.append(_timeit(f, *args, reps=reps))
    return min(times), times


def residual_throughput(detail):
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
    ap = AeroProblem(name="m6", mach=0.84, alpha=3.06, reynolds=11.72e6)
    ref = make_reference_state(ap, lift_index=2, n_turb=1)
    winf = jnp.asarray(ref.winf(), jnp.float32)
    topo = build_topology(mesh)
    x = jnp.asarray(mesh.blocks[0].x, jnp.float32)
    metrics = [compute_metrics(x)]
    d = compute_wall_distances(mesh, [x], jnp.float32)[0]
    extras = [{"walldist": d}]
    n_cells = mesh.n_cells
    reps = 10

    from adflow_tpu.geom.metrics import BlockMetrics
    from adflow_tpu.physics.residual import fill_halos, block_residual

    por = topo.blocks[0].por
    f32 = jnp.float32
    m0 = metrics[0]
    # static arrays as EXPLICIT jit parameters: Mosaic operands must be
    # parameters, not jit closure constants — constant operands device-fault
    # the kernel's DMA on real hardware (measured; see ops/pallas_rans.py)
    static_args = (m0.siE.astype(f32), m0.sjE.astype(f32),
                   m0.skE.astype(f32), m0.vol.astype(f32),
                   m0.xc_ext.astype(f32), d,
                   jnp.asarray(por[0], f32), jnp.asarray(por[1], f32),
                   jnp.asarray(por[2], f32))

    def make_fn(use_pallas, with_fill):
        cfg = ProblemConfig(
            equation_type="rans", vis2=0.25, vis4=1.0 / 64.0,
            diss_exponent=0.67, turbulence_model="sa", turb_res_scale=1e4,
            use_pallas=use_pallas)

        @jax.jit
        def n_residuals(w, siE, sjE, skE, vol, xc, dd, pI, pJ, pK):
            m = BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=vol, xc_ext=xc)

            def body(w, _):
                if with_fill:
                    (wf,) = fill_halos([w], [m], topo, ref, winf)
                else:
                    wf = w
                r = block_residual(wf, m, cfg, ref, {"walldist": dd},
                                   por=(pI, pJ, pK))
                w = w.at[2:-2, 2:-2, 2:-2].add(1e-12 * r)
                return w, ()
            w, _ = jax.lax.scan(body, w, None, length=reps)
            return w

        return n_residuals

    b = mesh.blocks[0]
    w = jnp.broadcast_to(
        winf, tuple(dd + 4 for dd in b.dims) + (ref.nw,)).astype(jnp.float32)

    variants = (("xla_full", False, True), ("xla_kernel", False, False))
    if PALLAS_PROBE:
        # subprocess mode: ONLY the Mosaic kernel, scan-free, with a
        # correctness gate — scan-wrapped Mosaic calls have produced both
        # device faults and silently-elided work on this stack, so the
        # probe times a direct call and only reports numbers whose output
        # matches the XLA path.
        cfg_p = ProblemConfig(
            equation_type="rans", vis2=0.25, vis4=1.0 / 64.0,
            diss_exponent=0.67, turbulence_model="sa", turb_res_scale=1e4,
            use_pallas=True)
        cfg_x = ProblemConfig(
            equation_type="rans", vis2=0.25, vis4=1.0 / 64.0,
            diss_exponent=0.67, turbulence_model="sa", turb_res_scale=1e4,
            use_pallas=False)

        def one(cfg_):
            @jax.jit
            def f(w, siE, sjE, skE, vol, xc, dd, pI, pJ, pK):
                m = BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=vol,
                                 xc_ext=xc)
                return block_residual(w, m, cfg_, ref, {"walldist": dd},
                                      por=(pI, pJ, pK))
            return f

        b0 = mesh.blocks[0]
        key = jax.random.PRNGKey(0)
        wr = jnp.broadcast_to(
            winf, tuple(dd + 4 for dd in b0.dims) + (ref.nw,)
        ).astype(jnp.float32)
        wr = wr * (1.0 + 0.01 * jax.random.normal(key, wr.shape,
                                                  jnp.float32))
        out = {}
        fp = one(cfg_p)
        fx = one(cfg_x)
        rp = fp(wr, *static_args)
        rp.block_until_ready()
        rx = fx(wr, *static_args)
        err = float(jnp.max(jnp.abs(rp - rx))
                    / jnp.maximum(jnp.max(jnp.abs(rx)), 1e-30))
        out["pallas_kernel"] = {"max_rel_err_vs_xla": round(err, 8)}
        if err < 1e-3:
            dt = _timeit(fp, wr, *static_args, reps=5)
            dtx = _timeit(fx, wr, *static_args, reps=5)
            out["pallas_kernel"].update(
                ms_per_eval=round(dt * 1e3, 3),
                mcell_evals_per_s=round(n_cells / dt / 1e6, 2))
            out["xla_kernel_single_eval"] = {
                "ms_per_eval": round(dtx * 1e3, 3),
                "mcell_evals_per_s": round(n_cells / dtx / 1e6, 2)}
        else:
            out["pallas_kernel"]["error"] = "output mismatch vs XLA"

        # FULL residual with the Mosaic kernel via TWO EXECUTABLES: the
        # halo fill jitted alone (pure XLA module) and the kernel jitted
        # alone (pure Mosaic module). Composing both in ONE module
        # device-faults (NOTES_TPU_INFRA.md fact 2); separate dispatches
        # keep each module in its proven-working configuration while
        # measuring the true full-eval cost (fill + kernel + 2 launches).
        try:
            @jax.jit
            def fill_only(w_):
                (wf_,) = fill_halos([w_], [BlockMetrics(
                    siE=static_args[0], sjE=static_args[1],
                    skE=static_args[2], vol=static_args[3],
                    xc_ext=static_args[4])], topo, ref, winf)
                return wf_

            def full_two_dispatch(w_, *sa):
                wf_ = fill_only(w_)
                wf_.block_until_ready()
                return fp(wf_, *sa)

            # correctness gate vs the one-module XLA full path
            @jax.jit
            def xla_full_once(w_, siE, sjE, skE, vol, xc, dd, pI, pJ, pK):
                m = BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=vol,
                                 xc_ext=xc)
                (wf_,) = fill_halos([w_], [m], topo, ref, winf)
                return block_residual(wf_, m, cfg_x, ref,
                                      {"walldist": dd}, por=(pI, pJ, pK))

            rf = full_two_dispatch(wr, *static_args)
            rf.block_until_ready()
            rxf = xla_full_once(wr, *static_args)
            errf = float(jnp.max(jnp.abs(rf - rxf))
                         / jnp.maximum(jnp.max(jnp.abs(rxf)), 1e-30))
            ent = {"max_rel_err_vs_xla": round(errf, 8)}
            if errf < 1e-3:
                dtf = _timeit(full_two_dispatch, wr, *static_args, reps=5)
                dtxf = _timeit(xla_full_once, wr, *static_args, reps=5)
                ent.update(ms_per_eval=round(dtf * 1e3, 3),
                           mcell_evals_per_s=round(n_cells / dtf / 1e6, 2))
                ent["xla_full_single_eval_ms"] = round(dtxf * 1e3, 3)
            else:
                ent["error"] = "output mismatch vs XLA full"
            out["pallas_full_two_dispatch"] = ent
        except Exception as e:
            out["pallas_full_two_dispatch"] = {"error": str(e)[:140]}
        detail["throughput"] = out
        detail["n_cells"] = n_cells
        return 0.0
    best = {}
    for name, use_pallas, with_fill in variants:
        try:
            fn = make_fn(use_pallas, with_fill)
            # headline variant gets the multi-trial defense; the secondary
            # kernel-only variant one trial (context, not headline)
            n_trials = 3 if name == "xla_full" else 1
            dt_total, trials = _timeit_trials(fn, w, *static_args,
                                              trials=n_trials)
            dt = dt_total / reps
            entry = {"ms_per_eval": round(dt * 1e3, 3),
                     "mcell_evals_per_s": round(n_cells / dt / 1e6, 2)}
            if n_trials > 1:
                entry["trial_ms_per_eval"] = [
                    round(t / reps * 1e3, 3) for t in trials]
            try:
                ca = fn.lower(w, *static_args).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                by = float(ca.get("bytes accessed", float("nan"))) / reps
                entry["bytes_per_eval_GB"] = round(by / 1e9, 2)
                entry["achieved_GBs"] = round(by / dt / 1e9, 1)
                entry["pct_of_hbm_peak"] = round(
                    100.0 * by / dt / 1e9 / V5E_HBM_PEAK_GBS, 1)
            except Exception:
                pass
            best[name] = entry
        except Exception as e:
            best[name] = {"error": str(e)[:120]}
            break   # a Mosaic fault wedges the process: stop probing
    detail["throughput"] = best
    detail["n_cells"] = n_cells
    ok = [v["mcell_evals_per_s"] for k, v in best.items()
          if "mcell_evals_per_s" in v and k.endswith("_full")]
    ok_any = [v["mcell_evals_per_s"] for v in best.values()
              if "mcell_evals_per_s" in v]
    return max(ok) if ok else (max(ok_any) if ok_any else 0.0)


def solve_bench(detail):
    """ANK->NK to 1e-8 relative on the TRANSONIC M6-class RANS wing
    (M 0.84, alpha 3.06, Re 11.7e6 — the BASELINE.md north star) in MIXED
    precision: all Krylov/PC/Jacobian work in f32 (the TPU-fast dtype),
    only the outer Newton residual in emulated f64 (solvers/newton.py
    make_mixed_nk). Validated on CPU: 6.1e-2 -> 1.5e-10 (2.5e-9 relative)
    in 119 iterations."""
    import jax

    _enable_compile_cache()
    jax.config.update("jax_enable_x64", True)

    t00 = time.perf_counter()

    def log(msg):
        # stderr breadcrumbs: a subprocess timeout surfaces the last phase
        # reached in detail.solve_error instead of losing everything
        print(f"# solve[{time.perf_counter() - t00:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    from adflow_tpu.api.solver import ADFLOW
    from adflow_tpu.core.refstate import AeroProblem
    from adflow_tpu.meshgen.analytic import flatplate_mesh, wing_omesh

    out = {}
    detail["solve"] = out

    # --- probe 1: deep convergence on hardware (CPPH anchor) ---
    # turbulent flat plate (the validated deep-convergence case): the
    # mixed pipeline (f32 ANK -> f64 ANK/NK continuation) to 1e-8 REL;
    # CPPH = cells * 3600 / wall on achieving it (reference bar: >1e6 per
    # CPU proc at 8 orders, doc/performance.rst:39-52). Runs FIRST: its
    # f64 modules are the smallest, so it fits the compile budget, and
    # its number (deep convergence ON CHIP) matters most.
    # DYNAMIC budgets: tunnel compile stalls (100-400 s/module,
    # NOTES_TPU_INFRA fact 6/14) ate fixed per-case timeLimits before the
    # first iteration could run; instead each case gets whatever remains
    # of the subprocess budget (960 s cap in main()) minus a reporting
    # margin, so compile-stall time is not double-charged
    BUDGET = 860.0

    def remaining():
        return BUDGET - (time.perf_counter() - t00)

    # precision: float32 on the chip. The FULL deep-convergence pipeline
    # (f32 ANK -> emulated-f64 ANK/NK continuation, precision='mixed')
    # reaches 1e-8 rel and is CPU-validated (flat plate: 59 iterations),
    # but on this tunnel a single emulated-f64 module compile can stall
    # past the whole bench budget (NOTES_TPU_INFRA fact 14), so the
    # hardware probe records the f32 pipeline and its ~1e-5-rel floor
    # honestly instead of recording nothing.
    opts = {
        "equationType": "RANS",
        "precision": "float32",
        "L2Convergence": 1e-8,
        "nCycles": 200,
        "ANKSwitchTol": 1.5,
        "useNKSolver": True,
        "NKSwitchTol": 1e-4,
        "printIterations": False,
        "printTiming": False,
        "timeLimit": 240.0,
    }
    log("probe 1 (turbulent flat plate deep convergence): building")
    # 96x48x4 = 18,432 cells: 8x the r04 probe, but the SAME line-PC
    # line length (nj=48) — line length is what drives the ANK module
    # compile cost on the tunnel (measured: nj=96 at 147k cells costs
    # >470 s first-iteration compile and cannot fit the budget)
    mesh2 = flatplate_mesh(ni=96, nj=48, nk=4, wall_spacing=2e-5,
                           height=0.5)
    opts["timeLimit"] = max(remaining() - 120.0, 60.0)
    s2 = ADFLOW(options=opts, mesh=mesh2)
    log("probe 1: solver built, solving")
    ap2 = AeroProblem(name="fp", mach=0.3, alpha=0.0, reynolds=2e6,
                      evalFuncs=["cd"])
    t0 = time.perf_counter()
    s2(ap2)
    wall2 = time.perf_counter() - t0
    log(f"probe 1: cold solve returned after {wall2:.0f}s")
    info2 = s2.solve_info
    rel2 = info2.total_r_final / max(info2.total_r0, 1e-300)
    f2 = {}
    s2.evalFunctions(ap2, f2)
    ent = {
        "n_cells": mesh2.n_cells,
        "case": "turbulent flat plate RANS, M 0.3 Re 2e6",
        "target_rel": 1e-8,
        "achieved_rel": float(f"{rel2:.3e}"),
        "converged": bool(info2.converged),
        "seconds": round(wall2, 1),
        "iterations": int(info2.iterations),
        "cpph": int(mesh2.n_cells * 3600.0 / max(wall2, 1e-9)),
        "cd": round(float(f2["fp_cd"]), 8),
        "dtype": "float32 (ANK->NK; 1e-8 via precision='mixed' is "
                 "CPU-validated — emulated-f64 compiles exceed the "
                 "tunnel budget, NOTES_TPU_INFRA)",
        "ref_cpph_per_proc": 1_000_000,
    }
    out["flatplate_deep"] = ent
    print(json.dumps(out), flush=True)   # partial result survives a cap
    # WARM re-solve in the same process: every jitted module is already
    # compiled, so this measures the steady-state solver — the number
    # comparable to the reference's CPPH bar (which excludes build/compile;
    # one-time compile is this stack's analogue of the reference's build)
    if remaining() > 1.15 * wall2 + 60.0 and info2.iterations >= 10:
        log("probe 1: warm re-solve")
        s2.resetFlow(ap2)
        t0 = time.perf_counter()
        s2(ap2)
        wall_w = time.perf_counter() - t0
        log(f"probe 1: warm solve returned after {wall_w:.0f}s")
        iw = s2.solve_info
        ent["seconds_warm"] = round(wall_w, 1)
        ent["iterations_warm"] = int(iw.iterations)
        ent["cpph_warm"] = int(mesh2.n_cells * 3600.0 / max(wall_w, 1e-9))
        ent["achieved_rel_warm"] = float(
            f"{iw.total_r_final / max(iw.total_r0, 1e-300):.3e}")
        print(json.dumps(out), flush=True)
    cpph = ent.get("cpph_warm", ent["cpph"])

    # --- probe 2: the BASELINE.md north-star case, reported honestly ---
    # transonic M6-class wing, f32 (the f64 continuation does not help
    # here: this COARSE 24k-cell wing orbits a limit set near ~4e-3 rel —
    # believed physical blunt-tip/wake-cut unsteadiness at this
    # resolution — so achieved_rel is recorded as-is and f32 keeps the
    # TPU compile surface small).
    if remaining() < 300.0:
        log("probe 2 skipped: budget consumed by compile stalls")
        return cpph
    ni, nj, nk = 64, 24, 16
    mesh = wing_omesh(ni=ni, nj=nj, nk=nk, viscous=True)
    opts1 = dict(opts, precision="float32", ANKSwitchTol=1.0,
                 timeLimit=max(remaining() - 160.0, 60.0))
    log("probe 2 (transonic M6 wing): building solver")
    solver = ADFLOW(options=opts1, mesh=mesh)
    log("probe 2: solver built, solving")
    ap = AeroProblem(name="m6b", mach=0.84, alpha=3.06, reynolds=11.72e6,
                     evalFuncs=["cl", "cd"])
    t0 = time.perf_counter()
    solver(ap)
    wall = time.perf_counter() - t0
    log(f"probe 2: solve returned after {wall:.0f}s")
    info = solver.solve_info
    funcs = {}
    solver.evalFunctions(ap, funcs)
    rel = info.total_r_final / max(info.total_r0, 1e-300)
    out["transonic_m6"] = {
        "n_cells": mesh.n_cells,
        "case": "M6-class transonic RANS wing, M 0.84 a 3.06 Re 11.7e6",
        "target_rel": 1e-8,
        "achieved_rel": float(f"{rel:.3e}"),
        "converged": bool(info.converged),
        "seconds": round(wall, 1),
        "iterations": int(info.iterations),
        "cl": round(float(funcs["m6b_cl"]), 6),
        "cd": round(float(funcs["m6b_cd"]), 6),
        "dtype": "float32 (ANK; limit-cycle floor documented)",
    }
    return cpph


def main():
    import jax

    _enable_compile_cache()
    if PALLAS_PROBE:
        detail = {}
        residual_throughput(detail)
        print(json.dumps(detail["throughput"]))
        return
    if SOLVE_PROBE:
        detail = {}
        solve_bench(detail)
        print(json.dumps(detail["solve"]))
        return

    detail = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]),
              "throughput": {}}
    try:
        mcell = residual_throughput(detail)
    except Exception as e:
        detail["throughput_error"] = str(e)[:200]
        mcell = 0.0

    baseline_mcell_evals = 2.0  # per CPU proc, module docstring

    def headline(value):
        return json.dumps({
            "metric": "rans_residual_throughput",
            "value": round(value, 2),
            "unit": "Mcell-evals/s/chip",
            "vs_baseline": round(value / baseline_mcell_evals, 2),
            "detail": detail,
        })

    # TIMEOUT DEFENSE (r04 lesson: the whole round's evidence was lost to
    # a driver timeout before the first JSON byte): print the headline
    # line NOW, before any probe can hang; re-print a richer final line
    # after the capped probes. Either line parses as the bench result.
    print(headline(mcell), flush=True)

    # solve in its own subprocess: the remote-compile service flakes on
    # the large f64 modules and a failure must not poison the process.
    # Budget: internal timeLimit 600 s + compile margin, hard cap 960 s
    # (tunnel bad windows stall compiles for minutes; the persistent
    # compile cache makes repeat runs skip them).
    try:
        pr = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--solve-probe"],
            capture_output=True, text=True, timeout=960)
        # LAST JSON line wins: the probe prints a partial result after
        # each case so a timeout mid-probe still reports what finished
        json_lines = [ln.strip() for ln in pr.stdout.splitlines()
                      if ln.strip().startswith("{")]
        if json_lines:
            detail["solve"] = json.loads(json_lines[-1])
        else:
            detail["solve_error"] = (pr.stderr.strip()[-200:]
                                     or f"rc={pr.returncode}")
    except subprocess.TimeoutExpired as e:
        so = e.stdout or b""
        if isinstance(so, bytes):
            so = so.decode("utf-8", "replace")
        json_lines = [ln.strip() for ln in so.splitlines()
                      if ln.strip().startswith("{")]
        if json_lines:
            detail["solve"] = json.loads(json_lines[-1])
            detail["solve"]["note"] = "subprocess cap hit after this case"
        else:
            detail["solve_error"] = str(e)[:200]
    except Exception as e:
        detail["solve_error"] = str(e)[:200]
    # Mosaic-kernel variants in a throwaway subprocess (fault isolation).
    # The fault is a per-dispatch lottery (~25-50%, NOTES_TPU_INFRA fact
    # 7/8): retry a few times in FRESH subprocesses — compiles are cached
    # after the first attempt, so retries are cheap — and keep the first
    # attempt that produced a validated timing.
    for attempt in range(3):
        try:
            pr = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--pallas-probe"],
                capture_output=True, text=True,
                timeout=300 if attempt == 0 else 240)
            pal = None
            for line in pr.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    pal = json.loads(line)
                    break
            if pal is None:
                detail["throughput"]["pallas_probe_error"] = (
                    pr.stderr.strip()[-160:] or f"rc={pr.returncode}")
                continue
            detail["throughput"].update(pal)
            detail["throughput"].pop("pallas_probe_error", None)
            detail["throughput"]["pallas_attempts"] = attempt + 1
            if any("mcell_evals_per_s" in v for v in pal.values()
                   if isinstance(v, dict)):
                break      # validated number recorded — stop retrying
        except Exception as e:
            detail["throughput"]["pallas_probe_error"] = str(e)[:160]

    # headline is the best VALIDATED full-residual rate across paths
    pal_full = detail["throughput"].get("pallas_full_two_dispatch", {})
    if "mcell_evals_per_s" in pal_full:
        mcell = max(mcell, pal_full["mcell_evals_per_s"])
    print(headline(mcell), flush=True)


if __name__ == "__main__":
    main()
