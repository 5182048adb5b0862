"""The user-facing solver class.

Reference analogue: class ``ADFLOW``
(`/root/reference/adflow/pyADflow.py:60`): options-dict construction, then
``__call__(aeroProblem)`` to solve, ``evalFunctions``/``evalFunctionsSens``
for cost functions and totals, state access, residual/JVP/VJP products.
Lifecycle mirrored from SURVEY.md §3.1-3.3; everything device-side is jitted
JAX over the mesh pytree instead of f2py calls into libadflow.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import BCType, MultiBlockMesh, WALL_BCS
from adflow_tpu.core.refstate import (
    GAMMA, AeroProblem, ReferenceState, make_reference_state)
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.options import Options
from adflow_tpu.physics.residual import (
    MeshTopology, ProblemConfig, build_topology, fill_halos, residual_list)
from adflow_tpu.physics.surface import (
    FLOW_THROUGH_BCS, build_wall_patches, cost_functions, flow_through,
    integrate_forces, wall_sensors)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.solvers import steady
from adflow_tpu.solvers.smoothers import residual_norms
from adflow_tpu.utils.dtypes import resolve_dtype


class _IterMonitor:
    """Per-iteration convergence table driven by the ``monitorVariables``
    option (reference: convergenceInfo, solvers.F90:1050-1238 — the Iter /
    Iter Type / CFL / Res columns + monitored functions from
    monitorVariables, extra/monitor.F90)."""

    _KNOWN = ("cpu", "resrho", "resturb", "totalr", "cl", "cd", "cmx",
              "cmy", "cmz", "cfl", "linres", "itertype")
    _FUNC_VARS = ("cl", "cd", "cmx", "cmy", "cmz")

    def __init__(self, solver, variables):
        self.solver = solver
        vl = []
        for v in variables:
            v = str(v).lower()
            if v in self._KNOWN and v not in vl:
                vl.append(v)
        if "resrho" not in vl:
            vl.insert(0, "resrho")
        self.vars = vl
        self.needs_state = any(v in self._FUNC_VARS for v in vl)
        self.t0 = time.time()
        self._header = False

    def _functions(self, w_list):
        # jitted once per solve: the naive eager path re-dispatched the
        # whole halo-fill + integration op-by-op EVERY iteration (weak
        # spot flagged in round 3) — one compiled executable amortizes it
        s = self.solver
        if not hasattr(self, "_fn_jit"):
            def _compute(w_list):
                wf = fill_halos(w_list, s.metrics_list, s.topo, s.ref,
                                s.winf)
                ibl = [bs.iblank for bs in s.topo.blocks]
                f = integrate_forces(
                    wf, s.x_list, s.metrics_list, s.wall_patches, s.ref,
                    s.cfg, iblank_list=ibl, extras_list=s.extras_list,
                    patch_weights=s.wall_patch_weights)
                out = cost_functions(f, s.ref)
                return {k: v for k, v in out.items()
                        if np.ndim(v) == 0}
            self._fn_jit = jax.jit(_compute)
        return {k: float(v) for k, v in self._fn_jit(w_list).items()}

    def __call__(self, it, rm, rt, w_list=None, cfl=None, linres=None,
                 itertype=""):
        funcs = None
        if self.needs_state and w_list is not None:
            funcs = self._functions(w_list)
        cols = []
        if not self._header:
            head = ["  iter", "type  "]
            for v in self.vars:
                head.append(f"{v:>12s}")
            print(" ".join(head))
            self._header = True
        cols.append(f"{it:6d}")
        cols.append(f"{itertype:<6s}")
        for v in self.vars:
            if v == "cpu":
                cols.append(f"{time.time() - self.t0:12.3f}")
            elif v == "resrho":
                cols.append(f"{rm:12.6e}")
            elif v == "resturb":
                cols.append(f"{rt:12.6e}")
            elif v == "totalr":
                cols.append(f"{(rm ** 2 + rt ** 2) ** 0.5:12.6e}")
            elif v == "cfl":
                cols.append(f"{cfl:12.4g}" if cfl is not None
                            else " " * 12)
            elif v == "linres":
                cols.append(f"{linres:12.4g}" if linres is not None
                            else " " * 12)
            elif v == "itertype":
                cols.append(f"{itertype:>12s}")
            elif funcs is not None and v in funcs:
                cols.append(f"{float(funcs[v]):12.6f}")
            else:
                cols.append(" " * 12)
        print(" ".join(cols))


class ADFLOW:
    """TPU-native solver with the reference's Python API surface."""

    def __init__(self, options: Optional[dict] = None,
                 mesh: Optional[MultiBlockMesh] = None,
                 comm=None, debug: bool = False, **kwargs):
        self.options = Options(options or {})
        self.dtype = resolve_dtype(self.options["precision"])

        # ---- mesh ingest (reference: partitionAndReadGrid,
        # partitioning.F90:5; here: object passthrough or file readers) ----
        if mesh is None:
            from adflow_tpu.io.meshio import read_mesh
            mesh = read_mesh(self.options["gridFile"])
        mesh.validate()
        # multi-chip layout (options meshDevices/meshAxisName, SURVEY
        # §2.10): split + order blocks so each device owns an equal slice
        # of the stacked block axis (the reference's loadBalanceGrid,
        # loadBalance.F90:5); the solve then runs the GSPMD stacked path
        # (_solve_stacked), everything else sees the split mesh normally
        self._stack_order = None
        n_dev = int(self.options["meshDevices"])
        if n_dev > 1:
            from adflow_tpu.dist.stacked import balance_blocks
            mesh, self._stack_order = balance_blocks(mesh, n_dev)
        self.mesh = mesh

        # ---- preprocessing (reference: preprocessingAPI.F90:5;
        # overset assembly = preprocessingoverset -> oversetComm,
        # oversetAPI.F90:7, explicit cut callback as in pyADflow.py:4370) ----
        self._cut_cb = kwargs.pop("cutCallback", None)
        self.topo: MeshTopology = build_topology(
            mesh, cut_callback=self._cut_cb)
        self.x_list = [jnp.asarray(b.x, self.dtype) for b in mesh.blocks]
        # true ghost metrics at b2b faces (xhalo analogue, metrics.py)
        from adflow_tpu.geom.metrics import compute_metrics_conn
        self.metrics_list = compute_metrics_conn(mesh.blocks, self.x_list)
        self._metrics_base = list(self.metrics_list)
        self._check_volumes()

        eq = self.options["equationType"].lower()
        # turbResScale: None -> model default, like _updateTurbResScale
        # (reference: pyADflow.py:6574 — SA 1e4, SST [1e3, 1e-6])
        trs = self.options["turbResScale"]
        turb_model = self.options["turbulenceModel"].lower()
        if trs is None:
            trs = ((1e3, 1e-6) if turb_model == "sst"
                   else 1e4 if eq == "rans" else 1.0)
        elif isinstance(trs, (list, tuple)):
            trs = tuple(float(v) for v in trs)
        else:
            trs = float(trs)
        self.cfg = ProblemConfig(
            equation_type=eq,
            vis2=float(self.options["vis2"]),
            vis4=float(self.options["vis4"]),
            diss_exponent=float(self.options["dissipationScalingExponent"]),
            discretization=self.options["discretization"].lower(),
            limiter=self.options["limiter"].lower(),
            entropy_fix=float(self.options["entropyFix"]),
            riemann_solver=str(self.options["riemannSolver"]).lower(),
            turbulence_model=turb_model,
            turb_order=str(self.options["turbulenceOrder"]).lower(),
            turb_res_scale=trs,
            use_ft2=bool(self.options["useft2SA"]),
            use_rotation_sa=bool(self.options["useRotationSA"]),
            use_qcr=bool(self.options["useQCR"]),
            use_pallas=bool(self.options["useBlockettes"])
            and jax.default_backend() == "tpu",
        )
        # gammaConstant: non-1.4 already rejected at option validation;
        # the kernels bake the GAMMA constant in at trace time
        assert abs(float(self.options["gammaConstant"]) - GAMMA) < 1e-12
        self.wall_patches = build_wall_patches(mesh)
        self.flow_patches = build_wall_patches(mesh,
                                               include=FLOW_THROUGH_BCS)
        # zipper-equivalent overlap dedup weights for overset surfaces
        # (overset/assembly.py overlap_surface_weights)
        self.wall_patch_weights = None
        self.zipper_gaps = None
        if any(bs.iblank is not None for bs in self.topo.blocks):
            from adflow_tpu.overset.assembly import (
                build_zipper_gaps, overlap_surface_weights)
            self.wall_patch_weights = overlap_surface_weights(
                mesh, self.wall_patches)
            if bool(self.options["useZipperMesh"]):
                # gap-strip triangulation so overset surface integrals are
                # watertight (reference zipperMesh.F90 createZipperMesh)
                self.zipper_gaps = build_zipper_gaps(
                    mesh, self.wall_patches, self.wall_patch_weights)

        # wall distance for RANS (reference: wallDistance.F90:129); the
        # point->element association feeds the useApproxWallDistance fast
        # update on mesh deformation (updateWallDistancesQuickly)
        self.extras_list = None
        self._walldist_assoc = None
        if self.cfg.rans:
            from adflow_tpu.geom.walldist import compute_wall_distances
            d_list, self._walldist_assoc = compute_wall_distances(
                mesh, self.x_list, self.dtype, return_assoc=True,
                cutoff=float(self.options["wallDistCutoff"]))
            self.extras_list = [{"walldist": d} for d in d_list]

        self.curAP: Optional[AeroProblem] = None
        self.ref: Optional[ReferenceState] = None
        self.winf = None
        self.w_list: Optional[List[jnp.ndarray]] = None
        self._ap_states: Dict[str, list] = {}
        self._ap_winfs: Dict[str, object] = {}
        self._sol_counter: Dict[str, int] = {}
        self.solve_info = None

    # ------------------------------------------------------------------
    def _check_volumes(self):
        for i, m in enumerate(self.metrics_list):
            vmin = float(jnp.min(m.vol[2:-2, 2:-2, 2:-2]))
            if vmin <= 0.0:
                raise ValueError(
                    f"block {i} ('{self.mesh.blocks[i].name}') has "
                    f"non-positive cell volume {vmin} — left-handed or "
                    f"degenerate mesh")

    # ------------------------------------------------------------------
    def setAeroProblem(self, ap: AeroProblem):
        """Reference: pyADflow.setAeroProblem:3240 (state stash per AP at
        :1304 so switching design points restores states)."""
        if self.curAP is ap:
            return
        if self.curAP is not None and self.w_list is not None:
            self._ap_states[self.curAP.name] = self.w_list
            self._ap_winfs[self.curAP.name] = getattr(
                self, "_state_winf", None)
        self.curAP = ap
        self.ref = make_reference_state(
            ap, lift_index=int(self.options["liftIndex"]),
            n_turb=self.cfg.n_turb,
            eddy_vis_inf_ratio=float(self.options["eddyVisInfRatio"]))
        if bool(self.options["useWallFunctions"]) and self.cfg.viscous:
            # wall-function wall treatment (computeUtau analogue; bc.py)
            import dataclasses as _dc
            self.ref = _dc.replace(self.ref, wall_fn=True)
        if bool(self.options["lowSpeedPreconditioner"]):
            # Weiss-Smith beta^2 cutoff anchored at the AP's free-stream
            # Mach (reference: lowSpeedPreconditioner, residuals.F90:172)
            import dataclasses as _dc
            self.cfg = _dc.replace(self.cfg,
                                   ls_precon_mach=float(ap.mach))
        self.winf = jnp.asarray(self.ref.winf(), self.dtype)
        # rigid grid motion (reference: gridVelocitiesFineLevel from the
        # AeroProblem rotation rates, solverUtils.F90:358): attach ALE face
        # velocities to the metrics; omega nondim by a_inf (grid in meters)
        mach_grid = float(getattr(ap, "machGrid", 0.0) or 0.0)
        if getattr(ap, "rotRate", None) is not None or mach_grid != 0.0:
            import numpy as _np
            from adflow_tpu.geom.metrics import add_grid_motion
            om = (_np.asarray(ap.rotRate, float) / ap.a_dim
                  if ap.rotRate is not None else _np.zeros(3))
            # machGrid: uniform grid translation opposite the freestream
            # direction (reference: solverUtils.F90:414, velGrid =
            # -machGrid*aInf*velDir); nondim by a_inf
            vtrans = -mach_grid * _np.asarray(self.ref.vel_dir, float)
            self.metrics_list = [
                add_grid_motion(m, x, om, ap.rotCenter, vtrans)
                for m, x in zip(self._metrics_base, self.x_list)]
        else:
            self.metrics_list = list(self._metrics_base)
        if ap.name in self._ap_states:
            self.w_list = self._ap_states[ap.name]
            self._state_winf = self._ap_winfs.get(ap.name,
                                                  getattr(self,
                                                          "_state_winf",
                                                          None))
        else:
            self.resetFlow(ap)
        self._inf_change_correction()

    def resetFlow(self, ap: Optional[AeroProblem] = None):
        """Free-stream (or restart-file) initialization (reference:
        initFlow, initializeFlow.F90:345; restart read at
        variableReading.F90)."""
        if ap is not None and self.curAP is not ap:
            self.setAeroProblem(ap)
        if self.options["restartFile"]:
            self._load_restart()
            self._fresh_state = False
            self._state_winf = np.asarray(self.ref.winf())
            return
        self.w_list = [
            jnp.broadcast_to(
                self.winf,
                tuple(d + 4 for d in b.dims) + (self.ref.nw,)
            ).astype(self.dtype)
            for b in self.mesh.blocks
        ]
        # uniform init: eligible for an FMG start (solvers.F90:63)
        self._fresh_state = True
        self._state_winf = np.asarray(self.ref.winf())

    # ------------------------------------------------------------------
    def __call__(self, ap: AeroProblem, **kwargs):
        """Solve the steady problem (reference: ADFLOW.__call__:1185 ->
        solvers.F90 solver/solveState)."""
        self.setAeroProblem(ap)
        opt = self.options
        t0 = time.time()

        monitor = None
        if opt["printIterations"]:
            mv = (opt["monitorVariables"] if opt["setMonitor"]
                  else ["resrho", "resturb"])
            monitor = _IterMonitor(self, mv)

        # timeLimit option (reference: solvers.F90:1136-1150 — stop the
        # solve when the wall-clock budget is exhausted)
        tl = float(opt["timeLimit"])
        deadline = (t0 + tl) if tl > 0.0 else None

        # SIGUSR1 = write-and-continue, SIGUSR2 = write-and-quit
        # (reference: connect_signals.c:23-47, polled solvers.F90:1174)
        from adflow_tpu.utils.signals import SignalMonitor

        def _sig_write(w_now):
            # sync the driver's CURRENT iterate before writing, else the
            # checkpoint holds the stale pre-solve state
            if w_now is not None:
                self.w_list = list(w_now)
            self.writeSolution(baseName=f"{ap.name}_sig")

        sigmon = SignalMonitor(on_write=_sig_write)

        if opt["equationMode"].lower() == "unsteady":
            from adflow_tpu.solvers.unsteady import (
                solve_unsteady_bdf, solve_unsteady_explicit_rk)
            scheme = opt["timeIntegrationScheme"].lower()
            if scheme.startswith("bdf"):
                self.w_list, uinfo = solve_unsteady_bdf(
                    self.w_list, self.metrics_list, self.topo, self.cfg,
                    self.ref, self.winf,
                    n_steps=int(kwargs.get("nTimeSteps",
                                           opt["nTimeStepsFine"])),
                    dt=float(opt["deltaT"]),
                    order=int(opt["timeAccuracy"]),
                    extras_list=self.extras_list, cfl=float(opt["CFL"]))
            else:
                self.w_list, uinfo = solve_unsteady_explicit_rk(
                    self.w_list, self.metrics_list, self.topo, self.cfg,
                    self.ref, self.winf,
                    n_steps=int(kwargs.get("nTimeSteps",
                                           opt["nTimeStepsFine"])),
                    dt=float(opt["deltaT"]), extras_list=self.extras_list)
            self.unsteady_info = uinfo
            ap.solveFailed = ap.fatalFail = bool(uinfo.failed)
            if opt["printTiming"]:
                print(f"  unsteady: {uinfo.n_steps} steps to "
                      f"t={uinfo.times[-1]:.4f}, wall "
                      f"{time.time() - t0:.2f} s")
            return

        if opt["equationMode"].lower() == "time spectral":
            from adflow_tpu.solvers.timespectral import (
                instance_refstates, solve_time_spectral)
            n_inst = int(opt["timeIntervals"])
            omega = float(opt["omegaFourier"])
            amp = float(kwargs.get("alphaAmplitude",
                                   getattr(ap, "deltaAlpha", 0.0)))
            refs, period = instance_refstates(
                ap, n_inst, omega, amp, int(opt["liftIndex"]),
                self.cfg.n_turb)
            winfs = [jnp.asarray(r.winf(), self.dtype) for r in refs]
            w_inst = [[jnp.broadcast_to(
                winfs[q], tuple(d + 4 for d in b.dims) + (self.ref.nw,)
            ).astype(self.dtype) for b in self.mesh.blocks]
                for q in range(n_inst)]
            w_inst, info = solve_time_spectral(
                w_inst, self.metrics_list, self.topo, self.cfg, refs,
                winfs, period, extras_list=self.extras_list,
                cfl=float(opt["CFL"]), n_cycles=int(opt["nCycles"]),
                l2_conv=float(opt["L2Convergence"]), monitor=monitor)
            self.ts_states = w_inst
            self.ts_refs = refs
            self.w_list = w_inst[0]
            self.solve_info = info
            # TS stability derivatives (reference inputTSStabDeriv
            # TSAlphaMode cost functions cl0/clalpha/clalphadot/...):
            # evaluate cl/cd/cmz per instance, Fourier-fit vs alpha(t)
            self._ts_stab = None
            if amp > 0.0 and omega > 0.0 and not info.failed:
                coeffs = {"cl": [], "cd": [], "cmz": []}
                ibl = [bs.iblank for bs in self.topo.blocks]
                for q in range(n_inst):
                    wfq = fill_halos(w_inst[q], self.metrics_list,
                                     self.topo, refs[q], winfs[q])
                    fq = integrate_forces(
                        wfq, self.x_list, self.metrics_list,
                        self.wall_patches, refs[q], self.cfg,
                        iblank_list=ibl, extras_list=self.extras_list,
                        patch_weights=self.wall_patch_weights)
                    cq = cost_functions(fq, refs[q])
                    for k in coeffs:
                        coeffs[k].append(float(cq[k]))
                from adflow_tpu.solvers.timespectral import (
                    stability_derivatives)
                self._ts_stab = stability_derivatives(
                    coeffs, [r.alpha for r in refs], omega, period,
                    ap.mach, ap.chordRef)
            ap.solveFailed = ap.fatalFail = bool(info.failed)
            if opt["printTiming"]:
                print(f"  time spectral: {n_inst} instances, "
                      f"{info.iterations} iters, R {info.total_r0:.3e} -> "
                      f"{info.total_r_final:.3e}, wall "
                      f"{time.time() - t0:.2f} s")
            return

        use_nk = bool(opt["useNKSolver"])
        use_ank = bool(opt["useANKSolver"])
        self._sigmon = sigmon
        prof_dir = opt["jaxProfileDir"]
        prof_cm = (jax.profiler.trace(str(prof_dir)) if prof_dir
                   else contextlib.nullcontext())
        try:
            sigmon.__enter__()
            prof_cm.__enter__()
            self._fmg_start(opt)
            if int(opt["meshDevices"]) > 1:
                self.w_list, info = self._solve_stacked(
                    opt, monitor, deadline)
            elif use_nk or use_ank:
                from adflow_tpu.solvers.newton import solve_newton_driver
                self.w_list, info = solve_newton_driver(
                    self.w_list, self.metrics_list, self.topo, self.cfg,
                    self.ref, self.winf, self.options,
                    extras_list=self.extras_list, monitor=monitor,
                    deadline=deadline, signal_check=sigmon.check,
                    mixed_data=self._mixed_data())
            elif str(opt["MGCycle"]).lower() not in ("sg", "none", ""):
                from adflow_tpu.solvers.multigrid import solve_mg
                self.w_list, info = solve_mg(
                    self.w_list, self.mesh, self.x_list, self.topo,
                    self.cfg,
                    self.ref, self.winf, mg_cycle=str(opt["MGCycle"]),
                    cfl=float(opt["CFL"]), n_cycles=int(opt["nCycles"]),
                    l2_conv=float(opt["L2Convergence"]),
                    l2_conv_rel=float(opt["L2ConvergenceRel"]),
                    monitor=monitor, dtype=self.dtype,
                    n_pre=int(opt["nMGFine"]), n_post=int(opt["nMGCoarse"]),
                    cfl_coarse=float(opt["CFLCoarse"]),
                    res_averaging=str(opt["resAveraging"]),
                    smooth_param=float(opt["smoothParameter"]),
                    deadline=deadline,
                    vis2_coarse=float(opt["vis2Coarse"]),
                    coarse_disc=str(opt["coarseDiscretization"]))
            else:
                self.w_list, info = steady.solve_rk(
                    self.w_list, self.metrics_list, self.topo, self.cfg,
                    self.ref, self.winf,
                    cfl=float(opt["CFL"]), n_cycles=int(opt["nCycles"]),
                    l2_conv=float(opt["L2Convergence"]),
                    l2_conv_rel=float(opt["L2ConvergenceRel"]),
                    extras_list=self.extras_list, monitor=monitor,
                    smoother=str(opt["smoother"]), deadline=deadline,
                    signal_check=sigmon.check)
        finally:
            prof_cm.__exit__(None, None, None)
            sigmon.__exit__()
        self._fresh_state = False
        self.solve_info = info
        ap.solveFailed = bool(info.failed)
        ap.fatalFail = bool(info.failed)
        if opt["printTiming"]:
            print(f"  solve wall time: {time.time() - t0:.2f} s "
                  f"({info.iterations} iterations, "
                  f"R {info.total_r0:.3e} -> {info.total_r_final:.3e})")
        return

    # ------------------------------------------------------------------
    def _inf_change_correction(self):
        """Adjust the existing state to a changed free stream (reference:
        initializeFlow.F90:191 infChangeCorrection): 'offset' adds the
        conservative winf delta to every interior cell; 'rotate' rotates
        and rescales cell velocities by the free-stream velocity change
        and offsets rho/rhoE. Saves the startup transient when alpha/mach
        move between solves (solveCL secant steps, AP sweeps)."""
        opt = self.options
        old = getattr(self, "_state_winf", None)
        wnew = np.asarray(self.ref.winf())
        if (not bool(opt["infChangeCorrection"]) or old is None
                or self.w_list is None
                or len(old) != len(wnew)):
            self._state_winf = wnew
            return
        d = wnew[:5] - np.asarray(old)[:5]
        if np.linalg.norm(d) < float(opt["infChangeCorrectionTol"]):
            self._state_winf = wnew
            return
        kind = str(opt["infChangeCorrectionType"]).lower()
        dvec = jnp.asarray(d, self.dtype)
        if kind == "offset":
            self.w_list = [
                w.at[2:-2, 2:-2, 2:-2, :5].add(dvec) for w in self.w_list]
        else:
            v1 = np.asarray(old)[1:4] / max(float(old[0]), 1e-30)
            v2 = wnew[1:4] / max(float(wnew[0]), 1e-30)
            m1 = np.linalg.norm(v1)
            m2 = np.linalg.norm(v2)
            # rotation matrix taking v1 to v2 (Rodrigues)
            if m1 > 1e-14 and m2 > 1e-14:
                a = v1 / m1
                b = v2 / m2
                c = float(np.dot(a, b))
                k = np.cross(a, b)
                s = np.linalg.norm(k)
                if s < 1e-14:
                    R = np.eye(3) * (1.0 if c > 0 else -1.0)
                else:
                    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                                  [-k[1], k[0], 0]]) / s
                    R = (np.eye(3) + s * K + (1 - c) * (K @ K))
                Rj = jnp.asarray(R * (m2 / max(m1, 1e-30)), self.dtype)
                out = []
                for w in self.w_list:
                    wi = w[2:-2, 2:-2, 2:-2]
                    rho = wi[..., 0:1]
                    v = wi[..., 1:4] / rho
                    rho_n = rho + dvec[0]
                    vn = jnp.einsum("ab,ijkb->ijka", Rj, v)
                    w = w.at[2:-2, 2:-2, 2:-2, 0].add(dvec[0])
                    w = w.at[2:-2, 2:-2, 2:-2, 1:4].set(rho_n * vn)
                    w = w.at[2:-2, 2:-2, 2:-2, 4].add(dvec[4])
                    out.append(w)
                self.w_list = out
        self._state_winf = wnew

    # ------------------------------------------------------------------
    _BCVAR_MAP = {
        "pressure": "P", "pressurestagnation": "Pt",
        "temperaturestagnation": "Tt", "temperature": "T",
        "density": "rho", "velocitymagnitude": "vmag",
        "velocityx": "vx", "velocityy": "vy", "velocityz": "vz",
        "velocitydir": "dir", "thrust": "thrust", "heat": "q",
    }

    def setBCVar(self, varName: str, value, familyGroup: str):
        """Prescribe BC data on every subface of a family (the reference's
        BC-data subsystem: AeroProblem.setBCVar ->
        _getBCDataFromAeroProblem -> bcdata.setbcdata, pyADflow.py:3688,
        src/bcdata/BCData.F90:1403).

        ``value``: scalar or a PER-SUBFACE array over the subface's cell
        window (T1, T2) in ascending-tangential-axis order — pressure
        profiles, Pt/Tt maps, Twall distributions. Units follow each
        datum's convention: P/Pt/rho/vmag nondimensional (p_ref = rho_inf
        a_inf^2), Tt nondimensional by T_inf, wall 'Temperature' in
        Kelvin (matches the isothermal-wall datum).
        """
        key = self._BCVAR_MAP.get(varName.lower().replace(" ", ""))
        if key is None:
            raise ValueError(
                f"unknown BC variable '{varName}'; known: "
                f"{sorted(self._BCVAR_MAP)}")
        import dataclasses as _dc
        n = 0
        for b in self.mesh.blocks:
            for i, sf in enumerate(b.bcs):
                if sf.family == familyGroup:
                    data = dict(sf.data or {})
                    data[key] = (np.asarray(value)
                                 if np.ndim(value) > 0 else float(value))
                    b.bcs[i] = _dc.replace(sf, data=data)
                    n += 1
        if n == 0:
            raise ValueError(
                f"no BC subfaces in family '{familyGroup}'")
        # prescribed data is baked into the static BC ops: rebuild
        self.topo = build_topology(self.mesh, cut_callback=self._cut_cb)

    def getBCData(self, familyGroup: Optional[str] = None):
        """Current prescribed-BC data {family: {key: value}} (reference:
        BCData query helpers)."""
        out = {}
        for b in self.mesh.blocks:
            for sf in b.bcs:
                if familyGroup is not None and sf.family != familyGroup:
                    continue
                if sf.data:
                    out.setdefault(sf.family, {}).update(sf.data)
        return out

    def setTargetCp(self, CpTargets, groupName: Optional[str] = None):
        """Set the target-Cp distribution for inverse design (reference:
        pyADflow.setTargetCp:3827 -> setcptargets; consumed by the
        'cperror2' cost function, surfaceIntegrations.F90:527). CpTargets:
        flat array over the group's wall faces in patch order (each patch
        row-major over its (T1, T2) face window)."""
        flat = np.asarray(CpTargets, float).ravel()
        tg = list(getattr(self, "_cp_targets", None)
                  or [None] * len(self.wall_patches))
        ofs = 0
        for i, p in enumerate(self.wall_patches):
            if groupName is not None and p.family != groupName:
                continue
            n1 = p.face_sl[[a for a in range(3) if a != p.axis][0]]
            n2 = p.face_sl[[a for a in range(3) if a != p.axis][1]]
            s1 = n1.stop - n1.start
            s2 = n2.stop - n2.start
            tg[i] = flat[ofs:ofs + s1 * s2].reshape(s1, s2)
            ofs += s1 * s2
        if ofs != len(flat):
            raise ValueError(
                f"CpTargets length {len(flat)} != group faces {ofs}")
        self._cp_targets = tg

    def _solve_stacked(self, opt, monitor, deadline):
        """Multi-device steady solve: blocks stacked on a leading axis
        sharded over a jax Mesh of ``meshDevices`` devices; GSPMD inserts
        the halo-gather collectives and psums the Krylov reductions (the
        TPU-native analogue of the reference's MPI domain decomposition +
        parallel PETSc KSP, SURVEY §2.10). RK startup then stacked ANK
        (dist/stacked.py) with the SER CFL controller."""
        import jax
        from jax.sharding import (Mesh as JMesh, NamedSharding,
                                  PartitionSpec as JP)
        from adflow_tpu.dist import stacked as dstk

        n_dev = int(opt["meshDevices"])
        axis = str(opt["meshAxisName"])
        mode = str(opt["haloExchangeMode"]).lower()
        if mode != "gather":
            raise NotImplementedError(
                "the API multi-device route uses the GSPMD stacked-"
                "blocks layout (haloExchangeMode='gather'); the "
                "shard_map/ppermute k-split path is available through "
                "adflow_tpu.dist.sharded for single-block meshes")
        devs = jax.devices()
        if len(devs) < n_dev:
            raise ValueError(
                f"meshDevices={n_dev} but only {len(devs)} devices")
        warped = self._warped_mesh()
        prob = dstk.build_stacked_problem(warped, self._stack_order)
        sm = dstk.stack_metrics(warped, prob, self.dtype)
        extras = None
        if self.cfg.rans:
            d_by_orig = [ex["walldist"] for ex in self.extras_list]
            extras = {"walldist": dstk.stack_walldist(
                warped, prob, d_by_orig, self.dtype)}
        winf = jnp.asarray(self.winf, self.dtype)
        w = dstk.stack_from_list(prob, self.w_list, winf, self.dtype)
        dm = JMesh(np.array(devs[:n_dev]), axis_names=(axis,))
        sh = NamedSharding(dm, JP(axis))
        w = jax.device_put(w, sh)
        sm = jax.device_put(sm, sh)
        if extras is not None:
            extras = jax.device_put(extras, sh)

        n_cycles = int(opt["nCycles"])
        use_ank = bool(opt["useANKSolver"])
        rk = jax.jit(dstk.make_stacked_rk_step(
            prob, self.cfg, self.ref, cfl=float(opt["CFL"])))
        ank = jax.jit(
            lambda w_, cfl_: dstk.stacked_ank_step(
                w_, sm, prob, self.cfg, self.ref, winf, cfl_,
                extras=extras,
                m=max(int(opt["ANKSubspaceSize"]), 1)
                if int(opt["ANKSubspaceSize"]) > 0 else 50,
                lintol=float(opt["ANKLinearSolveTol"])))

        import time as _time
        hist = []
        it = 0
        failed = False
        r0 = rnorm = None
        ank_switch_rel = float(opt["ANKSwitchTol"])
        target_rel = float(opt["L2Convergence"])
        # RK startup until the ANK window
        while it < n_cycles:
            w, norms = rk(w, sm, winf, extras)
            nm = float(np.asarray(norms)[0]) + float(np.asarray(norms)[1])
            it += 1
            if r0 is None:
                r0 = nm
            rnorm = nm
            hist.append([rnorm, 0.0])
            if monitor and not getattr(monitor, "needs_state", False):
                monitor(it, rnorm, 0.0, itertype="RK*")
            if not np.isfinite(rnorm):
                failed = True
                break
            if rnorm <= target_rel * r0:
                break
            if use_ank and rnorm <= ank_switch_rel * r0:
                break
            if deadline is not None and _time.time() >= deadline:
                break
        # stacked ANK with the SER CFL controller
        if use_ank and not failed and rnorm > target_rel * r0:
            cfl = float(opt["ANKCFL0"])
            cutback = float(opt["ANKCFLCutback"])
            factor = float(opt["ANKCFLFactor"])
            cfl_limit = float(opt["ANKCFLLimit"])
            lin_res_max = float(opt["ANKLinResMax"])
            n_reject = 0
            while it < n_cycles and rnorm > target_rel * r0:
                if deadline is not None and _time.time() >= deadline:
                    break
                w_new, rn, rnew, linres = ank(
                    w, jnp.asarray(cfl, self.dtype))
                it += 1
                rnew_f, linres_f = float(rnew), float(linres)
                if not np.isfinite(rnew_f) or rnew_f > 10.0 * rnorm:
                    cfl = max(cfl * cutback, 1.0)
                    n_reject += 1
                    if n_reject > 25:
                        failed = True
                        break
                    continue
                n_reject = 0
                w = w_new
                rnorm = rnew_f
                hist.append([rnorm, 0.0])
                if monitor and not getattr(monitor, "needs_state",
                                           False):
                    monitor(it, rnorm, 0.0, cfl=cfl, linres=linres_f,
                            itertype="ANK*")
                if linres_f > lin_res_max:
                    cfl = max(cfl * cutback, 1.0)
                else:
                    cfl = min(cfl * factor, cfl_limit)

        self.w_list = dstk.unstack_to_list(prob, jax.device_get(w),
                                           self.w_list)
        info = steady.SolveInfo(
            converged=bool(rnorm is not None
                           and rnorm <= target_rel * max(r0, 1e-300)),
            failed=bool(failed), iterations=it,
            total_r0=float(r0 or 0.0),
            total_r_final=float(rnorm if rnorm is not None else np.nan),
            history=np.asarray(hist) if hist else np.zeros((0, 2)))
        return self.w_list, info

    def checkMeshQuality(self, warn: bool = True):
        """Mesh quality report at the CURRENT coordinates (reference:
        gridChecking.F90 blockCheck + pyADflow mesh warp failure
        detection, pyADflow.py:1246-1266): inverted-cell / twisted-cell
        counts, min volume, max skewness and aspect ratio."""
        from adflow_tpu.geom.quality import check_mesh_quality
        rep = check_mesh_quality(self.mesh, self.x_list)
        if warn and not rep["ok"]:
            print(f"# WARNING mesh quality: "
                  f"{rep['n_negative_volumes']} negative volumes, "
                  f"{rep['n_twisted_cells']} twisted cells "
                  f"(min vol {rep['min_volume']:.3e})")
        return rep

    def checkPartitioning(self, nprocs: int):
        """Load-balance quality for a hypothetical nprocs chips
        (reference: pyADflow.checkPartitioning:1161 / loadBalance.F90):
        returns (load_imbalance, face_imbalance_placeholder) after the
        block splitting the balancer would perform."""
        from adflow_tpu.dist.stacked import balance_blocks
        m2, order = balance_blocks(self.mesh, nprocs)
        sizes = np.zeros(nprocs)
        per = len(order) // nprocs
        for c in range(nprocs):
            for pos in order[c * per:(c + 1) * per]:
                if pos >= 0:
                    sizes[c] += m2.blocks[pos].n_cells
        ideal = m2.n_cells / nprocs
        imbalance = float(sizes.max() / ideal - 1.0)
        return imbalance, 0.0

    def checkOverset(self, printReport: bool = True) -> dict:
        """Overset-connectivity quality report (reference: the
        ``oversetCheck.py`` / ``checkZipper.py`` diagnostic scripts):
        per-mesh counts of compute/fringe/hole cells, interpolation
        groups, and orphans (fringes whose donor search found no
        containing cell — they fall back to neighbor averaging)."""
        out = {"n_blocks": len(self.mesh.blocks),
               "n_cells": self.mesh.n_cells,
               "compute": self.mesh.n_cells, "fringe": 0, "hole": 0,
               "orphans": 0, "groups": 0}
        tab = self.topo.overset
        if tab is not None:
            ibl = np.concatenate([np.ravel(b) for b in tab.iblank])
            out["compute"] = int((ibl == 1).sum())
            out["fringe"] = int((ibl == -1).sum())
            out["hole"] = int((ibl == 0).sum())
            out["orphans"] = int(getattr(tab, "n_orphans", 0))
            out["groups"] = len(tab.groups)
        gaps = getattr(self, "zipper_gaps", None)
        out["zipper_gap_tris"] = (0 if gaps is None
                                  else int(gaps.patch_idx.shape[0]))
        if printReport:
            print(f"Overset check: {out['n_blocks']} blocks, "
                  f"{out['n_cells']} cells -> {out['compute']} compute, "
                  f"{out['fringe']} fringe, {out['hole']} hole; "
                  f"{out['orphans']} orphans; "
                  f"{out['zipper_gap_tris']} zipper gap triangles")
        return out

    def solveAdjointForRHS(self, inVec, relTol=None):
        """Solve (dR/dw)^T psi = inVec for an arbitrary RHS vector
        (reference: pyADflow.solveAdjointForRHS:4222)."""
        from adflow_tpu.adjoint.api import solve_adjoint_system
        if relTol is None:
            relTol = float(self.options["adjointL2Convergence"])
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        params = self._ap_params(self.curAP)
        sub = int(self.options["adjointSubspaceSize"])
        sol = solve_adjoint_system(
            fns, self, wvec, xvec, params,
            jnp.asarray(inVec, self.dtype).reshape(-1), tol=relTol,
            subspace=sub,
            restarts=max(1, int(self.options["adjointMaxIter"]) // sub))
        return np.asarray(sol.x)

    def solveDirectForRHS(self, inVec, relTol=None):
        """Solve the direct (untransposed) system (dR/dw) x = inVec
        (reference: pyADflow.solveDirectForRHS:4242) with matrix-free
        GMRES + the block line-implicit preconditioner."""
        from adflow_tpu.solvers.krylov import gmres
        from adflow_tpu.solvers.linpc import line_pc_apply
        if relTol is None:
            relTol = float(self.options["adjointL2Convergence"])
        nfns = self._newton_fns()
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        params = self._ap_params(self.curAP)

        def matvec(v):
            _, jv = jax.jvp(lambda w: fns.res(w, xvec, params),
                            (wvec,), (v,))
            return jv

        data_list = nfns.collect_pc_data(wvec,
                                         jnp.asarray(1e6, wvec.dtype))

        def precond(v):
            vb = nfns.packer.unpack(v)
            return nfns.packer.pack(
                [line_pc_apply(d, vv)
                 for d, vv in zip(data_list, vb)])

        sub = int(self.options["adjointSubspaceSize"])
        sol = gmres(matvec, jnp.asarray(inVec, self.dtype).reshape(-1),
                    m=sub,
                    restarts=max(1, int(self.options["adjointMaxIter"])
                                 // sub),
                    tol=relTol, precond=precond)
        return np.asarray(sol.x)

    def _fmg_start(self, opt):
        """Full-multigrid start (reference: the mgStartLevel groundLevel
        loop, solvers.F90:63 + FMG transfer transferToFineGrid:326):
        converge cheap agglomerated-coarse problems with the Newton driver
        (nCyclesCoarse / L2ConvergenceCoarse budgets) and prolong the
        result as the fine-grid initial state. Runs only from a uniform
        free-stream init (MGStartLevel 1 disables; -1 = as coarse as the
        mesh allows, like the reference default)."""
        lvl_opt = int(opt["MGStartLevel"])
        if lvl_opt == 1 or not getattr(self, "_fresh_state", False):
            return
        from adflow_tpu.solvers.multigrid import (build_mg_levels,
                                                  parse_mg_cycle,
                                                  prolong_correction)
        from adflow_tpu.solvers.newton import solve_newton_driver

        # -1 = start at the coarsest level of the MGCycle (reference
        # default): with the single-grid 'sg' cycle that is level 1 — no
        # FMG unless the user asks for levels explicitly
        want = (parse_mg_cycle(str(opt["MGCycle"]))[0] if lvl_opt < 0
                else max(lvl_opt, 1))
        if want < 2:
            return
        try:
            levels = build_mg_levels(self.mesh, self.x_list, self.cfg,
                                     want, self.dtype)
        except ValueError:
            return
        if len(levels) < 2:
            return
        sub = self.options.asdict()
        sub["nCycles"] = int(opt["nCyclesCoarse"])
        sub["L2Convergence"] = float(opt["L2ConvergenceCoarse"])
        sub["printIterations"] = False

        def fresh(level):
            return [jnp.broadcast_to(
                self.winf, tuple(d + 4 for d in bs.dims) + (self.ref.nw,)
            ).astype(self.dtype) for bs in level.topo.blocks]

        w_c = None
        for li in range(len(levels) - 1, 0, -1):
            level = levels[li]
            if w_c is None:
                w_c = fresh(level)
            w_c, info_c = solve_newton_driver(
                w_c, list(level.metrics_list), level.topo, self.cfg,
                self.ref, self.winf, sub,
                extras_list=(list(level.extras_list)
                             if level.extras_list else None))
            if info_c.failed:
                return   # keep the free-stream init
            fine = levels[li - 1]
            w_f = fresh(fine)
            w_c = [
                wf.at[2:-2, 2:-2, 2:-2].set(prolong_correction(
                    w_c[i][2:-2, 2:-2, 2:-2], fine.factors[i]))
                for i, wf in enumerate(w_f)]
        self.w_list = w_c

    def _mixed_data(self):
        """f64 companions for the mixed-precision endgame
        (precision='mixed', solvers/newton.py f64 continuation): metrics are
        recomputed from the ORIGINAL f64 node coordinates — upcasting the
        f32 metrics would put an ~1e-7 flux-closure floor on the f64
        residual itself."""
        if self.options["precision"].lower() != "mixed":
            return None
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "precision='mixed' needs jax_enable_x64 "
                "(jax.config.update('jax_enable_x64', True))")
        if getattr(self, "_mixed_cache", None) is None:
            from adflow_tpu.geom.metrics import compute_metrics_conn
            x64 = [jnp.asarray(b.x, jnp.float64) for b in self.mesh.blocks]
            metrics64 = compute_metrics_conn(self.mesh.blocks, x64)
            extras64 = None
            if self.cfg.rans:
                from adflow_tpu.geom.walldist import compute_wall_distances
                d64 = compute_wall_distances(self.mesh, x64, jnp.float64)
                extras64 = [{"walldist": d} for d in d64]
            self._mixed_cache = (metrics64, extras64)
        metrics64, extras64 = self._mixed_cache
        winf64 = jnp.asarray(self.ref.winf(), jnp.float64)
        return (metrics64, winf64, extras64)

    def _filled_w(self):
        return fill_halos(self.w_list, self.metrics_list, self.topo,
                          self.ref, self.winf)

    def evalFunctions(self, ap: AeroProblem, funcs: dict,
                      evalFuncs: Optional[Sequence[str]] = None,
                      ignoreMissing: bool = True):
        """Reference: pyADflow.evalFunctions:1536 — fills
        funcs['<ap.name>_<func>']."""
        self.setAeroProblem(ap)
        if evalFuncs is None:
            evalFuncs = ap.evalFuncs
        wf = self._filled_w()
        ibl = [bs.iblank for bs in self.topo.blocks]
        f = integrate_forces(wf, self.x_list, self.metrics_list,
                             self.wall_patches, self.ref, self.cfg,
                             iblank_list=ibl, extras_list=self.extras_list,
                             patch_weights=self.wall_patch_weights,
                             cp_targets=getattr(self, "_cp_targets", None),
                             zipper=self.zipper_gaps)
        f.update(wall_sensors(wf, self.metrics_list, self.wall_patches,
                              self.ref, iblank_list=ibl,
                              x_list=self.x_list))
        if self.flow_patches:
            f.update(flow_through(wf, self.metrics_list, self.flow_patches,
                                  self.ref))
        all_funcs = cost_functions(f, self.ref)
        for surf in getattr(self, "_user_surfaces", []):
            from adflow_tpu.physics.usersurf import integrate_user_surface
            all_funcs.update(integrate_user_surface(wf, surf, self.ref))
        if getattr(self, "_ts_stab", None):
            all_funcs.update(self._ts_stab)
        if getattr(self, "_extra_funcs", None):
            all_funcs.update(self._eval_extra_funcs(all_funcs))
        for name in evalFuncs:
            key = name.lower()
            if key in all_funcs:
                funcs[f"{ap.name}_{name}"] = float(all_funcs[key])
            elif not ignoreMissing:
                raise ValueError(f"Unknown cost function '{name}'")
        return funcs

    def getResidual(self, ap: AeroProblem):
        """Full residual pytree (reference: pyADflow.getResidual:5359)."""
        self.setAeroProblem(ap)
        return residual_list(self.w_list, self.metrics_list, self.topo,
                             self.cfg, self.ref, self.winf, self.extras_list)

    def getResNorms(self):
        """(totalR0-free) current norms; reference pyADflow.getResNorms:4495."""
        r = residual_list(self.w_list, self.metrics_list, self.topo,
                          self.cfg, self.ref, self.winf, self.extras_list)
        nm, nt = residual_norms(r)
        return float(nm), float(nt)

    # -- state access (reference: getStates:5174 / setStates:5181) -------
    def getStates(self):
        return jnp.concatenate(
            [w[2:-2, 2:-2, 2:-2].reshape(-1) for w in self.w_list])

    def setStates(self, states):
        out = []
        ofs = 0
        for w in self.w_list:
            interior = w[2:-2, 2:-2, 2:-2]
            n = interior.size
            out.append(w.at[2:-2, 2:-2, 2:-2].set(
                jnp.asarray(states[ofs:ofs + n]).reshape(interior.shape)))
            ofs += n
        self.w_list = out

    def getSurfaceCoordinates(self, groupName: Optional[str] = None):
        """All wall-patch node coordinates (reference:
        getSurfaceCoordinates:3197)."""
        pts = []
        for patch in self.wall_patches:
            pts.append(np.asarray(
                self.x_list[patch.block][patch.fnode_sl]).reshape(-1, 3))
        return np.concatenate(pts) if pts else np.zeros((0, 3))

    def setOption(self, name: str, value):
        self.options = self.options.replace(**{name: value})

    def getOption(self, name: str):
        return self.options[name]

    # ------------------------------------------------------------------
    # solution output + restart (reference: pyADflow.writeSolution:2664,
    # writeVolumeSolutionFile:2769, writeSurfaceSolutionFile; restart via
    # the 'restartFile' option -> initFlow/variableReading.F90)
    # ------------------------------------------------------------------
    _VOL_VAR_NAMES = ("Density", "VelocityX", "VelocityY", "VelocityZ",
                      "Pressure")

    def _solution_dicts(self):
        """Per-block cell-centered solution dicts: the restart-required
        variables always, plus the ``volumeVariables`` menu (reference:
        volume variable menu, output/outputMod.F90:319-741)."""
        menu = [str(v).lower() for v in self.options["volumeVariables"]]
        out = []
        wf = self._filled_w()
        for bi, w in enumerate(wf):
            wi = np.asarray(w[2:-2, 2:-2, 2:-2])
            rho = wi[..., 0]
            vel = wi[..., 1:4] / rho[..., None]
            ke = 0.5 * np.sum(wi[..., 1:4] ** 2, axis=-1) / rho
            p = (GAMMA - 1.0) * (wi[..., 4] - ke)
            d = {"Density": rho, "VelocityX": vel[..., 0],
                 "VelocityY": vel[..., 1], "VelocityZ": vel[..., 2],
                 "Pressure": p,
                 "Mach": np.linalg.norm(vel, axis=-1) / np.sqrt(
                     GAMMA * p / rho),
                 "CoefPressure": (p - self.ref.p_inf) / max(self.ref.q_inf,
                                                            1e-30)}
            if self.cfg.n_turb == 1:
                d["TurbulentSANuTilde"] = wi[..., 5]
            elif self.cfg.n_turb == 2:
                d["TurbulentEnergyKinetic"] = wi[..., 5]
                d["TurbulentDissipationRate"] = wi[..., 6]
            if "temp" in menu:
                d["Temperature"] = GAMMA * p / rho
            if ("eddy" in menu or "eddyratio" in menu) and self.cfg.rans                     and self.cfg.turbulence_model == "sa":
                from adflow_tpu.physics.sa import eddy_viscosity
                from adflow_tpu.physics.thermo import laminar_viscosity
                import jax.numpy as _jnp
                t = GAMMA * p / rho
                mu = np.asarray(laminar_viscosity(
                    _jnp.asarray(t), self.ref.mu_inf, self.ref.t_inf_dim))
                mut = np.asarray(eddy_viscosity(
                    _jnp.asarray(wi), _jnp.asarray(mu)))
                if "eddy" in menu:
                    d["EddyViscosity"] = mut
                if "eddyratio" in menu:
                    d["RatioEddyViscosity"] = mut / np.maximum(mu, 1e-300)
            if "dist" in menu and self.extras_list is not None:
                dd = self.extras_list[bi].get("walldist")
                if dd is not None:
                    d["WallDistance"] = np.asarray(dd)[1:-1, 1:-1, 1:-1]
            if "blank" in menu:
                ib = self.topo.blocks[bi].iblank
                if ib is not None:
                    d["Iblank"] = np.asarray(ib)[..., 0]
            if "resrho" in menu or "resmom" in menu or "restot" in menu:
                r = residual_list(wf, self.metrics_list, self.topo,
                                  self.cfg, self.ref, self.winf,
                                  self.extras_list)[bi]
                rr = np.asarray(r)
                if "resrho" in menu:
                    d["ResidualDensity"] = rr[..., 0]
                if "resmom" in menu:
                    for c, nm in enumerate("XYZ"):
                        d[f"ResidualMomentum{nm}"] = rr[..., 1 + c]
                if "restot" in menu:
                    d["ResidualTotal"] = np.linalg.norm(rr, axis=-1)
            out.append(d)
        return out

    def writeVolumeSolutionFile(self, fileName: str, writeGrid: bool = True):
        from adflow_tpu.io.cgns import write_cgns
        hist = None
        if self.options["storeConvHist"] and self.solve_info is not None:
            h = self.getConvergenceHistory()
            hist = {"RSDMassRMS": h["resrho"],
                    "RSDTurbulentRMS": h["resturb"]}
        write_cgns(self.mesh, fileName, solutions=self._solution_dicts(),
                   conv_hist=hist)

    def writeMeshFile(self, fileName: str):
        from adflow_tpu.io.cgns import write_cgns
        write_cgns(self.mesh, fileName)

    def writeTecplotVolumeFile(self, fileName: str):
        """Tecplot ASCII volume file: one ORDERED (I,J,K, point-packed)
        zone per block with coordinates + the cell-centered solution menu
        averaged to nodes (reference: the Tecplot volume writer,
        output/tecplotIO.F90)."""
        sols = self._solution_dicts()
        with open(fileName, "w") as f:
            f.write('TITLE = "adflow_tpu volume solution"\n')
            names = ["CoordinateX", "CoordinateY", "CoordinateZ"]
            names += list(sols[0].keys())
            f.write("VARIABLES = " + " ".join(f'"{n}"' for n in names)
                    + "\n")
            for bi, b in enumerate(self.mesh.blocks):
                ni, nj, nk = b.dims
                f.write(f'ZONE T="{b.name}" I={ni + 1} J={nj + 1} '
                        f'K={nk + 1} DATAPACKING=POINT\n')
                cols = [b.x[..., 0], b.x[..., 1], b.x[..., 2]]
                for v in sols[bi].values():
                    c = np.asarray(v)
                    # cell -> node average (pad edges by replication)
                    node = np.zeros((ni + 1, nj + 1, nk + 1))
                    wsum = np.zeros_like(node)
                    for di in (0, 1):
                        for dj in (0, 1):
                            for dk in (0, 1):
                                node[di:ni + di, dj:nj + dj,
                                     dk:nk + dk] += c
                                wsum[di:ni + di, dj:nj + dj,
                                     dk:nk + dk] += 1.0
                    cols.append(node / np.maximum(wsum, 1.0))
                flat = np.stack([np.asarray(c).reshape(-1, order="F")
                                 for c in cols], axis=1)
                np.savetxt(f, flat, fmt="%15.8g")

    def writeIsoSurfaceFile(self, fileName: str, isoSurfaces=None):
        """Triangulated isosurfaces of solution variables (reference:
        isoSurface option + outputMod.F90:68; marching tetrahedra on the
        node-averaged fields, io/isosurface.py). isoSurfaces: {var: value}
        (defaults to the ``isoSurface`` option)."""
        from adflow_tpu.io.isosurface import (_node_field, marching_tets,
                                              write_isosurface_tecplot)
        spec = isoSurfaces if isoSurfaces is not None \
            else self.options["isoSurface"]
        if not spec:
            raise ValueError("no isosurfaces requested (isoSurface option)")
        sols = self._solution_dicts()
        surfaces = []
        for var, value in spec.items():
            key = next((k for k in sols[0]
                        if k.lower() == str(var).lower()), None)
            if key is None:
                raise ValueError(
                    f"isoSurface variable '{var}' not in the volume "
                    f"menu {list(sols[0])}")
            tris = []
            for bi, b in enumerate(self.mesh.blocks):
                vn = _node_field(np.asarray(sols[bi][key]))
                t = marching_tets(np.asarray(b.x), vn, float(value))
                if len(t):
                    tris.append(t)
            tri = (np.concatenate(tris, axis=0) if tris
                   else np.zeros((0, 3, 3)))
            surfaces.append((f"{var}={value}", tri))
        write_isosurface_tecplot(fileName, surfaces)

    def writeSurfaceSensitivity(self, fileName: str, func: str,
                                groupName: Optional[str] = None):
        """Tecplot file of d(func)/d(surface node coordinates) over the
        wall patches (reference: pyADflow.writeSurfaceSensitivity:2962 —
        adjoint xS seeds written as FEQuadrilateral zones). Requires
        evalFunctionsSens (or solveAdjoint) to be callable for ``func``;
        the sensitivity written is the volume-node derivative evaluated AT
        the surface nodes (the frozen-volume-warp surface sensitivity)."""
        sens = {}
        self.evalFunctionsSens(self.curAP, sens, evalFuncs=[func])
        dxv = np.asarray(
            sens[f"{self.curAP.name}_{func}"]["xv"]).reshape(-1, 3)
        # unpack per block node arrays
        ofs = 0
        dx_blocks = []
        for b in self.mesh.blocks:
            n = int(np.prod([d + 1 for d in b.dims]))
            dx_blocks.append(dxv[ofs:ofs + n].reshape(
                tuple(d + 1 for d in b.dims) + (3,)))
            ofs += n
        with open(fileName, "w") as f:
            f.write("Variables = CoordinateX CoordinateY CoordinateZ "
                    "dX dY dZ\n")
            for patch in self.wall_patches:
                if groupName is not None and patch.family != groupName:
                    continue
                xs = np.asarray(
                    self.mesh.blocks[patch.block].x[patch.fnode_sl])
                ds = dx_blocks[patch.block][patch.fnode_sl]
                n1, n2 = xs.shape[:2]
                ne = (n1 - 1) * (n2 - 1)
                f.write(f"ZONE Nodes={n1 * n2} Elements={ne} "
                        "Zonetype=FEQuadrilateral Datapacking=Point\n")
                pts = xs.reshape(-1, 3)
                dss = ds.reshape(-1, 3)
                for i in range(len(pts)):
                    f.write("%15.8g %15.8g %15.8g %15.8g %15.8g %15.8g\n"
                            % (*pts[i], *dss[i]))
                for i in range(n1 - 1):
                    for j in range(n2 - 1):
                        a = i * n2 + j + 1
                        f.write(f"{a} {a + 1} {a + n2 + 1} {a + n2}\n")

    def writeSurfaceSolutionFile(self, fileName: str):
        """Tecplot ASCII surface file: one zone per wall patch carrying the
        ``surfaceVariables`` menu (reference: surface variable menu,
        output/outputMod.F90 + tecplotIO; cp/rho/P/temp/mach/v/cf/yplus)."""
        from adflow_tpu.core.mesh import VISCOUS_WALL_BCS
        from adflow_tpu.physics.surface import wall_viscous_tractions
        from adflow_tpu.physics.thermo import pressure as _pr

        menu = [str(v).lower() for v in self.options["surfaceVariables"]]
        wf = self._filled_w()
        visc_cache = {}
        names = ["Cp"]
        want_v = any(v in menu for v in ("vx", "vy", "vz"))
        if want_v:
            names += ["VelocityX", "VelocityY", "VelocityZ"]
        if "mach" in menu:
            names.append("Mach")
        if "rho" in menu:
            names.append("Density")
        if "p" in menu:
            names.append("Pressure")
        if "temp" in menu:
            names.append("Temperature")
        want_cf = any(v in menu for v in ("cf", "cfx", "cfy", "cfz",
                                          "yplus")) and self.cfg.viscous
        if want_cf:
            names += ["Cf", "CfX", "CfY", "CfZ", "YPlus"]
        with open(fileName, "w") as f:
            f.write('TITLE = "adflow_tpu surface solution"\n')
            f.write('VARIABLES = "X" "Y" "Z" '
                    + " ".join(f'"{n}"' for n in names) + "\n")
            nvar = 3 + len(names)
            cellvars = ",".join(str(i) for i in range(4, nvar + 1))
            for pi, patch in enumerate(self.wall_patches):
                x = np.asarray(self.x_list[patch.block][patch.fnode_sl])
                w = wf[patch.block]
                m = self.metrics_list[patch.block]
                wi = np.asarray(w[patch.int_sl])
                wg = np.asarray(w[patch.ghost_sl])
                p_face = 0.5 * (np.asarray(_pr(jnp.asarray(wi)))
                                + np.asarray(_pr(jnp.asarray(wg))))
                cols = [(p_face - self.ref.p_inf)
                        / max(self.ref.q_inf, 1e-30)]
                vel = wi[..., 1:4] / wi[..., 0:1]
                if want_v:
                    cols += [vel[..., 0], vel[..., 1], vel[..., 2]]
                if "mach" in menu:
                    cols.append(np.linalg.norm(vel, axis=-1)
                                / np.sqrt(GAMMA * p_face / wi[..., 0]))
                if "rho" in menu:
                    cols.append(0.5 * (wi[..., 0] + wg[..., 0]))
                if "p" in menu:
                    cols.append(p_face)
                if "temp" in menu:
                    cols.append(GAMMA * p_face / (0.5 * (wi[..., 0]
                                                       + wg[..., 0])))
                if want_cf:
                    s_ = (m.si, m.sj, m.sk)[patch.axis]
                    da = np.linalg.norm(np.asarray(s_[patch.face_sl]),
                                        axis=-1)
                    qs = max(0.5 * self.ref.mach ** 2, 1e-30)
                    if patch.bc in VISCOUS_WALL_BCS:
                        ex = (self.extras_list[patch.block]
                              if self.extras_list else None)
                        df = np.asarray(wall_viscous_tractions(
                            w, m, self.cfg, self.ref, patch, extras=ex,
                            cache=visc_cache))
                        tau = df / np.maximum(da, 1e-300)[..., None]
                        taumag = np.linalg.norm(tau, axis=-1)
                    else:
                        tau = np.zeros(da.shape + (3,))
                        taumag = np.zeros_like(da)
                    cols += [taumag / qs, tau[..., 0] / qs,
                             tau[..., 1] / qs, tau[..., 2] / qs]
                    # y+ = d1 * utau / nu with utau = sqrt(tau_w / rho)
                    from adflow_tpu.physics.thermo import laminar_viscosity
                    t_i = GAMMA * np.asarray(
                        _pr(jnp.asarray(wi))) / wi[..., 0]
                    mu = np.asarray(laminar_viscosity(
                        jnp.asarray(t_i), self.ref.mu_inf,
                        self.ref.t_inf_dim))
                    vol1 = np.asarray(m.vol[patch.int_sl])
                    d1 = 0.5 * vol1 / np.maximum(da, 1e-300)
                    utau = np.sqrt(np.maximum(taumag, 0.0) / wi[..., 0])
                    cols.append(d1 * utau * wi[..., 0]
                                / np.maximum(mu, 1e-300))
                n1, n2 = x.shape[:2]
                f.write(f'ZONE T="patch{pi}" I={n1} J={n2} '
                        f'DATAPACKING=BLOCK, '
                        f'VARLOCATION=([{cellvars}]=CELLCENTERED)\n')
                for dcomp in range(3):
                    np.savetxt(f, x[..., dcomp].T.reshape(-1)[None],
                               fmt="%.12e")
                for c in cols:
                    np.savetxt(f, np.asarray(c).T.reshape(-1)[None],
                               fmt="%.12e")

    def writeSolution(self, outputDir: Optional[str] = None,
                      baseName: Optional[str] = None, number=None):
        """Write volume + surface + lift-distribution files
        (reference: pyADflow.writeSolution:2664; numberSolutions appends
        the per-AeroProblem call counter to the file names, padded to
        writeSolutionDigits digits)."""
        import os
        outputDir = outputDir or self.options["outputDirectory"]
        baseName = baseName or (self.curAP.name if self.curAP else "sol")
        digits = max(int(self.options["writeSolutionDigits"]), 1)
        if number is None and bool(self.options["numberSolutions"]):
            number = self._sol_counter.get(baseName, 0)
            self._sol_counter[baseName] = number + 1
        if number is not None:
            baseName = f"{baseName}_{int(number):0{digits}d}"
        base = os.path.join(outputDir, baseName)
        self.writeVolumeSolutionFile(base + "_vol.cgns")
        self.writeSurfaceSolutionFile(base + "_surf.dat")
        if getattr(self, "_lift_dists", None):
            self.writeLiftDistributionFile(base + "_lift.dat")

    def _load_restart(self):
        """Read the restartFile CGNS solution into the state (reference:
        variableReading.F90 readRestartFile; type-mismatch tolerant)."""
        from adflow_tpu.io.cgns import read_cgns_solution
        sols = read_cgns_solution(self.options["restartFile"])
        w_list = []
        for bi, b in enumerate(self.mesh.blocks):
            d = sols[bi]
            rho = jnp.asarray(d["Density"], self.dtype)
            vel = jnp.stack([jnp.asarray(d[f"Velocity{c}"], self.dtype)
                             for c in "XYZ"], axis=-1)
            p = jnp.asarray(d["Pressure"], self.dtype)
            rhoe = p / 0.4 + 0.5 * rho * jnp.sum(vel * vel, axis=-1)
            cols = [rho[..., None], rho[..., None] * vel, rhoe[..., None]]
            if self.cfg.n_turb == 1:
                nut = (jnp.asarray(d["TurbulentSANuTilde"], self.dtype)
                       if "TurbulentSANuTilde" in d
                       else jnp.full_like(rho, float(self.winf[5])))
                cols.append(nut[..., None])
            elif self.cfg.n_turb == 2:
                for j, nm in enumerate(("TurbulentEnergyKinetic",
                                        "TurbulentDissipationRate")):
                    v = (jnp.asarray(d[nm], self.dtype) if nm in d
                         else jnp.full_like(rho, float(self.winf[5 + j])))
                    cols.append(v[..., None])
            wi = jnp.concatenate(cols, axis=-1)
            w = jnp.broadcast_to(
                self.winf, tuple(dd + 4 for dd in b.dims)
                + (self.ref.nw,)).astype(self.dtype)
            w_list.append(w.at[2:-2, 2:-2, 2:-2].set(wi))
        self.w_list = w_list

    def getConvergenceHistory(self):
        """Reference: pyADflow.getConvergenceHistory:1404."""
        if self.solve_info is None:
            return {}
        h = self.solve_info.history
        return {"resrho": h[:, 0], "resturb": h[:, 1],
                "iterations": np.arange(len(h))}

    # ------------------------------------------------------------------
    # solution utilities (reference: solveCL:1847, getForces:3723,
    # addLiftDistribution:470)
    # ------------------------------------------------------------------
    def solveCL(self, ap: AeroProblem, CLStar: float, alpha0: float = 0.0,
                delta: float = 0.5, tol: float = 1e-4, maxIter: int = 20,
                autoReset: bool = False):
        """Secant iteration on alpha to hit a target CL
        (pyADflow.solveCL:1847)."""
        def cl_at(alpha):
            ap.alpha = alpha
            self.curAP = None          # force refstate rebuild
            self._ap_states.pop(ap.name, None)
            self(ap)
            funcs = {}
            self.evalFunctions(ap, funcs, evalFuncs=["cl"])
            return funcs[f"{ap.name}_cl"]

        a0, a1 = alpha0, alpha0 + delta
        f0 = cl_at(a0) - CLStar
        if abs(f0) < tol:
            return a0
        f1 = cl_at(a1) - CLStar
        for _ in range(maxIter):
            if abs(f1) < tol:
                return a1
            if f1 == f0:
                break
            a2 = a1 - f1 * (a1 - a0) / (f1 - f0)
            a0, f0 = a1, f1
            a1 = a2
            f1 = cl_at(a1) - CLStar
        return a1

    def getForces(self, groupName: Optional[str] = None):
        """Nodal surface forces (pressure + full-gradient viscous traction),
        cell-face force distributed 1/4 to each face node (reference:
        warping/getForces.F90:2 with the surfaceCellCenterToNode
        transfer; viscous part from the viscSubface stress —
        surfaceIntegrations.F90:406)."""
        from adflow_tpu.core.mesh import VISCOUS_WALL_BCS
        from adflow_tpu.physics.surface import wall_viscous_tractions
        wf = self._filled_w()
        out = []
        visc_cache = {}
        from adflow_tpu.physics.thermo import pressure as _pr
        for patch in self.wall_patches:
            w = wf[patch.block]
            m = self.metrics_list[patch.block]
            s = (m.si, m.sj, m.sk)[patch.axis]
            s_out = patch.sign * np.asarray(s[patch.face_sl])
            p_face = 0.5 * (np.asarray(_pr(w[patch.int_sl]))
                            + np.asarray(_pr(w[patch.ghost_sl])))
            df = (p_face - self.ref.p_inf)[..., None] * s_out
            if patch.bc in VISCOUS_WALL_BCS and self.cfg.viscous:
                ex = (self.extras_list[patch.block]
                      if self.extras_list is not None else None)
                df = df + np.asarray(wall_viscous_tractions(
                    w, m, self.cfg, self.ref, patch, extras=ex,
                    cache=visc_cache))
            n1 = df.shape[0] + 1
            n2 = df.shape[1] + 1
            nodal = np.zeros((n1, n2, 3))
            for di in (0, 1):
                for dj in (0, 1):
                    nodal[di:n1 - 1 + di, dj:n2 - 1 + dj] += 0.25 * df
            # dimensional Newtons (reference getForces.F90 forces carry
            # pRef): nondim force * rho_inf_dim a_inf_dim^2
            out.append(nodal.reshape(-1, 3) * self.ref.p_ref_dim)
        return (np.concatenate(out) if out else np.zeros((0, 3)))

    def addIntegrationSurface(self, fileName, familyName: str,
                              isInflow: bool = True):
        """Add a user-defined integration surface: an arbitrary
        triangulated plane inside the domain on which mass flow and
        mass-averaged totals are integrated, exposed as cost functions
        ``<familyName>_mdot`` / ``_mavgptot`` / ``_mavgttot`` / ``_mavgps``
        / ``_mavgmn`` / ``_area`` (reference:
        pyADflow.addIntegrationSurface:780 +
        userSurfaceIntegrations.F90). ``fileName`` is a formatted PLOT3D
        surface file, or a ``(pts, conn)`` tuple of vertex coordinates
        (np, 3) and quad/tri connectivity."""
        from adflow_tpu.physics.usersurf import (
            build_integration_surface, read_plot3d_surf)
        if isinstance(fileName, str):
            pts, conn = read_plot3d_surf(fileName)
        else:
            pts, conn = fileName
        surf = build_integration_surface(
            self.mesh, self.x_list, pts, conn, familyName,
            is_inflow=isInflow)
        if not hasattr(self, "_user_surfaces"):
            self._user_surfaces = []
        self._user_surfaces.append(surf)
        self._afns = None        # adjoint funcs now include this surface

    def addActuatorRegion(self, axis1, axis2, radius: float,
                          familyName: str = "actuator",
                          thrust: float = 0.0, torque: float = 0.0):
        """Add a cylindrical actuator volume adding distributed momentum
        (thrust along the axis) and energy (torque work) sources
        (reference: pyADflow.addActuatorRegion:831 ->
        solver/actuatorRegion.F90, sourceTerms_block residuals.F90:348;
        the reference takes a closed-surface triangulation — here the
        region is an axis-aligned cylinder, the common propeller-disk
        case)."""
        axis1 = np.asarray(axis1, float)
        axis2 = np.asarray(axis2, float)
        axvec = axis2 - axis1
        length = float(np.linalg.norm(axvec))
        axhat = axvec / max(length, 1e-30)
        if self.extras_list is None:
            self.extras_list = [{} for _ in self.mesh.blocks]
        # total volume of captured cells (for uniform distribution)
        masks = []
        vol_tot = 0.0
        for bi, m in enumerate(self.metrics_list):
            from adflow_tpu.geom.metrics import cell_centers
            xc = np.asarray(cell_centers(self.x_list[bi]))
            rel = xc - axis1
            t = rel @ axhat
            rad = np.linalg.norm(rel - t[..., None] * axhat, axis=-1)
            mask = ((t >= 0.0) & (t <= length) & (rad <= radius))
            masks.append(mask)
            vol = np.asarray(m.vol[2:-2, 2:-2, 2:-2])
            vol_tot += float(vol[mask].sum())
        if vol_tot <= 0.0:
            raise ValueError("actuator region captures no cells")
        for bi, m in enumerate(self.metrics_list):
            vol = np.asarray(m.vol[2:-2, 2:-2, 2:-2])
            src = np.zeros(vol.shape + (5,))
            f_per_vol = thrust / vol_tot
            # momentum source along the axis; energy source = F.u added at
            # residual time would need u — use actuator work f.u with the
            # local velocity folded in via thrust*axis . u_inf approx; the
            # reference adds f.u per cell — here: momentum only + torque
            # tangential momentum, energy from local dot handled below.
            src[..., 1:4] = (mask_v := masks[bi])[..., None] * (
                f_per_vol * axhat) * vol[..., None]
            if torque != 0.0:
                from adflow_tpu.geom.metrics import cell_centers
                xc = np.asarray(cell_centers(self.x_list[bi]))
                rel = xc - axis1
                t = rel @ axhat
                rvec = rel - t[..., None] * axhat
                rad = np.maximum(np.linalg.norm(rvec, axis=-1), 1e-12)
                that = np.cross(np.broadcast_to(axhat, rvec.shape), rvec)
                that /= np.maximum(
                    np.linalg.norm(that, axis=-1, keepdims=True), 1e-30)
                # torque T = sum f_t * r * V -> f_t = T / (sum r^2 V / r)...
                # uniform tangential force per volume weighted by radius
                w_r = rad * vol
                denom = float((w_r[mask_v] * rad[mask_v]).sum())
                f_t = torque / max(denom, 1e-30)
                src[..., 1:4] += (mask_v[..., None]
                                  * (f_t * rad)[..., None] * that
                                  * vol[..., None])
            ex = dict(self.extras_list[bi])
            ex["act_src_momentum"] = jnp.asarray(src, self.dtype)
            self.extras_list[bi] = ex
        # fold the velocity-dependent energy source at residual time:
        # store momentum sources; energy = f . u computed lazily
        self._finalize_actuator_sources()

    def _finalize_actuator_sources(self):
        """No-op kept for API stability: the energy row f . u is now
        evaluated per residual evaluation inside block_residual from the
        live state (residuals.F90:348 behavior), so nothing to fold."""
        return

    def getHeatFluxes(self, groupName: Optional[str] = None):
        """Wall heat flux per wall face, q = k dT/dn (reference:
        pyADflow.getHeatFluxes:3755; thin-layer wall gradient)."""
        from adflow_tpu.core.refstate import PR_LAMINAR, GAMMA
        from adflow_tpu.physics.thermo import (laminar_viscosity,
                                               temperature)
        wf = self._filled_w()
        out = []
        for patch in self.wall_patches:
            w = wf[patch.block]
            m = self.metrics_list[patch.block]
            s = (m.si, m.sj, m.sk)[patch.axis]
            smag = np.linalg.norm(np.asarray(s[patch.face_sl]), axis=-1)
            wi = w[patch.int_sl]
            wg = w[patch.ghost_sl]
            ti = np.asarray(temperature(wi))
            tg = np.asarray(temperature(wg))
            mu = np.asarray(laminar_viscosity(
                jnp.asarray(0.5 * (ti + tg)), self.ref.mu_inf,
                self.ref.t_inf_dim))
            k = mu / (PR_LAMINAR * (GAMMA - 1.0))
            vol = np.asarray(m.vol[patch.int_sl])
            dn = vol / np.maximum(smag, 1e-30)
            q = k * (ti - tg) / np.maximum(dn, 1e-30)   # dT/dn into wall
            out.append((q * smag).reshape(-1))
        return np.concatenate(out) if out else np.zeros(0)

    def addLiftDistribution(self, nSegments: int, direction: str,
                            groupName: Optional[str] = None):
        """Spanwise lift-distribution definition
        (pyADflow.addLiftDistribution:470); written by writeSolution."""
        if not hasattr(self, "_lift_dists"):
            self._lift_dists = []
        idx = {"x": 0, "y": 1, "z": 2}[direction.lower()]
        self._lift_dists.append((int(nSegments), idx))

    def writeLiftDistributionFile(self, fileName: str):
        """Bin wall-face forces along the span axis -> sectional
        distributions (tecplotIO.F90 lift distributions)."""
        wf = self._filled_w()
        from adflow_tpu.physics.thermo import pressure as _pr
        with open(fileName, "w") as f:
            f.write('TITLE = "lift distribution"\n')
            f.write('VARIABLES = "coor" "lift" "drag"\n')
            for nseg, axd in getattr(self, "_lift_dists", []):
                lo, hi = np.inf, -np.inf
                data = []
                for patch in self.wall_patches:
                    w = wf[patch.block]
                    m = self.metrics_list[patch.block]
                    s = (m.si, m.sj, m.sk)[patch.axis]
                    s_out = patch.sign * np.asarray(s[patch.face_sl])
                    p_face = 0.5 * (np.asarray(_pr(w[patch.int_sl]))
                                    + np.asarray(_pr(w[patch.ghost_sl])))
                    df = (p_face - self.ref.p_inf)[..., None] * s_out
                    from adflow_tpu.physics.surface import _patch_face_centers
                    xc = np.asarray(_patch_face_centers(
                        self.x_list[patch.block], patch))
                    c = xc[..., axd].reshape(-1)
                    lo, hi = min(lo, c.min()), max(hi, c.max())
                    data.append((c, df.reshape(-1, 3)))
                if not data:
                    continue
                if hi - lo < 1e-10:   # quasi-2D: single unit-width band
                    lo, hi = lo - 0.5, lo + 0.5
                edges = np.linspace(lo, hi + 1e-12, nseg + 1)
                lift = np.zeros(nseg)
                drag = np.zeros(nseg)
                for c, df in data:
                    bins = np.clip(np.digitize(c, edges) - 1, 0, nseg - 1)
                    np.add.at(lift, bins, self.ref.p_ref_dim
                              * (df @ np.asarray(self.ref.lift_dir)))
                    np.add.at(drag, bins, self.ref.p_ref_dim
                              * (df @ np.asarray(self.ref.drag_dir)))
                centers = 0.5 * (edges[:-1] + edges[1:])
                width = edges[1] - edges[0]
                f.write(f'ZONE T="dist_{"xyz"[axd]}" I={nseg}\n')
                for i in range(nseg):
                    f.write(f"{centers[i]:.10e} {lift[i] / width:.10e} "
                            f"{drag[i] / width:.10e}\n")

    # ------------------------------------------------------------------
    # adjoint / derivative machinery (reference: pyADflow.solveAdjoint:4052,
    # evalFunctionsSens:1673, computeJacobianVectorProductFwd:4557/Bwd:4814)
    # ------------------------------------------------------------------
    def _newton_fns(self):
        from adflow_tpu.solvers import newton
        if getattr(self, "_nfns", None) is None:
            self._nfns = newton.build_newton_fns(
                self.w_list, self.metrics_list, self.topo, self.cfg,
                self.ref, self.winf, self.extras_list)
        return self._nfns

    def _newton_packer(self):
        return self._newton_fns().packer

    def _adjoint_fns(self):
        from adflow_tpu.adjoint.api import build_adjoint_fns
        if getattr(self, "_afns", None) is None:
            self._afns = build_adjoint_fns(self)
        return self._afns

    def _ap_params(self, ap: AeroProblem):
        """Differentiable design-variable dict (the reference's extra-DV
        index map alpha/beta/mach + P, T, Re, ref point —
        pyADflow.py:6444-6461)."""
        out = {"alpha": jnp.asarray(ap.alpha, self.dtype),
               "beta": jnp.asarray(ap.beta, self.dtype),
               "mach": jnp.asarray(ap.mach, self.dtype),
               "T": jnp.asarray(ap.T, self.dtype),
               "P": jnp.asarray(ap.P, self.dtype),
               "xref": jnp.asarray([ap.xRef, ap.yRef, ap.zRef],
                                   self.dtype)}
        if ap.reynolds and ap.reynolds > 0:
            out["reynolds"] = jnp.asarray(ap.reynolds, self.dtype)
        # grid-motion DVs (reference rotx..rotcenz/machgrid,
        # pyADflow.py:6447-6457): rotRate carried NONDIM (rad/s / a_inf,
        # matching the primal's metrics attach); evalFunctionsSens converts
        # the gradient back to per-(rad/s)
        if getattr(ap, "rotRate", None) is not None:
            import numpy as _np
            out["rotRate"] = jnp.asarray(
                _np.asarray(ap.rotRate, float) / ap.a_dim, self.dtype)
            out["rotCenter"] = jnp.asarray(ap.rotCenter, self.dtype)
        if float(getattr(ap, "machGrid", 0.0) or 0.0) != 0.0:
            out["machGrid"] = jnp.asarray(ap.machGrid, self.dtype)
        return out

    def _wx_vecs(self):
        fns = self._adjoint_fns()
        packer = self._newton_packer()
        wvec = packer.pack_w(self.w_list)
        xvec = fns.pack_x(self.x_list)
        return wvec, xvec

    def solveAdjoint(self, ap: AeroProblem, objective: str):
        """Solve dRdw^T psi = dI/dw for one cost function; psi cached per
        (ap, objective) and warm-started (reference restartAdjoint)."""
        from adflow_tpu.adjoint.api import solve_adjoint_system
        self.setAeroProblem(ap)
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        params = self._ap_params(ap)
        key = objective.lower()

        dIdw = jax.grad(
            lambda w: fns.funcs(w, xvec, params)[key])(wvec)
        if not hasattr(self, "_psi_cache"):
            self._psi_cache = {}
        # warm-start from the cached psi only when restartAdjoint is on
        # (reference: inputADjoint restartAdjoint / solveAdjoint warm
        # start, adjointAPI.F90:742-752)
        psi0 = (self._psi_cache.get((ap.name, key))
                if bool(self.options["restartAdjoint"]) else None)
        sol = solve_adjoint_system(
            fns, self, wvec, xvec, params, dIdw, psi0=psi0,
            tol=float(self.options["adjointL2Convergence"]),
            abs_tol=float(self.options["adjointL2ConvergenceRel"]),
            subspace=int(self.options["adjointSubspaceSize"]),
            restarts=max(1, int(self.options["adjointMaxIter"])
                         // max(int(self.options["adjointSubspaceSize"]), 1)))
        self._psi_cache[(ap.name, key)] = sol.x
        self.adjointFailed = not bool(sol.converged)
        return sol.x

    def evalFunctionsSens(self, ap: AeroProblem, funcsSens: dict,
                          evalFuncs: Optional[Sequence[str]] = None):
        """Total derivatives d(func)/d{alpha, beta, mach, xv} via one adjoint
        solve per function: dI/d* = dI/d*|direct - psi^T dR/d*."""
        self.setAeroProblem(ap)
        if evalFuncs is None:
            evalFuncs = ap.evalFuncs
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        params = self._ap_params(ap)
        for name in evalFuncs:
            key = name.lower()
            psi = self.solveAdjoint(ap, key)

            def scalar_fn(x, p, key=key):
                return fns.funcs(wvec, x, p)[key]

            gI_x, gI_p = jax.grad(scalar_fn, argnums=(0, 1))(xvec, params)
            _, vjp_xp = jax.vjp(
                lambda x, p: fns.res(wvec, x, p), xvec, params)
            gR_x, gR_p = vjp_xp(psi)
            sens = {
                "alpha": float(gI_p["alpha"] - gR_p["alpha"]),
                "beta": float(gI_p["beta"] - gR_p["beta"]),
                "mach": float(gI_p["mach"] - gR_p["mach"]),
                "T": float(gI_p["T"] - gR_p["T"]),
                "P": float(gI_p["P"] - gR_p["P"]),
                "xref": np.asarray(gI_p["xref"] - gR_p["xref"]),
                "xv": np.asarray(gI_x - gR_x),
            }
            # freestream-density DV (reference iDV['rho'],
            # pyADflow.py:6451): our thermodynamic pair is (P, T) with
            # rho = P/(R T) — the rho total at constant T follows by the
            # gas-law chain dI/drho|_T = R T dI/dP
            from adflow_tpu.core.refstate import R_GAS
            sens["rho"] = R_GAS * ap.T * sens["P"]
            if "reynolds" in params:
                sens["reynolds"] = float(gI_p["reynolds"]
                                         - gR_p["reynolds"])
            if "rotRate" in params:
                # gradients taken w.r.t. the nondim rate (rad/s / a_inf);
                # report per-(rad/s) like the reference rotx/roty/rotz DVs
                sens["rotRate"] = np.asarray(
                    gI_p["rotRate"] - gR_p["rotRate"]) / ap.a_dim
                sens["rotCenter"] = np.asarray(
                    gI_p["rotCenter"] - gR_p["rotCenter"])
            if "machGrid" in params:
                sens["machGrid"] = float(gI_p["machGrid"]
                                         - gR_p["machGrid"])
            funcsSens[f"{ap.name}_{name}"] = sens
        return funcsSens

    def computeJacobianVectorProductFwd(self, wDot=None, xVDot=None,
                                        residualDeriv=False, funcDeriv=False,
                                        **kwargs):
        """Forward (JVP) products (reference: adjointAPI.F90:11 via
        master_d; modes FD/CS unnecessary — jax.jvp is exact)."""
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        params = self._ap_params(self.curAP)
        wd = (jnp.zeros_like(wvec) if wDot is None
              else jnp.asarray(wDot, self.dtype))
        xd = (jnp.zeros_like(xvec) if xVDot is None
              else jnp.asarray(xVDot, self.dtype).reshape(-1))
        out = []
        if residualDeriv:
            _, rdot = jax.jvp(lambda w, x: fns.res(w, x, params),
                              (wvec, xvec), (wd, xd))
            out.append(np.asarray(rdot))
        if funcDeriv:
            _, fdot = jax.jvp(lambda w, x: fns.funcs(w, x, params),
                              (wvec, xvec), (wd, xd))
            out.append({k: float(v) for k, v in fdot.items()})
        return out[0] if len(out) == 1 else tuple(out)

    def computeJacobianVectorProductBwd(self, resBar=None, funcsBar=None,
                                        wDeriv=False, xVDeriv=False,
                                        **kwargs):
        """Reverse (VJP) products (reference: adjointAPI.F90:97 via
        master_b)."""
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        params = self._ap_params(self.curAP)
        gw = jnp.zeros_like(wvec)
        gx = jnp.zeros_like(xvec)
        if resBar is not None:
            _, vjp = jax.vjp(lambda w, x: fns.res(w, x, params), wvec, xvec)
            dw, dx = vjp(jnp.asarray(resBar, self.dtype))
            gw, gx = gw + dw, gx + dx
        if funcsBar is not None:
            def weighted(w, x):
                f = fns.funcs(w, x, params)
                return sum(float(v) * f[k.lower()]
                           for k, v in funcsBar.items())
            dw, dx = jax.grad(weighted, argnums=(0, 1))(wvec, xvec)
            gw, gx = gw + dw, gx + dx
        out = []
        if wDeriv:
            out.append(np.asarray(gw))
        if xVDeriv:
            out.append(np.asarray(gx))
        return out[0] if len(out) == 1 else tuple(out)

    # ------------------------------------------------------------------
    # Geometry interface (reference: setSurfaceCoordinates:3208,
    # updateGeometryInfo:4295, setGrid/getGrid warping.F90:70,195)
    # ------------------------------------------------------------------
    def setSurfaceCoordinates(self, coords, groupName: Optional[str] = None):
        """Stage new wall-surface node coordinates; applied (IDW volume
        warp + metric rebuild) by updateGeometryInfo, like the reference's
        deferred ``_updateGeomInfo`` flag."""
        self._pending_surface = np.asarray(coords, float)
        self._geom_dirty = True

    def updateGeometryInfo(self):
        """Warp the volume mesh to the staged surface and rebuild metrics
        (reference: updateGeometryInfo:4295 -> IDWarp warp + metric)."""
        if not getattr(self, "_geom_dirty", False):
            return
        from adflow_tpu.geom.warp import warp_mesh
        pts0 = self.getSurfaceCoordinates()
        disp = self._pending_surface - pts0
        self.x_list = warp_mesh(self.mesh, self.x_list, pts0, disp)
        self._rebuild_geometry()
        self._geom_dirty = False

    def _warped_mesh(self):
        """The mesh object at the CURRENT node coordinates (shares BC/conn
        metadata, replaces only x) — host-side geometry rebuilds (overset
        donor search, wall quads, overlap weights) must see the warped
        coordinates, not construction-time ones."""
        import dataclasses as _dc
        from adflow_tpu.core.mesh import MultiBlockMesh
        return MultiBlockMesh(
            blocks=[_dc.replace(b, x=np.asarray(x, float))
                    for b, x in zip(self.mesh.blocks, self.x_list)],
            name=self.mesh.name)

    def _rebuild_geometry(self):
        """Recompute metrics/wall distances/overset connectivity and drop
        stale jitted closures after any node-coordinate change."""
        from adflow_tpu.geom.metrics import compute_metrics_conn
        self.metrics_list = compute_metrics_conn(self.mesh.blocks,
                                                 self.x_list)
        self._metrics_base = list(self.metrics_list)
        warped = None
        if self.topo.overset is not None or self._cut_cb is not None:
            # overset re-connectivity for the deformed mesh (reference:
            # updateOversetConnectivity, oversetCommUtilites.F90:1729,
            # called per step from blockette.F90:193): donors, weights and
            # iblank are functions of the coordinates — without this the
            # fringe interpolation silently reads pre-warp donor cells
            warped = self._warped_mesh()
            self.topo = build_topology(warped, cut_callback=self._cut_cb)
            if self.wall_patch_weights is not None:
                from adflow_tpu.overset.assembly import (
                    build_zipper_gaps, overlap_surface_weights)
                self.wall_patch_weights = overlap_surface_weights(
                    warped, self.wall_patches)
                if bool(self.options["useZipperMesh"]):
                    self.zipper_gaps = build_zipper_gaps(
                        warped, self.wall_patches,
                        self.wall_patch_weights)
        if self.cfg.rans:
            from adflow_tpu.geom.walldist import (
                compute_wall_distances, update_wall_distances)
            mesh_now = warped if warped is not None else self.mesh
            cutoff = float(self.options["wallDistCutoff"])
            if (bool(self.options["useApproxWallDistance"])
                    and self._walldist_assoc is not None):
                # fast path: re-project onto the stored nearest elements
                # (updateWallDistancesQuickly, wallDistance.F90:36)
                d_list = update_wall_distances(
                    mesh_now, self.x_list, self._walldist_assoc,
                    self.dtype, cutoff=cutoff)
            else:
                d_list, self._walldist_assoc = compute_wall_distances(
                    mesh_now, self.x_list, self.dtype, return_assoc=True,
                    cutoff=cutoff)
            for ex, d in zip(self.extras_list, d_list):
                ex["walldist"] = d
        self._nfns = None
        self._afns = None
        self._psi_cache = {}
        ap, self.curAP = self.curAP, None
        if ap is not None:
            self.setAeroProblem(ap)

    def getGrid(self):
        """Flat volume-node coordinate vector in block order (reference:
        getGrid, warping.F90:195 — the MPhys 'adflow_vol_coords')."""
        return np.concatenate(
            [np.asarray(x).reshape(-1) for x in self.x_list])

    def setGrid(self, flat):
        """Set all volume nodes from a flat vector (reference: setGrid,
        warping.F90:70)."""
        flat = np.asarray(flat, float)
        off = 0
        new = []
        for x in self.x_list:
            n = int(np.prod(x.shape))
            new.append(jnp.asarray(flat[off:off + n].reshape(x.shape),
                                   self.dtype))
            off += n
        self.x_list = new
        self._rebuild_geometry()

    # ------------------------------------------------------------------
    # Slices & extra output (reference: addSlices:516, tecplotIO.F90)
    # ------------------------------------------------------------------
    def addSlices(self, direction: str, positions, sliceType: str = "relative",
                  groupName: Optional[str] = None):
        """Register plane cuts of the wall surface (reference addSlices:516;
        direction in 'x','y','z')."""
        if not hasattr(self, "_slices"):
            self._slices = []
        ax = {"x": 0, "y": 1, "z": 2}[direction.lower()]
        for pos in np.atleast_1d(positions):
            self._slices.append((ax, float(pos)))

    def _surface_cp(self, patch):
        from adflow_tpu.physics.thermo import pressure
        w = self._filled_w()[patch.block]
        pi = pressure(w[patch.int_sl])
        pg = pressure(w[patch.ghost_sl])
        pw = 0.5 * (pi + pg)
        qinf = 0.5 * self.ref.mach ** 2
        return np.asarray((pw - self.ref.p_inf) / qinf)

    def writeSlicesFile(self, fileName: str):
        """Write all registered slices as Tecplot FELINESEG zones."""
        from adflow_tpu.io.slices import slice_quads, write_tecplot_slices
        out = []
        for (ax, pos) in getattr(self, "_slices", []):
            nrm = np.zeros(3)
            nrm[ax] = 1.0
            p0 = nrm * pos
            segs_all, vals_all = [], {"Cp": []}
            for patch in self.wall_patches:
                corners = np.asarray(self.x_list[patch.block][patch.fnode_sl])
                cp = self._surface_cp(patch)
                segs, vals = slice_quads(corners, {"Cp": cp}, p0, nrm)
                if len(segs):
                    segs_all.append(segs)
                    vals_all["Cp"].append(vals["Cp"])
            if segs_all:
                out.append((f"slice_{'xyz'[ax]}_{pos:g}",
                            np.concatenate(segs_all),
                            {"Cp": np.concatenate(vals_all["Cp"])}))
        write_tecplot_slices(fileName, out)

    def writeForceFile(self, fileName: str, groupName: Optional[str] = None):
        """Nodal wall force file (reference: writeForceFile:2884)."""
        pts = self.getSurfaceCoordinates(groupName)
        forces = self.getForces(groupName)
        with open(fileName, "w") as f:
            f.write(f"{len(pts)}\n")
            for p, fr in zip(pts, np.asarray(forces).reshape(-1, 3)):
                f.write(" ".join(f"{v:.12e}" for v in (*p, *fr)) + "\n")

    # ------------------------------------------------------------------
    # Composite / user cost functions (reference: addUserFunction:1005,
    # addFunction:1048)
    # ------------------------------------------------------------------
    def addFunction(self, funcName: str, groupName: Optional[str],
                    name: Optional[str] = None):
        """Register <funcName> restricted to a surface family group."""
        if not hasattr(self, "_extra_funcs"):
            self._extra_funcs = {}
        name = name or f"{funcName}_{groupName}"
        self._extra_funcs[name.lower()] = ("family", funcName.lower(),
                                           groupName)
        return name

    def addUserFunction(self, funcName: str, functions: Sequence[str],
                        callback):
        """Register a Python composite of existing cost functions
        (reference: adflowUserFunc, pyADflow.py:1005/6814)."""
        if not hasattr(self, "_extra_funcs"):
            self._extra_funcs = {}
        self._extra_funcs[funcName.lower()] = ("user", list(functions),
                                               callback)
        return funcName

    def _eval_extra_funcs(self, base: dict) -> dict:
        out = {}
        for name, spec in getattr(self, "_extra_funcs", {}).items():
            if spec[0] == "user":
                _, deps, cb = spec
                out[name] = float(cb({d: base[d.lower()] for d in deps}))
            else:
                _, fname, group = spec
                wf = self._filled_w()
                patches = [p for p in self.wall_patches
                           if group is None or p.family == group]
                f = integrate_forces(wf, self.x_list,
                                     self.metrics_list, patches, self.ref,
                                     self.cfg,
                                     iblank_list=[bs.iblank for bs
                                                  in self.topo.blocks],
                                     extras_list=self.extras_list)
                # family-restricted flow-through functions (mdot,
                # aavgptot, ... — reference addFunction on inflow/outflow
                # families, test_multiple_bc.py scenario)
                fpatches = [p for p in self.flow_patches
                            if group is None or p.family == group]
                if fpatches:
                    f.update(flow_through(wf, self.metrics_list, fpatches,
                                          self.ref))
                out[name] = float(cost_functions(f, self.ref)[fname])
        return out

    # ------------------------------------------------------------------
    # Solution utilities (reference: solveSep:2516, solveTrimCL:2236,
    # solveTargetFuncs:2369, solveErrorEstimate:5370,
    # propagateUncertainty:1784)
    # ------------------------------------------------------------------
    def _func_at(self, ap, dvs: dict, names):
        for k, v in dvs.items():
            setattr(ap, k, float(v))
        if bool(self.options["infChangeCorrection"]) \
                and self.w_list is not None and self.curAP is ap:
            # keep the converged state: the free-stream-change correction
            # warm-starts the next DV point (reference solveCL behavior
            # with infChangeCorrection on)
            self._ap_states[ap.name] = self.w_list
            self._ap_winfs[ap.name] = getattr(self, "_state_winf", None)
        else:
            self._ap_states.pop(ap.name, None)
        self.curAP = None
        self(ap)
        funcs = {}
        self.evalFunctions(ap, funcs, evalFuncs=list(names))
        return [funcs[f"{ap.name}_{n}"] for n in names]

    def solveTargetFuncs(self, ap: AeroProblem, targets: dict, dvs: dict,
                         tol: float = 1e-4, maxIter: int = 12):
        """Broyden (multi-variable secant) solve driving cost functions to
        targets by varying AeroProblem scalars (reference
        solveTargetFuncs:2369)."""
        names = list(targets)
        keys = list(dvs)
        x = np.array([float(dvs[k]) for k in keys])
        t = np.array([float(targets[n]) for n in names])
        f = np.array(self._func_at(ap, dict(zip(keys, x)), names)) - t
        # initial Jacobian by forward differences
        J = np.zeros((len(names), len(keys)))
        for j, k in enumerate(keys):
            dx = max(1e-2, 1e-2 * abs(x[j]))
            xp = x.copy()
            xp[j] += dx
            fp = np.array(self._func_at(ap, dict(zip(keys, xp)), names)) - t
            J[:, j] = (fp - f) / dx
        for _ in range(maxIter):
            if np.abs(f).max() < tol:
                break
            step = np.linalg.lstsq(J, -f, rcond=None)[0]
            x = x + step
            fn = np.array(self._func_at(ap, dict(zip(keys, x)), names)) - t
            df = fn - f
            # Broyden rank-1 update
            denom = float(step @ step)
            if denom > 0:
                J = J + np.outer(df - J @ step, step) / denom
            f = fn
        return dict(zip(keys, x))

    def solveTrimCL(self, ap: AeroProblem, CLStar: float, trimStar: float = 0.0,
                    alpha0: float = 0.0, trimDV: str = "beta",
                    trimFunc: str = "cmy", tol: float = 1e-4,
                    maxIter: int = 12):
        """2x2 trim solve: alpha->CL*, trim DV -> trim function target
        (reference solveTrimCL:2236)."""
        ap.alpha = alpha0
        return self.solveTargetFuncs(
            ap, {"cl": CLStar, trimFunc: trimStar},
            {"alpha": alpha0, trimDV: getattr(ap, trimDV, 0.0)},
            tol=tol, maxIter=maxIter)

    def solveSep(self, ap: AeroProblem, sepStar: float, alpha0: float = 0.0,
                 delta: float = 0.5, tol: float = 1e-4, maxIter: int = 20):
        """Secant on alpha to a target separation-sensor value
        (reference solveSep:2516)."""
        out = self.solveTargetFuncs(ap, {"sepsensor": sepStar},
                                    {"alpha": alpha0}, tol=tol,
                                    maxIter=maxIter)
        return out["alpha"]

    def solveErrorEstimate(self, ap: AeroProblem, objective: str):
        """Adjoint-weighted residual error estimate for one function:
        err = -psi^T R(w) (reference solveErrorEstimate:5370)."""
        self.setAeroProblem(ap)
        psi = self.solveAdjoint(ap, objective.lower())
        fns = self._adjoint_fns()
        wvec, xvec = self._wx_vecs()
        r = fns.res(wvec, xvec, self._ap_params(ap))
        return -float(jnp.vdot(jnp.asarray(psi), r))

    def propagateUncertainty(self, ap: AeroProblem, evalFuncs, uq: dict):
        """First-order (linearized) uncertainty propagation: sigma_f^2 =
        sum (df/dv)^2 sigma_v^2 over aero DVs (reference
        propagateUncertainty:1784)."""
        sens = {}
        self.evalFunctionsSens(ap, sens, evalFuncs=list(evalFuncs))
        out = {}
        for name in evalFuncs:
            key = f"{ap.name}_{name}"
            var = 0.0
            for dv, sigma in uq.items():
                d = sens.get(key, {}).get(dv, 0.0)
                var += (float(np.asarray(d).reshape(-1)[0]
                              if np.ndim(d) else d) * sigma) ** 2
            out[key] = math_sqrt(var)
        return out

    def mapVector(self, vec, groupName1: Optional[str],
                  groupName2: Optional[str], vec2=None):
        """Map a surface-point vector between family groups (reference
        mapVector:5045). Groups are node sets of wall patches."""
        def rows(group):
            rows = []
            off = 0
            for patch in self.wall_patches:
                n = int(np.prod(np.asarray(
                    self.x_list[patch.block][patch.fnode_sl]).shape[:-1]))
                if group is None or patch.family == group:
                    rows.extend(range(off, off + n))
                off += n
            return np.asarray(rows, int)

        r1, r2 = rows(groupName1), rows(groupName2)
        full = np.zeros((sum(int(np.prod(np.asarray(
            self.x_list[p.block][p.fnode_sl]).shape[:-1]))
            for p in self.wall_patches), vec.shape[-1]))
        full[r1] = np.asarray(vec)
        out = full[r2]
        if vec2 is not None:
            np.asarray(vec2)[...] = out
        return out

    def setWallTemperature(self, temperature):
        """Prescribe isothermal-wall temperatures (reference
        setWallTemperature:3793): scalar or per-patch dict {family: T}."""
        for blk in self.mesh.blocks:
            for sf in blk.bcs:
                if sf.bc is BCType.NS_WALL_ISOTHERMAL:
                    t = (temperature.get(sf.family)
                         if isinstance(temperature, dict) else temperature)
                    if t is not None:
                        d = dict(sf.data or {})
                        d["T"] = float(t)
                        object.__setattr__(sf, "data", d)
        self.topo = build_topology(self.mesh, cut_callback=self._cut_cb)
        self._nfns = None
        self._afns = None


def math_sqrt(x):
    import math
    return math.sqrt(x)


# Alias matching this framework's own naming
Solver = ADFLOW
