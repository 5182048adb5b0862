"""The user-facing solver class.

Reference analogue: class ``ADFLOW``
(`/root/reference/adflow/pyADflow.py:60`): options-dict construction, then
``__call__(aeroProblem)`` to solve, ``evalFunctions``/``evalFunctionsSens``
for cost functions and totals, state access, residual/JVP/VJP products.
Lifecycle mirrored from SURVEY.md §3.1-3.3; everything device-side is jitted
JAX over the mesh pytree instead of f2py calls into libadflow.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import MultiBlockMesh, WALL_BCS
from adflow_tpu.core.refstate import (
    AeroProblem, ReferenceState, make_reference_state)
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.options import Options
from adflow_tpu.physics.residual import (
    MeshTopology, ProblemConfig, build_topology, fill_halos, residual_list)
from adflow_tpu.physics.surface import (
    build_wall_patches, cost_functions, integrate_forces)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.solvers import steady
from adflow_tpu.solvers.smoothers import residual_norms
from adflow_tpu.utils.dtypes import resolve_dtype


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
        self.mesh = mesh

        # ---- preprocessing (reference: preprocessingAPI.F90:5) ----
        self.topo: MeshTopology = build_topology(mesh)
        self.x_list = [jnp.asarray(b.x, self.dtype) for b in mesh.blocks]
        self.metrics_list = [compute_metrics(x) for x in self.x_list]
        self._check_volumes()

        eq = self.options["equationType"].lower()
        self.cfg = ProblemConfig(
            equation_type=eq,
            vis2=float(self.options["vis2"]),
            vis4=float(self.options["vis4"]),
            diss_exponent=float(self.options["dissipationScalingExponent"]),
            discretization=self.options["discretization"].lower(),
            limiter=self.options["limiter"].lower(),
            entropy_fix=float(self.options["entropyFix"]),
            turbulence_model=self.options["turbulenceModel"].lower(),
        )
        self.wall_patches = build_wall_patches(mesh)

        # wall distance for RANS (reference: wallDistance.F90:129)
        self.extras_list = None
        if self.cfg.rans:
            from adflow_tpu.geom.walldist import compute_wall_distances
            d_list = compute_wall_distances(mesh, self.x_list, self.dtype)
            self.extras_list = [{"walldist": d} for d in d_list]

        self.curAP: Optional[AeroProblem] = None
        self.ref: Optional[ReferenceState] = None
        self.winf = None
        self.w_list: Optional[List[jnp.ndarray]] = None
        self._ap_states: Dict[str, list] = {}
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
        self.curAP = ap
        self.ref = make_reference_state(
            ap, lift_index=int(self.options["liftIndex"]),
            n_turb=self.cfg.n_turb)
        self.winf = jnp.asarray(self.ref.winf(), self.dtype)
        if ap.name in self._ap_states:
            self.w_list = self._ap_states[ap.name]
        else:
            self.resetFlow(ap)

    def resetFlow(self, ap: Optional[AeroProblem] = None):
        """Uniform free-stream initialization (reference: initFlow,
        initializeFlow.F90:345)."""
        if ap is not None and self.curAP is not ap:
            self.setAeroProblem(ap)
        self.w_list = [
            jnp.broadcast_to(
                self.winf,
                tuple(d + 4 for d in b.dims) + (self.ref.nw,)
            ).astype(self.dtype)
            for b in self.mesh.blocks
        ]

    # ------------------------------------------------------------------
    def __call__(self, ap: AeroProblem, **kwargs):
        """Solve the steady problem (reference: ADFLOW.__call__:1185 ->
        solvers.F90 solver/solveState)."""
        self.setAeroProblem(ap)
        opt = self.options
        t0 = time.time()

        monitor = None
        if opt["printIterations"]:
            def monitor(it, rm, rt):
                print(f"  iter {it:6d}  resrho {rm:12.6e}  resturb {rt:12.6e}")

        use_nk = bool(opt["useNKSolver"])
        use_ank = bool(opt["useANKSolver"])
        if use_nk or use_ank:
            from adflow_tpu.solvers.newton import solve_newton_driver
            self.w_list, info = solve_newton_driver(
                self.w_list, self.metrics_list, self.topo, self.cfg,
                self.ref, self.winf, self.options,
                extras_list=self.extras_list, monitor=monitor)
        else:
            self.w_list, info = steady.solve_rk(
                self.w_list, self.metrics_list, self.topo, self.cfg,
                self.ref, self.winf,
                cfl=float(opt["CFL"]), n_cycles=int(opt["nCycles"]),
                l2_conv=float(opt["L2Convergence"]),
                l2_conv_rel=float(opt["L2ConvergenceRel"]),
                extras_list=self.extras_list, monitor=monitor)
        self.solve_info = info
        ap.solveFailed = bool(info.failed)
        ap.fatalFail = bool(info.failed)
        if opt["printTiming"]:
            print(f"  solve wall time: {time.time() - t0:.2f} s "
                  f"({info.iterations} iterations, "
                  f"R {info.total_r0:.3e} -> {info.total_r_final:.3e})")
        return

    # ------------------------------------------------------------------
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
        f = integrate_forces(wf, self.x_list, self.metrics_list,
                             self.wall_patches, self.ref, self.cfg)
        all_funcs = cost_functions(f, self.ref)
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


# Alias matching this framework's own naming
Solver = ADFLOW
