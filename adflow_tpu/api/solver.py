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
        return {"alpha": jnp.asarray(ap.alpha, self.dtype),
                "beta": jnp.asarray(ap.beta, self.dtype),
                "mach": jnp.asarray(ap.mach, self.dtype)}

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
        psi0 = self._psi_cache.get((ap.name, key))
        sol = solve_adjoint_system(
            fns, self, wvec, xvec, params, dIdw, psi0=psi0,
            tol=float(self.options["adjointL2Convergence"]),
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
                "xv": np.asarray(gI_x - gR_x),
            }
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


# Alias matching this framework's own naming
Solver = ADFLOW
