"""Newton-type implicit solvers: ANK (pseudo-transient) and NK (full Newton).

Reference analogues (`/root/reference/src/NKSolver/NKSolvers.F90`):
- ANK (:1643-4113): backward-Euler pseudo-transient with per-cell CFL-scaled
  diagonal (computeTimeStepBlock:2116), SER CFL ramp, physicality check
  limiting density/energy changes (physicalityCheckANK:3013), matrix-free
  GMRES solves (ANKStep:3629).
- NK (:1-1641): matrix-free Newton-Krylov, Eisenstat-Walker forcing
  (getEWTol:1606), cubic line search (LSCubic:681), NKStep:512.
- The switching driver solveState (solver/solvers.F90:892): smoother -> ANK
  -> NK by relative-residual thresholds.

Key design difference: the reference builds a first-order assembled PC with
ASM+ILU via PETSc; ILU doesn't vectorize on TPU, so the PC here is a
row-scaling (per-cell pseudo-time + spectral-radius diagonal) at first, with
the plan of a line-implicit (DADI-style batched tridiagonal) PC — the
structured-mesh PC that both smooths stretched-grid stiffness and maps to
batched small solves XLA handles well. The Jacobian-vector product is an
exact jax.jvp through the one true residual (no FD perturbation, no
Tapenade; replaces outputForward/*_d.f90).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.physics.residual import (
    MeshTopology, ProblemConfig, fill_halos, residual_list)
from adflow_tpu.physics.thermo import IRHO, IRHOE, pressure
from adflow_tpu.physics.fluxes import spectral_radii
from adflow_tpu.physics.timestep import viscous_spectral_radii
from adflow_tpu.solvers.krylov import gmres
from adflow_tpu.solvers import steady
from adflow_tpu.solvers.smoothers import residual_norms


# ---------------------------------------------------------------------------
# flat-vector packing of interior states
# ---------------------------------------------------------------------------

class Packer:
    """Pack per-block interior states into one flat vector (the reference's
    PETSc global state vector, setGlobalCellsAndNodes ordering)."""

    def __init__(self, block_dims, nw: int):
        self.block_dims = list(block_dims)
        self.nw = nw
        self.sizes = [d[0] * d[1] * d[2] * nw for d in self.block_dims]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.n = int(self.offsets[-1])

    def pack(self, arr_list):
        return jnp.concatenate([a.reshape(-1) for a in arr_list])

    def unpack(self, vec):
        out = []
        for i, d in enumerate(self.block_dims):
            out.append(vec[self.offsets[i]:self.offsets[i + 1]].reshape(
                d[0], d[1], d[2], self.nw))
        return out

    def pack_w(self, w_list):
        """Interior-only pack of halo-padded states."""
        return jnp.concatenate(
            [w[2:-2, 2:-2, 2:-2].reshape(-1) for w in w_list])

    def unpack_into(self, vec, w_list):
        """Write the flat vector into the interiors of halo-padded states."""
        out = []
        for i, w in enumerate(w_list):
            d = self.block_dims[i]
            interior = vec[self.offsets[i]:self.offsets[i + 1]].reshape(
                d[0], d[1], d[2], self.nw)
            out.append(w.at[2:-2, 2:-2, 2:-2].set(interior))
        return out


class NewtonFns(NamedTuple):
    res_flat: Callable            # wvec -> rvec
    rad_sum_cells: Callable       # wvec -> per-block per-cell radius sums
    make_precond: Callable        # (wvec, cfl) -> v -> M^-1 v  (line PC)
    collect_pc_data: Callable     # (wvec, cfl) -> [LinePCData] per block
    build_pc: Callable            # (wvec, cfl, **kw) -> [PC data] per block
    packer: Packer
    row_scale_vec: Optional[jnp.ndarray] = None  # (nw,) turbResScale rows
    # first-order (lumped-dissipation) residual twin for the approximate
    # ANK linearization above ANKSecondOrdSwitchTol (reference: the
    # approx dissipation variants fluxes.F90:3861/4344 driven by
    # dissipationLumpingParameter sigma, used by the ANK Jacobian while
    # totalR > ANK_secondOrdSwitchTol*totalR0, NKSolvers.F90:3408)
    res_flat_approx: Optional[Callable] = None


def _pc_apply_block(data, v):
    """Apply one block's PC data (line or multigrid) — trace-time dispatch
    on the (static) data type."""
    from adflow_tpu.solvers.amg import AMGPCData, amg_pc_apply
    from adflow_tpu.solvers.linpc import line_pc_apply

    if isinstance(data, AMGPCData):
        return amg_pc_apply(data, v)
    return line_pc_apply(data, v)


def pc_apply_vec(pc_data, packer: Packer, v):
    """M^-1 v on the packed vector from per-block lagged PC data."""
    vb = packer.unpack(v)
    return packer.pack([_pc_apply_block(d, vv)
                        for d, vv in zip(pc_data, vb)])


def build_newton_fns(template_w_list, metrics_list, topo: MeshTopology,
                     cfg: ProblemConfig, ref, winf, extras_list=None,
                     approx_sigma: float = 6.0) -> NewtonFns:
    packer = Packer([w[2:-2, 2:-2, 2:-2].shape[:3] for w in template_w_list],
                    template_w_list[0].shape[-1])
    # free-stream-filled templates: corner halo cells that no BC subface or
    # connection ever writes must still hold physical states (rho=0 there
    # would NaN pressure/viscosity even though fluxes never read them,
    # poisoning jnp reductions under jvp)
    template = [jnp.broadcast_to(winf, w.shape).astype(w.dtype)
                for w in template_w_list]

    def res_flat(wvec):
        w_list = packer.unpack_into(wvec, template)
        r_list = residual_list(w_list, metrics_list, topo, cfg, ref, winf,
                               extras_list)
        return packer.pack(r_list)

    # first-order twin: upwind drops to a first-order limiter; central
    # schemes lump the 4th-difference into a constant 2nd-difference
    # coefficient vis2 + sigma*vis4 (sigma = dissipationLumpingParameter,
    # reference inputDiscretization; fluxes.F90 inviscidDissFluxScalarApprox)
    if cfg.discretization.startswith("upwind"):
        cfg_approx = dataclasses.replace(cfg, limiter="first order")
    else:
        cfg_approx = dataclasses.replace(
            cfg, coarse_level=True, use_pallas=False,
            vis2=cfg.vis2 + approx_sigma * cfg.vis4)

    def res_flat_approx(wvec):
        w_list = packer.unpack_into(wvec, template)
        r_list = residual_list(w_list, metrics_list, topo, cfg_approx, ref,
                               winf, extras_list)
        return packer.pack(r_list)

    def rad_sum_cells(wvec):
        """Per-block (ni,nj,nk) sum of convective (+viscous) spectral radii
        — V/dt per cell is rad_sum / CFL (timeStep_block analogue)."""
        w_list = packer.unpack_into(wvec, template)
        w_list = fill_halos(w_list, metrics_list, topo, ref, winf)
        outs = []
        for w, m in zip(w_list, metrics_list):
            p = jnp.maximum(pressure(w), 1e-10)
            rI, rJ, rK = spectral_radii(w, p, m, cfg.ls_precon_mach)
            rs = (rI + rJ + rK)[1:-1, 1:-1, 1:-1]
            if cfg.viscous:
                rv = viscous_spectral_radii(w, m, cfg, ref)
                rs = rs + 4.0 * (rv[0] + rv[1] + rv[2])
            outs.append(rs)
        return w_list, outs

    def collect_pc_data(wvec, cfl, axes=(1, 0, 2), kappa=0.25):
        from adflow_tpu.solvers.linpc import build_line_pc
        w_list, rs_list = rad_sum_cells(wvec)
        return [build_line_pc(w, m, cfg, ref, dtinv=rs / cfl, axes=axes,
                              kappa=kappa)
                for w, m, rs in zip(w_list, metrics_list, rs_list)]

    def build_pc(wvec, cfl, axes=(1, 0, 2), kappa=1.0,
                 pc_kind: str = "line", amg_levels: int = 2,
                 amg_nsmooth: int = 1):
        """Per-block PC data for (V/dt + dR/dw): line-implicit
        (solvers/linpc.py, the reference's ASM+ILU analogue) or Galerkin
        stencil multigrid (solvers/amg.py, the reference's amg.F90 —
        *GlobalPreconditioner='multigrid'). Returned data is a pytree —
        built OUTSIDE the step jit and lagged (NKJacobianLag)."""
        if pc_kind == "multigrid":
            from adflow_tpu.solvers.amg import build_amg_pc
            w_list_f, rs_list = rad_sum_cells(wvec)
            return [
                build_amg_pc(w, m, cfg, ref, dtinv=rs / cfl,
                             levels=amg_levels, n_smooth=amg_nsmooth,
                             axes=axes, kappa=kappa)
                for w, m, rs in zip(w_list_f, metrics_list, rs_list)]
        return collect_pc_data(wvec, cfl, axes, kappa)

    def make_precond(wvec, cfl, axes=(1, 0, 2), kappa=1.0, **kw):
        data_list = build_pc(wvec, cfl, axes=axes, kappa=kappa, **kw)

        def precond(v):
            return pc_apply_vec(data_list, packer, v)

        return precond

    return NewtonFns(res_flat=res_flat, rad_sum_cells=rad_sum_cells,
                     make_precond=make_precond,
                     collect_pc_data=collect_pc_data, build_pc=build_pc,
                     packer=packer,
                     row_scale_vec=cfg.row_scale(template_w_list[0].dtype),
                     res_flat_approx=res_flat_approx)


# ---------------------------------------------------------------------------
# physicality limiting (reference: physicalityCheckANK, NKSolvers.F90:3013)
# ---------------------------------------------------------------------------

def physicality_alpha(wvec, dwvec, packer: Packer, rel_tol: float = 0.2,
                      turb_rel_tol: float = 0.99):
    """Global under-relaxation so no cell's rho or rhoE changes by more than
    rel_tol (turbulence by turb_rel_tol)."""
    alpha = jnp.asarray(1.0, wvec.dtype)
    w_l = packer.unpack(wvec)
    d_l = packer.unpack(dwvec)
    for w, d in zip(w_l, d_l):
        for idx, tol in ((IRHO, rel_tol), (IRHOE, rel_tol)):
            rel = jnp.abs(d[..., idx]) / jnp.maximum(
                jnp.abs(w[..., idx]), 1e-12)
            alpha = jnp.minimum(alpha, tol / jnp.maximum(jnp.max(rel), tol))
        if packer.nw > 5:
            # turbulence: prevent update driving nuTilde far negative
            neg = -d[..., 5] / jnp.maximum(jnp.abs(w[..., 5]), 1e-12)
            alpha = jnp.minimum(
                alpha, turb_rel_tol / jnp.maximum(jnp.max(neg), turb_rel_tol))
    return alpha


# ---------------------------------------------------------------------------
# ANK step
# ---------------------------------------------------------------------------

def _pc_params(opts):
    axes = opts["linePCAxes"]
    if axes == "auto" or axes is None:
        axes = (1, 0, 2)
    else:
        axes = tuple(axes)
    return axes, float(opts["linePCKappa"])


def _pc_choice(opts, prefix: str) -> dict:
    """PC-family kwargs for make_precond (reference: pyADflow.py:5805-5831).
    Literal option lookups per prefix (not f-strings) so the option-
    consumption scan sees the names."""
    if prefix == "ANK":
        kind = str(opts["ANKGlobalPreconditioner"]).lower()
        levels = int(opts["ANKAMGLevels"])
        nsmooth = int(opts["ANKAMGNSmooth"])
    else:
        kind = str(opts["NKGlobalPreconditioner"]).lower()
        levels = int(opts["NKAMGLevels"])
        nsmooth = int(opts["NKAMGNSmooth"])
    return dict(
        pc_kind=("multigrid" if kind == "multigrid" else "line"),
        amg_levels=levels, amg_nsmooth=nsmooth)


def make_ank_step(fns: NewtonFns, opts, segregated: bool = False,
                  approx: bool = False):
    """One jitted ANK step. ``segregated=False``: fully-coupled
    mean-flow+turbulence Newton system (the reference's post-
    ANKCoupledSwitchTol mode). ``segregated=True``: the reference's
    STARTUP mode (NKSolvers.F90:3337 ANKTurbSolveKSP / DADI subiters) —
    the Krylov system covers the mean-flow rows only (turbulence frozen),
    then the turbulence advances at the new mean flow: ANKNSubiterTurb
    implicit line-solve subiterations (ANKUseTurbDADI=True, the DD-ADI
    analogue) or a small turbulence-rows Krylov solve (False, the
    reference's turbKSP, NKSolvers.F90:3337).

    ``approx=True``: the Krylov matvec linearizes the FIRST-ORDER
    (lumped-dissipation / first-order-limiter) residual twin while the RHS
    and merits stay exact — the reference's approximate ANK formulation
    used while totalR > ANK_secondOrdSwitchTol*totalR0."""
    m = int(opts["ANKSubspaceSize"])
    if m <= 0:
        m = 50
    # ANKMaxIter (reference ank_maxIter): cap on Krylov iterations per step
    m = min(m, max(int(opts["ANKMaxIter"]), 1))
    turb_cfl_scale = float(opts["ANKTurbCFLScale"])
    lintol = float(opts["ANKLinearSolveTol"])
    phys_tol = float(opts["ANKPhysicalLSTol"])
    phys_tol_turb = float(opts["ANKPhysicalLSTolTurb"])
    step_factor = float(opts["ANKStepFactor"])
    step_min = float(opts["ANKStepMin"])
    use_turb_dadi = bool(opts["ANKUseTurbDADI"])
    n_sub_turb = max(int(opts["ANKNSubiterTurb"]),
                     int(opts["nSubiterTurb"]), 1)
    nw = fns.packer.nw
    seg = segregated and nw > 5
    res_lin = (fns.res_flat_approx if approx and fns.res_flat_approx
               is not None else fns.res_flat)
    if seg:
        mean_mask = jnp.concatenate([
            jnp.broadcast_to(jnp.arange(nw) < 5, tuple(d) + (nw,)
                             ).reshape(-1)
            for d in fns.packer.block_dims]).astype(jnp.float32)

    @jax.jit
    def ank_step(wvec, cfl, pc_data):
        r = fns.res_flat(wvec)
        rnorm = jnp.linalg.norm(r)
        _, rs_list = fns.rad_sum_cells(wvec)
        # residual turbulence rows carry turbResScale; the pseudo-time
        # diagonal must carry the same row scale so (D + J) dw = -R is an
        # exact row scaling of the unscaled backward-Euler system.
        # ANKTurbCFLScale (reference ANK_turbcflscale): turbulence rows
        # march at cfl * scale — their diagonal divides by the scale.
        rsv = fns.row_scale_vec
        chan = jnp.ones((fns.packer.nw,), wvec.dtype)
        if rsv is not None:
            chan = chan * rsv
        if turb_cfl_scale != 1.0 and fns.packer.nw > 5:
            chan = chan.at[5:].divide(turb_cfl_scale)
        diag = fns.packer.pack([
            jnp.broadcast_to((rs / cfl)[..., None],
                             rs.shape + (fns.packer.nw,)) * chan
            for rs in rs_list])

        if seg:
            mk = mean_mask.astype(wvec.dtype)

            def matvec(v):
                _, jv = jax.jvp(res_lin, (wvec,), (mk * v,))
                return diag * v + mk * jv

            def precond(v):
                return (mk * pc_apply_vec(pc_data, fns.packer, mk * v)
                        + (1.0 - mk) * v)

            rhs = -(mk * r)
        else:
            def matvec(v):
                _, jv = jax.jvp(res_lin, (wvec,), (v,))
                return diag * v + jv

            def precond(v):
                return pc_apply_vec(pc_data, fns.packer, v)

            rhs = -r

        sol = gmres(matvec, rhs, m=m, restarts=2, tol=lintol,
                    precond=precond)
        alpha0 = physicality_alpha(wvec, sol.x, fns.packer, phys_tol,
                                   phys_tol_turb) * step_factor

        # backtracking on the UNSTEADY residual ||D a dw + R(w + a dw)|| —
        # the correct merit for pseudo-transient marching: the steady
        # residual may legitimately grow through a transient (nonnormal
        # shear-flow dynamics), but the backward-Euler residual must shrink
        # (reference: computeUnsteadyResANK, NKSolvers.F90:2614)
        def unsteady_merit(a):
            return jnp.linalg.norm(diag * (a * sol.x)
                                   + fns.res_flat(wvec + a * sol.x))

        alphas = jnp.stack([alpha0, 0.5 * alpha0, 0.25 * alpha0])
        merits = jax.vmap(unsteady_merit)(alphas)
        best = jnp.argmin(merits)
        # ANKStepMin (reference ANK_stepMin): never march below the minimum
        # step — the driver sees alpha <= step_min and cuts the CFL back
        alpha = jnp.maximum(alphas[best], step_min)
        mnew = merits[best]
        wnew = wvec + alpha * sol.x
        if seg:
            mk = mean_mask.astype(wvec.dtype)
            if use_turb_dadi:
                # turbulence subiterations at the new mean flow: implicit
                # line-solve updates via the PC's turbulence tridiagonal
                # (the DD-ADI analogue, turbAPI.F90:4 turbSolveDDADI /
                # NKSolvers.F90 ANK_useTurbDADI + nSubiterTurb)
                for _ in range(n_sub_turb):
                    rt = (1.0 - mk) * fns.res_flat(wnew)
                    dwt = (1.0 - mk) * pc_apply_vec(pc_data, fns.packer,
                                                    -rt)
                    # turbulence physicality: global under-relaxation so no
                    # cell's turbulence variable changes by more than the
                    # physical LS tolerance (physicalityCheckANK turb
                    # branch, NKSolvers.F90:3212)
                    rel = jnp.abs(dwt) / jnp.maximum(jnp.abs(wnew), 1e-12)
                    at = jnp.minimum(1.0, phys_tol_turb
                                     / jnp.maximum(jnp.max(rel), 1e-30))
                    wnew = wnew + at * dwt
            else:
                # turbKSP (reference ANKTurbSolveKSP, NKSolvers.F90:3337 —
                # ANKUseTurbDADI=False): backward-Euler Newton solve on the
                # turbulence rows at the frozen new mean flow
                wcur = wnew
                for _ in range(n_sub_turb):
                    rt = (1.0 - mk) * fns.res_flat(wcur)

                    def tmatvec(v):
                        _, jv = jax.jvp(res_lin, (wcur,), ((1.0 - mk) * v,))
                        return diag * v + (1.0 - mk) * jv

                    def tprecond(v):
                        return ((1.0 - mk) * pc_apply_vec(
                            pc_data, fns.packer, (1.0 - mk) * v)
                            + mk * v)

                    tsol = gmres(tmatvec, -rt, m=min(m, 20), restarts=1,
                                 tol=lintol, precond=tprecond)
                    dwt = (1.0 - mk) * tsol.x
                    rel = jnp.abs(dwt) / jnp.maximum(jnp.abs(wcur), 1e-12)
                    at = jnp.minimum(1.0, phys_tol_turb
                                     / jnp.maximum(jnp.max(rel), 1e-30))
                    wcur = wcur + at * dwt
                wnew = wcur
        rnew = jnp.linalg.norm(fns.res_flat(wnew))
        # alpha0 (the physicality-limited step BEFORE merit backtracking)
        # is the reference's lambda for the ANKStepMin/ANKConstCFLStep CFL
        # gates: the merit search legitimately halves alpha on good steps,
        # which must not freeze the CFL ramp
        # all iteration scalars in ONE output array: the driver fetches
        # them with a single host transfer — separate float() pulls cost
        # one tunnel/device round trip EACH and dominate per-iteration
        # wall time at small problem sizes (measured ~1 s/iter at 2k
        # cells on the TPU tunnel)
        stats = jnp.stack([
            rnorm, rnew, alpha, alpha0,
            jnp.asarray(sol.iters, wvec.dtype),
            sol.res_norm / jnp.maximum(sol.b_norm, 1e-30),
            mnew / jnp.maximum(rnorm, 1e-30)])
        return wnew, stats

    return ank_step


# ---------------------------------------------------------------------------
# NK step with Eisenstat-Walker + cubic line search
# ---------------------------------------------------------------------------

def make_nk_step(fns: NewtonFns, opts):
    m = int(opts["NKSubspaceSize"])
    ls_kind = str(opts["NKLS"]).lower()
    # NKFixedStep (reference NK_fixedStep, NKSolvers.F90:973): the step
    # taken with NKLS='none' — no search, just a fixed fraction of the
    # Newton update (physicality still caps it)
    fixed_step = float(opts["NKFixedStep"])

    @jax.jit
    def nk_step(wvec, eta, pc_data):
        r = fns.res_flat(wvec)
        rnorm = jnp.linalg.norm(r)

        def matvec(v):
            _, jv = jax.jvp(fns.res_flat, (wvec,), (v,))
            return jv

        # lagged PC built at a large pseudo-CFL regularization (no dt in
        # the Newton matrix itself; the PC still needs a nonsingular D)
        def precond(v):
            return pc_apply_vec(pc_data, fns.packer, v)

        sol = gmres(matvec, -r, m=m, restarts=2, tol=eta, precond=precond)
        alpha0 = physicality_alpha(wvec, sol.x, fns.packer)

        def merit(a):
            return jnp.linalg.norm(fns.res_flat(wvec + a * sol.x))

        if ls_kind == "none":
            alpha = jnp.minimum(alpha0, fixed_step)
        else:
            # backtracking with cubic-ish halving: try alpha0, then halve
            # while the merit increases (bounded unroll of 4, traced)
            def body(carry, _):
                a, fa = carry
                a2 = 0.5 * a
                fa2 = merit(a2)
                better = fa2 < fa
                return jax.lax.cond(
                    fa > rnorm,
                    lambda: (jnp.where(better, a2, a),
                             jnp.where(better, fa2, fa)),
                    lambda: (a, fa)), None

            f0 = merit(alpha0)
            (alpha, _), _ = jax.lax.scan(body, (alpha0, f0), None, length=4)
        wnew = wvec + alpha * sol.x
        rnew = jnp.linalg.norm(fns.res_flat(wnew))
        # single stats vector -> single host transfer (see ank_step)
        stats = jnp.stack([rnorm, rnew, alpha,
                           jnp.asarray(sol.iters, wvec.dtype),
                           sol.res_norm / jnp.maximum(sol.b_norm, 1e-30)])
        return wnew, stats

    return nk_step


class _LaggedPC:
    """Jacobian/PC lagging (reference: NKJacobianLag / ANKJacobianLag /
    ANKPCUpdateTol, NKSolvers.F90:372,559): rebuild the per-block PC data
    only every ``lag`` iterations, or when the residual dropped past
    ``update_tol`` x the build-time residual, or when the CFL moved more
    than 4x from the build-time CFL — between rebuilds the (expensive,
    jacfwd-assembled) PC is reused as a frozen pytree argument."""

    def __init__(self, fns: NewtonFns, opts, prefix: str, lag_opt: str):
        axes, kappa = _pc_params(opts)
        kw = _pc_choice(opts, prefix)
        self._build = jax.jit(lambda w, c: fns.build_pc(
            w, c, axes=axes, kappa=kappa, **kw))
        self.lag = max(int(opts[lag_opt]), 1)
        self.update_tol = float(opts["ANKPCUpdateTol"])
        self.data = None
        self._it = self._r = self._cfl = None

    def get(self, it, wvec, rnorm, cfl):
        stale = (self.data is None or (it - self._it) >= self.lag
                 or rnorm <= self.update_tol * self._r
                 or not (0.25 <= cfl / self._cfl <= 4.0))
        if stale:
            self.data = self._build(wvec, jnp.asarray(cfl, wvec.dtype))
            self._it, self._r, self._cfl = it, rnorm, cfl
        return self.data


# ---------------------------------------------------------------------------
# the switching driver (reference: solveState, solvers.F90:892)
# ---------------------------------------------------------------------------

def solve_newton_driver(w_list, metrics_list, topo, cfg, ref, winf, opts,
                        extras_list=None, monitor=None,
                        deadline: Optional[float] = None,
                        signal_check=None, mixed_data=None):
    """mixed_data: (metrics64_list, winf64, extras64_list) — presence
    switches the NK phase to the mixed-precision f64-outer Newton
    (precision='mixed'; the metrics MUST be recomputed from f64 node
    coordinates, not upcast from f32 — f32-rounded face areas break the
    telescoping flux sum at ~1e-7 relative, putting a floor on the f64
    residual itself)."""
    import time as _time
    fns = build_newton_fns(w_list, metrics_list, topo, cfg, ref, winf,
                           extras_list,
                           approx_sigma=float(
                               opts["dissipationLumpingParameter"]))
    wvec = fns.packer.pack_w(w_list)
    dtype = wvec.dtype

    def _mon(it, rnorm, rt, cfl=None, linres=None, itertype=""):
        if monitor is None:
            return
        kw = dict(cfl=cfl, linres=linres, itertype=itertype)
        if getattr(monitor, "needs_state", False):
            kw["w_list"] = fns.packer.unpack_into(wvec, w_list)
        monitor(it, rnorm, rt, **kw)

    # convergence is measured against the FREE-STREAM residual norm
    # (reference: getFreeStreamResidual -> totalR0, solvers.F90:972), not the
    # current state's — re-solving a converged state must return immediately.
    winf_vec = fns.packer.pack(
        [jnp.broadcast_to(winf, tuple(d) + (fns.packer.nw,))
         for d in fns.packer.block_dims])
    r_free = float(jnp.linalg.norm(fns.res_flat(winf_vec)))
    rnorm = float(jnp.linalg.norm(fns.res_flat(wvec)))
    r0 = max(r_free, 1e-30)
    l2conv = float(opts["L2Convergence"]) * r0
    l2abs = float(opts["L2ConvergenceRel"])
    target = max(l2conv, l2abs)
    n_cycles = int(opts["nCycles"])

    use_ank = bool(opts["useANKSolver"])
    use_nk = bool(opts["useNKSolver"])
    ank_switch = float(opts["ANKSwitchTol"]) * r0
    nk_switch = float(opts["NKSwitchTol"]) * r0

    hist = []
    it = 0
    failed = False

    # ---- startup smoother until ANK window (reference FMG/MG phase) ----
    if (not use_ank or rnorm > ank_switch) and rnorm > target:
        rk_target = ank_switch if use_ank else (nk_switch if use_nk else target)
        w_list = fns.packer.unpack_into(wvec, w_list)
        w_list, info = steady.solve_rk(
            w_list, metrics_list, topo, cfg, ref, winf,
            cfl=float(opts["CFL"]), n_cycles=n_cycles,
            l2_conv=rk_target / max(r0, 1e-30),
            extras_list=extras_list, monitor=monitor, total_r0=r0,
            smoother=str(opts["smoother"]), deadline=deadline,
            signal_check=signal_check)
        wvec = fns.packer.pack_w(w_list)
        hist.append(info.history)
        it += info.iterations
        rnorm = info.total_r_final
        failed = info.failed

    # ---- ANK phase ----
    if use_ank and not failed and rnorm > target:
        # segregated-vs-coupled turbulence (reference ANKCoupledSwitchTol,
        # NKSolvers.F90: ANK starts segregated and couples once the
        # residual drops below the switch; this framework's exact-jvp ANK
        # is robust fully coupled, so OUR default switch (1e3) couples
        # immediately — reference scripts setting e.g. 1e-4 get the
        # reference's staged behavior)
        coupled_switch = float(opts["ANKCoupledSwitchTol"]) * r0
        # first-order linearization window (reference ANKSecondOrdSwitchTol,
        # NKSolvers.F90:3408: approx formulation while totalR > tol*totalR0).
        # OUR default (1e3) goes second-order immediately — the exact-jvp
        # ANK is robust without the staging; reference scripts setting a
        # real threshold (1e-4..1e-6) get the reference's staged behavior.
        second_ord_switch = float(opts["ANKSecondOrdSwitchTol"]) * r0
        _steps = {}

        def ank_step_for(rn):
            seg = (rn > coupled_switch and fns.packer.nw > 5)
            approx = rn > second_ord_switch
            key = (seg, approx)
            if key not in _steps:
                _steps[key] = make_ank_step(fns, opts, segregated=seg,
                                            approx=approx)
            return _steps[key]
        cfl = float(opts["ANKCFL0"])
        cfl_min = float(opts["ANKCFLMin"])
        cfl_limit = float(opts["ANKCFLLimit"])
        cfl_factor = float(opts["ANKCFLFactor"])
        cfl_exp = float(opts["ANKCFLExponent"])
        cutback = float(opts["ANKCFLCutback"])
        lin_res_max = float(opts["ANKLinResMax"])
        lintol = float(opts["ANKLinearSolveTol"])
        unsteady_ls_tol = float(opts["ANKUnsteadyLSTol"])
        # SER anchor = the FREE-STREAM residual scale r0, not the phase
        # entry residual: a warm-started ANK (the f64 continuation of a
        # mixed solve) would otherwise rebase SER to its tiny entry
        # residual and cap its own CFL near ANKCFL0 forever
        r_ank0 = max(rnorm, r0)
        n_reject = 0
        # learned CFL ceiling: when the linear solver fails at CFL X, the
        # SER target is beyond what the preconditioner supports — cap
        # subsequent growth near X and release the cap slowly. Kills the
        # grow-10x/fail/halve limit cycle the raw SER ramp produces once
        # the PC saturates (reference ANK gets the same effect through
        # lambda-based CFL reductions + jacobian lag).
        cfl_cap = cfl_limit
        # best-state checkpoint: pseudo-time transients may raise the steady
        # residual legitimately, but a blow-up restores here
        best_w, best_r = wvec, rnorm
        # mixed-precision handover: the f32 ANK residual floors at its own
        # evaluation noise (~1e-5 rel) which may sit ABOVE NKSwitchTol —
        # detect the stall and hand the state to the f64-outer NK instead
        # of burning the cycle budget at the floor
        stall_ref, stall_count = rnorm, 0
        lagged = _LaggedPC(fns, opts, "ANK", "ANKJacobianLag")
        while it < n_cycles and rnorm > target and not failed:
            if use_nk and rnorm <= nk_switch:
                break
            # f32-floor handover: stall detection alone also fires on
            # physical plateau transients (transonic shock settling at
            # ~1e-1 rel) where the f64 Newton continuation would start
            # from far too rough a state — require the residual to be
            # ~2 orders down first (the mixed phase starts as a
            # pseudo-transient continuation, so a shock-settled state at
            # 1e-2..1e-3 rel is a safe handover point; the f32 ANK's
            # PC-limited wandering ceiling on transonic RANS sits there,
            # measured on the M6 case)
            if mixed_data is not None and use_nk and rnorm <= 1e-2 * r0:
                # the f64-outer mixed phase is itself a pseudo-transient
                # continuation (SER-ramped CFL from ~100), so it takes
                # over as soon as the shock has settled (~1e-2 rel) —
                # letting the f32 ANK keep marching past this point just
                # burns budget wandering at its PC-limited ceiling
                # (measured on the M6 case: 30+ iterations of creep
                # between 1e-2 rel and the old stall-detected handover)
                wvec = best_w if best_r < rnorm else wvec
                rnorm = min(rnorm, best_r)
                break
            if deadline is not None and _time.time() >= deadline:
                break
            if signal_check is not None and signal_check(
                    lambda: fns.packer.unpack_into(wvec, w_list)) == "stop":
                break
            wnew, stats = ank_step_for(rnorm)(
                wvec, jnp.asarray(cfl, dtype),
                lagged.get(it, wvec, rnorm, cfl))
            st = np.asarray(stats)          # ONE device->host transfer
            (_, rnew_f, _alpha_f, alpha0_f, _kiters_f, linres_f,
             umerit_f) = (float(v) for v in st)
            it += 1
            # accept on the unsteady-residual merit (time marching), not on
            # steady-residual descent (reference: ANK always steps once the
            # unsteady LS passes)
            bad = (not np.isfinite(rnew_f)
                   or umerit_f > unsteady_ls_tol
                   or rnew_f > 100.0 * best_r)
            if bad:
                cfl_cap = max(cfl * cutback, cfl_min)
                cfl = max(cfl * cutback, cfl_min)
                n_reject += 1
                if rnew_f > 1e3 * best_r or not np.isfinite(rnew_f):
                    wvec = best_w          # restore checkpoint
                if n_reject > 25:
                    failed = True
                continue
            n_reject = 0
            wvec = wnew
            rnorm = rnew_f
            if rnorm < 0.99 * stall_ref:
                stall_ref, stall_count = rnorm, 0
            else:
                stall_count += 1
            if rnorm < best_r:
                best_w, best_r = wvec, rnorm
            elif rnorm > 5.0 * best_r:
                # sustained steady-residual growth with accepted unsteady
                # steps = inexact-Newton wandering at a CFL the linear
                # solver can't support (matrix-diss NACA0012 limit cycle):
                # restore the best state and learn a harder CFL ceiling
                # (reference ANK cuts CFL on bad lambda the same way)
                wvec = best_w
                rnorm = best_r
                cfl_cap = max(cfl * cutback, cfl_min)
                cfl = max(cfl * cutback, cfl_min)
            hist.append(np.array([[rnorm, 0.0]]))
            _mon(it, rnorm, 0.0, cfl=cfl, linres=linres_f, itertype="ANK")
            # CFL controller (reference: ANKLinResMax gating + SER ramp):
            # grow only when the linear solve met its tolerance, back off
            # when it degraded past ANKLinResMax. Step-size gates on the
            # PHYSICALITY step alpha0 (the reference's lambda):
            # alpha0 <= ANKStepMin forces a cutback; alpha0 below
            # ANKConstCFLStep holds the CFL constant (no ramp).
            alpha_f = alpha0_f
            if alpha_f <= float(opts["ANKStepMin"]) + 1e-12:
                cfl_cap = max(cfl * cutback, cfl_min)
                cfl = max(cfl * cutback, cfl_min)
            elif alpha_f < float(opts["ANKConstCFLStep"]):
                pass   # hold CFL constant this iteration
            elif linres_f > lin_res_max:
                cfl_cap = max(cfl * cutback, cfl_min)
                cfl = max(cfl * cutback, cfl_min)
            elif linres_f <= lin_res_max:
                # grow whenever the linear solve met ANKLinResMax —
                # inexact Newton still contracts at linres ~0.1; gating
                # growth on the much tighter lintol pinned the CFL at the
                # PC's saturation point and turned transonic transients
                # into thousand-iteration creeps (measured on the M6 f32
                # case: CFL stuck ~20, 1%/iter)
                cfl_cap = min(cfl_cap * 1.2, cfl_limit)
                cfl = min(
                    float(opts["ANKCFL0"]) * (r_ank0 / max(rnorm, 1e-30))
                    ** cfl_exp,
                    cfl * cfl_factor, cfl_cap, cfl_limit)
                cfl = max(cfl, cfl_min)
            else:
                cfl_cap = min(cfl_cap * 1.05, cfl_limit)

    # ---- f64 continuation phase (precision='mixed') ----
    # deadline guard: the phase's first act is compiling the f64 modules
    # (on TPU: EMULATED f64, potentially minutes on a bad tunnel window)
    # and a compile cannot be interrupted — do not even start it unless
    # a meaningful slice of the time budget remains
    if (use_nk and not failed and rnorm > target
            and mixed_data is not None
            and (deadline is None or _time.time() < deadline - 60.0)):
        # The f32 phases hand over once the transient is settled (~1e-2
        # rel, their PC-limited ceiling); the ENDGAME then re-enters this
        # same driver in full float64 — f64 ANK re-ramps and the f64 NK
        # finishes to the deep target, i.e. exactly the machinery the f64
        # regression tests validate, warm-started from the f32 state.
        # (An f32-Krylov/f64-outer "iterative refinement" NK was tried
        # first and is fundamentally blocked here: the f32 line PC makes
        # ZERO Krylov progress on the undamped Newton system — measured
        # linres 1.0 — and pseudo-transient f32 solves wander at the same
        # ceiling as the f32 ANK. On TPU the f64 endgame runs emulated:
        # slower per eval, but it converges.)
        metrics64, winf64, extras64 = mixed_data
        w_list64 = [jnp.asarray(w, jnp.float64)
                    for w in fns.packer.unpack_into(wvec, w_list)]
        w_list64, info64 = solve_newton_driver(
            w_list64, metrics64, topo, cfg, ref,
            jnp.asarray(winf64, jnp.float64), opts,
            extras_list=extras64, monitor=monitor, deadline=deadline,
            signal_check=signal_check, mixed_data=None)
        wvec = fns.packer.pack_w([w.astype(dtype) for w in w_list64])
        it += info64.iterations
        rnorm = info64.total_r_final
        failed = info64.failed
        if len(info64.history):
            hist.append(info64.history)

    # ---- NK phase ----
    elif use_nk and not failed and rnorm > target:
        nk_step = make_nk_step(fns, opts)
        eta_max = float(opts["NKLinearSolveTol"])
        use_ew = bool(opts["NKUseEW"])
        ew_exp = float(opts["NKEWRTolExponent"])
        eta = eta_max
        r_prev = rnorm
        lagged = _LaggedPC(fns, opts, "NK", "NKJacobianLag")
        while it < n_cycles and rnorm > target and not failed:
            if deadline is not None and _time.time() >= deadline:
                break
            if signal_check is not None and signal_check(
                    lambda: fns.packer.unpack_into(wvec, w_list)) == "stop":
                break
            wnew, stats = nk_step(
                wvec, jnp.asarray(eta, dtype),
                lagged.get(it, wvec, rnorm, 1e6))
            st = np.asarray(stats)          # ONE device->host transfer
            rnew_f = float(st[1])
            if not np.isfinite(rnew_f):
                failed = True
                break
            wvec = wnew
            r_prev = rnorm
            rnorm = rnew_f
            it += 1
            hist.append(np.array([[rnorm, 0.0]]))
            _mon(it, rnorm, 0.0, linres=float(st[4]), itertype="NK")
            if use_ew:
                # Eisenstat-Walker choice 2 (reference getEWTol:1606)
                eta = min(eta_max,
                          0.9 * (rnorm / max(r_prev, 1e-30)) ** ew_exp)
                eta = max(eta, 1e-8)

    w_list = fns.packer.unpack_into(wvec, w_list)
    hist_np = (np.concatenate(hist) if hist else np.zeros((0, 2)))
    # maxL2DeviationFactor (reference solvers.F90:1912): if the iteration
    # budget ran out but the residual is within factor x target, the solve
    # still counts as converged (not failed) for the Python level
    dev = float(opts["maxL2DeviationFactor"])
    near = (it >= n_cycles and np.isfinite(rnorm)
            and rnorm <= dev * target)
    info = steady.SolveInfo(
        converged=bool(rnorm <= target or near), failed=bool(failed),
        iterations=it, total_r0=r0, total_r_final=float(rnorm),
        history=hist_np)
    return w_list, info
