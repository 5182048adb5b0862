"""Distributed implicit solvers: ANK/NK + adjoint matvec under shard_map.

Reference analogue: ADflow's implicit path is distributed through PETSc —
the KSP runs on the global MPI communicator, matrix-free matvecs call the
halo exchange inside FormFunction (`/root/reference/src/NKSolver/
NKSolvers.F90:512,3629`), and the adjoint KSP reuses the same parallel
layout (`src/adjoint/adjointAPI.F90`). The TPU-native equivalent: every
shard runs the identical Krylov program on its LOCAL flat vector, all inner
products/norms are completed with ``psum`` over the mesh axis
(`solvers/krylov.py gmres(axis_name=...)``), and the Jacobian-vector product
is jax.jvp through the shard-local residual whose halo fill contains the
``ppermute`` ring — so J.v carries exact cross-chip coupling, and the
transposed (adjoint) matvec inherits the reversed ppermute from JAX's
transpose rule for free (the reference needed hand-built transposed halo
exchanges, haloExchange.F90 whalo*Adj).

Scope: rides the k-split ShardedProblem (dist/sharded.py). The line-implicit
PC is applied shard-locally; k-lines truncate at shard interfaces — a
block-Jacobi-between-chips preconditioner, exactly the ASM(0) structure the
reference uses across ranks (PETSc ASM, NKSolvers.F90 setup).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adflow_tpu.core.refstate import ReferenceState
from adflow_tpu.dist.sharded import (
    ShardedProblem, fill_halos_sharded, sharded_norms)
from adflow_tpu.physics.fluxes import spectral_radii
from adflow_tpu.physics.residual import ProblemConfig, block_residual
from adflow_tpu.physics.thermo import IRHO, IRHOE, pressure
from adflow_tpu.physics.timestep import viscous_spectral_radii
from adflow_tpu.solvers.krylov import gmres


def _res_local_flat(prob: ShardedProblem, cfg: ProblemConfig,
                    ref: ReferenceState, winf, template, extras):
    """Shard-local flat residual closure (interior DOFs only)."""
    ni, nj, nk = prob.local_dims
    nw = template.shape[-1]
    por = prob.local_topo.blocks[0].por

    def res_flat(wvec, metrics):
        w = template.at[2:-2, 2:-2, 2:-2].set(
            wvec.reshape(ni, nj, nk, nw))
        w = fill_halos_sharded(w, metrics, prob, ref, winf)
        r = block_residual(w, metrics, cfg, ref, extras, por=por)
        return r.reshape(-1)

    return res_flat


def _rad_sums(w, metrics, cfg, ref):
    p = jnp.maximum(pressure(w), 1e-10)
    rI, rJ, rK = spectral_radii(w, p, metrics, cfg.ls_precon_mach)
    rs = (rI + rJ + rK)[1:-1, 1:-1, 1:-1]
    if cfg.viscous:
        rv = viscous_spectral_radii(w, metrics, cfg, ref)
        rs = rs + 4.0 * (rv[0] + rv[1] + rv[2])
    return rs


def sharded_ank_step(wvec, metrics, prob: ShardedProblem, cfg: ProblemConfig,
                     ref: ReferenceState, winf, cfl, extras=None,
                     m: int = 20, lintol: float = 0.05,
                     turb_cfl_scale: float = 1.0):
    """One distributed ANK step on the shard-local flat state vector.

    Mirrors solvers/newton.py make_ank_step with every norm/dot psum'd over
    the mesh axis; runs INSIDE shard_map. Returns (wvec_new, rnorm_old,
    rnorm_new, lin_res_rel).
    """
    ax = prob.mesh_axis
    ni, nj, nk = prob.local_dims
    nw = wvec.size // (ni * nj * nk)
    template = jnp.broadcast_to(
        winf, (ni + 4, nj + 4, nk + 4, nw)).astype(wvec.dtype)
    res_flat = _res_local_flat(prob, cfg, ref, winf, template, extras)

    def gnorm(v):
        return jnp.sqrt(jax.lax.psum(jnp.sum(v * v), ax))

    r = res_flat(wvec, metrics)
    rnorm = gnorm(r)

    w_full = fill_halos_sharded(
        template.at[2:-2, 2:-2, 2:-2].set(wvec.reshape(ni, nj, nk, nw)),
        metrics, prob, ref, winf)
    rs = _rad_sums(w_full, metrics, cfg, ref)
    chan = jnp.ones((nw,), wvec.dtype)
    rsv = cfg.row_scale(wvec.dtype)
    if rsv is not None:
        chan = chan * rsv
    if turb_cfl_scale != 1.0 and nw > 5:
        chan = chan.at[5:].divide(turb_cfl_scale)
    diag = (jnp.broadcast_to((rs / cfl)[..., None], rs.shape + (nw,))
            * chan).reshape(-1)

    def matvec(v):
        _, jv = jax.jvp(lambda u: res_flat(u, metrics), (wvec,), (v,))
        return diag * v + jv

    # shard-local line PC (ASM(0) across chips)
    from adflow_tpu.solvers.linpc import build_line_pc, line_pc_apply
    pc = build_line_pc(w_full, metrics, cfg, ref, dtinv=rs / cfl,
                       axes=(1, 0), kappa=0.25)

    def precond(v):
        return line_pc_apply(pc, v.reshape(ni, nj, nk, nw)).reshape(-1)

    sol = gmres(matvec, -r, m=m, restarts=2, tol=lintol, precond=precond,
                axis_name=ax)

    # physicality limit with a GLOBAL (pmax-reduced) alpha so every shard
    # applies the identical under-relaxation
    dw = sol.x.reshape(ni, nj, nk, nw)
    wi = wvec.reshape(ni, nj, nk, nw)
    alpha0 = jnp.asarray(1.0, wvec.dtype)
    for idx in (IRHO, IRHOE):
        rel = jnp.max(jnp.abs(dw[..., idx])
                      / jnp.maximum(jnp.abs(wi[..., idx]), 1e-12))
        rel = jax.lax.pmax(rel, ax)
        alpha0 = jnp.minimum(alpha0, 0.2 / jnp.maximum(rel, 0.2))
    if nw > 5:
        # keep turbulence working variables from being driven far negative
        # (physicalityCheckANK turb rows, NKSolvers.F90:3013)
        neg = jnp.max(-dw[..., 5]
                      / jnp.maximum(jnp.abs(wi[..., 5]), 1e-12))
        neg = jax.lax.pmax(neg, ax)
        alpha0 = jnp.minimum(alpha0, 0.99 / jnp.maximum(neg, 0.99))

    # backtracking on the UNSTEADY (backward-Euler) residual, exactly as the
    # single-device make_ank_step (newton.py): the globally-reduced merit
    # ||D a dw + R(w + a dw)|| is identical on every shard, so each shard
    # picks the same alpha (reference: computeUnsteadyResANK,
    # NKSolvers.F90:2614). Unrolled 3-candidate search (no vmap: the halo
    # ppermute inside res_flat stays unbatched).
    def unsteady_merit(a):
        return gnorm(diag * (a * sol.x) + res_flat(wvec + a * sol.x, metrics))

    alphas = [alpha0, 0.5 * alpha0, 0.25 * alpha0]
    merits = jnp.stack([unsteady_merit(a) for a in alphas])
    best = jnp.argmin(jnp.where(jnp.isfinite(merits), merits, jnp.inf))
    alpha = jnp.stack(alphas)[best]

    wnew = wvec + alpha * sol.x
    rnew = gnorm(res_flat(wnew, metrics))
    return wnew, rnorm, rnew, sol.res_norm / jnp.maximum(sol.b_norm, 1e-30)


def sharded_adjoint_matvec(wvec, psi, metrics, prob: ShardedProblem,
                           cfg: ProblemConfig, ref: ReferenceState, winf,
                           extras=None):
    """(dR/dw)^T psi on shard-local flat vectors — the distributed adjoint
    operator. The ppermute in the halo fill transposes to the reverse ring
    automatically under jax.vjp, so contributions accumulated into halo
    cells flow back to the owning shard's interior DOFs."""
    ni, nj, nk = prob.local_dims
    nw = wvec.size // (ni * nj * nk)
    template = jnp.broadcast_to(
        winf, (ni + 4, nj + 4, nk + 4, nw)).astype(wvec.dtype)
    res_flat = _res_local_flat(prob, cfg, ref, winf, template, extras)
    _, vjp = jax.vjp(lambda u: res_flat(u, metrics), wvec)
    (out,) = vjp(psi)
    return out


def make_sharded_ank_adjoint_step(prob, cfg, ref, device_mesh, cfl=5.0):
    """Jitted SPMD step for the dryrun/tests: 1 distributed ANK step + 1
    adjoint matvec + global norms. Input/output layouts match
    make_sharded_step (stacked shard arrays)."""
    from jax.sharding import PartitionSpec as P
    from adflow_tpu.dist.sharded import shard_map

    ax = prob.mesh_axis
    ni, nj, nk = prob.local_dims

    def local(w_s, metrics_s, winf_s, d_s):
        w = w_s[0]
        metrics = jax.tree.map(lambda a: a[0], metrics_s)
        extras = None if d_s is None else {"walldist": d_s[0]}
        nw = w.shape[-1]
        wvec = w[2:-2, 2:-2, 2:-2].reshape(-1)
        wnew, r0, r1, linres = sharded_ank_step(
            wvec, metrics, prob, cfg, ref, winf_s,
            jnp.asarray(cfl, w.dtype), extras)
        psi = jnp.ones_like(wnew)
        atv = sharded_adjoint_matvec(wnew, psi, metrics, prob, cfg, ref,
                                     winf_s, extras)
        atn = jnp.sqrt(jax.lax.psum(jnp.sum(atv * atv), ax))
        w_out = w.at[2:-2, 2:-2, 2:-2].set(wnew.reshape(ni, nj, nk, nw))
        return (w_s.at[0].set(w_out), jnp.stack([r0, r1, linres, atn]))

    spec = P(ax)

    def step(w_stack, metrics_stack, winf_arr, d_stack):
        if d_stack is None:
            fn = shard_map(lambda w, m, wi: local(w, m, wi, None),
                           mesh=device_mesh, in_specs=(spec, spec, P()),
                           out_specs=(spec, P()))
            return fn(w_stack, metrics_stack, winf_arr)
        fn = shard_map(local, mesh=device_mesh,
                       in_specs=(spec, spec, P(), spec),
                       out_specs=(spec, P()))
        return fn(w_stack, metrics_stack, winf_arr, d_stack)

    return step
