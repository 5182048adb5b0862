"""Multigrid preconditioner for the ANK/NK/adjoint linear systems.

Reference analogue: the aggregation AMG in `/root/reference/src/solver/
amg.F90` (``setupAMG``:75 builds 2:1 structured-agglomeration Galerkin
coarse operators from the assembled first-order PC matrix;
``MGPreCon``:712 runs the recursive V-cycle; selected with
``ANKGlobalPreconditioner``/``NKGlobalPreconditioner``/
``globalPreconditioner`` = 'multigrid', depth ``*AMGLevels``, smoothing
``*AMGNSmooth`` — pyADflow.py:5805-5831,5914).

TPU-native design: instead of aggregating a PETSc CSR matrix, the
first-order flux Jacobian is kept in its natural structured form — a
7-point BLOCK STENCIL (5x5 mean-flow blocks + scalar turbulence rows) per
mesh block:

    A v = D v + sum_ax ( L_ax v[-1] + U_ax v[+1] )

built from the same exact flux Jacobians / |A| characteristic splitting as
the line PC (solvers/linpc.py). Everything vectorizes: the stencil apply is
batched 5x5 matmuls (MXU), the smoother is the batched block-Thomas line
solve, and Galerkin coarsening with piecewise-constant interpolation
reduces to even/odd slicing + 2x2x2 pool-sums — the coarse operator is
again a 7-point block stencil, so every level runs the same code.

Smoother: damped line-Jacobi  z <- z + w * T_ax^-1 (r - A z)  where T_ax is
the block tridiagonal (L_ax, D, U_ax) along the stiffest axis; D contains
ALL directions' diagonal contributions, so the sweep is unconditionally
convergent for the diagonally-dominant first-order splitting.

Blocks are preconditioned independently (block-Jacobi across mesh blocks,
= the reference's ASM overlap 0 across processors).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from adflow_tpu.physics.fluxes import extended_face_areas, spectral_radii
from adflow_tpu.physics.thermo import IMX, IMZ, IRHO, pressure
from adflow_tpu.physics.timestep import viscous_spectral_radii
from adflow_tpu.solvers.linpc import (
    abs_flux_jacobians, block_tridiag_solve, flux_jacobians)


import dataclasses as _dc
import functools as _ft


@_ft.partial(jax.tree_util.register_dataclass,
             data_fields=("D", "L", "U", "Dt", "Lt", "Ut"),
             meta_fields=("turb_scale",))
@_dc.dataclass(frozen=True)
class StencilOp:
    """7-point block-stencil operator on one mesh block's interior.

    Registered pytree (turb_scale static) so the lagged hierarchy can be
    passed into jitted Newton steps."""

    D: jnp.ndarray                 # (ni,nj,nk,5,5)
    L: Tuple[jnp.ndarray, ...]     # per axis (ni,nj,nk,5,5), row i couples i-1
    U: Tuple[jnp.ndarray, ...]     # per axis, row i couples i+1
    Dt: Optional[jnp.ndarray]      # (ni,nj,nk) turbulence scalar diagonal
    Lt: Optional[tuple]            # per axis (ni,nj,nk); shared over nt vars
    Ut: Optional[tuple]
    turb_scale: Optional[tuple] = None    # system rows carry turbResScale

    def _replace(self, **kw):
        return _dc.replace(self, **kw)


def build_stencil_jacobian(w, metrics, cfg, ref, dtinv,
                           kappa: float = 1.0) -> StencilOp:
    """First-order flux-Jacobian stencil of (V/dt + dR/dw) for one block.

    Same linearization family as ``linpc.build_line_pc`` but assembled for
    ALL three axes with a single shared diagonal (the reference's
    setupStateResidualMatrix first-order PC, adjointUtils.F90:7).
    w: halo-padded filled state; dtinv: (ni,nj,nk) V/dt.
    """
    matrix_split = (cfg.discretization.startswith("upwind")
                    or "matrix" in cfg.discretization)
    p = jnp.maximum(pressure(w), 1e-10)
    rI, rJ, rK = spectral_radii(w, p, metrics, cfg.ls_precon_mach)
    rads = [rI, rJ, rK]
    if cfg.viscous:
        rv = viscous_spectral_radii(w, metrics, cfg, ref)
        rads = [r + jnp.pad(4.0 * v, 1, mode="edge")
                for r, v in zip(rads, rv)]
    rtot = (rads[0] + rads[1] + rads[2])[1:-1, 1:-1, 1:-1]
    nw = w.shape[-1]
    nt = nw - 5
    eye = jnp.eye(5, dtype=w.dtype)

    siE, sjE, skE = extended_face_areas(metrics)
    sE = [siE, sjE, skE]
    it = tuple([slice(2, -2)] * 3)

    if matrix_split:
        D = dtinv[..., None, None] * eye
    else:
        D = (dtinv + kappa * rtot)[..., None, None] * eye
    Dt = None
    if nt > 0:
        Dt = dtinv + kappa * rtot

    Ls, Us, Lts, Uts = [], [], [], []
    for ax in range(3):
        lo = [slice(2, -2)] * 3
        hi = [slice(2, -2)] * 3
        lo[ax] = slice(1, -3)
        hi[ax] = slice(3, -1)
        w_m = w[tuple(lo)][..., :5]
        w_p = w[tuple(hi)][..., :5]

        et = [slice(1, -1)] * 3
        fm = list(et)
        fp = list(et)
        fm[ax] = slice(1, -2)
        fp[ax] = slice(2, -1)
        s_m = sE[ax][tuple(fm)]
        s_p = sE[ax][tuple(fp)]

        r_ext = rads[ax]
        ei = [slice(1, -1)] * 3
        lo_r = list(ei)
        hi_r = list(ei)
        ce_r = list(ei)
        lo_r[ax] = slice(0, -2)
        hi_r[ax] = slice(2, None)
        ce_r[ax] = slice(1, -1)
        lam_m = 0.5 * (r_ext[tuple(lo_r)] + r_ext[tuple(ce_r)])
        lam_p = 0.5 * (r_ext[tuple(hi_r)] + r_ext[tuple(ce_r)])

        A_m = flux_jacobians(w_m, s_m)
        A_p = flux_jacobians(w_p, s_p)
        if matrix_split:
            w_c = w[it][..., :5]
            Aabs_m = abs_flux_jacobians(w_m, s_m)
            Aabs_p = abs_flux_jacobians(w_p, s_p)
            L = -0.5 * (A_m + Aabs_m)
            U = 0.5 * (A_p - Aabs_p)
            D = D + 0.5 * (abs_flux_jacobians(w_c, s_m)
                           + abs_flux_jacobians(w_c, s_p))
        else:
            L = -0.5 * (A_m + kappa * lam_m[..., None, None] * eye)
            U = 0.5 * (A_p - kappa * lam_p[..., None, None] * eye)
        Ls.append(L)
        Us.append(U)

        if nt > 0:
            rho_m = w_m[..., IRHO]
            rho_p = w_p[..., IRHO]
            q_m = jnp.sum(w_m[..., IMX:IMZ + 1] * s_m, axis=-1) / rho_m
            q_p = jnp.sum(w_p[..., IMX:IMZ + 1] * s_p, axis=-1) / rho_p
            Lts.append(-0.5 * (q_m + kappa * lam_m))
            Uts.append(0.5 * (q_p - kappa * lam_p))
    if matrix_split:
        # cross-axis scalar conditioning is already in |A|; no extra kappa
        pass
    ts = cfg.turb_scales if (nt > 0 and cfg.rans) else None
    if ts is not None and all(s == 1.0 for s in ts):
        ts = None
    return StencilOp(D=D, L=tuple(Ls), U=tuple(Us), Dt=Dt,
                     Lt=tuple(Lts) or None, Ut=tuple(Uts) or None,
                     turb_scale=ts)


# ---------------------------------------------------------------------------
# stencil algebra
# ---------------------------------------------------------------------------

def _roll_zero(a, ax, shift):
    """Shift along ax by `shift` (+1: take a[i-1]), zero-filled."""
    pad = [(0, 0)] * a.ndim
    idx = [slice(None)] * a.ndim
    if shift == 1:
        pad[ax] = (1, 0)
        idx[ax] = slice(0, -1)
    else:
        pad[ax] = (0, 1)
        idx[ax] = slice(1, None)
    return jnp.pad(a[tuple(idx)], pad)


def _bmm(M, v):
    """(...,5,5) @ (...,5) batched."""
    return jnp.einsum("...ij,...j->...i", M, v)


def stencil_apply(op: StencilOp, v):
    """A v for v: (ni,nj,nk,nw) (mean-flow + optional turbulence rows)."""
    vm = v[..., :5]
    out = _bmm(op.D, vm)
    for ax in range(3):
        out = out + _bmm(op.L[ax], _roll_zero(vm, ax, 1))
        out = out + _bmm(op.U[ax], _roll_zero(vm, ax, -1))
    if v.shape[-1] > 5 and op.Dt is not None:
        vt = v[..., 5:]
        ot = op.Dt[..., None] * vt
        for ax in range(3):
            ot = ot + op.Lt[ax][..., None] * _roll_zero(vt, ax, 1)
            ot = ot + op.Ut[ax][..., None] * _roll_zero(vt, ax, -1)
        out = jnp.concatenate([out, ot], axis=-1)
    return out


def stencil_transpose(op: StencilOp) -> StencilOp:
    """A^T as a stencil: (A^T v)_i = D_i^T v_i + U_{i-1}^T v_{i-1}
    + L_{i+1}^T v_{i+1} — used for the adjoint PC (Galerkin commutes with
    transpose for R = P^T, so transposing each level is exact)."""
    DT = jnp.swapaxes(op.D, -1, -2)
    LT, UT = [], []
    LtT, UtT = [], []
    for ax in range(3):
        # new L couples row i to i-1: U_{i-1}^T shifted down
        LT.append(_roll_zero(jnp.swapaxes(op.U[ax], -1, -2), ax, 1))
        UT.append(_roll_zero(jnp.swapaxes(op.L[ax], -1, -2), ax, -1))
        if op.Lt is not None:
            LtT.append(_roll_zero(op.Ut[ax], ax, 1))
            UtT.append(_roll_zero(op.Lt[ax], ax, -1))
    return StencilOp(D=DT, L=tuple(LT), U=tuple(UT), Dt=op.Dt,
                     Lt=tuple(LtT) or None, Ut=tuple(UtT) or None,
                     turb_scale=op.turb_scale)


def line_smooth(op: StencilOp, r, z, axis: int, damp: float = 1.0):
    """One damped line-Jacobi sweep: z + damp * T_ax^-1 (r - A z)."""
    from adflow_tpu.solvers.dadi import tridiag_solve

    resid = r - stencil_apply(op, z)
    rm = jnp.moveaxis(resid[..., :5], axis, 0)
    Lx = jnp.moveaxis(op.L[axis], axis, 0)
    Dx = jnp.moveaxis(op.D, axis, 0)
    Ux = jnp.moveaxis(op.U[axis], axis, 0)
    dz = block_tridiag_solve(Lx, Dx, Ux, rm)
    dz = jnp.moveaxis(dz, 0, axis)
    if r.shape[-1] > 5 and op.Dt is not None:
        rt = jnp.moveaxis(resid[..., 5:], axis, 0)
        dzt = tridiag_solve(jnp.moveaxis(op.Lt[axis], axis, 0),
                            jnp.moveaxis(op.Dt, axis, 0),
                            jnp.moveaxis(op.Ut[axis], axis, 0), rt)
        dz = jnp.concatenate([dz, jnp.moveaxis(dzt, 0, axis)], axis=-1)
    return z + damp * dz


# ---------------------------------------------------------------------------
# Galerkin coarsening (piecewise-constant P, R = P^T)
# ---------------------------------------------------------------------------

def _pool(a, f):
    """Sum over f[0] x f[1] x f[2] groups of the leading 3 dims."""
    m, n, p = a.shape[0] // f[0], a.shape[1] // f[1], a.shape[2] // f[2]
    rest = a.shape[3:]
    a = a.reshape((m, f[0], n, f[1], p, f[2]) + rest)
    return a.sum(axis=(1, 3, 5))

def _even(a, ax):
    idx = [slice(None)] * a.ndim
    idx[ax] = slice(0, None, 2)
    return a[tuple(idx)]


def _odd(a, ax):
    idx = [slice(None)] * a.ndim
    idx[ax] = slice(1, None, 2)
    return a[tuple(idx)]


def coarsen_stencil(op: StencilOp, f) -> StencilOp:
    """Galerkin RAP with piecewise-constant interpolation: the coarse
    operator of a 7-point stencil under 2:1 (semi-)agglomeration is again
    a 7-point stencil.  Per axis with factor 2 (cells 2I, 2I+1 -> I):
      - intra-aggregate couplings U[2I] (2I->2I+1) and L[2I+1] join D_c;
      - crossing couplings U[2I+1] -> U_c[I], L[2I] -> L_c[I];
    then everything pool-sums over the remaining (tangential) factors."""
    D_new = op.D
    Ls, Us = list(op.L), list(op.U)
    Dt_new = op.Dt
    Lts = list(op.Lt) if op.Lt is not None else None
    Uts = list(op.Ut) if op.Ut is not None else None

    # fold intra-aggregate couplings of each coarsened axis into D first
    for ax in range(3):
        if f[ax] != 2:
            continue
        intra = _even(op.U[ax], ax) + _odd(op.L[ax], ax)
        # scatter back to fine positions: U contribution lives at even
        # cells, L at odd — both sum into the same aggregate, so add the
        # pair sum at the even position (pool-sum will collect it)
        pad_shape = list(op.D.shape)
        add = jnp.zeros(pad_shape, op.D.dtype)
        idx = [slice(None)] * add.ndim
        idx[ax] = slice(0, None, 2)
        add = add.at[tuple(idx)].set(intra)
        D_new = D_new + add
        if Lts is not None:
            intrat = _even(op.Ut[ax], ax) + _odd(op.Lt[ax], ax)
            addt = jnp.zeros(list(op.Dt.shape), op.Dt.dtype)
            idxt = [slice(None)] * addt.ndim
            idxt[ax] = slice(0, None, 2)
            addt = addt.at[tuple(idxt)].set(intrat)
            Dt_new = Dt_new + addt
        # crossing couplings: keep only those at the aggregate boundary
        Uc = jnp.zeros_like(op.U[ax])
        Uc = Uc.at[tuple(idx)].set(_odd(op.U[ax], ax))
        Lc = jnp.zeros_like(op.L[ax])
        Lc = Lc.at[tuple(idx)].set(_even(op.L[ax], ax))
        Us[ax], Ls[ax] = Uc, Lc
        if Uts is not None:
            Utc = jnp.zeros_like(op.Ut[ax])
            Utc = Utc.at[tuple(idxt)].set(_odd(op.Ut[ax], ax))
            Ltc = jnp.zeros_like(op.Lt[ax])
            Ltc = Ltc.at[tuple(idxt)].set(_even(op.Lt[ax], ax))
            Uts[ax], Lts[ax] = Utc, Ltc

    return StencilOp(
        D=_pool(D_new, f),
        L=tuple(_pool(Lv, f) for Lv in Ls),
        U=tuple(_pool(Uv, f) for Uv in Us),
        Dt=_pool(Dt_new, f) if Dt_new is not None else None,
        Lt=tuple(_pool(v, f) for v in Lts) if Lts is not None else None,
        Ut=tuple(_pool(v, f) for v in Uts) if Uts is not None else None,
        turb_scale=op.turb_scale)


def _restrict(r, f):
    return _pool(r, f)


def _prolong(z, f):
    for ax in range(3):
        if f[ax] > 1:
            z = jnp.repeat(z, f[ax], axis=ax)
    return z


# ---------------------------------------------------------------------------
# the multigrid preconditioner: line-PC smoother + Galerkin coarse correction
# ---------------------------------------------------------------------------
#
# A pure stencil V-cycle (single-axis line smoother per level) is a much
# weaker fine-level smoother than the proven 3-axis line-implicit PC, and —
# measured on the 96x32 NACA0012 NK system — the raw coarse correction is
# actively harmful: at Newton CFL the coarse Galerkin operators are nearly
# singular (zero row sums of the conservative convection stencil) and a few
# damped sweeps on them amplify the restricted residual ~80x, poisoning the
# GMRES Krylov space (linres 0.96 vs 0.09 for the line PC alone). The design
# that works:
#   pre-smooth  z  = S v                 S = the full line PC (linpc.py)
#   correction  z += P C (R (v - A z))   A = fine first-order stencil,
#                                        C = damped line sweeps on BOOSTED
#                                            Galerkin coarse levels
#   post-smooth z += S (v - A z)
# with each coarse diagonal inflated by `boost` x its own trace magnitude —
# the regularization bounds the correction while keeping the long-wavelength
# coupling the line PC lacks (measured: linres 0.117 with boost=1.0, i.e.
# line-PC-equivalent on the subsonic case where the line PC already wins,
# and strictly more global coupling for the shocked/transonic systems it
# was built for).

@_ft.partial(jax.tree_util.register_dataclass,
             data_fields=("line", "ops"),
             meta_fields=("factors", "axis", "n_smooth", "coarse_damp",
                          "transposed"))
@_dc.dataclass(frozen=True)
class AMGPCData:
    line: object        # LinePCData fine smoother
    ops: tuple          # StencilOp per level (0 = finest)
    factors: tuple      # (fi,fj,fk) between level l and l+1
    axis: int           # coarse line-smoother primary sweep axis
    n_smooth: int       # sweeps per coarse level
    coarse_damp: float = 0.6
    transposed: bool = False


def _coarsen_factors(dims):
    return tuple(2 if (d > 1 and d % 2 == 0) else 1 for d in dims)


def _boost_diag(op: StencilOp, boost: float) -> StencilOp:
    """Inflate the diagonal by boost x |trace/5| (coarse regularization)."""
    if boost <= 0.0:
        return op
    tr = jnp.trace(op.D, axis1=-2, axis2=-1)[..., None, None] / 5.0
    eye = jnp.eye(5, dtype=op.D.dtype)
    return op._replace(
        D=op.D + boost * jnp.abs(tr) * eye,
        Dt=None if op.Dt is None else op.Dt * (1.0 + boost))


def build_amg_pc(w, metrics, cfg, ref, dtinv, levels: int = 2,
                 n_smooth: int = 1, axes=(1, 0, 2), kappa: float = 0.25,
                 coarse_boost: float = 1.0, coarse_damp: float = 0.6,
                 transpose: bool = False) -> AMGPCData:
    """Build the composite PC for one block (setupAMG analogue).

    axes/kappa parametrize the fine line-PC smoother AND the stencil used
    for correction residuals (they should approximate the same operator);
    transpose=True builds M for A^T (adjoint solves)."""
    from adflow_tpu.solvers.linpc import build_line_pc

    lp = build_line_pc(w, metrics, cfg, ref, dtinv=dtinv, axes=axes,
                       kappa=kappa)
    op0 = build_stencil_jacobian(w, metrics, cfg, ref, dtinv, kappa)
    if transpose:
        op0 = stencil_transpose(op0)
    ops = [op0]
    factors = []
    cur = op0
    dims = cur.D.shape[:3]
    for _ in range(1, max(levels, 1)):
        f = _coarsen_factors(dims)
        if all(fa == 1 for fa in f):
            break
        cur = _boost_diag(coarsen_stencil(cur, f), coarse_boost)
        ops.append(cur)
        factors.append(f)
        dims = cur.D.shape[:3]
    return AMGPCData(line=lp, ops=tuple(ops), factors=tuple(factors),
                     axis=(axes[0] if axes else 1),
                     n_smooth=max(int(n_smooth), 1),
                     coarse_damp=float(coarse_damp), transposed=transpose)


def amg_vcycle(data: AMGPCData, r, lev: int):
    """Damped line-sweep V-cycle on the boosted coarse hierarchy
    (lev >= 1; the fine level is handled by the composite apply)."""
    op = data.ops[lev]
    z = jnp.zeros_like(r)
    ax = data.axis if r.shape[data.axis] > 1 else 0
    for _ in range(data.n_smooth):
        z = line_smooth(op, r, z, ax, data.coarse_damp)
    if lev == len(data.ops) - 1:
        for ax2 in (0, 2, data.axis):
            if r.shape[ax2] > 1:
                z = line_smooth(op, r, z, ax2, data.coarse_damp)
        return z
    f = data.factors[lev]
    r_c = _restrict(r - stencil_apply(op, z), f)
    z = z + _prolong(amg_vcycle(data, r_c, lev + 1), f)
    for _ in range(data.n_smooth):
        z = line_smooth(op, r, z, ax, data.coarse_damp)
    return z


def amg_pc_apply(data: AMGPCData, v):
    """Composite preconditioner application M^-1 v.

    turbResScale rows: forward system M = S*T -> M^-1 v = T^-1 (v/S);
    transposed (adjoint) M^T = T^T S -> M^-T v = (T^-T v)/S."""
    from adflow_tpu.solvers.linpc import (line_pc_apply,
                                          line_pc_apply_transposed)

    op0 = data.ops[0]
    inv = None
    if op0.turb_scale is not None and v.shape[-1] > 5:
        inv = jnp.asarray((1.0,) * 5 + tuple(1.0 / s for s in
                                             op0.turb_scale), v.dtype)
    # the line PC handles its own turb_scale; the stencil levels are
    # unscaled, so work in the UNSCALED residual space throughout
    if inv is not None and not data.transposed:
        v = v * inv
    lp = data.line
    if data.transposed:
        def smooth(u):
            return line_pc_apply_transposed(lp, u, skip_scale=True)
    else:
        def smooth(u):
            return line_pc_apply(lp, u, skip_scale=True)

    z = smooth(v)
    if len(data.ops) > 1:
        op = op0
        r1 = v - stencil_apply(op, z)
        z = z + _prolong(amg_vcycle(data, _restrict(r1, data.factors[0]), 1),
                         data.factors[0])
        r2 = v - stencil_apply(op, z)
        z = z + smooth(r2)
    if inv is not None and data.transposed:
        z = z * inv
    return z
