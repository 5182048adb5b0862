"""Block line-implicit preconditioner for the ANK/NK linear systems.

Reference analogue: the first-order approximate Jacobian PC the reference
assembles into PETSc with ASM+ILU (`/root/reference/src/adjoint/
adjointUtils.F90:7 setupStateResidualMatrix`, used by FormJacobianNK /
FormJacobianANK, NKSolvers.F90:372,1935). ILU is inherently sequential, so
the TPU-native counterpart is the other classic strong PC for structured
meshes: block line-implicit relaxation —

    M_dir = D + A_dir,   A_dir = first-order spectral-radius-split flux
                          Jacobian coupling along one grid line,

solved exactly with a batched block-Thomas recurrence (lax.scan along the
line, all other cells + lines vectorized; 5x5 blocks ride the VPU/MXU).
Off-diagonal blocks use the exact analytic flux Jacobian (via jax.jacfwd of
the face flux — no hand-derived matrices) with scalar |A| ~ lambda I
splitting, i.e. the LU-SGS linearization. A single direction has NO
approximate-factorization error, so it stays effective at arbitrarily large
CFL; directions can be composed multiplicatively (alternating sweeps) for
meshes stiff in several directions.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from adflow_tpu.physics.fluxes import extended_face_areas, spectral_radii
from adflow_tpu.physics.thermo import IMX, IMZ, IRHO, IRHOE, pressure
from adflow_tpu.physics.timestep import viscous_spectral_radii
from adflow_tpu.core.refstate import GAMMA


def _euler_flux_single(w5, svec):
    """F(w).S for one cell's 5-vector (helper for jacfwd)."""
    rho = w5[IRHO]
    m = w5[IMX:IMZ + 1]
    ke = 0.5 * jnp.sum(m * m) / rho
    p = (GAMMA - 1.0) * (w5[IRHOE] - ke)
    q = jnp.dot(m, svec) / rho
    return jnp.concatenate([
        jnp.array([rho * q]), m * q + p * svec,
        jnp.array([(w5[IRHOE] + p) * q])])


_flux_jac = jax.jacfwd(_euler_flux_single)


def flux_jacobians(w5_cells, svecs):
    """Batched exact A(w).S (…,5,5) via forward-mode AD."""
    flat_w = w5_cells.reshape(-1, 5)
    flat_s = jnp.broadcast_to(svecs, w5_cells.shape[:-1] + (3,)).reshape(-1, 3)
    jac = jax.vmap(_flux_jac)(flat_w, flat_s)
    return jac.reshape(w5_cells.shape[:-1] + (5, 5))


def _prim_from_cons(w5):
    """[rho,u,v,w,p] from a conservative 5-vector (trailing axis)."""
    rho = w5[..., 0:1]
    vel = w5[..., 1:4] / rho
    ke = 0.5 * jnp.sum(w5[..., 1:4] * vel, axis=-1, keepdims=True)
    p = (GAMMA - 1.0) * (w5[..., 4:5] - ke)
    return jnp.concatenate([rho, vel, jnp.maximum(p, 1e-10)], axis=-1)


def _abs_jac_single(q5, svec):
    """|A_roe(q)|.S as a dense 5x5 (conservative variables) — the exact
    linear map of the matrix-dissipation/Roe splitting, obtained by jacfwd
    of the characteristic dissipation apply (physics/upwind.py
    roe_abs_jacobian_apply with qL = qR; eigenvalue floors included, so the
    PC inherits the discretization's own entropy-fix conditioning)."""
    from adflow_tpu.physics.upwind import roe_abs_jacobian_apply

    def f(dw):
        return roe_abs_jacobian_apply(q5, q5, svec, dw)

    return jax.jacfwd(f)(jnp.zeros(5, q5.dtype))


def abs_flux_jacobians(w5_cells, svecs):
    """Batched |A(w).S| (…,5,5) from conservative states."""
    q = _prim_from_cons(w5_cells)
    flat_q = q.reshape(-1, 5)
    flat_s = jnp.broadcast_to(svecs, w5_cells.shape[:-1] + (3,)).reshape(-1, 3)
    jac = jax.vmap(_abs_jac_single)(flat_q, flat_s)
    return jac.reshape(w5_cells.shape[:-1] + (5, 5))


def solve_small(A, B):
    """Batched dense solve for tiny blocks (n <= ~8) by UNROLLED
    Gauss-Jordan elimination.

    Replaces ``jnp.linalg.solve``: XLA lowers that through
    ``LuDecompositionExpander``, which segfaults the TPU backend compiler
    on this stack (reproduced: bench --solve-probe native crash inside
    ``xla::LuDecompositionExpander::ExpandInstruction``). The PC blocks
    are diagonally dominant by construction (pseudo-time + split radii on
    the diagonal, Schur complements of a dominant block tridiagonal stay
    dominant), so elimination without pivoting is stable; the pivot gets a
    sign-preserving floor as a belt-and-braces guard.

    A: (..., n, n); B: (..., n) or (..., n, k). Returns A^-1 B.
    """
    n = A.shape[-1]
    b_vec = B.ndim == A.ndim - 1
    if b_vec:
        B = B[..., None]
    M = jnp.concatenate([A, B], axis=-1)
    rows = jnp.arange(n)
    tiny = jnp.asarray(jnp.finfo(A.dtype).tiny, A.dtype)
    for i in range(n):
        piv = M[..., i, i:i + 1]
        piv = jnp.where(jnp.abs(piv) < tiny,
                        jnp.where(piv < 0, -tiny, tiny), piv)
        row = M[..., i, :] / piv
        factor = jnp.where(rows != i, M[..., :, i], 0.0)
        M = M - factor[..., None] * row[..., None, :]
        M = M.at[..., i, :].set(row)
    X = M[..., n:]
    return X[..., 0] if b_vec else X


def block_tridiag_solve(L, D, U, rhs):
    """Block-Thomas along axis 0.

    L/D/U: (n, ..., b, b) block rows (L[0], U[-1] ignored); rhs (n, ..., b).
    """

    def fwd(carry, xs):
        Cp_prev, dp_prev = carry
        Lc, Dc, Uc, rc = xs
        denom = Dc - Lc @ Cp_prev
        Cp = solve_small(denom, Uc)
        rhs_c = rc - (Lc @ dp_prev[..., None])[..., 0]
        dp = solve_small(denom, rhs_c)
        return (Cp, dp), (Cp, dp)

    Cp0 = jnp.zeros_like(D[0])
    dp0 = jnp.zeros_like(rhs[0])
    _, (Cps, dps) = jax.lax.scan(fwd, (Cp0, dp0), (L, D, U, rhs))

    def bwd(x_next, xs):
        Cp, dp = xs
        x = dp - (Cp @ x_next[..., None])[..., 0]
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(rhs[0]), (Cps, dps),
                         reverse=True)
    return xs


import dataclasses as _dc


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("mean", "turb", "dscalar"),
                   meta_fields=("axes", "turb_scale"))
@_dc.dataclass(frozen=True)
class LinePCData:
    """Frozen per-block PC operators: for each sweep direction the block
    tridiagonal (L, D, U) in line-first axis order, plus the turbulence
    scalar tridiagonal (lt, dt, ut) when nw > 5.

    Registered as a pytree (axes/turb_scale static) so lagged PC data can
    be built once and passed INTO jitted Newton steps — the reference's
    Jacobian lag (NKJacobianLag/ANKJacobianLag, NKSolvers.F90:372)."""

    axes: tuple
    mean: list      # [(L, D, U)] per axis, arrays (n_ax, other..., 5, 5)
    turb: list      # [(lt, dt, ut)] per axis or None
    dscalar: jnp.ndarray  # (ni,nj,nk) full diagonal for inter-factor scaling
    # per-turb-variable turbResScale: the system's turbulence rows are
    # scaled by s, so PC = s*T and PC^-1 v = T^-1 (v/s)
    turb_scale: Optional[tuple] = None


def build_line_pc(w, metrics, cfg, ref, dtinv, axes=(1,),
                  coupling: float = 1.0, kappa: float = 1.0):
    """Build PC data for one block.

    w: halo-padded state (filled); dtinv: (ni,nj,nk) V/dt diagonal.
    axes: sweep directions (default j — the wall-normal stiff direction on
    O-meshes; pass (0,1,2) for full alternating sweeps).
    kappa scales the scalar-|A| part of the splitting (A +- kappa*lambda I):
    kappa=1 is the LU-SGS choice (robust, overdamped vs the small-eps JST
    dissipation of the true operator); smaller kappa matches the JST spectrum
    better at the cost of weaker diagonal dominance.

    For upwind / matrix-dissipation discretizations the scalar lambda*I
    splitting badly over-dissipates the entropy/shear rows (their physical
    dissipation is |u_n|, not |u_n|+c), so the PC mismatch lets GMRES stall
    near 0.3 relative (measured on the matrix-diss NACA0012 ANK solve).
    Those discretizations get the exact characteristic splitting instead:
    L = -0.5(A_m + |A_m|), U = 0.5(A_p - |A_p|) and a MATRIX diagonal
    D = (V/dt + cross-radii) I + 0.5(|A_f-| + |A_f+|) — the true first-order
    Roe line Jacobian (reference: setupStateResidualMatrix builds the same
    first-order PC, adjointUtils.F90:7).
    """
    matrix_split = (cfg.discretization.startswith("upwind")
                    or "matrix" in cfg.discretization)
    p = jnp.maximum(pressure(w), 1e-10)
    rI, rJ, rK = spectral_radii(w, p, metrics,
                                cfg.ls_precon_mach)
    rads = [rI, rJ, rK]
    if cfg.viscous:
        rv = viscous_spectral_radii(w, metrics, cfg, ref)
        rads = [r + jnp.pad(4.0 * v, 1, mode="edge")
                for r, v in zip(rads, rv)]
    # total diagonal: V/dt + sum over all 6 faces of 0.5*kappa*lambda_face
    # (face lambda ~ cell-averaged radius; 2 faces/dir -> rad_dir)
    rtot = (rads[0] + rads[1] + rads[2])[1:-1, 1:-1, 1:-1]
    dscalar = dtinv + kappa * rtot
    nw = w.shape[-1]
    eye = jnp.eye(5, dtype=w.dtype)

    siE, sjE, skE = extended_face_areas(metrics)
    sE = [siE, sjE, skE]

    mean_ops = []
    turb_ops = []
    for ax in axes:
        # neighbor states along ax (one-ring): cells c-1 and c+1
        it = [slice(2, -2)] * 3
        lo = list(it)
        hi = list(it)
        lo[ax] = slice(1, -3)
        hi[ax] = slice(3, -1)
        w_m = w[tuple(lo)][..., :5]
        w_p = w[tuple(hi)][..., :5]

        # face areas: sE[ax] padded by 1 -> interior faces of cell c are at
        # extended indices c+1 (minus face) and c+2 (plus face); tangential
        # interior slice = [1:-1]
        et = [slice(1, -1)] * 3
        fm = list(et)
        fp = list(et)
        fm[ax] = slice(1, -2)
        fp[ax] = slice(2, -1)
        s_m = sE[ax][tuple(fm)]
        s_p = sE[ax][tuple(fp)]

        # face spectral radii: mean of adjacent cell radii (extended grid)
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
            w_c = w[tuple(it)][..., :5]
            Aabs_m = abs_flux_jacobians(w_m, s_m)
            Aabs_p = abs_flux_jacobians(w_p, s_p)
            Aabs_cm = abs_flux_jacobians(w_c, s_m)
            Aabs_cp = abs_flux_jacobians(w_c, s_p)
            L = -0.5 * coupling * (A_m + Aabs_m)
            U = 0.5 * coupling * (A_p - Aabs_p)
            # diagonal: pseudo-time + scalar radii of the two CROSS
            # directions + the sweep direction's matrix |A| halves
            r_cross = rtot - rads[ax][1:-1, 1:-1, 1:-1]
            D = ((dtinv + kappa * r_cross)[..., None, None] * eye
                 + 0.5 * (Aabs_cm + Aabs_cp))
        else:
            L = -0.5 * coupling * (A_m + kappa * lam_m[..., None, None] * eye)
            U = 0.5 * coupling * (A_p - kappa * lam_p[..., None, None] * eye)
            D = dscalar[..., None, None] * eye

        # move the sweep axis first
        L = jnp.moveaxis(L, ax, 0)
        U = jnp.moveaxis(U, ax, 0)
        D = jnp.moveaxis(D, ax, 0)
        mean_ops.append((L, D, U))

        if nw > 5:
            # scalar advection-diffusion model for turbulence variables
            rho_m = w_m[..., IRHO]
            rho_p = w_p[..., IRHO]
            q_m = jnp.sum(w_m[..., IMX:IMZ + 1] * s_m, axis=-1) / rho_m
            q_p = jnp.sum(w_p[..., IMX:IMZ + 1] * s_p, axis=-1) / rho_p
            lt = -0.5 * coupling * (q_m + kappa * lam_m)
            ut = 0.5 * coupling * (q_p - kappa * lam_p)
            dt_ = dscalar
            turb_ops.append((jnp.moveaxis(lt, ax, 0),
                             jnp.moveaxis(dt_, ax, 0),
                             jnp.moveaxis(ut, ax, 0)))
        else:
            turb_ops.append(None)

    ts = cfg.turb_scales if (nw > 5 and cfg.rans) else None
    if ts is not None and all(s == 1.0 for s in ts):
        ts = None
    return LinePCData(axes=tuple(axes), mean=mean_ops, turb=turb_ops,
                      dscalar=dscalar, turb_scale=ts)


def line_pc_apply(data: LinePCData, v, skip_scale: bool = False):
    """Apply M^-1 v on one block, v: (ni,nj,nk,nw).

    Multiple axes compose as an approximate factorization
    M = (D+A_1) D^-1 (D+A_2) D^-1 ... with the FULL diagonal D in every
    factor: since D >= sum of radii the inter-factor scaling stays bounded
    as CFL -> inf (unlike the classic AF whose error blows up with dt).

    skip_scale: caller already works in the UNSCALED (physical) residual
    space and handles turbResScale rows itself (solvers/amg.py)."""
    from adflow_tpu.solvers.dadi import tridiag_solve

    z = v
    if not skip_scale and data.turb_scale is not None and v.shape[-1] > 5:
        # PC = S*T on the scaled turbulence rows: un-scale the input once,
        # then apply the unscaled factors
        inv = jnp.asarray((1.0,) * 5 + tuple(1.0 / s for s in
                                             data.turb_scale), v.dtype)
        z = z * inv
    for i, ax in enumerate(data.axes):
        if i > 0:
            z = z * data.dscalar[..., None]
        L, D, U = data.mean[i]
        zb = jnp.moveaxis(z, ax, 0)
        zm = block_tridiag_solve(L, D, U, zb[..., :5])
        if z.shape[-1] > 5 and data.turb[i] is not None:
            lt, dt_, ut = data.turb[i]
            zt = tridiag_solve(lt, dt_, ut, zb[..., 5:])
            zl = jnp.concatenate([zm, zt], axis=-1)
        else:
            zl = zm
        z = jnp.moveaxis(zl, 0, ax)
    return z


def line_pc_apply_transposed(data: LinePCData, v, skip_scale: bool = False):
    """Apply M^-T v on one block: transpose each factor and reverse the
    sweep order (adjoint PC; reference: the transposed PETSc PC in
    solveAdjoint, adjointAPI.F90:661).

    Forward PC is M = S*T on turbResScale rows, so M^-T v = S^-1 T^-T v —
    the un-scale happens AFTER the transposed solves (unless skip_scale).
    """
    from adflow_tpu.solvers.dadi import tridiag_solve

    z = v
    for i in reversed(range(len(data.axes))):
        ax = data.axes[i]
        L, D, U = data.mean[i]
        # transpose of tridiag(L, D, U): blocks transposed, L/U swapped
        # with a one-cell shift along the line
        LT = jnp.swapaxes(U, -1, -2)
        LT = jnp.roll(LT, 1, axis=0).at[0].set(jnp.zeros_like(LT[0]))
        UT = jnp.swapaxes(L, -1, -2)
        UT = jnp.roll(UT, -1, axis=0).at[-1].set(jnp.zeros_like(UT[0]))
        DT = jnp.swapaxes(D, -1, -2)
        zb = jnp.moveaxis(z, ax, 0)
        zm = block_tridiag_solve(LT, DT, UT, zb[..., :5])
        if z.shape[-1] > 5 and data.turb[i] is not None:
            lt, dt_, ut = data.turb[i]
            ltT = jnp.roll(ut, 1, axis=0).at[0].set(0.0)
            utT = jnp.roll(lt, -1, axis=0).at[-1].set(0.0)
            zt = tridiag_solve(ltT, dt_, utT, zb[..., 5:])
            zl = jnp.concatenate([zm, zt], axis=-1)
        else:
            zl = zm
        z = jnp.moveaxis(zl, 0, ax)
        if i > 0:
            z = z * data.dscalar[..., None]
    if not skip_scale and data.turb_scale is not None and z.shape[-1] > 5:
        inv = jnp.asarray((1.0,) * 5 + tuple(1.0 / s for s in
                                             data.turb_scale), z.dtype)
        z = z * inv
    return z
