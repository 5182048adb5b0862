"""Diagonalized alternating-direction-implicit (DADI) operators.

Reference analogues:
- ``DADISmoother`` / ``executeDADIStep``
  (`/root/reference/src/solver/smoothers.F90:383,425`) — the diagonalized
  ADI smoother alternative to RK.
- The ASM+ILU preconditioner the reference builds in PETSc for ANK/NK
  (`src/adjoint/adjointUtils.F90:7`): ILU does not vectorize on TPU, so this
  framework's implicit preconditioner is the scalar approximate-factorization

      (D + A_i) D^-1 (D + A_j) D^-1 (D + A_k)  ~  D + A_i + A_j + A_k

  with D = V/dt (+ spectral radius sum) per cell and A_dir the first-order
  scalar model of the directional flux Jacobian: per line, tridiagonal with
  diag 0.5(lam_minus + lam_plus), off-diagonals -0.5 lam. Each factor is a
  batch of independent scalar tridiagonal solves along one grid direction —
  a Thomas recurrence via lax.scan over the line, vectorized over the other
  two directions and the 5+ variables (VPU-wide on TPU).

This one operator serves as: the ANK/NK preconditioner and (applied to the
nonlinear update D z = -R) the DADI smoother.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from adflow_tpu.physics.fluxes import spectral_radii
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.physics.timestep import viscous_spectral_radii


def tridiag_solve(lower, diag, upper, rhs):
    """Batched Thomas algorithm along axis 0.

    lower/diag/upper: (n, ...) coefficient arrays (lower[0] and upper[-1]
    ignored); rhs: (n, ..., nv). Returns solution with rhs's shape.
    Not pivoted — valid for the diagonally-dominant PC systems built here.
    """
    n = diag.shape[0]

    def fwd(carry, xs):
        cp_prev, dp_prev = carry
        a, b, c, d = xs
        denom = b - a * cp_prev
        denom = jnp.where(jnp.abs(denom) < 1e-30,
                          jnp.sign(denom) * 1e-30 + 1e-30, denom)
        cp = c / denom
        dp = (d - a[..., None] * dp_prev) / denom[..., None]
        return (cp, dp), (cp, dp)

    a = lower
    b = diag
    c = upper
    cp0 = jnp.zeros_like(diag[0])
    dp0 = jnp.zeros_like(rhs[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (cp0, dp0), (a, b, c, rhs))

    def bwd(x_next, xs):
        cp, dp = xs
        x = dp - cp[..., None] * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(rhs[0]), (cps, dps),
                         reverse=True)
    return xs


def _face_lambdas(rad_ext, axis):
    """(lam_minus, lam_plus) per interior cell from the one-ring-extended
    per-cell spectral radius: lam at a face = mean of adjacent cells."""
    sl_lo = [slice(1, -1)] * 3
    sl_hi = [slice(1, -1)] * 3
    sl_c = [slice(1, -1)] * 3
    sl_lo[axis] = slice(0, -2)
    sl_hi[axis] = slice(2, None)
    sl_c[axis] = slice(1, -1)
    rc = rad_ext[tuple(sl_c)]
    rm = 0.5 * (rad_ext[tuple(sl_lo)] + rc)
    rp = 0.5 * (rad_ext[tuple(sl_hi)] + rc)
    return rm, rp


class DadiData:
    """Per-block frozen coefficients for one PC application set."""

    def __init__(self, d, lams):
        self.d = d          # (ni, nj, nk) diagonal V/dt term
        self.lams = lams    # [(lam_minus, lam_plus)] per axis


def build_dadi_data(w, metrics, cfg, ref, dtinv, relax: float = 1.0):
    """Coefficients from the current state. ``dtinv`` = V/dt per interior
    cell (the ANK pseudo-time diagonal; for a pure smoother pass
    dtinv = radsum/CFL)."""
    p = jnp.maximum(pressure(w), 1e-10)
    rI, rJ, rK = spectral_radii(w, p, metrics,
                                cfg.ls_precon_mach)
    if cfg.viscous:
        # augment with viscous radii (interior only, edge-padded)
        rv = viscous_spectral_radii(w, metrics, cfg, ref)
        rI = rI + jnp.pad(rv[0], 1, mode="edge")
        rJ = rJ + jnp.pad(rv[1], 1, mode="edge")
        rK = rK + jnp.pad(rv[2], 1, mode="edge")
    lams = [(_face_lambdas(r, ax)) for ax, r in enumerate((rI, rJ, rK))]
    lams = [(relax * lm, relax * lp) for lm, lp in lams]
    return DadiData(d=dtinv, lams=lams)


def dadi_apply(data: DadiData, v):
    """Approximate (D + A_i + A_j + A_k)^{-1} v on one block.

    v: (ni, nj, nk, nv). Sequence: solve i-factor, scale by D, solve
    j-factor, scale by D, solve k-factor.
    """
    z = v
    for axis in range(3):
        lm, lp = data.lams[axis]
        diag = data.d + 0.5 * (lm + lp)
        lower = -0.5 * lm
        upper = -0.5 * lp
        zl = jnp.moveaxis(z, axis, 0)
        dl = jnp.moveaxis(diag, axis, 0)
        ll = jnp.moveaxis(lower, axis, 0)
        ul = jnp.moveaxis(upper, axis, 0)
        zl = tridiag_solve(ll, dl, ul, zl)
        z = jnp.moveaxis(zl, 0, axis)
        if axis < 2:
            z = z * data.d[..., None]
    return z
