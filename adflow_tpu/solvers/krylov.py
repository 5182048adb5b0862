"""Matrix-free GMRES, jittable, fixed-subspace with early exit.

Reference analogue: the PETSc KSP GMRES used by NK/ANK/adjoint
(`/root/reference/src/NKSolver/NKSolvers.F90` KSPSolve calls,
`src/adjoint/adjointAPI.F90:865` setupPETScKsp). The reference's "parallel
linear algebra" (SURVEY.md §2.10 item 5) is entirely matvecs + dots + norms,
so a hand-rolled JAX GMRES distributes for free: dots become psum-able
reductions under shard_map and the matvec is the (sharded) residual JVP.

Implementation notes:
- Right preconditioning (solve A M^-1 u = b, x = M^-1 u) so the monitored
  residual is the true residual, matching PETSc's default for NK here.
- Orthogonalization: classical Gram-Schmidt with one re-orthogonalization
  pass (CGS2) — two big (m x n) matvecs instead of a sequential MGS loop:
  the TPU-friendly choice, stability comparable to MGS.
- Fixed maximum subspace (static shapes for XLA) with lax.while_loop early
  exit so converged solves stop issuing matvecs.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GmresResult(NamedTuple):
    x: jnp.ndarray
    res_norm: jnp.ndarray       # estimated final residual norm
    b_norm: jnp.ndarray
    iters: jnp.ndarray          # total inner iterations
    converged: jnp.ndarray


def _identity(v):
    return v


def gmres(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
          m: int = 30, restarts: int = 1, tol: float = 1e-2,
          atol: float = 0.0, precond: Optional[Callable] = None,
          axis_name: Optional[str] = None) -> GmresResult:
    """Solve A x = b with restarted GMRES(m).

    matvec: v -> A v on flat vectors; precond: v -> M^-1 v (right PC).
    tol is relative to ||b||. All control flow is traced (jit-safe).

    ``axis_name``: when set, ``b``/vectors are SHARD-LOCAL pieces of a
    global vector inside a shard_map over that mesh axis; every inner
    product / norm is completed with a psum so the Arnoldi process (and
    hence the small replicated H) is identical on all shards — the
    distributed-KSP behaviour of the reference's PETSc solves.
    """
    Minv = precond or _identity
    n = b.shape[0]
    dtype = b.dtype
    if x0 is None:
        x0 = jnp.zeros_like(b)

    if axis_name is None:
        def _gdot(A, v):      # rows of A . v (A: (m+1, n) or (n,))
            return A @ v

        def _gnorm(v):
            return jnp.linalg.norm(v)
    else:
        def _gdot(A, v):
            return jax.lax.psum(A @ v, axis_name)

        def _gnorm(v):
            return jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis_name))

    b_norm = _gnorm(b)
    target = jnp.maximum(tol * b_norm, atol)

    def cycle(carry):
        x, _, total_iters, _ = carry
        r0 = b - matvec(x)
        beta = _gnorm(r0)

        V = jnp.zeros((m + 1, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        V = V.at[0].set(r0 / jnp.maximum(beta, 1e-30))

        def arnoldi_cond(st):
            V, H, cs, sn, g, k = st
            # stop on non-finite g[k] too: an overflowed/NaN Arnoldi state
            # would otherwise run to k=m with sk=0 rotations and report an
            # exactly-0.0 residual (the round-2 "linres=0.0" breakdown)
            return jnp.logical_and(
                jnp.logical_and(k < m, jnp.abs(g[k]) > target),
                jnp.isfinite(g[k]))

        def arnoldi_body(st):
            V, H, cs, sn, g, k = st
            v_k = V[k]
            w = matvec(Minv(v_k))
            # CGS2: h = V w; w -= V^T h; one re-orth pass
            mask = (jnp.arange(m + 1) <= k).astype(dtype)
            h1 = _gdot(V, w) * mask
            w = w - V.T @ h1
            h2 = _gdot(V, w) * mask
            w = w - V.T @ h2
            h = h1 + h2
            hk1 = _gnorm(w)
            V2 = V.at[k + 1].set(w / jnp.maximum(hk1, 1e-30))

            # apply stored Givens rotations to the new column
            col = h.at[k + 1].set(hk1)[: m + 1]

            def rot_body(i, col):
                ci, si = cs[i], sn[i]
                applied_i = jnp.where(
                    i < k,
                    jnp.stack([ci * col[i] + si * col[i + 1],
                               -si * col[i] + ci * col[i + 1]]),
                    jnp.stack([col[i], col[i + 1]]))
                return col.at[i].set(applied_i[0]).at[i + 1].set(applied_i[1])

            col = jax.lax.fori_loop(0, m, rot_body, col)
            # new rotation zeroing col[k+1]
            denom = jnp.sqrt(col[k] ** 2 + col[k + 1] ** 2)
            ck = jnp.where(denom > 0, col[k] / jnp.maximum(denom, 1e-30), 1.0)
            sk = jnp.where(denom > 0, col[k + 1] / jnp.maximum(denom, 1e-30),
                           0.0)
            col = col.at[k].set(denom).at[k + 1].set(0.0)
            g2 = g.at[k + 1].set(-sk * g[k]).at[k].set(ck * g[k])
            H2 = H.at[:, k].set(col)
            return (V2, H2, cs.at[k].set(ck), sn.at[k].set(sk), g2, k + 1)

        V, H, cs, sn, g, k = jax.lax.while_loop(
            arnoldi_cond, arnoldi_body, (V, H, cs, sn, g, 0))

        # solve the (masked) triangular system H[:k,:k] y = g[:k]
        kk = jnp.arange(m)
        diag_mask = (kk >= k)
        Hm = H[:m, :m] + jnp.diag(diag_mask.astype(dtype))
        gm = jnp.where(kk < k, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
        dx = Minv(V[:m].T @ y)
        x_new = x + dx
        res = jnp.abs(g[k])
        return (x_new, res, total_iters + k, beta)

    def restart_cond(carry):
        _, res, total_iters, _ = carry
        return jnp.logical_and(res > target, total_iters < m * restarts)

    x, res, iters, _ = jax.lax.while_loop(
        restart_cond, cycle, (x0, jnp.asarray(jnp.inf, dtype),
                              jnp.asarray(0), b_norm))
    return GmresResult(x=x, res_norm=res, b_norm=b_norm, iters=iters,
                       converged=res <= target)
