"""Precision policy.

The reference is compiled with ``-r8`` (double everywhere,
`/root/reference/config/defaults/config.LINUX_GFORTRAN.mk`). On TPU, f64 is
emulated and slow; the policy here is: 'auto' = float64 on CPU (tests,
golden regressions) and float32 on TPU (bench), overridable per solver via
the ``precision`` option. Deep-convergence paths can opt into compensated
(double-single) accumulations later without changing kernel code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_dtype(precision: str = "auto"):
    p = precision.lower()
    if p == "float64":
        return jnp.float64
    if p in ("float32", "tf32", "mixed"):
        # 'mixed': f32 solver machinery + f64 outer Newton residual
        # (solvers/newton.py mixed NK phase) — the working dtype is f32
        return jnp.float32
    # auto
    backend = jax.default_backend()
    if backend == "cpu" and jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)
