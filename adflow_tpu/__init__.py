"""adflow_tpu — a TPU-native compressible-flow solver (JAX/XLA/Pallas).

A brand-new framework with the capability set of mdolab/adflow (reference
surveyed in SURVEY.md): cell-centered finite-volume Euler / laminar NS / RANS
on structured multiblock meshes, JST central + Roe upwind fluxes, SA
turbulence, RK/DADI smoothers with geometric multigrid, matrix-free
Newton-Krylov solvers, surface-integrated cost functions, and a discrete
adjoint obtained with jax.vjp through the residual (replacing the reference's
121k-LoC Tapenade tree, see /root/reference/src/adjoint).

The public entry point mirrors the reference Python API
(`adflow/pyADflow.py:60` ADFLOW class): ``ADFLOW(options)`` /
``Solver(options)``.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 inputs ("default" precision), which cripples
# the 5x5 line-PC block solves and einsum-based Jacobian algebra: measured
# on the transonic M6-class mixed solve, ANK deadlocks at 0.23 relative on
# TPU (CFL/SER stuck at 45) while the SAME program on CPU f32 converges
# 2.5e-9. CFD linear algebra needs true f32 accumulation; the cost is
# negligible here (stencil kernels are elementwise — matmuls only appear
# in tiny PC blocks and GMRES dots).
_jax.config.update("jax_default_matmul_precision", "highest")

from adflow_tpu.options import get_default_options, Options  # noqa: F401
from adflow_tpu.core.refstate import ReferenceState, AeroProblem  # noqa: F401
from adflow_tpu.api.solver import ADFLOW, Solver  # noqa: F401
