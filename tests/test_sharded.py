"""Partition invariance: the k-split SPMD solver must reproduce the
single-device multiblock path to machine precision.

Reference analogue: the random-block-order regression case
(`/root/reference/tests/reg_tests/test_functionals.py:96-110`,
funcs_euler_scalar_jst_rand_tut_wing) proving results are independent of the
partitioning. Here: one RK iteration on the full block vs the same iteration
sharded over a 4-device mesh axis must agree bitwise-tightly, for Euler and
RANS (the RANS case exercises ghost-cell Green-Gauss gradients and viscous
metrics at shard interfaces).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.dist.sharded import (
    build_sharded_problem, make_sharded_step, shard_arrays, split_metrics)
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.geom.walldist import compute_wall_distances
from adflow_tpu.meshgen.analytic import wing_omesh
from adflow_tpu.physics.residual import ProblemConfig, build_topology
from adflow_tpu.solvers.smoothers import rk_iteration

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

N_SHARDS = 4
N_ITERS = 3


def _setup(equation_type):
    viscous = equation_type != "euler"
    mesh = wing_omesh(ni=32, nj=12, nk=8, viscous=viscous)
    cfg = ProblemConfig(
        equation_type=equation_type, vis2=0.25, vis4=1.0 / 64.0,
        diss_exponent=0.67, turbulence_model="sa")
    ap = AeroProblem(name="w", mach=0.6, alpha=2.0,
                     reynolds=(1e6 if viscous else None))
    ref = make_reference_state(ap, lift_index=2, n_turb=cfg.n_turb)
    winf = jnp.asarray(ref.winf())
    x = jnp.asarray(mesh.blocks[0].x)
    d = None
    if cfg.rans:
        d = compute_wall_distances(mesh, [x], x.dtype)[0]
    return mesh, cfg, ref, winf, x, d


CFL = 1.0


def _global_iterations(mesh, cfg, ref, winf, x, d):
    topo = build_topology(mesh)
    metrics = [compute_metrics(x)]
    extras = [{"walldist": d}] if d is not None else None
    b = mesh.blocks[0]
    w = jnp.broadcast_to(winf, tuple(dd + 4 for dd in b.dims) + (ref.nw,))
    w = w.astype(x.dtype)
    for _ in range(N_ITERS):
        [w], _ = rk_iteration([w], metrics, topo, cfg, ref, winf,
                              jnp.asarray(CFL), extras)
    return np.asarray(w[2:-2, 2:-2, 2:-2])


def _sharded_iterations(mesh, cfg, ref, winf, x, d):
    devs = np.array(jax.devices()[:N_SHARDS])
    device_mesh = Mesh(devs, axis_names=("z",))
    prob = build_sharded_problem(mesh, n_shards=N_SHARDS)
    w_stack, d_stack = shard_arrays(mesh, prob, winf, x.dtype,
                                    None if d is None else np.asarray(d))
    metrics_stack = split_metrics(compute_metrics(x), N_SHARDS)
    sh = NamedSharding(device_mesh, P("z"))
    w_stack = jax.device_put(w_stack, sh)
    metrics_stack = jax.device_put(metrics_stack, sh)
    if d_stack is not None:
        d_stack = jax.device_put(d_stack, sh)
    step = jax.jit(make_sharded_step(prob, cfg, ref, device_mesh,
                                     n_iters=N_ITERS, cfl=CFL))
    w_new, hist = step(w_stack, metrics_stack, jnp.asarray(winf), d_stack)
    assert np.all(np.isfinite(np.asarray(hist)))
    # reassemble global interior: shard s owns k-cells [s*nkl, (s+1)*nkl)
    w_np = np.asarray(w_new)[:, 2:-2, 2:-2, 2:-2]
    return np.concatenate([w_np[s] for s in range(N_SHARDS)], axis=2)


@pytest.mark.parametrize("equation_type", ["euler", "rans"])
def test_partition_invariance(equation_type):
    mesh, cfg, ref, winf, x, d = _setup(equation_type)
    w_glob = _global_iterations(mesh, cfg, ref, winf, x, d)
    w_shard = _sharded_iterations(mesh, cfg, ref, winf, x, d)
    assert w_glob.shape == w_shard.shape
    assert np.all(np.isfinite(w_glob)), f"{equation_type}: global diverged"
    assert np.all(np.isfinite(w_shard)), f"{equation_type}: sharded diverged"
    # per-variable field scale (z-momentum etc. can be ~0 pointwise)
    scale = np.maximum(np.abs(w_glob).max(axis=(0, 1, 2)), 1e-12)
    err = np.max(np.abs(w_glob - w_shard) / scale)
    assert err < 1e-12, f"{equation_type}: sharded mismatch rel err {err}"


def _ank_adjoint(mesh, cfg, ref, winf, x, d, n_shards):
    """One distributed ANK step + adjoint matvec on an n-shard mesh."""
    from adflow_tpu.dist.sharded_newton import make_sharded_ank_adjoint_step

    devs = np.array(jax.devices()[:n_shards])
    device_mesh = Mesh(devs, axis_names=("z",))
    prob = build_sharded_problem(mesh, n_shards=n_shards)
    w_stack, d_stack = shard_arrays(mesh, prob, winf, x.dtype,
                                    None if d is None else np.asarray(d))
    metrics_stack = split_metrics(compute_metrics(x), n_shards)
    sh = NamedSharding(device_mesh, P("z"))
    w_stack = jax.device_put(w_stack, sh)
    metrics_stack = jax.device_put(metrics_stack, sh)
    if d_stack is not None:
        d_stack = jax.device_put(d_stack, sh)
    step = jax.jit(make_sharded_ank_adjoint_step(prob, cfg, ref, device_mesh,
                                                 cfl=5.0))
    w_new, stats = step(w_stack, metrics_stack, jnp.asarray(winf), d_stack)
    w_np = np.asarray(w_new)[:, 2:-2, 2:-2, 2:-2]
    return (np.concatenate([w_np[s] for s in range(n_shards)], axis=2),
            np.asarray(stats))


@pytest.mark.parametrize("equation_type", ["euler", "rans"])
def test_ank_adjoint_partition_invariance(equation_type):
    """Distributed ANK step + adjoint matvec: 4-shard result must match the
    1-shard run of the identical program (psum'd GMRES Arnoldi must be
    partition-independent; reference analogue: parallel PETSc KSP giving
    rank-count-independent results)."""
    mesh, cfg, ref, winf, x, d = _setup(equation_type)
    w1, s1 = _ank_adjoint(mesh, cfg, ref, winf, x, d, 1)
    w4, s4 = _ank_adjoint(mesh, cfg, ref, winf, x, d, N_SHARDS)
    assert np.all(np.isfinite(w4)), f"{equation_type}: sharded ANK diverged"
    assert np.all(np.isfinite(s4)), f"stats: {s4}"
    scale = np.maximum(np.abs(w1).max(axis=(0, 1, 2)), 1e-12)
    err = np.max(np.abs(w1 - w4) / scale)
    # GMRES accumulates rounding differently across partitions; f64 keeps
    # the gap tiny but not bitwise
    assert err < 1e-8, f"{equation_type}: ANK partition mismatch {err}"
    assert abs(s1[3] - s4[3]) / max(abs(s1[3]), 1e-300) < 1e-8, (
        f"adjoint matvec norm mismatch: {s1[3]} vs {s4[3]}")
