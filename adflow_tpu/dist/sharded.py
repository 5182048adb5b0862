"""Multi-chip SPMD domain decomposition: k-axis split under shard_map.

Reference analogue: ADflow's MPI domain decomposition + halo exchange
(`/root/reference/src/partitioning/loadBalance.F90:677` block splitting,
`src/utils/haloExchange.F90:5,109` whalo1/whalo2). The reference splits
structured blocks across ranks and replays precomputed send/recv lists with
nonblocking MPI. The TPU-native equivalent implemented here (SURVEY.md §2.10,
§5.7): shard the k-axis of a structured block over a 1-D
``jax.sharding.Mesh`` axis ``'z'`` with 2-deep halo slabs exchanged by
``jax.lax.ppermute`` rings over ICI, global reductions by ``psum``, and
everything inside one ``shard_map``-wrapped jitted step — XLA overlaps the
ppermute with local stencil work.

Design:
- The global block (ni, nj, nk) is split into nshards local blocks
  (ni, nj, nk/nshards), each carried halo-padded: (ni+4, nj+4, nkl+4, nw),
  stacked on a leading axis that is sharded 1:1 over devices.
- Every shard runs the IDENTICAL program (shard_map requirement): all global
  BCs — including the global kmin/kmax BCs — are applied on every shard, the
  local b2b connections (e.g. the O-mesh i-wrap) are exchanged locally, and
  then the k-halos of shards that HAVE a neighbor are overwritten with the
  neighbor's edge slabs via ppermute. Shards without a neighbor (first/last)
  keep their BC-filled values. This reproduces the reference's ordered
  BC -> exchange corner handling (physics/residual.py fill_halos) with the
  exchange now crossing chips.
- Restriction (current scope): one global structured block, split along k;
  k-faces must not be solid walls (face porosities would differ per shard).
  General multi-block-over-chips assignment rides the same primitives with
  block bucketing (halo.py HaloTable) — planned; ADflow has the same
  "split blocks to load balance" special case (loadBalance.F90:880).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map(..., check_vma=)
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # older: jax.experimental.shard_map(..., check_rep=)
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from adflow_tpu.core.mesh import (
    Block, BCSubface, Face, MultiBlockMesh, WALL_BCS)
from adflow_tpu.core.refstate import ReferenceState
from adflow_tpu.dist.halo import build_conn_ops, exchange_halos_list
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.physics.bc import apply_bcs, build_bc_ops
from adflow_tpu.physics.residual import (
    BlockStatic, MeshTopology, ProblemConfig, _build_porosities,
    block_residual)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.physics.timestep import local_timestep
from adflow_tpu.solvers.smoothers import RK_COEFFS

H = 2


@dataclasses.dataclass(frozen=True)
class ShardedProblem:
    """Static data for a k-split SPMD solve."""

    mesh_axis: str                 # device-mesh axis name
    n_shards: int
    local_dims: Tuple[int, int, int]
    local_topo: MeshTopology       # identical on every shard
    # template local Block (shard 0) used to build BC ops / porosities
    template: Block


def _make_local_template(block: Block, n_shards: int) -> Block:
    """A local block (shard-sized) carrying ALL global BCs and the local b2b
    connections. Identical static metadata on every shard: global k-face BCs
    are applied everywhere and later overwritten by ppermute where a
    neighbor exists."""
    ni, nj, nk = block.dims
    if nk % n_shards != 0:
        raise ValueError(f"nk={nk} not divisible by n_shards={n_shards}")
    nkl = nk // n_shards
    for sf in block.bcs:
        if sf.face.axis == 2 and sf.bc in WALL_BCS:
            raise NotImplementedError(
                "k-face wall BCs not supported in k-split mode (per-shard "
                "porosities would differ); rotate the mesh so walls are on "
                "i/j faces")
        if sf.rng is not None and sf.face.axis != 2:
            # subface ranges in the k direction would need per-shard clipping
            t1, t2 = [a for a in range(3) if a != sf.face.axis]
            krng = sf.rng[0] if t1 == 2 else sf.rng[1]
            if krng != (0, nk):
                raise NotImplementedError(
                    "k-partial subfaces not supported in k-split mode")
    for c in block.conns:
        if c.face.axis == 2:
            raise NotImplementedError(
                "k-face b2b connections not supported in k-split mode")
        if c.donor_block != 0:
            raise NotImplementedError("k-split mode takes a single block")

    def _clip_rng(sf: BCSubface) -> BCSubface:
        if sf.rng is None or sf.face.axis == 2:
            return dataclasses.replace(sf)
        t1, _t2 = [a for a in range(3) if a != sf.face.axis]
        # k is always the larger tangential axis index except for k-faces
        (a0, a1), (b0, b1) = sf.rng
        if t1 == 2:
            a0, a1 = 0, nkl
        else:
            b0, b1 = 0, nkl
        return dataclasses.replace(sf, rng=((a0, a1), (b0, b1)))

    x_local = block.x[:, :, : nkl + 1]
    bcs = [_clip_rng(sf) for sf in block.bcs]
    conns = [dataclasses.replace(c) for c in block.conns]
    return Block(name=f"{block.name}_shard", x=x_local, bcs=bcs, conns=conns)


def build_sharded_problem(mesh: MultiBlockMesh, n_shards: int,
                          mesh_axis: str = "z") -> ShardedProblem:
    if len(mesh.blocks) != 1:
        raise NotImplementedError(
            "k-split sharding takes a single global block; multi-block "
            "meshes solve on the per-block list path")
    template = _make_local_template(mesh.blocks[0], n_shards)
    shard_mesh = MultiBlockMesh([template], name="shard")
    topo = MeshTopology(
        blocks=(BlockStatic(dims=template.dims,
                            bc_ops=tuple(build_bc_ops(template)),
                            por=_build_porosities(template)),),
        conn_ops=tuple(build_conn_ops(shard_mesh)))
    return ShardedProblem(
        mesh_axis=mesh_axis, n_shards=n_shards, local_dims=template.dims,
        local_topo=topo, template=template)


def shard_arrays(mesh: MultiBlockMesh, prob: ShardedProblem, winf,
                 dtype=jnp.float32, walldist: Optional[np.ndarray] = None):
    """Host-side split of state/wall-distance into the stacked-shard layout.

    Returns (w_stack, d_stack):
      w_stack: (S, ni+4, nj+4, nkl+4, nw) free-stream initialized state
      d_stack: (S, ni+2, nj+2, nkl+2) wall distance on the one-ring grid
               (None unless walldist given, as (ni+2, nj+2, nk+2) global)
    """
    blk = mesh.blocks[0]
    ni, nj, nk = blk.dims
    S = prob.n_shards
    nkl = nk // S
    nw = len(np.asarray(winf))
    w_stack = np.broadcast_to(
        np.asarray(winf, dtype=np.dtype(dtype)),
        (S, ni + 4, nj + 4, nkl + 4, nw)).copy()
    d_stack = None
    if walldist is not None:
        d = np.asarray(walldist)  # (ni+2, nj+2, nk+2): one-ring global
        parts = []
        for s in range(S):
            lo, hi = s * nkl, (s + 1) * nkl + 2
            parts.append(d[:, :, lo:hi])
        d_stack = np.stack(parts)
    return (jnp.asarray(w_stack, dtype),
            None if d_stack is None else jnp.asarray(d_stack, dtype))


def split_metrics(gm, n_shards: int, dtype=None):
    """Split GLOBAL BlockMetrics into stacked per-shard BlockMetrics whose
    extended (halo) entries carry the TRUE neighbor metrics at shard
    interfaces — the analogue of the reference's xhalo coordinate exchange +
    halo metric computation at preprocessing (preprocessingAPI.F90:1042,
    metric). With exact halo metrics, every kernel (JST radii, Green-Gauss
    ghost gradients, viscous distances) produces bit-identical interface
    fluxes on both sides: partition-invariant, conservative.

    Differentiable: the split is pure slicing, so geometry gradients chain
    through compute_metrics -> split_metrics -> step.
    """
    from adflow_tpu.geom.metrics import BlockMetrics

    nk = gm.skE.shape[2] - 3
    S = n_shards
    nkl = nk // S

    def stack(a, extra):  # extra = trailing k extent beyond nkl
        parts = [a[:, :, s * nkl: s * nkl + nkl + extra] for s in range(S)]
        out = jnp.stack(parts)
        return out if dtype is None else out.astype(dtype)

    return BlockMetrics(
        siE=stack(gm.siE, 2), sjE=stack(gm.sjE, 2), skE=stack(gm.skE, 3),
        vol=stack(gm.vol, 4), xc_ext=stack(gm.xc_ext, 2))


def exchange_k_halos(w, axis_name: str):
    """Overwrite k-halos with neighbor edge slabs where a neighbor exists.

    w: local (ni+4, nj+4, nkl+4, nv) with BC-filled halos. The slabs carry
    the full (ni+4, nj+4) extent, so corner/edge halos inherit the
    neighbor's own BC-filled lateral halos — the cross-chip analogue of the
    reference's ordered corner communication (haloExchange.F90 whalo2).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return w
    idx = jax.lax.axis_index(axis_name)
    right_perm = [(i, i + 1) for i in range(n - 1)]
    left_perm = [(i + 1, i) for i in range(n - 1)]
    # my top interior slab -> right neighbor's bottom halo
    from_left = jax.lax.ppermute(w[:, :, -4:-2], axis_name, right_perm)
    # my bottom interior slab -> left neighbor's top halo
    from_right = jax.lax.ppermute(w[:, :, 2:4], axis_name, left_perm)
    has_left = (idx > 0)
    has_right = (idx < n - 1)
    w = w.at[:, :, 0:2].set(
        jnp.where(has_left, from_left, w[:, :, 0:2]))
    w = w.at[:, :, -2:].set(
        jnp.where(has_right, from_right, w[:, :, -2:]))
    return w


def fill_halos_sharded(w, metrics, prob: ShardedProblem,
                       ref: ReferenceState, winf):
    """BC -> local b2b -> BC -> cross-chip k exchange (see module doc)."""
    topo = prob.local_topo
    bs = topo.blocks[0]
    w = apply_bcs(w, metrics, bs.bc_ops, ref, winf)
    if topo.conn_ops:
        (w,) = exchange_halos_list([w], topo.conn_ops)
        w = apply_bcs(w, metrics, bs.bc_ops, ref, winf)
    w = exchange_k_halos(w, prob.mesh_axis)
    return w


def sharded_residual(w, metrics, prob: ShardedProblem, cfg: ProblemConfig,
                     ref: ReferenceState, winf, extras=None):
    """Local residual with cross-chip halo fill. Shapes as block_residual."""
    w = fill_halos_sharded(w, metrics, prob, ref, winf)
    return block_residual(w, metrics, cfg, ref, extras,
                          por=prob.local_topo.blocks[0].por)


def sharded_norms(r, axis_name: str, n_mean: int = 5):
    """Global residual 2-norms via psum (reference: mpi_allreduce of norms,
    solvers.F90 convergenceInfo)."""
    s_mean = jax.lax.psum(jnp.sum(r[..., :n_mean] ** 2), axis_name)
    if r.shape[-1] > n_mean:
        s_turb = jax.lax.psum(jnp.sum(r[..., n_mean:] ** 2), axis_name)
    else:
        s_turb = jnp.zeros((), r.dtype)
    return jnp.sqrt(s_mean), jnp.sqrt(s_turb)


def rk_iteration_sharded(w, metrics, prob: ShardedProblem, cfg: ProblemConfig,
                         ref, winf, cfl, extras=None,
                         coeffs: Sequence[float] = RK_COEFFS):
    """One multistage RK iteration on the local shard (cross-chip halos).
    Mirrors solvers/smoothers.py rk_iteration. Returns (w, r0, norms)."""
    w0 = fill_halos_sharded(w, metrics, prob, ref, winf)
    p = pressure(w0)
    dt = local_timestep(w0, p, metrics, cfl, cfg, ref)
    dtv = dt / metrics.vol[2:-2, 2:-2, 2:-2]
    por = prob.local_topo.blocks[0].por

    # point-implicit SA destruction damping — identical per-cell-local
    # treatment to smoothers.rk_iteration, so partition invariance holds
    diag = None
    nmf = 5
    if cfg.rans and cfg.turbulence_model == "sa" and extras is not None:
        from adflow_tpu.physics.sa import sa_destruction_diag
        diag = sa_destruction_diag(w0, metrics, extras["walldist"])
    inv_ts = None
    if cfg.rans and any(s != 1.0 for s in cfg.turb_scales):
        inv_ts = jnp.asarray([1.0 / s for s in cfg.turb_scales], w0.dtype)

    r0 = None
    wk = w0
    for alpha in coeffs:
        r = block_residual(wk, metrics, cfg, ref, extras, por=por)
        if r0 is None:
            r0 = r
        if r.shape[-1] > nmf and (diag is not None or inv_ts is not None):
            rt = r[..., nmf:]
            if inv_ts is not None:
                rt = rt * inv_ts
            if diag is not None:
                rt = rt / (1.0 + alpha * dtv * diag)[..., None]
            r = jnp.concatenate([r[..., :nmf], rt], axis=-1)
        upd = w0[2:-2, 2:-2, 2:-2] - alpha * dtv[..., None] * r
        wk = fill_halos_sharded(
            w0.at[2:-2, 2:-2, 2:-2].set(upd), metrics, prob, ref, winf)
    nm, nt = sharded_norms(r0, prob.mesh_axis)
    return wk, r0, jnp.stack([nm, nt])


def make_sharded_step(prob: ShardedProblem, cfg: ProblemConfig,
                      ref: ReferenceState, device_mesh: Mesh,
                      n_iters: int = 1, cfl: float = 1.5):
    """Build the jitted SPMD step: shard_map over the device mesh running
    ``n_iters`` RK iterations (lax.scan) + global norm reduction.

    Inputs are the stacked-shard state (shard_arrays) and stacked per-shard
    metrics (split_metrics); differentiable w.r.t. both.
    """
    ax = prob.mesh_axis
    spec_st = P(ax)          # stacked arrays: leading shard axis

    def local_step(w_s, metrics_s, winf_s, d_s):
        # shard_map keeps the leading (now size-1) stack axis: squeeze it.
        w = w_s[0]
        metrics = jax.tree.map(lambda a: a[0], metrics_s)
        extras = None if d_s is None else {"walldist": d_s[0]}

        def one(carry, _):
            w, = carry
            w, _r, norms = rk_iteration_sharded(
                w, metrics, prob, cfg, ref, winf_s, jnp.asarray(cfl), extras)
            return (w,), norms

        (w,), hist = jax.lax.scan(one, (w,), None, length=n_iters)
        return w_s.at[0].set(w), hist

    out_specs = (spec_st, P())

    def step(w_stack, metrics_stack, winf_arr, d_stack):
        if d_stack is None:
            fn = shard_map(
                lambda w, m, wi: local_step(w, m, wi, None),
                mesh=device_mesh, in_specs=(spec_st, spec_st, P()),
                out_specs=out_specs)
            return fn(w_stack, metrics_stack, winf_arr)
        fn = shard_map(
            local_step, mesh=device_mesh,
            in_specs=(spec_st, spec_st, P(), spec_st),
            out_specs=out_specs)
        return fn(w_stack, metrics_stack, winf_arr, d_stack)

    return step
