"""Blocks over chips: stacked multi-block state sharded on a block axis.

Reference analogue: ADflow's load balancing + halo exchange
(`/root/reference/src/partitioning/loadBalance.F90:5` loadBalanceGrid,
`:677 splitBlockInitialization`, `:880 splitBlocksLoadBalance`,
`src/utils/haloExchange.F90:109 whalo2`): CGNS blocks are split until they
can be distributed evenly over MPI ranks, then each rank owns an arbitrary
set of blocks and replays precomputed send/recv lists.

TPU-native equivalent (SURVEY.md §2.2, §2.10): blocks are padded to ONE
bucket shape and stacked on a leading axis that is sharded over the device
mesh (`jax.sharding.NamedSharding(mesh, P("b"))`). The entire step is a
single logical JAX program — the b2b halo exchange is one static gather
over the stacked array (dist/halo.py HaloTable) and residual norms are
plain `jnp.linalg.norm`; GSPMD partitions the program and inserts the
cross-chip collectives (all-to-all for the gather, psum for norms). No
hand-written shard_map/ppermute needed on this path, and it generalizes to
any number of blocks per chip.

Block splitting (`split_block`) is general: any block of an arbitrary
multiblock mesh can be cut, with every connection whose donor was the cut
block remapped onto the parts — straddling windows become partial-face
(``rng``) connections (the donor-side remapping of
loadBalance.F90:880 splitBlocksLoadBalance). The only restriction is that
a cut may not pass through the 2-deep ghost window of a connected face
normal to the cut (the balance driver keeps cuts >= 2 cells from faces).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import (
    B2BConnection, BCSubface, Block, Face, MultiBlockMesh)
from adflow_tpu.core.refstate import ReferenceState
from adflow_tpu.dist.halo import HaloTable, build_halo_table, exchange_halos
from adflow_tpu.geom.metrics import BlockMetrics, compute_metrics
from adflow_tpu.physics.bc import apply_bcs, build_bc_ops
from adflow_tpu.physics.residual import (
    ProblemConfig, _build_porosities, block_residual)
from adflow_tpu.physics.thermo import pressure
from adflow_tpu.physics.timestep import local_timestep
from adflow_tpu.solvers.smoothers import RK_COEFFS

H = 2


# ---------------------------------------------------------------------------
# block splitting (loadBalance.F90:677 splitBlockInitialization analogue)
# ---------------------------------------------------------------------------

def _clip_rng(rng, lo, hi):
    """Intersect a half-open range with [lo, hi); None if empty."""
    a0, a1 = max(rng[0], lo), min(rng[1], hi)
    return (a0 - lo, a1 - lo) if a1 > a0 else None


_OLD_DONOR = -12345   # phase-A sentinel: "donor is the pre-split block"


def _remap_donor_conn(c: B2BConnection, rec_dims, bi: int, new_index: int,
                      axis: int, cut: int, n_axis: int
                      ) -> List[B2BConnection]:
    """Split/retarget one connection whose donor was the pre-split block.

    Reference analogue: donor-side remapping of 1-to-1 subfaces when a
    block is split for load balance (loadBalance.F90:880
    splitBlocksLoadBalance). The receiver's ghost window maps affinely to
    donor coords (donor[|t|-1] = sign(t)*mine + offset); the receiver axis
    m* with |transform[m*]|-1 == axis controls the donor's split-axis
    coordinate, so partitioning the m* range at the cut yields at most two
    partial-face connections, each retargeted to one part (part-1 donors
    renumbered by -cut through offset[m*]).
    """
    ax = c.face.axis
    t_axes = [a for a in range(3) if a != ax]
    rng = c.rng or ((0, rec_dims[t_axes[0]]), (0, rec_dims[t_axes[1]]))
    ranges = {ax: ((rec_dims[ax], rec_dims[ax] + 2) if c.face.is_high
                   else (-2, 0)),
              t_axes[0]: tuple(rng[0]), t_axes[1]: tuple(rng[1])}
    mstar = next(m for m in range(3) if abs(c.transform[m]) - 1 == axis)
    s = 1 if c.transform[mstar] > 0 else -1
    mlo, mhi = ranges[mstar]
    d_ends = (s * mlo + c.offset[mstar], s * (mhi - 1) + c.offset[mstar])
    dlo, dhi = min(d_ends), max(d_ends) + 1

    out: List[B2BConnection] = []
    for plo, phi, donor_idx, dshift in ((0, cut, bi, 0),
                                        (cut, n_axis, new_index, -cut)):
        # the depth direction may legitimately reach past the donor's ends
        # (2nd ghost layer beyond a donor of depth < 2 never happens for
        # cut in [2, n-2]); clamp the partition windows to the donor range
        a0, a1 = max(dlo, plo), min(dhi, phi)
        if a0 >= a1:
            continue
        if s > 0:
            m0, m1 = a0 - c.offset[mstar], a1 - c.offset[mstar]
        else:
            m0, m1 = (c.offset[mstar] - a1 + 1, c.offset[mstar] - a0 + 1)
        off = list(c.offset)
        off[mstar] = off[mstar] + dshift
        if mstar == ax:
            # the ghost DEPTH maps onto the split axis: the 2-deep window
            # must land entirely inside one part (guaranteed by the
            # balance driver's cut-margin rule)
            if (m0, m1) != ranges[ax]:
                raise NotImplementedError(
                    "cut passes through a connected face's ghost depth "
                    "(choose a cut >= 2 cells from connected faces)")
            newrng = c.rng
        else:
            pos = t_axes.index(mstar)
            r = [list(rng[0]), list(rng[1])]
            r[pos] = [max(r[pos][0], m0), min(r[pos][1], m1)]
            if r[pos][0] >= r[pos][1]:
                continue
            newrng = (tuple(r[0]), tuple(r[1]))
        out.append(dataclasses.replace(
            c, donor_block=donor_idx, offset=tuple(off), rng=newrng))
    if not out:
        raise ValueError("donor remap produced no pieces (bad topology)")
    return out


def split_block(mesh: MultiBlockMesh, bi: int, axis: int, cut: int
                ) -> MultiBlockMesh:
    """Split block ``bi`` at interior cell index ``cut`` along ``axis``.

    Part 0 keeps cells [0, cut), part 1 (appended at the end) gets
    [cut, n). An internal 1-to-1 connection stitches them; every
    connection (of any block, including self-wraps) whose donor was ``bi``
    is remapped onto the parts, splitting into partial-face (``rng``)
    connections where the window straddles the cut
    (loadBalance.F90:880 donor remapping).
    """
    blk = mesh.blocks[bi]
    n = blk.dims[axis]
    if not (0 < cut < n):
        raise ValueError(f"cut {cut} outside (0, {n})")
    new_index = len(mesh.blocks)

    def part_block(part: int) -> Block:
        lo = 0 if part == 0 else cut
        hi = cut if part == 0 else n
        xsl = [slice(None)] * 3
        xsl[axis] = slice(lo, hi + 1)
        x = blk.x[tuple(xsl)]

        bcs: List[BCSubface] = []
        for sf in blk.bcs:
            ax = sf.face.axis
            if ax == axis:
                # stays with the part that owns that face
                if (sf.face.is_high and part == 1) or \
                        (not sf.face.is_high and part == 0):
                    bcs.append(dataclasses.replace(sf))
                continue
            o1, o2 = [a for a in range(3) if a != ax]
            rng = sf.rng or ((0, blk.dims[o1]), (0, blk.dims[o2]))
            r = [list(rng[0]), list(rng[1])]
            pos = 0 if o1 == axis else 1
            clipped = _clip_rng(tuple(r[pos]), lo, hi)
            if clipped is None:
                continue
            r[pos] = list(clipped)
            bcs.append(dataclasses.replace(
                sf, rng=(tuple(r[0]), tuple(r[1]))))

        conns: List[B2BConnection] = []
        for c in blk.conns:
            ax = c.face.axis
            donor = _OLD_DONOR if c.donor_block == bi else c.donor_block
            if ax == axis:
                if (c.face.is_high) != (part == 1):
                    continue
                off = list(c.offset)
                if part == 1:
                    # receiver renumbering: coords along the split axis
                    # shift by -cut; mine_old = mine_new + cut enters the
                    # affine map through the axis component's offset
                    s = 1 if c.transform[axis] > 0 else -1
                    off[axis] = off[axis] + s * cut
                conns.append(dataclasses.replace(
                    c, donor_block=donor, offset=tuple(off)))
                continue
            # lateral face: clip the window to this part, shift frame
            o1, o2 = [a for a in range(3) if a != ax]
            rng = c.rng or ((0, blk.dims[o1]), (0, blk.dims[o2]))
            r = [list(rng[0]), list(rng[1])]
            pos = 0 if o1 == axis else 1
            clipped = _clip_rng(tuple(r[pos]), lo, hi)
            if clipped is None:
                continue
            r[pos] = list(clipped)
            off = list(c.offset)
            if part == 1:
                s = 1 if c.transform[axis] > 0 else -1
                off[axis] = off[axis] + s * cut
            conns.append(dataclasses.replace(
                c, donor_block=donor, offset=tuple(off),
                rng=(tuple(r[0]), tuple(r[1]))))

        # internal stitch connection
        my_face = Face(2 * axis + (1 if part == 0 else 0))
        off = [0, 0, 0]
        off[axis] = -cut if part == 0 else cut
        conns.append(B2BConnection(
            face=my_face, donor_block=(new_index if part == 0 else bi),
            donor_face=Face(2 * axis + (0 if part == 0 else 1)),
            transform=(1, 2, 3), offset=tuple(off)))
        return Block(name=f"{blk.name}_s{part}", x=x, bcs=bcs, conns=conns)

    blocks = list(mesh.blocks)
    blocks[bi] = part_block(0)
    blocks.append(part_block(1))

    # phase B: remap every connection whose donor was the old block
    out_blocks: List[Block] = []
    for rbi, b in enumerate(blocks):
        newconns: List[B2BConnection] = []
        changed = False
        for c in b.conns:
            needs = (c.donor_block == _OLD_DONOR
                     or (c.donor_block == bi and rbi not in (bi, new_index)))
            if not needs:
                newconns.append(c)
                continue
            changed = True
            c0 = (dataclasses.replace(c, donor_block=bi)
                  if c.donor_block == _OLD_DONOR else c)
            newconns.extend(_remap_donor_conn(
                c0, b.dims, bi, new_index, axis, cut, n))
        out_blocks.append(
            dataclasses.replace(b, conns=newconns) if changed else b)
    return MultiBlockMesh(out_blocks, name=mesh.name)


def balance_blocks(mesh: MultiBlockMesh, n_chips: int,
                   max_imbalance: float = 1.25
                   ) -> Tuple[MultiBlockMesh, List[int]]:
    """Split oversized blocks and order them so chip c owns a contiguous,
    equal-count slice of the stacked block axis (greedy LPT assignment;
    reference: loadBalanceGrid, loadBalance.F90:5).

    Returns (mesh, order): ``order[pos]`` = original block index for stack
    position pos; dummy positions (padding to equal count) are -1.
    """
    m = mesh
    total = m.n_cells
    target = total / n_chips
    # split until no block exceeds max_imbalance * target (and we have at
    # least n_chips blocks)
    guard = 0
    while True:
        sizes = [b.n_cells for b in m.blocks]
        big = int(np.argmax(sizes))
        if (len(m.blocks) >= n_chips
                and sizes[big] <= max_imbalance * target):
            break
        blk = m.blocks[big]
        for axis in sorted(range(3), key=lambda a: -blk.dims[a]):
            if blk.dims[axis] < 2:
                continue
            try:
                m = split_block(m, big, axis, blk.dims[axis] // 2)
                break
            except NotImplementedError:
                continue
        else:
            break
        guard += 1
        if guard > 64:
            break

    # greedy LPT: biggest block to least-loaded chip
    sizes = [b.n_cells for b in m.blocks]
    order_desc = np.argsort(sizes)[::-1]
    bins: List[List[int]] = [[] for _ in range(n_chips)]
    loads = np.zeros(n_chips)
    for b in order_desc:
        c = int(np.argmin(loads))
        bins[c].append(int(b))
        loads[c] += sizes[b]
    per = max(len(bn) for bn in bins)
    order: List[int] = []
    for bn in bins:
        order.extend(bn + [-1] * (per - len(bn)))
    return m, order


# ---------------------------------------------------------------------------
# stacked problem
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StackedProblem:
    """Static data for the stacked multi-block solve."""

    nb: int                                # stack length (incl. dummies)
    bucket: Tuple[int, int, int]           # bucket interior dims
    block_dims: Tuple[Tuple[int, int, int], ...]   # per-slot real dims
    active: Tuple[bool, ...]
    bc_ops: Tuple[tuple, ...]              # per-slot BCOp tuples
    halo: Optional[HaloTable]
    por: Tuple[np.ndarray, np.ndarray, np.ndarray]  # stacked (B, ...) masks
    mask: np.ndarray                       # (B, NI, NJ, NK) interior mask
    order: Tuple[int, ...]                 # stack slot -> original block


def build_stacked_problem(mesh: MultiBlockMesh,
                          order: Optional[Sequence[int]] = None
                          ) -> StackedProblem:
    if order is None:
        order = list(range(len(mesh.blocks)))
    NI = max(b.dims[0] for b in mesh.blocks)
    NJ = max(b.dims[1] for b in mesh.blocks)
    NK = max(b.dims[2] for b in mesh.blocks)
    bucket = (NI, NJ, NK)
    nb = len(order)

    # reorder blocks into stack order; halo table must see the same order,
    # so build a reordered mesh (conn donor indices remapped)
    remap = {orig: pos for pos, orig in enumerate(order) if orig >= 0}
    stack_blocks: List[Optional[Block]] = []
    for orig in order:
        if orig < 0:
            stack_blocks.append(None)
            continue
        blk = mesh.blocks[orig]
        conns = [dataclasses.replace(c, donor_block=remap[c.donor_block])
                 for c in blk.conns]
        stack_blocks.append(dataclasses.replace(blk, conns=conns))

    real = [b for b in stack_blocks if b is not None]
    # build the halo table on a mesh of the stacked order; dummy slots have
    # no connections so we temporarily substitute unit blocks
    def unit_block(i):
        x = np.zeros((2, 2, 2, 3))
        x[..., 0] = np.arange(2)[:, None, None]
        x[..., 1] = np.arange(2)[None, :, None]
        x[..., 2] = np.arange(2)[None, None, :]
        return Block(name=f"dummy{i}", x=x, bcs=[], conns=[])

    mesh_stacked = MultiBlockMesh(
        [b if b is not None else unit_block(i)
         for i, b in enumerate(stack_blocks)], name=mesh.name)
    halo = build_halo_table(mesh_stacked,
                            padded_shape=(NI + 2 * H, NJ + 2 * H, NK + 2 * H))

    porI = np.zeros((nb, NI + 1, NJ, NK), np.float32)
    porJ = np.zeros((nb, NI, NJ + 1, NK), np.float32)
    porK = np.zeros((nb, NI, NJ, NK + 1), np.float32)
    mask = np.zeros((nb, NI, NJ, NK), np.float32)
    bc_ops = []
    dims_out = []
    active = []
    for i, b in enumerate(stack_blocks):
        if b is None:
            bc_ops.append(())
            dims_out.append((1, 1, 1))
            active.append(False)
            continue
        ni, nj, nk = b.dims
        pi, pj, pk = _build_porosities(b)
        if pi is None:
            pi = np.ones((ni + 1, nj, nk), np.float32)
            pj = np.ones((ni, nj + 1, nk), np.float32)
            pk = np.ones((ni, nj, nk + 1), np.float32)
        porI[i, :ni + 1, :nj, :nk] = pi
        porJ[i, :ni, :nj + 1, :nk] = pj
        porK[i, :ni, :nj, :nk + 1] = pk
        mask[i, :ni, :nj, :nk] = 1.0
        bc_ops.append(tuple(build_bc_ops(b)))
        dims_out.append(b.dims)
        active.append(True)
    return StackedProblem(
        nb=nb, bucket=bucket, block_dims=tuple(dims_out),
        active=tuple(active), bc_ops=tuple(bc_ops), halo=halo,
        por=(porI, porJ, porK), mask=mask, order=tuple(order))


def stack_metrics(mesh: MultiBlockMesh, prob: StackedProblem, dtype
                  ) -> BlockMetrics:
    """Per-slot metrics embedded at the low corner of bucket-shaped arrays.

    Pad region: unit volumes, zero face areas, edge-replicated centers —
    fluxes vanish there and nothing divides by zero; the residual mask
    removes any leftovers.
    """
    NI, NJ, NK = prob.bucket
    nb = prob.nb
    f = np.float64 if dtype == jnp.float64 else np.float32
    siE = np.zeros((nb, NI + 3, NJ + 2, NK + 2, 3), f)
    sjE = np.zeros((nb, NI + 2, NJ + 3, NK + 2, 3), f)
    skE = np.zeros((nb, NI + 2, NJ + 2, NK + 3, 3), f)
    vol = np.ones((nb, NI + 4, NJ + 4, NK + 4), f)
    xc = np.zeros((nb, NI + 2, NJ + 2, NK + 2, 3), f)
    # distinct pad coordinates so face-gradient distances never vanish
    xc[..., 0] = 1e3 + np.arange(NI + 2, dtype=f)[None, :, None, None]
    xc[..., 1] = 1e3 + np.arange(NJ + 2, dtype=f)[None, None, :, None]
    xc[..., 2] = 1e3 + np.arange(NK + 2, dtype=f)[None, None, None, :]
    # TRUE ghost metrics at b2b faces (xhalo analogue) — required for
    # split/partition invariance of JST radii + viscous ghost gradients
    from adflow_tpu.geom.metrics import compute_metrics_conn
    x_all = [jnp.asarray(b.x, dtype) for b in mesh.blocks]
    metrics_all = compute_metrics_conn(mesh.blocks, x_all)
    for pos, orig in enumerate(prob.order):
        if orig < 0:
            continue
        m = metrics_all[orig]
        ni, nj, nk = mesh.blocks[orig].dims
        siE[pos, :ni + 3, :nj + 2, :nk + 2] = np.asarray(m.siE)
        sjE[pos, :ni + 2, :nj + 3, :nk + 2] = np.asarray(m.sjE)
        skE[pos, :ni + 2, :nj + 2, :nk + 3] = np.asarray(m.skE)
        vol[pos, :ni + 4, :nj + 4, :nk + 4] = np.asarray(m.vol)
        xc[pos, :ni + 2, :nj + 2, :nk + 2] = np.asarray(m.xc_ext)
    return BlockMetrics(siE=jnp.asarray(siE), sjE=jnp.asarray(sjE),
                        skE=jnp.asarray(skE), vol=jnp.asarray(vol),
                        xc_ext=jnp.asarray(xc))


def stack_state(prob: StackedProblem, winf, dtype) -> jnp.ndarray:
    NI, NJ, NK = prob.bucket
    nw = len(np.asarray(winf))
    w = np.broadcast_to(np.asarray(winf, np.float64),
                        (prob.nb, NI + 4, NJ + 4, NK + 4, nw)).copy()
    return jnp.asarray(w, dtype)


def stack_walldist(mesh: MultiBlockMesh, prob: StackedProblem, d_by_orig,
                   dtype) -> jnp.ndarray:
    """Stack per-original-block wall distances (one-ring ext arrays)."""
    NI, NJ, NK = prob.bucket
    out = np.full((prob.nb, NI + 2, NJ + 2, NK + 2), 1.0, np.float64)
    for pos, orig in enumerate(prob.order):
        if orig < 0:
            continue
        d = np.asarray(d_by_orig[orig])
        ni, nj, nk = mesh.blocks[orig].dims
        out[pos, :ni + 2, :nj + 2, :nk + 2] = d
    return jnp.asarray(out, dtype)


def _slot_metrics(sm: BlockMetrics, b: int) -> BlockMetrics:
    return BlockMetrics(siE=sm.siE[b], sjE=sm.sjE[b], skE=sm.skE[b],
                        vol=sm.vol[b], xc_ext=sm.xc_ext[b])


def fill_halos_stacked(w, sm: BlockMetrics, prob: StackedProblem,
                       ref: ReferenceState, winf) -> jnp.ndarray:
    """BC -> b2b exchange -> BC on the stacked state (the ordered corner
    fill of physics/residual.py fill_halos, now one gather for all
    connections; reference: whalo2 + applyAllBC ordering)."""
    def bc_pass(w):
        for b in range(prob.nb):
            if not prob.bc_ops[b]:
                continue
            wb = apply_bcs(w[b], _slot_metrics(sm, b), prob.bc_ops[b],
                           ref, winf)
            w = w.at[b].set(wb)
        return w

    w = bc_pass(w)
    if prob.halo is not None:
        w = exchange_halos(w, prob.halo)
        w = bc_pass(w)
    return w


def stacked_residual(w, sm: BlockMetrics, prob: StackedProblem,
                     cfg: ProblemConfig, ref: ReferenceState, winf,
                     extras=None, fill: bool = True) -> jnp.ndarray:
    """Masked residual (B, NI, NJ, NK, nw) of the stacked state."""
    if fill:
        w = fill_halos_stacked(w, sm, prob, ref, winf)
    porI, porJ, porK = (jnp.asarray(p, w.dtype) for p in prob.por)

    def one(wb, smb, pi, pj, pk, dxb):
        ex = None if dxb is None else {"walldist": dxb}
        return block_residual(wb, smb, cfg, ref, ex, por=(pi, pj, pk))

    d = None if extras is None else extras.get("walldist")
    in_axes = (0, 0, 0, 0, 0, None if d is None else 0)
    r = jax.vmap(one, in_axes=in_axes)(w, sm, porI, porJ, porK, d)
    # select (not multiply): pad/dummy cells can produce non-finite values
    # whose TANGENTS would survive a mask multiply (NaN * 0 = NaN in jvp);
    # where() blocks both primal and tangent of the dead branch
    mask = jnp.asarray(prob.mask, w.dtype)[..., None]
    return jnp.where(mask > 0, r, 0.0)


def make_stacked_rk_step(prob: StackedProblem, cfg: ProblemConfig,
                         ref: ReferenceState, cfl: float = 1.5,
                         coeffs=RK_COEFFS):
    """One multistage RK iteration over the stacked blocks (mirrors
    solvers/smoothers.py rk_iteration). Shard w/metrics on the leading axis
    and jit — GSPMD inserts the halo-gather collectives."""

    def step(w, sm, winf, extras=None):
        w0 = fill_halos_stacked(w, sm, prob, ref, winf)
        p = pressure(w0)

        def ts(wb, pb, smb):
            return local_timestep(wb, pb, smb, jnp.asarray(cfl, w.dtype),
                                  cfg, ref)

        dt = jax.vmap(ts)(w0, p, sm)
        dtv = dt / sm.vol[:, 2:-2, 2:-2, 2:-2]
        mask = jnp.asarray(prob.mask, w.dtype)[..., None]
        # pad/dummy cells have zero face areas -> infinite local dt; the
        # masked update would still produce inf*0 = NaN, so zero dtv there
        dtv = jnp.where(mask[..., 0] > 0, dtv, 0.0)

        nmf = 5
        inv_ts = None
        if cfg.rans and any(s != 1.0 for s in cfg.turb_scales):
            inv_ts = jnp.asarray([1.0 / s for s in cfg.turb_scales], w.dtype)
        diag = None
        if cfg.rans and cfg.turbulence_model == "sa" and extras is not None:
            from adflow_tpu.physics.sa import sa_destruction_diag

            def dd(wb, smb, db):
                return sa_destruction_diag(wb, smb, db)

            diag = jax.vmap(dd)(w0, sm, extras["walldist"])

        r0 = None
        wk = w0
        for alpha in coeffs:
            r = stacked_residual(wk, sm, prob, cfg, ref, winf, extras,
                                 fill=False)
            if r0 is None:
                r0 = r
            if r.shape[-1] > nmf and (diag is not None or inv_ts is not None):
                rt = r[..., nmf:]
                if inv_ts is not None:
                    rt = rt * inv_ts
                if diag is not None:
                    rt = rt / (1.0 + alpha * dtv * diag)[..., None]
                r = jnp.concatenate([r[..., :nmf], rt], axis=-1)
            upd = w0[:, 2:-2, 2:-2, 2:-2] - alpha * dtv[..., None] * r * mask
            wk = fill_halos_stacked(
                w0.at[:, 2:-2, 2:-2, 2:-2].set(upd), sm, prob, ref, winf)
        nm = jnp.linalg.norm(r0[..., :nmf])
        nt = (jnp.linalg.norm(r0[..., nmf:]) if r0.shape[-1] > nmf
              else jnp.zeros((), w.dtype))
        return wk, jnp.stack([nm, nt])

    return step


def stacked_ank_step(w, sm, prob: StackedProblem, cfg: ProblemConfig,
                     ref: ReferenceState, winf, cfl, extras=None,
                     m: int = 20, lintol: float = 0.05):
    """One ANK step on the stacked state: backward-Euler diagonal +
    matrix-free GMRES, mirroring solvers/newton.py make_ank_step. Pure
    global program — under a sharded jit the Krylov dots/norms psum via
    GSPMD (the reference's parallel PETSc KSP)."""
    from adflow_tpu.physics.fluxes import spectral_radii
    from adflow_tpu.physics.timestep import viscous_spectral_radii
    from adflow_tpu.solvers.krylov import gmres
    from adflow_tpu.physics.thermo import IRHO, IRHOE

    NI, NJ, NK = prob.bucket
    nw = w.shape[-1]
    maskv = jnp.asarray(prob.mask, w.dtype)[..., None]

    def res_flat(wvec):
        ws = w.at[:, 2:-2, 2:-2, 2:-2].set(
            wvec.reshape(prob.nb, NI, NJ, NK, nw))
        r = stacked_residual(ws, sm, prob, cfg, ref, winf, extras)
        return r.reshape(-1)

    wvec = w[:, 2:-2, 2:-2, 2:-2].reshape(-1)
    r = res_flat(wvec)
    rnorm = jnp.linalg.norm(r)

    wf = fill_halos_stacked(w, sm, prob, ref, winf)

    def rad(wb, smb):
        p = jnp.maximum(pressure(wb), 1e-10)
        rI, rJ, rK = spectral_radii(wb, p, smb, cfg.ls_precon_mach)
        rs = (rI + rJ + rK)[1:-1, 1:-1, 1:-1]
        if cfg.viscous:
            rv = viscous_spectral_radii(wb, smb, cfg, ref)
            rs = rs + 4.0 * (rv[0] + rv[1] + rv[2])
        return rs

    rs = jax.vmap(rad)(wf, sm)
    chan = jnp.ones((nw,), w.dtype)
    rsv = cfg.row_scale(w.dtype)
    if rsv is not None:
        chan = chan * rsv
    # pad cells: diag = 1, residual = 0 -> those DOFs solve to 0 exactly
    diag_cells = jnp.where(jnp.asarray(prob.mask, w.dtype) > 0,
                           rs / cfl, 1.0)
    diag = (diag_cells[..., None] * chan * jnp.maximum(maskv, 0.0)
            + (1.0 - maskv)).reshape(-1)

    def matvec(v):
        _, jv = jax.jvp(res_flat, (wvec,), (v,))
        return diag * v + jv

    # line-implicit PC vmapped over the stacked block axis (the same
    # solvers/linpc.py PC the single-device ANK uses; under a sharded jit
    # each device factors only its own slots — the reference's per-rank
    # ASM+ILU locality). Pad/dummy rows pass through identity.
    from adflow_tpu.solvers.linpc import build_line_pc, line_pc_apply

    def build_slot(wb, smb, rsb):
        return build_line_pc(wb, smb, cfg, ref, dtinv=rsb / cfl,
                             axes=(1, 0, 2), kappa=0.25)

    pc_data = jax.vmap(build_slot)(wf, sm, rs)

    def precond(v):
        vb = v.reshape(prob.nb, NI, NJ, NK, nw)
        out = jax.vmap(line_pc_apply)(pc_data, vb)
        out = jnp.where(maskv > 0, out, vb)
        return out.reshape(-1)

    sol = gmres(matvec, -r, m=m, restarts=2, tol=lintol, precond=precond)

    dw = sol.x.reshape(prob.nb, NI, NJ, NK, nw)
    wi = wvec.reshape(prob.nb, NI, NJ, NK, nw)
    alpha0 = jnp.asarray(1.0, w.dtype)
    msk = jnp.asarray(prob.mask, w.dtype)
    for idx in (IRHO, IRHOE):
        rel = jnp.max(msk * jnp.abs(dw[..., idx])
                      / jnp.maximum(jnp.abs(wi[..., idx]), 1e-12))
        alpha0 = jnp.minimum(alpha0, 0.2 / jnp.maximum(rel, 0.2))
    if nw > 5:
        neg = jnp.max(msk * (-dw[..., 5])
                      / jnp.maximum(jnp.abs(wi[..., 5]), 1e-12))
        alpha0 = jnp.minimum(alpha0, 0.99 / jnp.maximum(neg, 0.99))

    def merit(a):
        return jnp.linalg.norm(diag * (a * sol.x)
                               + res_flat(wvec + a * sol.x))

    alphas = [alpha0, 0.5 * alpha0, 0.25 * alpha0]
    merits = jnp.stack([merit(a) for a in alphas])
    best = jnp.argmin(jnp.where(jnp.isfinite(merits), merits, jnp.inf))
    alpha = jnp.stack(alphas)[best]
    wnew_vec = wvec + alpha * sol.x
    rnew = jnp.linalg.norm(res_flat(wnew_vec))
    w_out = w.at[:, 2:-2, 2:-2, 2:-2].set(
        wnew_vec.reshape(prob.nb, NI, NJ, NK, nw))
    return w_out, rnorm, rnew, sol.res_norm / jnp.maximum(sol.b_norm, 1e-30)


def stack_from_list(prob: StackedProblem, w_list, winf,
                    dtype) -> jnp.ndarray:
    """Stack per-block (halo-padded) states into the (B, NI+4, ...) array
    (dummy slots and pad cells hold free stream)."""
    w = stack_state(prob, winf, dtype)
    for pos, orig in enumerate(prob.order):
        if orig < 0:
            continue
        ni, nj, nk = prob.block_dims[pos]
        w = w.at[pos, 2:2 + ni, 2:2 + nj, 2:2 + nk].set(
            jnp.asarray(w_list[orig][2:-2, 2:-2, 2:-2], dtype))
    return w


def unstack_to_list(prob: StackedProblem, w, w_list):
    """Scatter stacked interiors back into the per-block state list."""
    out = list(w_list)
    for pos, orig in enumerate(prob.order):
        if orig < 0:
            continue
        ni, nj, nk = prob.block_dims[pos]
        out[orig] = w_list[orig].at[2:-2, 2:-2, 2:-2].set(
            w[pos, 2:2 + ni, 2:2 + nj, 2:2 + nk].astype(
                w_list[orig].dtype))
    return out
