"""Block-to-block halo exchange via precomputed static gather tables.

Reference analogue: ``whalo1``/``whalo2`` + ``determineCommPattern``
(`/root/reference/src/utils/haloExchange.F90:5,109`,
`src/preprocessing/pointMatchedCommPattern.F90`): the reference precomputes
per-peer (block, i, j, k) send/recv lists once per MG level and replays them
with nonblocking MPI. Here the same precomputation produces *static index
arrays baked into the jitted step* (SURVEY.md §5.8): each ghost cell of each
connection knows its donor (block, cell) and the exchange is one gather.

On a device mesh the per-block arrays are stacked on a leading 'blocks' axis
and sharded; the gather becomes a collective handled by XLA (gather mode) or
an explicit ppermute ring (dist/sharded.py). Single-device multiblock uses
the same tables with plain jnp.take.

Corner/edge halos: ghost regions are enumerated over the tangentially
*extended* face window, and the fill sequence BC -> exchange -> BC (see
physics/residual.py) reproduces the reference's ordered-communication corner
handling (doc note at haloExchange.F90 whalo2).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import B2BConnection, Block, Face, MultiBlockMesh

H = 2


@dataclasses.dataclass(frozen=True)
class HaloTable:
    """Gather table for all b2b ghost cells of all blocks.

    dst_block[n], dst_flat[n]: ghost cell location (flat index into the
        halo-padded (NI+4)*(NJ+4)*(NK+4) cell space of its block)
    src_block[n], src_flat[n]: donor cell in the donor block's padded space
    rot[n]: index into ``rotations`` (0 = identity) applied to the momentum
        vector for periodic connections (communication.F90:59-80).
    """

    dst_block: np.ndarray
    dst_flat: np.ndarray
    src_block: np.ndarray
    src_flat: np.ndarray
    rot: np.ndarray
    rotations: np.ndarray  # (n_rot, 3, 3), rotations[0] = I
    padded_shape: Tuple[int, int, int]


def _lateral_window(rng_ax, dim, ext):
    """Tangential cell range for one lateral axis: the connection's rng
    window (full face if None), extended by ``ext`` only where the window
    touches the physical block end — interior ends are split seams whose
    ghosts belong to the sibling partial-face connection."""
    lo, hi = (0, dim) if rng_ax is None else rng_ax
    return (lo - (ext if lo == 0 else 0), hi + (ext if hi == dim else 0))


def _ghost_cells_for_face(face: Face, dims, ext: int = H, rng=None):
    """Cell coords (interior frame, may be negative) of the 2-deep ghost
    region behind ``face`` (restricted to the partial-face window ``rng``
    when given), extended ``ext`` cells tangentially."""
    ax = face.axis
    n = dims[ax]
    t_axes = [a for a in range(3) if a != ax]
    rngs = []
    for a in range(3):
        if a == ax:
            rngs.append(np.arange(n, n + H) if face.is_high
                        else np.arange(-H, 0))
        else:
            r = None if rng is None else rng[t_axes.index(a)]
            lo, hi = _lateral_window(r, dims[a], ext)
            rngs.append(np.arange(lo, hi))
    g = np.stack(np.meshgrid(*rngs, indexing="ij"), axis=-1)
    return g.reshape(-1, 3)


def build_halo_table(mesh: MultiBlockMesh,
                     padded_shape: Optional[Tuple[int, int, int]] = None
                     ) -> Optional[HaloTable]:
    """Precompute the exchange gather table (all blocks padded to a common
    halo-padded shape so flat indices are uniform — blocks ARE padded to
    buckets in the stacked solver state)."""
    if padded_shape is None:
        padded_shape = tuple(
            max(b.dims[a] for b in mesh.blocks) + 2 * H for a in range(3))
    dstb, dstf, srcb, srcf, rots = [], [], [], [], []
    rotations = [np.eye(3)]

    def flat(idx3, shape):
        return ((idx3[:, 0] * shape[1]) + idx3[:, 1]) * shape[2] + idx3[:, 2]

    for bi, blk in enumerate(mesh.blocks):
        for conn in blk.conns:
            donor = mesh.blocks[conn.donor_block]
            ghosts = _ghost_cells_for_face(conn.face, blk.dims,
                                           rng=conn.rng)
            # affine map into donor cell coords:
            # donor[|t|-1] = sign(t) * mine[m] + offset[m]
            d = np.zeros_like(ghosts)
            for m in range(3):
                t = conn.transform[m]
                d[:, abs(t) - 1] = np.sign(t) * ghosts[:, m] + conn.offset[m]
            # clamp donors into the donor's valid halo-padded range; cells
            # mapping outside (far corners of non-matching topology) read
            # the nearest valid cell — same spirit as the reference's
            # indirect-halo averaging fallback (haloExchange.F90:201)
            dpad = np.clip(d + H, 0,
                           np.array(donor.dims) + 2 * H - 1)
            gpad = ghosts + H
            dstb.append(np.full(len(ghosts), bi, np.int32))
            dstf.append(flat(gpad, padded_shape).astype(np.int32))
            srcb.append(np.full(len(ghosts), conn.donor_block, np.int32))
            srcf.append(flat(dpad, padded_shape).astype(np.int32))
            if conn.rotation is not None:
                rotations.append(np.asarray(conn.rotation))
                rid = len(rotations) - 1
            else:
                rid = 0
            rots.append(np.full(len(ghosts), rid, np.int32))

    if not dstb:
        return None
    return HaloTable(
        dst_block=np.concatenate(dstb), dst_flat=np.concatenate(dstf),
        src_block=np.concatenate(srcb), src_flat=np.concatenate(srcf),
        rot=np.concatenate(rots), rotations=np.stack(rotations),
        padded_shape=padded_shape)


# ---------------------------------------------------------------------------
# Box-to-box exchange for the per-block-list (unstacked) path: a 1-to-1
# connection maps a contiguous ghost box onto a contiguous donor box, so the
# exchange is pure slicing + axis permutation + flips — no gather at all.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConnOp:
    dst_block: int
    src_block: int
    dst_sl: Tuple[slice, slice, slice]
    src_sl: Tuple[slice, slice, slice]
    perm: Tuple[int, int, int]        # output axis m <- donor axis perm[m]
    rotation: Optional[np.ndarray] = None


def build_conn_ops(mesh: MultiBlockMesh, ext: int = H) -> List[ConnOp]:
    ops: List[ConnOp] = []
    for bi, blk in enumerate(mesh.blocks):
        dims = blk.dims
        for conn in blk.conns:
            donor = mesh.blocks[conn.donor_block]
            ax = conn.face.axis
            t_axes = [a for a in range(3) if a != ax]
            lo = [0, 0, 0]
            hi = [0, 0, 0]
            for a in range(3):
                if a == ax:
                    if conn.face.is_high:
                        lo[a], hi[a] = dims[a], dims[a] + H
                    else:
                        lo[a], hi[a] = -H, 0
                else:
                    r = (None if conn.rng is None
                         else conn.rng[t_axes.index(a)])
                    lo[a], hi[a] = _lateral_window(r, dims[a], ext)
            dst_sl = tuple(slice(l + H, h + H) for l, h in zip(lo, hi))
            src_sl = [None, None, None]
            perm = [0, 0, 0]
            for m in range(3):
                t = conn.transform[m]
                q = abs(t) - 1
                perm[m] = q
                if t > 0:
                    dlo = lo[m] + conn.offset[m]
                    dhi = hi[m] + conn.offset[m]
                    src_sl[q] = slice(dlo + H, dhi + H)
                else:
                    # descending donor coords as mine ascend
                    dhi_incl = -lo[m] + conn.offset[m]
                    dlo_incl = -(hi[m] - 1) + conn.offset[m]
                    stop = dlo_incl + H - 1
                    src_sl[q] = slice(dhi_incl + H, None if stop < 0 else stop,
                                      -1)
                # sanity: stay inside the donor's padded array
                dd = donor.dims[q]
                s = src_sl[q]
                if s.step in (None, 1):
                    assert 0 <= s.start and s.stop <= dd + 2 * H, (bi, conn)
                else:
                    assert s.start <= dd + 2 * H - 1, (bi, conn)
            ops.append(ConnOp(
                dst_block=bi, src_block=conn.donor_block, dst_sl=dst_sl,
                src_sl=tuple(src_sl), perm=tuple(perm),
                rotation=(None if conn.rotation is None
                          else np.asarray(conn.rotation))))
    return ops


def exchange_halos_list(w_list: List[jnp.ndarray], ops: Sequence[ConnOp]
                        ) -> List[jnp.ndarray]:
    """Exchange b2b halos for per-block arrays (list of (ni+4, nj+4, nk+4,
    nv)). Reads all sources before any write, like the reference's
    buffered sends (haloExchange.F90)."""
    patches = []
    for op in ops:
        src = w_list[op.src_block][op.src_sl]
        src = jnp.transpose(src, axes=(*op.perm, 3))
        if op.rotation is not None and src.shape[-1] >= 4:
            rotm = jnp.asarray(op.rotation, src.dtype)
            mom = jnp.einsum("ab,ijkb->ijka", rotm, src[..., 1:4])
            src = jnp.concatenate([src[..., :1], mom, src[..., 4:]], axis=-1)
        patches.append(src)
    out = list(w_list)
    for op, patch in zip(ops, patches):
        out[op.dst_block] = out[op.dst_block].at[op.dst_sl].set(patch)
    return out


def exchange_halos(w_stack: jnp.ndarray, table: Optional[HaloTable]
                   ) -> jnp.ndarray:
    """Fill b2b ghost cells. w_stack: (nblocks, NI+4, NJ+4, NK+4, nv) with
    every block padded to the common shape. Pure gather/scatter with static
    indices; nv is arbitrary (state, gradients, coordinates...)."""
    if table is None:
        return w_stack
    nb = w_stack.shape[0]
    nv = w_stack.shape[-1]
    flat = w_stack.reshape(nb, -1, nv)
    src = flat[table.src_block, table.src_flat]          # (n, nv)
    if len(table.rotations) > 1 and nv >= 4:
        rotm = jnp.asarray(table.rotations, w_stack.dtype)[table.rot]
        mom = jnp.einsum("nab,nb->na", rotm, src[:, 1:4])
        src = jnp.concatenate([src[:, :1], mom, src[:, 4:]], axis=-1)
    flat = flat.at[table.dst_block, table.dst_flat].set(src)
    return flat.reshape(w_stack.shape)
