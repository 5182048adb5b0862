"""Finite-volume metrics: face area vectors, volumes, cell centers.

Reference analogue: ``metric`` / ``volume_block`` / ``metric_block``
(`/root/reference/src/preprocessing/preprocessingAPI.F90` and
`src/adjoint/adjointExtra.F90:5,179`). Face areas use the diagonal cross
product (exact for bilinear faces); volumes use the divergence theorem over
the 6 faces, which telescopes so block volumes sum exactly.

All functions are jittable and differentiable w.r.t. node coordinates —
this is the geometry leg of the adjoint chain (the reference needed
hand-differentiated twins in adjointExtra.F90; here jax.vjp handles it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockMetrics(NamedTuple):
    """Metrics for one block with ni x nj x nk cells.

    Face areas are stored on the ONE-RING EXTENDED grid (halo faces) so a
    block that is a shard of a larger domain can carry its neighbors' true
    interface metrics (dist/sharded.py split_metrics) — a single free block
    fills the ring by edge replication (reference mirrors halo metrics in
    metric.F90). Properties si/sj/sk expose the interior views.

    siE: (ni+3, nj+2, nk+2, 3)  +i-face area vectors, faces -1..ni+1 over
         cells -1..nj / -1..nk
    sjE: (ni+2, nj+3, nk+2, 3)
    skE: (ni+2, nj+2, nk+3, 3)
    vol: (ni+4, nj+4, nk+4) cell volumes, halo layers mirrored (or true for
         shard interfaces)
    xc_ext: (ni+2, nj+2, nk+2, 3) cell centers on the one-ring extended
        grid; ghost centers mirrored across face centers (viscous
        face-gradient correction distances)
    """

    siE: jnp.ndarray
    sjE: jnp.ndarray
    skE: jnp.ndarray
    vol: jnp.ndarray
    xc_ext: jnp.ndarray
    # Optional ALE grid-face VELOCITY vectors on the same extended grids
    # (reference: sFaceI/J/K + grid velocities, solverUtils.F90:358-1193).
    # None => static mesh. Normal face speed used by the fluxes is vf . S.
    vfIE: object = None
    vfJE: object = None
    vfKE: object = None

    @property
    def si(self) -> jnp.ndarray:
        """(ni+1, nj, nk, 3) interior i-face areas."""
        return self.siE[1:-1, 1:-1, 1:-1]

    @property
    def sj(self) -> jnp.ndarray:
        return self.sjE[1:-1, 1:-1, 1:-1]

    @property
    def sk(self) -> jnp.ndarray:
        return self.skE[1:-1, 1:-1, 1:-1]

    @property
    def vfI(self):
        return None if self.vfIE is None else self.vfIE[1:-1, 1:-1, 1:-1]

    @property
    def vfJ(self):
        return None if self.vfJE is None else self.vfJE[1:-1, 1:-1, 1:-1]

    @property
    def vfK(self):
        return None if self.vfKE is None else self.vfKE[1:-1, 1:-1, 1:-1]


def _quad_area(x00, x10, x11, x01):
    """0.5 * (x11-x00) x (x01-x10): area vector of a bilinear quad whose
    corners are ordered counterclockwise seen from the +normal side."""
    return 0.5 * jnp.cross(x11 - x00, x01 - x10)


def face_areas(x: jnp.ndarray):
    """Face area vectors (si, sj, sk) from nodes x: (ni+1, nj+1, nk+1, 3).

    Orientation: si points in +i, sj in +j, sk in +k (right-handed blocks).
    """
    # i-faces: corners ordered (j,k): (0,0),(1,0),(1,1),(0,1) -> CCW from +i.
    si = _quad_area(
        x[:, :-1, :-1], x[:, 1:, :-1], x[:, 1:, 1:], x[:, :-1, 1:])
    # j-faces: corners ordered (k,i): CCW from +j.
    sj = _quad_area(
        x[:-1, :, :-1], x[:-1, :, 1:], x[1:, :, 1:], x[1:, :, :-1])
    # k-faces: corners ordered (i,j): CCW from +k.
    sk = _quad_area(
        x[:-1, :-1, :], x[1:, :-1, :], x[1:, 1:, :], x[:-1, 1:, :])
    return si, sj, sk


def face_centers(x: jnp.ndarray):
    """Face centroids (mean of 4 corner nodes) for i/j/k faces."""
    xmi = 0.25 * (x[:, :-1, :-1] + x[:, 1:, :-1] + x[:, 1:, 1:] + x[:, :-1, 1:])
    xmj = 0.25 * (x[:-1, :, :-1] + x[:-1, :, 1:] + x[1:, :, 1:] + x[1:, :, :-1])
    xmk = 0.25 * (x[:-1, :-1, :] + x[1:, :-1, :] + x[1:, 1:, :] + x[:-1, 1:, :])
    return xmi, xmj, xmk


def cell_volumes(x: jnp.ndarray):
    """Cell volumes via the divergence theorem: V = (1/3) sum_f xc_f . S_f."""
    si, sj, sk = face_areas(x)
    xmi, xmj, xmk = face_centers(x)

    def fdot(xm, s):
        return jnp.sum(xm * s, axis=-1)

    vol = (
        fdot(xmi[1:], si[1:]) - fdot(xmi[:-1], si[:-1])
        + fdot(xmj[:, 1:], sj[:, 1:]) - fdot(xmj[:, :-1], sj[:, :-1])
        + fdot(xmk[:, :, 1:], sk[:, :, 1:]) - fdot(xmk[:, :, :-1], sk[:, :, :-1])
    ) / 3.0
    return vol


def cell_centers(x: jnp.ndarray):
    """Cell centroids (mean of 8 corner nodes)."""
    return 0.125 * (
        x[:-1, :-1, :-1] + x[1:, :-1, :-1] + x[:-1, 1:, :-1] + x[:-1, :-1, 1:]
        + x[1:, 1:, :-1] + x[1:, :-1, 1:] + x[:-1, 1:, 1:] + x[1:, 1:, 1:])


def _cell_centers_ext(x: jnp.ndarray) -> jnp.ndarray:
    """Cell centers padded by one ghost ring whose positions are the
    interior centers mirrored across the boundary face centers — the
    geometrically-consistent ghost location for BC-mirrored states (works
    for single-cell axes, unlike linear extrapolation)."""
    xc = cell_centers(x)
    xmi, xmj, xmk = face_centers(x)

    def pad_axis(a, fc, ax):
        first = jax.lax.slice_in_dim(a, 0, 1, axis=ax)
        last = jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax], axis=ax)
        f_lo = jax.lax.slice_in_dim(fc, 0, 1, axis=ax)
        f_hi = jax.lax.slice_in_dim(fc, fc.shape[ax] - 1, fc.shape[ax],
                                    axis=ax)
        return jnp.concatenate(
            [2.0 * f_lo - first, a, 2.0 * f_hi - last], axis=ax)

    def edge_pad(fc, axes):
        pads = [(0, 0)] * 4
        for ax in axes:
            pads[ax] = (1, 1)
        return jnp.pad(fc, pads, mode="edge")

    xc = pad_axis(xc, xmi, 0)
    xc = pad_axis(xc, edge_pad(xmj, (0,)), 1)
    xc = pad_axis(xc, edge_pad(xmk, (0, 1)), 2)
    return xc


def compute_metrics(x: jnp.ndarray) -> BlockMetrics:
    """All metrics for one block. Halo volumes are mirrored from the interior
    and halo faces edge-replicated (reference mirrors halo metrics in
    metric.F90 so dissipation scaling sees sensible values)."""
    si, sj, sk = face_areas(x)
    vol = cell_volumes(x)
    vol = jnp.pad(vol, 2, mode="symmetric")
    pad1 = ((1, 1), (1, 1), (1, 1), (0, 0))
    return BlockMetrics(
        siE=jnp.pad(si, pad1, mode="edge"),
        sjE=jnp.pad(sj, pad1, mode="edge"),
        skE=jnp.pad(sk, pad1, mode="edge"),
        vol=vol, xc_ext=_cell_centers_ext(x))


compute_metrics_jit = jax.jit(compute_metrics)


def rigid_velocity(points, omega, center, vtrans):
    """v(x) = omega x (x - center) + vtrans for rigid-body grid motion
    (reference: gridVelocitiesFineLevel, solverUtils.F90:358 — rotation
    rate + translation of the whole grid / a rotating reference frame)."""
    om = jnp.asarray(omega, points.dtype)
    c = jnp.asarray(center, points.dtype)
    vt = jnp.asarray(vtrans, points.dtype)
    return jnp.cross(jnp.broadcast_to(om, points.shape), points - c) + vt


def add_grid_motion(metrics: BlockMetrics, x: jnp.ndarray, omega,
                    center=(0.0, 0.0, 0.0), vtrans=(0.0, 0.0, 0.0)
                    ) -> BlockMetrics:
    """Attach rigid-motion face velocities to a block's metrics.

    Face velocities are evaluated at face centroids (the same points the
    volume formula integrates), so for rigid motion the discrete velocity
    divergence telescopes to ~0 per cell and freestream is preserved (the
    ALE GCL, reference src/solver/ALEUtils.F90).
    """
    xmi, xmj, xmk = face_centers(x)
    pad1 = ((1, 1), (1, 1), (1, 1), (0, 0))

    def vf(xm):
        return jnp.pad(rigid_velocity(xm, omega, center, vtrans), pad1,
                       mode="edge")

    return metrics._replace(vfIE=vf(xmi), vfJE=vf(xmj), vfKE=vf(xmk))


# ---------------------------------------------------------------------------
# True halo metrics at b2b connections (reference: xhalo coordinate exchange
# + halo metric computation, preprocessingAPI.F90:1042 + metric; the ghost
# ring of siE/sjE/skE/vol/xc_ext then carries the NEIGHBOR's real geometry
# instead of edge replication — required for partition-invariant JST radii,
# Green-Gauss ghost gradients and viscous distances at internal interfaces,
# e.g. block splits, dist/stacked.py).
# ---------------------------------------------------------------------------

def extend_nodes_list(blocks, x_list):
    """Per-block node arrays extended by ONE ghost node layer per side:
    (ni+3, nj+3, nk+3, 3). Base fill: linear extrapolation; b2b connection
    faces overwritten with the donor block's true nodes (differentiable
    gathers with static indices). Rotated/translated periodic connections
    keep the extrapolated fill (geometry is not a plain copy there)."""
    import numpy as _np

    def extrap_pad(x):
        for ax in range(3):
            lo = 2.0 * jax.lax.slice_in_dim(x, 0, 1, axis=ax) \
                - jax.lax.slice_in_dim(x, 1, 2, axis=ax)
            n = x.shape[ax]
            hi = 2.0 * jax.lax.slice_in_dim(x, n - 1, n, axis=ax) \
                - jax.lax.slice_in_dim(x, n - 2, n - 1, axis=ax)
            x = jnp.concatenate([lo, x, hi], axis=ax)
        return x

    out = [extrap_pad(x) for x in x_list]
    # two passes, reading from the (partially) EXTENDED donor arrays: pass 1
    # fills the face ghost planes, pass 2 lets corner/edge ghosts pick up
    # values another connection delivered to the donor — exact corners where
    # the topology provides them (the reference's ordered xhalo rounds).
    for _ in range(2):
        nxt = list(out)
        for bi, blk in enumerate(blocks):
            dims = tuple(s - 1 for s in blk.x.shape[:3])  # cells per axis
            for conn in blk.conns:
                if conn.rotation is not None or conn.translation is not None:
                    continue
                ax = conn.face.axis
                donor = blocks[conn.donor_block]
                ddims = tuple(s - 1 for s in donor.x.shape[:3])
                t_axes = [a for a in range(3) if a != ax]
                # my ghost node plane (node coords, -1..n+1 tangentially;
                # partial-face connections restrict to their rng window,
                # extended past it only at physical block ends — interior
                # ends are split seams owned by the sibling window)
                rngs = []
                for m in range(3):
                    if m == ax:
                        rngs.append(_np.array(
                            [dims[ax] + 1 if conn.face.is_high else -1]))
                    else:
                        rlo, rhi = ((0, dims[m]) if conn.rng is None
                                    else conn.rng[t_axes.index(m)])
                        nlo = rlo - 1 if rlo == 0 else rlo
                        nhi = rhi + 2 if rhi == dims[m] else rhi + 1
                        rngs.append(_np.arange(nlo, nhi))
                g = _np.stack(_np.meshgrid(*rngs, indexing="ij"), axis=-1)
                d = _np.zeros_like(g)
                for m in range(3):
                    t = conn.transform[m]
                    a_d = abs(t) - 1
                    if t > 0:
                        d[..., a_d] = g[..., m] + conn.offset[m]
                    else:
                        d[..., a_d] = conn.offset[m] + 1 - g[..., m]
                # donor indices into its EXTENDED array (+1 shift), ghost
                # ring allowed, clamped at the ext bounds
                for m in range(3):
                    d[..., m] = _np.clip(d[..., m] + 1, 0, ddims[m] + 2)
                gi = g + 1  # into my x_ext coords
                src = out[conn.donor_block][d[..., 0], d[..., 1], d[..., 2]]
                nxt[bi] = nxt[bi].at[gi[..., 0], gi[..., 1],
                                     gi[..., 2]].set(src)
        out = nxt
    return out


def compute_metrics_conn(blocks, x_list):
    """compute_metrics per block, with the ghost-ring metric entries at b2b
    connection faces replaced by TRUE values computed from exchanged halo
    nodes. Physical-BC ghost entries keep the standard mirrored/replicated
    construction (identical to compute_metrics), so conn-free blocks are
    bit-identical to the plain path."""
    x_ext_list = extend_nodes_list(blocks, x_list)
    out = []
    for bi, blk in enumerate(blocks):
        base = compute_metrics(x_list[bi])
        conns = [c for c in blk.conns
                 if c.rotation is None and c.translation is None]
        if not conns:
            out.append(base)
            continue
        xe = x_ext_list[bi]
        fsi, fsj, fsk = face_areas(xe)
        fvol = cell_volumes(xe)
        fxc = cell_centers(xe)
        siE, sjE, skE = base.siE, base.sjE, base.skE
        vol, xc = base.vol, base.xc_ext

        def set_plane(a, full, axis, hi, vol_style=False):
            idx = (a.shape[axis] - (2 if vol_style else 1)) if hi \
                else (1 if vol_style else 0)
            fidx = full.shape[axis] - 1 if hi else 0
            sl = [slice(None)] * a.ndim
            sl[axis] = idx
            fsl = [slice(None)] * full.ndim
            fsl[axis] = fidx
            if vol_style:
                # base vol is two-ring padded (n+4): embed the one-ring
                # plane into the central tangential region
                for t in range(3):
                    if t != axis:
                        sl[t] = slice(1, -1)
            return a.at[tuple(sl)].set(full[tuple(fsl)])

        done = set()
        for c in conns:
            key = (c.face.axis, c.face.is_high)
            if key in done:
                continue
            done.add(key)
            ax, hi = key
            siE = set_plane(siE, fsi, ax, hi)
            sjE = set_plane(sjE, fsj, ax, hi)
            skE = set_plane(skE, fsk, ax, hi)
            vol = set_plane(vol, fvol, ax, hi, vol_style=True)
            xc = set_plane(xc, fxc, ax, hi)
        out.append(BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=vol,
                                xc_ext=xc, vfIE=base.vfIE, vfJE=base.vfJE,
                                vfKE=base.vfKE))
    return out
