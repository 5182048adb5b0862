"""Wall-distance computation for turbulence models.

Reference analogue: ``computeWallDistance``
(`/root/reference/src/wallDistance/wallDistance.F90:129`): gather the global
wall surface, build an ADT tree, Newton-refined nearest-point projection per
cell. Here: the global wall surface is gathered as face-center quadrature
points and distances are an exact min over point distances computed as one
batched, chunked matmul-style reduction — the O(N*M) form is HBM/MXU
friendly on TPU and removes the irregular tree search. A C++ ADT for
huge surfaces plugs in behind the same interface (native/).

``updateWallDistancesQuickly`` parity: distances are a pure function of
(cell centers, wall points); re-call on mesh deformation.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import VISCOUS_WALL_BCS, WALL_BCS, MultiBlockMesh
from adflow_tpu.geom.metrics import cell_centers
from adflow_tpu.physics.surface import build_wall_patches


def gather_wall_points(mesh: MultiBlockMesh, x_list) -> jnp.ndarray:
    """Wall-face centers + corner nodes of all (viscous+slip) wall patches."""
    patches = build_wall_patches(mesh, include=WALL_BCS)
    pts = []
    for patch in patches:
        # the face axis is dropped by fnode_sl: axes 0,1 are in-face
        xs = x_list[patch.block][patch.fnode_sl]

        def corner(d1, d2, xs=xs):
            return xs[d1:xs.shape[0] - 1 + d1, d2:xs.shape[1] - 1 + d2]

        center = 0.25 * (corner(0, 0) + corner(1, 0)
                         + corner(0, 1) + corner(1, 1))
        pts.append(center.reshape(-1, 3))
        pts.append(xs.reshape(-1, 3))
    if not pts:
        return jnp.zeros((0, 3))
    return jnp.concatenate(pts)


@jax.jit
def _min_dist_chunked(xc: jnp.ndarray, wall: jnp.ndarray) -> jnp.ndarray:
    """min_j ||xc_i - wall_j|| with |xc| x |wall| pairwise distances done via
    the  |a-b|^2 = |a|^2 - 2 a.b + |b|^2  expansion (one big matmul -> MXU)."""
    a2 = jnp.sum(xc * xc, axis=-1, keepdims=True)
    b2 = jnp.sum(wall * wall, axis=-1)[None, :]
    d2 = a2 - 2.0 * (xc @ wall.T) + b2
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))


def compute_wall_distances(mesh: MultiBlockMesh, x_list,
                           dtype=jnp.float32,
                           chunk: int = 1 << 16) -> List[jnp.ndarray]:
    """Per-block wall distance on the one-ring extended cell grid
    (ni+2, nj+2, nk+2) — the SA source term needs distances at halo cells
    adjacent to boundaries; edge padding supplies them."""
    wall = gather_wall_points(mesh, x_list)
    out = []
    for x in x_list:
        xc = cell_centers(jnp.asarray(x, dtype))
        shp = xc.shape[:3]
        flat = xc.reshape(-1, 3)
        if wall.shape[0] == 0:
            d = jnp.full(flat.shape[0], 1e10, dtype)
        else:
            parts = []
            for s in range(0, flat.shape[0], chunk):
                parts.append(_min_dist_chunked(
                    flat[s:s + chunk], jnp.asarray(wall, dtype)))
            d = jnp.concatenate(parts)
        d = d.reshape(shp)
        d = jnp.pad(d, 1, mode="edge")
        out.append(jnp.maximum(d, 1e-12))
    return out
