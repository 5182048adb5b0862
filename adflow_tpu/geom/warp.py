"""Inverse-distance-weighted volume mesh warping.

Reference analogue: ADflow delegates volume warping to IDWarp via
``setMesh``/``ADFLOW.setSurfaceCoordinates`` (`/root/reference/adflow/
pyADflow.py:380,3208`; the MPhys ADflowWarper component,
`adflow/mphys/mphys_adflow.py:352`). This gives adflow_tpu a built-in
equivalent so geometry design loops work standalone: surface displacements
are diffused into the volume with Shepard (inverse-distance) weights, with
zero-displacement anchors on non-moving boundaries so the far field stays
put.

TPU-native: the kernel is one dense (n_vol x n_ctl) matmul chain — jitted,
differentiable (the warp is part of the dIdx geometry chain, like IDWarp's
reverse-mode warp in the reference's evalFunctionsSens stack).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import MultiBlockMesh, WALL_BCS


def _boundary_anchor_nodes(mesh: MultiBlockMesh) -> np.ndarray:
    """Nodes of all non-wall physical boundaries (farfield etc.): anchors
    that must not move."""
    pts = []
    for blk in mesh.blocks:
        nnode = np.array(blk.x.shape[:3])
        for sf in blk.bcs:
            if sf.bc in WALL_BCS:
                continue
            ax = sf.face.axis
            idx = [slice(None)] * 3
            idx[ax] = -1 if sf.face.is_high else 0
            pts.append(blk.x[tuple(idx)].reshape(-1, 3))
    if not pts:
        return np.zeros((0, 3))
    allp = np.concatenate(pts)
    # thin out: warping accuracy at anchors only needs coverage
    if len(allp) > 2000:
        allp = allp[:: len(allp) // 2000 + 1]
    return allp


@jax.jit
def _idw_disp(xq, ctl_pts, ctl_disp, power=3.0, eps=1e-10):
    """Shepard interpolation of control displacements at query points.

    xq: (nq, 3); ctl_pts: (nc, 3); ctl_disp: (nc, 3) -> (nq, 3).
    """
    d2 = jnp.sum((xq[:, None, :] - ctl_pts[None, :, :]) ** 2, axis=-1)
    w = 1.0 / (d2 ** (power / 2.0) + eps)
    return (w @ ctl_disp) / jnp.sum(w, axis=1, keepdims=True)


def warp_mesh(mesh: MultiBlockMesh, x_list: List[jnp.ndarray],
              surf_pts0: np.ndarray, surf_disp,
              anchors: Optional[np.ndarray] = None,
              chunk: int = 16384) -> List[jnp.ndarray]:
    """Warp every block's nodes given wall-surface displacements.

    surf_pts0: (ns, 3) original surface node positions; surf_disp: (ns, 3)
    their displacements. Returns new x_list (same shapes, differentiable
    w.r.t. surf_disp).
    """
    if anchors is None:
        anchors = _boundary_anchor_nodes(mesh)
    if len(anchors):
        # drop anchors that coincide with / crowd the moving surface
        # (symmetry planes share their wall-ring nodes with the wall)
        from scipy.spatial import cKDTree
        d, _ = cKDTree(np.asarray(surf_pts0)).query(anchors)
        span = float(np.ptp(np.asarray(surf_pts0), axis=0).max())
        anchors = anchors[d > 0.05 * max(span, 1e-12)]
    ctl_pts = jnp.asarray(
        np.concatenate([np.asarray(surf_pts0), anchors]), x_list[0].dtype)
    zd = jnp.zeros((len(anchors), 3), x_list[0].dtype)
    ctl_disp = jnp.concatenate([jnp.asarray(surf_disp, x_list[0].dtype), zd])
    out = []
    for x in x_list:
        flat = x.reshape(-1, 3)
        n = flat.shape[0]
        parts = []
        for s in range(0, n, chunk):
            parts.append(_idw_disp(flat[s:s + chunk], ctl_pts, ctl_disp))
        out.append((flat + jnp.concatenate(parts)).reshape(x.shape))
    return out
