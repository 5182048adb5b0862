"""Zipper gap-triangulation tests.

Reference analogue: `/root/reference/src/overset/zipperMesh.F90:18`
(createZipperMesh) + `solver/zipperIntegrations.F90`: after overlapping
overset surface faces are deduplicated, the strip between the two
retained-region fronts is stitched with triangles so surface integrals
are watertight.
"""

import numpy as np
import pytest

from adflow_tpu.core.mesh import BCSubface, BCType, Block, Face, \
    MultiBlockMesh
from adflow_tpu.overset.assembly import (
    build_zipper_gaps, overlap_surface_weights)
from adflow_tpu.physics.surface import build_wall_patches


def _wall_box(name, x0, x1, nx, ny=8, nz=4, y0=0.0, y1=1.0):
    """A box block whose z-min face is a viscous wall covering
    [x0,x1] x [y0,y1] (the overset surface under test)."""
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    zs = np.linspace(0.0, 0.5, nz + 1)
    x = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    bcs = [BCSubface(face=Face(f), bc=BCType.FARFIELD, family="far")
           for f in (0, 1, 2, 3, 5)]
    bcs.append(BCSubface(face=Face(4), bc=BCType.NS_WALL_ADIABATIC,
                         family="wall"))
    return Block(name=name, x=x, bcs=bcs)


def _two_patch_mesh(overlap=0.2, n1=24, n2=15):
    """Two disconnected (= two clusters) blocks whose wall patches
    overlap in x by ``overlap``; total covered wall = [0,1] x [0,1]."""
    b1 = _wall_box("fine", 0.0, 0.6, n1)
    b2 = _wall_box("coarse", 0.6 - overlap, 1.0, n2)
    return MultiBlockMesh([b1, b2], name="twopatch")


def _areas(mesh, patches, weights, zipper):
    total = 0.0
    for pi, p in enumerate(patches):
        xs = mesh.blocks[p.block].x[p.fnode_sl]
        d1 = xs[1:, 1:] - xs[:-1, :-1]
        d2 = xs[:-1, 1:] - xs[1:, :-1]
        a = 0.5 * np.linalg.norm(np.cross(d1, d2), axis=-1)
        w = np.ones_like(a) if weights[pi] is None else weights[pi]
        total += float(np.sum(a * w))
    gap = 0.0
    if zipper is not None:
        gap = float(np.sum(np.linalg.norm(zipper.svec, axis=1)))
    return total, gap


def test_zipper_watertight_area():
    """Dedup alone under-counts the overlapped wall; dedup + zipper
    recovers the analytic area to < 0.1% (the reference's watertight
    integration claim, zipperMesh.F90:4-16)."""
    mesh = _two_patch_mesh()
    patches = build_wall_patches(mesh)
    weights = overlap_surface_weights(mesh, patches)
    assert any(w is not None for w in weights), "dedup must trigger"
    zipper = build_zipper_gaps(mesh, patches, weights)
    assert zipper is not None and zipper.n_tris > 0
    dedup_area, gap_area = _areas(mesh, patches, weights, zipper)
    analytic = 1.0 * 1.0
    # the dedup front leaves a genuine gap strip...
    assert dedup_area < analytic - 1e-6
    # ...which the zipper closes
    np.testing.assert_allclose(dedup_area + gap_area, analytic,
                               rtol=1e-3)


def test_zipper_tris_carry_face_association():
    mesh = _two_patch_mesh()
    patches = build_wall_patches(mesh)
    weights = overlap_surface_weights(mesh, patches)
    zipper = build_zipper_gaps(mesh, patches, weights)
    assert zipper is not None
    assert zipper.patch_idx.shape == zipper.face_flat.shape
    assert zipper.svec.shape == (zipper.n_tris, 3)
    # associations point at retained faces
    for pi in np.unique(zipper.patch_idx):
        p = patches[int(pi)]
        xs = mesh.blocks[p.block].x[p.fnode_sl]
        nfaces = (xs.shape[0] - 1) * (xs.shape[1] - 1)
        sel = zipper.face_flat[zipper.patch_idx == pi]
        assert sel.min() >= 0 and sel.max() < nfaces
        w = weights[int(pi)]
        if w is not None:
            assert np.all(w.reshape(-1)[sel] > 0.5)


def test_touching_patches_stay_watertight():
    """Patches that only TOUCH at a seam: the center-distance dedup may
    still remove a seam row; dedup + zipper must keep the total area
    watertight regardless."""
    b1 = _wall_box("a", 0.0, 0.5, 10)
    b2 = _wall_box("b", 0.5, 1.0, 10)
    mesh = MultiBlockMesh([b1, b2], name="touch")
    patches = build_wall_patches(mesh)
    weights = overlap_surface_weights(mesh, patches)
    zipper = build_zipper_gaps(mesh, patches, weights)
    dedup_area, gap_area = _areas(mesh, patches, weights, zipper)
    np.testing.assert_allclose(dedup_area + gap_area, 1.0, rtol=1e-3)
