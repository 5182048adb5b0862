"""Overset (chimera) connectivity tests.

Reference analogue: tests/reg_tests/test_overset.py (conic overset vs
multiblock refs). Here: (1) trilinear donor interpolation reproduces linear
fields exactly; (2) freestream is preserved through the full overset residual
(hole cut + fringe ring + outer-boundary interpolation); (3) iblank
partitioning is sane.
"""

import numpy as np
import jax.numpy as jnp

from adflow_tpu.core.mesh import (
    BCSubface, BCType, Block, Face, MultiBlockMesh)
from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.meshgen.analytic import cube_mesh
from adflow_tpu.overset.assembly import (
    IBLANK_COMPUTE, IBLANK_FRINGE, IBLANK_HOLE, _padded_centers,
    apply_overset, build_overset)
from adflow_tpu.physics.residual import (
    ProblemConfig, build_topology, residual_list)


def _box_in_box(n_bg=16, n_in=20):
    """Background [0,1]^3 farfield box + inner overset box [0.25,0.75]^3."""
    bg = cube_mesh(n=n_bg).blocks[0]
    xs = [np.linspace(0.25, 0.75, n_in + 1)] * 3
    x = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1)
    inner = Block(
        name="inner", x=x,
        bcs=[BCSubface(face=f, bc=BCType.OVERSET, family="ovs")
             for f in Face])
    return MultiBlockMesh(blocks=[bg, inner], name="boxbox")


def _cut(bi, centers):
    # cut a hole in the BACKGROUND under the inner box's core
    if bi != 0:
        return np.zeros(len(centers), bool)
    return np.max(np.abs(centers - 0.5), axis=1) < 0.1


def test_overset_linear_exactness():
    mesh = _box_in_box()
    tab = build_overset(mesh, cut_callback=_cut)
    assert tab is not None and tab.n_orphans == 0

    def lin(c):
        return (1.0 + 2.0 * c[..., 0] - 3.0 * c[..., 1] + 0.5 * c[..., 2])

    w_list, exact = [], []
    for b in mesh.blocks:
        pc = _padded_centers(b.x)
        f = lin(pc)[..., None]
        exact.append(f)
        # receivers hold garbage; donors hold the linear field
        g = f.copy()
        w_list.append(jnp.asarray(g))
    # poison the inner block's ghosts and the background fringe
    w0 = np.array(w_list[0])
    w1 = np.array(w_list[1])
    w1[:2], w1[-2:], w1[:, :2], w1[:, -2:] = 99.0, 99.0, 99.0, 99.0
    w1[:, :, :2], w1[:, :, -2:] = 99.0, 99.0
    fr = tab.iblank[0] == IBLANK_FRINGE
    w0[2:-2, 2:-2, 2:-2][fr] = 99.0
    out = apply_overset([jnp.asarray(w0), jnp.asarray(w1)], tab)
    # inner ghosts: exact to ~1e-12 (trilinear reproduces linears)
    err_in = np.abs(np.array(out[1]) - exact[1])
    interior_and_ghost = err_in[:, 2:-2, 2:-2]  # i-ghost layers incl.
    assert np.max(err_in[:2, 2:-2, 2:-2]) < 1e-10
    assert np.max(err_in[-2:, 2:-2, 2:-2]) < 1e-10
    # background fringe cells: exact
    err_bg = np.abs(np.array(out[0])[2:-2, 2:-2, 2:-2] - exact[0][2:-2, 2:-2, 2:-2])
    assert np.max(err_bg[fr]) < 1e-10


def test_overset_iblank_partition():
    mesh = _box_in_box()
    tab = build_overset(mesh, cut_callback=_cut)
    ib0 = tab.iblank[0]
    assert (ib0 == IBLANK_HOLE).sum() > 0
    assert (ib0 == IBLANK_FRINGE).sum() > 0
    assert (ib0 == IBLANK_COMPUTE).sum() > 0
    # inner block: all compute (its receivers are ghost cells)
    assert (tab.iblank[1] == IBLANK_COMPUTE).all()
    # fringe ring fully separates holes from compute cells
    hole = ib0 == IBLANK_HOLE
    comp = ib0 == IBLANK_COMPUTE
    p = np.pad(hole, 1, constant_values=False)
    touch = (p[:-2, 1:-1, 1:-1] | p[2:, 1:-1, 1:-1] | p[1:-1, :-2, 1:-1]
             | p[1:-1, 2:, 1:-1] | p[1:-1, 1:-1, :-2] | p[1:-1, 1:-1, 2:])
    assert not (touch & comp).any()


def test_overset_freestream_preservation():
    mesh = _box_in_box(n_bg=12, n_in=14)
    topo = build_topology(mesh, cut_callback=_cut)
    assert topo.overset is not None
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1 / 64,
                        diss_exponent=0.67)
    ap = AeroProblem(name="fs", mach=0.5, alpha=3.0)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = jnp.asarray(ref.winf())
    metrics = [compute_metrics(jnp.asarray(b.x)) for b in mesh.blocks]
    w_list = [jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims)
                               + (5,)).astype(jnp.float64)
              for b in mesh.blocks]
    r = residual_list(w_list, metrics, topo, cfg, ref, winf)
    for rb in r:
        assert float(jnp.max(jnp.abs(rb))) < 1e-12


# ---------------------------------------------------------------------------
# Implicit hole cutting (round 3): no user callback — wall containment +
# flooding (oversetAPI.F90 implicit path, floodInteriorCells.F90).
# ---------------------------------------------------------------------------

import dataclasses as _dc

from adflow_tpu.meshgen.analytic import naca0012_omesh


def _airfoil_in_box(ni=64, nj=16, n_bg=40, radius=1.5):
    """NACA0012 O-mesh (JMAX -> overset receiver) inside a background
    Cartesian block with farfield outer boundaries."""
    near = naca0012_omesh(ni=ni, nj=nj, radius=radius,
                          nk=2).blocks[0]
    bcs = [( _dc.replace(sf, bc=BCType.OVERSET, family="ovs")
            if sf.face is Face.JMAX else sf) for sf in near.bcs]
    near = _dc.replace(near, bcs=bcs)

    xs = np.linspace(-2.0, 3.0, n_bg + 1)
    ys = np.linspace(-2.0, 2.0, n_bg + 1)
    zs = near.x[0, 0, :, 2]
    x = np.zeros((n_bg + 1, n_bg + 1, len(zs), 3))
    x[..., 0] = xs[:, None, None]
    x[..., 1] = ys[None, :, None]
    x[..., 2] = zs[None, None, :]
    bg = Block(
        name="bg", x=x,
        bcs=[BCSubface(Face.IMIN, BCType.FARFIELD, family="far"),
             BCSubface(Face.IMAX, BCType.FARFIELD, family="far"),
             BCSubface(Face.JMIN, BCType.FARFIELD, family="far"),
             BCSubface(Face.JMAX, BCType.FARFIELD, family="far"),
             BCSubface(Face.KMIN, BCType.SYMMETRY, family="sym"),
             BCSubface(Face.KMAX, BCType.SYMMETRY, family="sym")])
    return MultiBlockMesh(blocks=[near, bg], name="airfoil_box")


def test_implicit_hole_cut():
    """Background cells inside the airfoil must be blanked WITHOUT a user
    callback; cells well away stay compute; no orphans."""
    mesh = _airfoil_in_box()
    tab = build_overset(mesh)           # no cut_callback
    assert tab is not None
    ib_bg = tab.iblank[1]
    from adflow_tpu.overset.assembly import _cell_centers
    c = _cell_centers(mesh.blocks[1].x)
    # strictly inside the airfoil (max thickness 12% at x~0.3): holes
    inside = ((np.abs(c[..., 1]) < 0.02)
              & (c[..., 0] > 0.3) & (c[..., 0] < 0.6))
    assert (ib_bg[inside] == IBLANK_HOLE).all(), "no holes inside the body"
    # far from the body: compute
    far = np.abs(c[..., 1]) > 1.0
    assert (ib_bg[far] == IBLANK_COMPUTE).all()
    assert tab.n_orphans == 0


def test_implicit_overset_freestream():
    """Free stream is preserved through the implicit-cut overset residual
    (holes + fringes + interpolation all active)."""
    mesh = _airfoil_in_box()
    topo = build_topology(mesh)
    assert any(bs.iblank is not None for bs in topo.blocks)
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1 / 64.0,
                        diss_exponent=0.67)
    ap = AeroProblem(name="fs", mach=0.5, alpha=1.0)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = jnp.asarray(ref.winf())
    metrics = [compute_metrics(jnp.asarray(b.x)) for b in mesh.blocks]
    w = [jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims) + (5,))
         for b in mesh.blocks]
    r = residual_list(w, metrics, topo, cfg, ref, winf)
    # background (holes + fringe + flood) must be exactly free-stream
    assert float(jnp.max(jnp.abs(r[1]))) < 1e-11
    # the airfoil mesh preserves free stream away from its wall rows (a
    # wall legitimately deflects uniform flow; same as the single-grid
    # test_upwind freestream check)
    assert float(jnp.max(jnp.abs(np.asarray(r[0])[:, 2:]))) < 1e-11
