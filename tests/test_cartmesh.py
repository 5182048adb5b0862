"""Cartesian background-mesh generator tests (reference:
overset/cartMesh.F90 createCartMesh)."""

import dataclasses as _dc

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.core.mesh import BCType, Face
from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.meshgen.analytic import naca0012_omesh
from adflow_tpu.meshgen.cartmesh import cartesian_background
from adflow_tpu.physics.residual import build_topology, fill_halos


def _near_airfoil(ni=48, nj=12, radius=1.2):
    near = naca0012_omesh(ni=ni, nj=nj, radius=radius, nk=2).blocks[0]
    bcs = [(_dc.replace(sf, bc=BCType.OVERSET, family="ovs")
            if sf.face is Face.JMAX else sf) for sf in near.bcs]
    from adflow_tpu.core.mesh import MultiBlockMesh
    return MultiBlockMesh([_dc.replace(near, bcs=bcs)], name="near")


def test_generator_structure():
    near = _near_airfoil()
    mesh = cartesian_background(near, scale=3.0, far=12.0,
                                sym_planes=("zlow", "zhigh"))
    bg = mesh.blocks[-1]
    mesh.validate()
    # outer extent reaches the requested far distance in x/y
    assert bg.x[..., 0].max() > 12.0 and bg.x[..., 0].min() < -11.0
    # symmetry-clipped span matches the body span exactly
    zb = near.blocks[0].x[..., 2]
    np.testing.assert_allclose(bg.x[..., 2].min(), zb.min())
    np.testing.assert_allclose(bg.x[..., 2].max(), zb.max())
    # BCs: farfield everywhere except the two symmetry z faces
    kinds = {sf.face: sf.bc for sf in bg.bcs}
    assert kinds[Face.KMIN] is BCType.SYMMETRY
    assert kinds[Face.KMAX] is BCType.SYMMETRY
    assert kinds[Face.IMIN] is BCType.FARFIELD
    # core spacing tracks the wall face size within the scale factor
    xs = np.unique(bg.x[..., 0])
    core = xs[(xs > -0.5) & (xs < 1.5)]
    h_core = np.diff(core).mean()
    assert 0.01 < h_core < 0.6       # uniform, body-scaled core


def test_overset_solve_with_auto_background():
    """The generated background + implicit hole cut preserve free stream
    through the full halo/overset fill (the machinery behind an overset
    solve)."""
    near = _near_airfoil()
    mesh = cartesian_background(near, scale=4.0, far=8.0,
                                sym_planes=("zlow", "zhigh"))
    topo = build_topology(mesh)
    assert topo.overset is not None
    ibl = topo.overset.iblank
    # the background must have holes (inside the airfoil) and fringes
    assert (ibl[1] == 0).sum() > 0
    assert (ibl[1] == -1).sum() > 0
    ap = AeroProblem(name="fs", mach=0.5, alpha=1.5)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = jnp.asarray(ref.winf())
    metrics = [compute_metrics(jnp.asarray(b.x)) for b in mesh.blocks]
    w_list = [jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims) + (5,))
              for b in mesh.blocks]
    wf = fill_halos(w_list, metrics, topo, ref, winf)
    # interior cells only: wall-BC ghosts legitimately differ (mirrored
    # velocity), like the existing overset freestream tests
    for i, w in enumerate(wf):
        err = float(jnp.max(jnp.abs(w[2:-2, 2:-2, 2:-2] - winf)))
        assert err < 1e-12, (i, err)
