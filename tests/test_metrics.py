"""Metrics correctness: volumes, areas, watertightness, differentiability.

Reference analogue: metric checking in gridChecking.F90 + the implicit
guarantees metric.F90 relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.geom.metrics import (
    cell_volumes, compute_metrics, face_areas)
from adflow_tpu.meshgen.analytic import cube_mesh, naca0012_omesh


def test_cube_volumes_exact():
    mesh = cube_mesh(n=4)
    vol = cell_volumes(jnp.asarray(mesh.blocks[0].x))
    np.testing.assert_allclose(np.asarray(vol), (1.0 / 4) ** 3, rtol=1e-13)


def test_perturbed_cube_volume_sum():
    """Divergence-theorem volumes telescope: total volume is exact even on a
    randomly perturbed interior."""
    mesh = cube_mesh(n=6, perturb=0.3, seed=3)
    vol = cell_volumes(jnp.asarray(mesh.blocks[0].x))
    assert float(jnp.min(vol)) > 0.0
    np.testing.assert_allclose(float(jnp.sum(vol)), 1.0, rtol=1e-12)


def test_watertight_cells():
    """Sum of outward face-area vectors of every cell is exactly zero —
    the discrete identity free-stream preservation rests on."""
    mesh = cube_mesh(n=5, perturb=0.25, seed=1)
    si, sj, sk = face_areas(jnp.asarray(mesh.blocks[0].x))
    closure = (si[1:] - si[:-1] + sj[:, 1:] - sj[:, :-1]
               + sk[:, :, 1:] - sk[:, :, :-1])
    assert float(jnp.max(jnp.abs(closure))) < 1e-14


def test_face_area_orientation():
    mesh = cube_mesh(n=3)
    si, sj, sk = face_areas(jnp.asarray(mesh.blocks[0].x))
    assert float(jnp.min(si[..., 0])) > 0
    assert float(jnp.min(sj[..., 1])) > 0
    assert float(jnp.min(sk[..., 2])) > 0


def test_metrics_padding_shapes():
    mesh = cube_mesh(n=4)
    m = compute_metrics(jnp.asarray(mesh.blocks[0].x))
    assert m.vol.shape == (8, 8, 8)
    assert m.si.shape == (5, 4, 4, 3)


def test_naca_mesh_positive_volumes():
    mesh = naca0012_omesh(ni=64, nj=24)
    vol = cell_volumes(jnp.asarray(mesh.blocks[0].x))
    assert float(jnp.min(vol)) > 0.0


def test_metrics_differentiable():
    """Geometry chain must be AD-able (adjoint w.r.t. shape)."""
    mesh = cube_mesh(n=3, perturb=0.1)
    x = jnp.asarray(mesh.blocks[0].x)

    def total_vol(x):
        return jnp.sum(cell_volumes(x))

    g = jax.grad(total_vol)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # moving an interior node does not change the total volume
    assert abs(float(g[2, 2, 2, 0])) < 1e-12
    # FD check on a boundary-adjacent node
    eps = 1e-6
    xp = x.at[1, 1, 1, 2].add(eps)
    fd = (total_vol(xp) - total_vol(x)) / eps
    np.testing.assert_allclose(float(g[1, 1, 1, 2]), float(fd),
                               rtol=1e-5, atol=1e-10)
