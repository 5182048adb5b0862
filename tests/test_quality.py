"""Mesh quality diagnostics tests (reference: gridChecking.F90 +
unit_tests/test_mesh_skewness.py)."""

import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.geom.quality import cell_quality, check_mesh_quality
from adflow_tpu.meshgen.analytic import cube_mesh, naca0012_omesh
from adflow_tpu.options import Options


def test_uniform_cube_quality():
    mesh = cube_mesh(n=6)
    rep = check_mesh_quality(mesh)
    assert rep["ok"]
    assert rep["n_negative_volumes"] == 0
    h = 1.0 / 6.0
    np.testing.assert_allclose(rep["min_volume"], h ** 3, rtol=1e-12)
    assert rep["max_skewness"] < 1e-12          # orthogonal grid
    np.testing.assert_allclose(rep["max_aspect_ratio"], 1.0, rtol=1e-12)


def test_inverted_cell_detected():
    mesh = cube_mesh(n=4)
    x = mesh.blocks[0].x.copy()
    # collapse one node through the opposite face -> inverted cells
    x[2, 2, 2] = x[1, 1, 1] - 0.3 * (x[3, 3, 3] - x[1, 1, 1])
    mesh.blocks[0].x = x
    rep = check_mesh_quality(mesh)
    assert not rep["ok"]
    assert rep["n_negative_volumes"] > 0 or rep["n_twisted_cells"] > 0


def test_twisted_cell_detected():
    """A twisted hex can keep positive total volume while a corner
    Jacobian goes negative — the sub-Jacobian check must flag it."""
    mesh = cube_mesh(n=2)
    x = mesh.blocks[0].x.copy()
    # rotate the top face of one cell by ~90 degrees around its center
    c = x[1:3, 1:3, 2].mean(axis=(0, 1))
    for (i, j), (i2, j2) in zip([(1, 1), (1, 2), (2, 2), (2, 1)],
                                [(1, 2), (2, 2), (2, 1), (1, 1)]):
        pass
    top = x[1:3, 1:3, 2].copy()
    x[1, 1, 2] = top[0, 1]
    x[1, 2, 2] = top[1, 1]
    x[2, 2, 2] = top[1, 0]
    x[2, 1, 2] = top[0, 0]
    mesh.blocks[0].x = x
    rep = check_mesh_quality(mesh)
    assert rep["n_twisted_cells"] > 0


def test_skewness_and_aspect_scale():
    # sheared cube: constant skewness, unit aspect growth
    mesh = cube_mesh(n=5)
    x = mesh.blocks[0].x.copy()
    x[..., 0] += 0.5 * x[..., 1]         # shear x by y
    q = cell_quality(x)
    assert q["skewness"].max() > 0.05    # clearly non-orthogonal
    assert (q["volume"] > 0).all()


def test_solver_quality_api():
    mesh = naca0012_omesh(ni=32, nj=12)
    s = ADFLOW(options={"equationType": "euler",
                        "printIterations": False, "printTiming": False},
               mesh=mesh)
    rep = s.checkMeshQuality(warn=False)
    assert rep["ok"]
    assert rep["max_aspect_ratio"] > 1.0
    assert len(rep["blocks"]) == 1


def test_gamma_constant_rejected():
    with pytest.raises(NotImplementedError, match="gamma"):
        Options({"gammaConstant": 1.3})
