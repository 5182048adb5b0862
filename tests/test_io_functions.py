"""Solution I/O, restart, cost-function menu, and solver utilities —
reference analogues: tests/unit_tests/test_restart.py,
tests/reg_tests/test_flow_restart.py, test_cl_solve.py, and the
surfaceIntegrations cost-function coverage in test_functionals.py."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.api.solver import ADFLOW
from adflow_tpu.core.mesh import BCSubface, BCType, Face
from adflow_tpu.core.refstate import AeroProblem
from adflow_tpu.meshgen.analytic import channel_mesh, naca0012_omesh

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow

OPTS = {"equationType": "euler", "useANKSolver": False, "useNKSolver": False,
        "nCycles": 25, "printIterations": False, "printTiming": False}


@pytest.fixture(scope="module")
def quick_solve(tmp_path_factory):
    mesh = naca0012_omesh(ni=48, nj=16)
    s = ADFLOW(options=OPTS, mesh=mesh)
    ap = AeroProblem(name="io", mach=0.5, alpha=2.0,
                     evalFuncs=["cl", "cd", "sepsensor", "cavitation"])
    s(ap)
    return s, ap


def test_write_and_restart_roundtrip(quick_solve, tmp_path):
    s, ap = quick_solve
    s.writeSolution(outputDir=str(tmp_path), baseName="t")
    # numberSolutions (reference default True) appends the per-AP call
    # counter padded to writeSolutionDigits
    assert (tmp_path / "t_000_vol.cgns").exists()
    assert (tmp_path / "t_000_surf.dat").exists()

    s2 = ADFLOW(options=dict(OPTS, restartFile=str(tmp_path / "t_000_vol.cgns")),
                mesh=naca0012_omesh(ni=48, nj=16))
    s2.setAeroProblem(ap)
    np.testing.assert_allclose(np.asarray(s2.getStates()),
                               np.asarray(s.getStates()), atol=1e-14)


def test_extended_cost_functions(quick_solve):
    s, ap = quick_solve
    funcs = {}
    s.evalFunctions(ap, funcs,
                    evalFuncs=["cl", "clp", "clv", "sepsensor", "cavitation",
                               "area", "cmx", "cfy"])
    # inviscid: viscous split must be zero, pressure split equals the total
    assert funcs["io_clv"] == 0.0
    np.testing.assert_allclose(funcs["io_clp"], funcs["io_cl"], rtol=1e-12)
    assert funcs["io_area"] > 0.0
    assert funcs["io_sepsensor"] >= 0.0


def test_lift_distribution_integral(quick_solve, tmp_path):
    """Sum of binned sectional lift * width == total lift."""
    s, ap = quick_solve
    s.addLiftDistribution(8, "z")
    fn = str(tmp_path / "lift.dat")
    s.writeLiftDistributionFile(fn)
    data = np.loadtxt(fn, skiprows=3)
    funcs = {}
    s.evalFunctions(ap, funcs, evalFuncs=["lift"])
    width = data[1, 0] - data[0, 0]
    np.testing.assert_allclose(np.sum(data[:, 1]) * width,
                               funcs["io_lift"], rtol=1e-6)


def test_nodal_forces_sum(quick_solve):
    """Nodal getForces sums to the integrated pressure force."""
    s, ap = quick_solve
    f = s.getForces()
    funcs = {}
    s.evalFunctions(ap, funcs, evalFuncs=["fx", "fy", "fz"])
    np.testing.assert_allclose(
        f.sum(axis=0),
        [funcs["io_fx"], funcs["io_fy"], funcs["io_fz"]], atol=1e-10)


def test_flow_through_channel():
    """Subsonic-inflow/outflow channel: mass conservation between planes
    and sensible mass-averaged totals (flowIntegrationFace:894)."""
    mesh = channel_mesh(ni=32, nj=8, nk=2)
    s = ADFLOW(options=dict(OPTS, nCycles=400, CFL=1.0, L2Convergence=1e-8),
               mesh=mesh)
    ap = AeroProblem(name="ch", mach=0.3,
                     evalFuncs=["mdot", "mavgptot", "mavgmn"])
    s(ap)
    funcs = {}
    s.evalFunctions(ap, funcs)
    # net mdot (in - out) ~ 0 once converged; averages near freestream
    assert abs(funcs["ch_mdot"]) < 1e-4
    assert funcs["ch_mavgptot"] > 0.0


def test_solve_cl_secant():
    mesh = naca0012_omesh(ni=48, nj=16)
    s = ADFLOW(options=dict(OPTS, useANKSolver=True, nCycles=200,
                            L2Convergence=1e-8), mesh=mesh)
    ap = AeroProblem(name="clt", mach=0.5, alpha=1.0, evalFuncs=["cl"])
    alpha = s.solveCL(ap, CLStar=0.2, alpha0=1.0, delta=0.5, tol=2e-4)
    funcs = {}
    s.evalFunctions(ap, funcs, evalFuncs=["cl"])
    assert abs(funcs["clt_cl"] - 0.2) < 2e-4


def test_output_variable_menus(tmp_path):
    """surfaceVariables/volumeVariables menus + convergence history in the
    CGNS file (reference: outputMod.F90:319-741 variable menus; convArray
    written to solution files)."""
    import h5py
    from adflow_tpu.meshgen.analytic import flatplate_mesh

    mesh = flatplate_mesh(ni=24, nj=12, wall_spacing=1e-3)
    solver = ADFLOW(options={
        "equationType": "laminar NS", "nCycles": 20, "ANKSwitchTol": 1.5,
        "printIterations": False, "printTiming": False,
        "surfaceVariables": ["cp", "vx", "vy", "vz", "cf", "yplus"],
        "volumeVariables": ["resrho", "temp"],
        "outputDirectory": str(tmp_path)}, mesh=mesh)
    ap = AeroProblem(name="mn", mach=0.2, reynolds=1e4, reynoldsLength=1.0,
                     T=288.15)
    solver(ap)
    solver.writeSolution()
    with h5py.File(tmp_path / "mn_000_vol.cgns", "r") as f:
        assert "GlobalConvergenceHistory" in f["Base"]
        zone = [k for k in f["Base"]
                if isinstance(f["Base"][k], h5py.Group)
                and "FlowSolution" in f["Base"][k]][0]
        sol = f["Base"][zone]["FlowSolution"]
        for name in ("Density", "Pressure", "ResidualDensity",
                     "Temperature"):
            assert name in sol, list(sol)
    hdr = open(tmp_path / "mn_000_surf.dat").readlines()[1]
    for name in ("Cp", "Cf", "YPlus", "VelocityX"):
        assert name in hdr


def test_tecplot_volume_and_surface_sensitivity(quick_solve, tmp_path):
    """Tecplot volume writer (tecplotIO.F90 analogue) and
    writeSurfaceSensitivity (pyADflow.py:2962)."""
    s, ap = quick_solve
    fn = str(tmp_path / "vol.dat")
    s.writeTecplotVolumeFile(fn)
    txt = open(fn).read()
    assert "ZONE" in txt and "CoordinateX" in txt
    data = np.loadtxt(fn, skiprows=3)
    assert data.shape[1] >= 4
    assert np.isfinite(data).all()

    fn2 = str(tmp_path / "sens.dat")
    s.writeSurfaceSensitivity(fn2, "cl")
    txt2 = open(fn2).read().splitlines()
    assert "dX dY dZ" in txt2[0]
    assert any("FEQuadrilateral" in ln for ln in txt2)
    vals = np.array([ln.split() for ln in txt2
                     if len(ln.split()) == 6], dtype=float)
    assert len(vals) > 0 and np.isfinite(vals).all()
    # the sensitivity field must be nonzero somewhere on the wall
    assert np.abs(vals[:, 3:]).max() > 1e-8


def test_isosurface_extraction(quick_solve, tmp_path):
    """Marching-tets isosurface (isoSurface option, outputMod.F90:68):
    the Mach isosurface of the converged airfoil flow is non-empty and
    every triangle vertex interpolates the isovalue."""
    s, ap = quick_solve
    fn = str(tmp_path / "iso.dat")
    s.writeIsoSurfaceFile(fn, {"mach": 0.4})
    txt = open(fn).read()
    assert "FETRIANGLE" in txt
    # sphere-test of the machinery itself: iso of an analytic field
    from adflow_tpu.io.isosurface import marching_tets
    n = 12
    g = np.linspace(-1, 1, n + 1)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    x = np.stack([X, Y, Z], axis=-1)
    r = np.sqrt(X**2 + Y**2 + Z**2)
    tri = marching_tets(x, r, 0.7)
    assert len(tri) > 100
    radii = np.linalg.norm(tri.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(radii, 0.7, atol=0.02)
