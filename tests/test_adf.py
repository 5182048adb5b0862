"""ADF-flavor CGNS ingestion tests.

Reference analogue: the ADF-flavor CGNS read path of
`/root/reference/src/partitioning/readCGNSGrid.F90` (every mdolab
regression mesh is ADF flavor). The fixture is synthesized (HDF5-flavor
write -> hdf5_to_adf) since the reference meshes are downloaded assets;
the disk layout follows the ADF core spec (io/adf.py docstring).
"""

import numpy as np
import pytest

from adflow_tpu.io.adf import (
    AdfNode, adf_to_hdf5, hdf5_to_adf, is_adf, read_adf_tree,
    write_adf_tree)
from adflow_tpu.io.cgns import read_cgns, read_cgns_solution, write_cgns
from adflow_tpu.meshgen.analytic import cube_mesh, naca0012_omesh


def _mesh_equal(a, b):
    assert len(a.blocks) == len(b.blocks)
    for ba, bb in zip(a.blocks, b.blocks):
        np.testing.assert_allclose(ba.x, bb.x, rtol=0, atol=0)
        assert len(ba.bcs) == len(bb.bcs)
        for sa, sb in zip(sorted(ba.bcs, key=lambda s: (s.face, s.bc)),
                          sorted(bb.bcs, key=lambda s: (s.face, s.bc))):
            assert sa.face == sb.face and sa.bc == sb.bc
            assert sa.family == sb.family and sa.rng == sb.rng
        assert len(ba.conns) == len(bb.conns)
        for ca, cb in zip(sorted(ba.conns, key=lambda c: c.face),
                          sorted(bb.conns, key=lambda c: c.face)):
            assert ca.face == cb.face
            assert ca.donor_block == cb.donor_block
            assert ca.transform == cb.transform
            assert ca.offset == cb.offset


def test_adf_tree_roundtrip(tmp_path):
    """write_adf_tree -> read_adf_tree preserves names, labels, dtypes and
    Fortran-ordered data exactly."""
    root = AdfNode("ADF MotherNode", "Root Node of ADF File", "MT", (),
                   None)
    base = root.add_child(AdfNode("Base", "CGNSBase_t", "I4", (),
                                  np.array([3, 3], np.int32)))
    arr = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    base.add_child(AdfNode("Coords", "DataArray_t", "R8", (), arr))
    base.add_child(AdfNode("Note", "Descriptor_t", "C1", (),
                           np.frombuffer(b"hello adf", np.int8)))
    p = str(tmp_path / "t.adf")
    write_adf_tree(root, p)
    assert is_adf(p)
    r = read_adf_tree(p)
    assert r.name == "ADF MotherNode"
    b = r["Base"]
    assert b.label == "CGNSBase_t"
    np.testing.assert_array_equal(np.asarray(b[" data"]),
                                  np.array([3, 3], np.int32))
    np.testing.assert_allclose(np.asarray(b["Coords"][" data"]), arr)
    assert np.asarray(b["Note"][" data"]).tobytes() == b"hello adf"


def test_adf_cgns_mesh_roundtrip(tmp_path):
    """A multiblock mesh written as CGNS-HDF5, converted to ADF flavor,
    reads back identically through the SAME read_cgns entry point."""
    from adflow_tpu.dist.stacked import split_block
    mesh = split_block(cube_mesh(n=4), 0, 0, 2)   # 2 blocks + b2b conn
    h5 = str(tmp_path / "m.cgns")
    adf = str(tmp_path / "m_adf.cgns")
    write_cgns(mesh, h5)
    hdf5_to_adf(h5, adf)
    assert is_adf(adf) and not is_adf(h5)
    m_h5 = read_cgns(h5)
    m_adf = read_cgns(adf)
    _mesh_equal(m_h5, m_adf)


def test_adf_solution_read(tmp_path):
    """Cell-centered FlowSolution survives the ADF conversion (restart
    parity, variableReading.F90)."""
    mesh = naca0012_omesh(ni=16, nj=8)
    ni, nj, nk = mesh.blocks[0].dims
    rng = np.random.default_rng(7)
    sol = {"Density": rng.random((ni, nj, nk)),
           "Pressure": rng.random((ni, nj, nk))}
    h5 = str(tmp_path / "s.cgns")
    adf = str(tmp_path / "s_adf.cgns")
    write_cgns(mesh, h5, solutions=[sol])
    hdf5_to_adf(h5, adf)
    got = read_cgns_solution(adf)[0]
    np.testing.assert_allclose(got["Density"], sol["Density"])
    np.testing.assert_allclose(got["Pressure"], sol["Pressure"])


def test_adf_to_hdf5_conversion(tmp_path):
    """The documented ADF->HDF5 conversion path (adf2hdf equivalent)."""
    mesh = cube_mesh(n=3)
    h5 = str(tmp_path / "a.cgns")
    adf = str(tmp_path / "a_adf.cgns")
    back = str(tmp_path / "a_back.cgns")
    write_cgns(mesh, h5)
    hdf5_to_adf(h5, adf)
    adf_to_hdf5(adf, back)
    _mesh_equal(read_cgns(h5), read_cgns(back))


def test_adf_big_endian_read(tmp_path):
    """Numeric-format 'B' (IEEE big-endian) files read correctly — real
    ADF files record the writing machine's format in the header."""
    root = AdfNode("ADF MotherNode", "Root Node of ADF File", "MT", (),
                   None)
    root.add_child(AdfNode("V", "DataArray_t", "R8", (),
                           np.array([1.5, -2.25, 3.125])))
    p = str(tmp_path / "be.adf")
    write_adf_tree(root, p)
    buf = bytearray(open(p, "rb").read())
    # flip the header's numeric-format char and byte-swap the one R8 array
    assert buf[100] == ord("L")
    buf[100] = ord("B")
    tree_le = read_adf_tree(p)       # sanity: little-endian read works
    np.testing.assert_allclose(np.asarray(tree_le["V"][" data"]),
                               [1.5, -2.25, 3.125])
    import re
    data = np.array([1.5, -2.25, 3.125]).tobytes()
    pos = bytes(buf).find(data)
    assert pos > 0
    buf[pos:pos + 24] = np.array([1.5, -2.25, 3.125]).byteswap().tobytes()
    pb = str(tmp_path / "be2.adf")
    open(pb, "wb").write(bytes(buf))
    tree_be = read_adf_tree(pb)
    np.testing.assert_allclose(np.asarray(tree_be["V"][" data"]),
                               [1.5, -2.25, 3.125])
