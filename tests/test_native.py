"""Native C++ setup kernels == numpy reference implementations, and the
MFEM mesh parser reads the actual reference data files correctly."""

import os

import numpy as np
import pytest

from remhos_tpu.native import (build_cg_index, build_neighbor_table,
                               is_available, load_mfem_mesh)
from remhos_tpu.dofmaps import build_dofmaps
from remhos_tpu.mesh import load_mesh, make_cartesian_mesh

pytestmark = pytest.mark.skipif(not is_available(),
                                reason="no native toolchain")

REF_DATA = "/root/reference/data"


def test_neighbor_table_matches_numpy():
    for dim, shape, per in [(2, (5, 3), (True, False)),
                            (3, (4, 3, 2), (False, True, True)),
                            (1, (7,), (True,))]:
        m = make_cartesian_mesh(dim, shape, (0,) * dim, (1,) * dim, per)
        nat = build_neighbor_table(shape, per)
        assert np.array_equal(nat, m.nbr_elem)


def test_cg_index_matches_numpy():
    for dim, shape, per, q in [(2, (4, 4), (True, True), 3),
                               (3, (3, 2, 2), (False, False, True), 2)]:
        m = make_cartesian_mesh(dim, shape, (0,) * dim, (1,) * dim, per)
        dm = build_dofmaps(m, q)
        nat = build_cg_index(shape, per, q)
        assert np.array_equal(nat, dm.cg_idx)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="no reference data")
class TestMFEMParser:
    def test_inline_quad(self):
        m = load_mfem_mesh(f"{REF_DATA}/inline-quad.mesh")
        assert m["kind"] == "inline"
        assert m["dim"] == 2 and m["n"] == (4, 4) and m["s"] == (1.0, 1.0)

    def test_periodic_square_nodes_match_registry(self):
        m = load_mfem_mesh(f"{REF_DATA}/periodic-square.mesh")
        assert m["kind"] == "v10" and m["dim"] == 2
        assert m["elem_verts"].shape == (9, 4)
        # the registry's exact breakpoints must appear in the file nodes
        xs = np.unique(m["l2_nodes"][..., 0].round(12))
        reg = load_mesh("periodic-square")
        assert np.allclose(sorted(xs), reg.breaks[0], atol=0)

    def test_periodic_cube_truncated_coords(self):
        m = load_mfem_mesh(f"{REF_DATA}/periodic-cube.mesh")
        assert m["dim"] == 3 and m["elem_verts"].shape == (27, 8)
        xs = np.unique(m["l2_nodes"][..., 0])
        reg = load_mesh("periodic-cube")
        assert np.allclose(sorted(xs), reg.breaks[0], atol=0)

    def test_cube01_hex(self):
        m = load_mfem_mesh(f"{REF_DATA}/cube01_hex.mesh")
        assert m["dim"] == 3 and m["elem_verts"].shape == (8, 8)
        xs = np.unique(m["verts"][:, 0])
        assert np.allclose(sorted(xs), [0, 0.5, 1.0], atol=0)

    def test_periodic_segment(self):
        m = load_mfem_mesh(f"{REF_DATA}/periodic-segment.mesh")
        assert m["dim"] == 1 and m["elem_verts"].shape == (4, 2)
