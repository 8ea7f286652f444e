"""General 3D hex topology: orientation-aware neighbor/CG tables.

The decisive test scrambles every element's local frame with a random cube
rotation (one of the 24 orientation-preserving corner relabelings): the
physics is frame-invariant, so the run must reproduce the unscrambled
results exactly — this exercises every relative face orientation the
reference's GetLocalFaceDofIndex3D caseology covers.
"""

import os

import numpy as np
import pytest

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run
from remhos_tpu.umesh3d import from_arrays_3d
from remhos_tpu.mesh import load_mesh

CUBE01 = "/root/reference/data/cube01_hex.mesh"


def _rotations():
    """The 24 rotation matrices of the cube (axis permutation x signs,
    det=+1)."""
    import itertools
    rots = []
    for perm in itertools.permutations(range(3)):
        for signs in itertools.product((1, -1), repeat=3):
            R = np.zeros((3, 3))
            for a in range(3):
                R[a, perm[a]] = signs[a]
            if np.linalg.det(R) > 0:
                rots.append(R)
    return rots


def _scramble(mesh, seed=0):
    """Apply a random rotation to each element's local corner frame."""
    rng = np.random.default_rng(seed)
    rots = _rotations()
    bits = np.stack([(np.arange(8) >> d) & 1 for d in range(3)], -1)  # [8,3]
    ref = bits - 0.5
    new_corners = np.empty_like(mesh.corners)
    new_pos = np.empty_like(mesh.corner_pos)
    for e in range(mesh.num_elements):
        R = rots[rng.integers(len(rots))]
        # rotated reference coords of each corner -> which old corner sits
        # at the new local position
        newref = ref @ R.T
        newbits = (newref > 0).astype(int)
        old_of_new = newbits @ np.array([1, 2, 4])
        new_corners[e] = mesh.corners[e][old_of_new]
        new_pos[e] = mesh.corner_pos[e][old_of_new]
    return from_arrays_3d(new_corners, new_pos, mesh.mesh_order)


@pytest.mark.skipif(not os.path.exists(CUBE01), reason="no reference data")
class TestGeneral3D:
    def test_cube01_general_matches_golden(self):
        r = run(RunConfig(mesh=CUBE01, problem=10, rs_levels=1, order=2,
                          dt=0.02, t_final=0.7, max_tsteps=10,
                          ho=3, lo=1, fct=1, verbose=False))
        rs = run(RunConfig(mesh="cube01_hex", problem=10, rs_levels=1,
                           order=2, dt=0.02, t_final=0.7, max_tsteps=10,
                           ho=3, lo=1, fct=1, verbose=False))
        assert abs(r.final_mass_u - rs.final_mass_u) < 1e-13
        assert abs(r.max_u - rs.max_u) < 1e-13

    def test_orientation_scramble_invariance(self):
        from remhos_tpu.umesh import load_general_mesh
        from remhos_tpu.driver import run as _run
        import remhos_tpu.driver as drv

        base = load_general_mesh(CUBE01, rs_levels=1)
        scrambled = _scramble(base, seed=42)
        results = []
        for m in (base, scrambled):
            # run through the driver with an injected mesh
            orig = drv.load_mesh
            try:
                drv.load_mesh = lambda *a, **k: m
                r = _run(RunConfig(mesh="injected", problem=10, rs_levels=0,
                                   order=2, dt=0.02, t_final=0.7,
                                   max_tsteps=8, ho=3, lo=3, fct=2,
                                   verbose=False))
            finally:
                drv.load_mesh = orig
            results.append(r)
        r0, r1 = results
        assert abs(r0.final_mass_u - r1.final_mass_u) < 1e-13
        assert abs(r0.max_u - r1.max_u) < 1e-12
