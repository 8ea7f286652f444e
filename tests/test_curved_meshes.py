"""Higher-order curved general meshes (star-q2 'Quadratic', star-q3
'Cubic' H1 node grid functions; straight-sided unstr.mesh).

The decisive check for MFEM's oriented edge dofs (2 per edge at cubic
order, stored along the edge's canonical min->max vertex direction) is
geometric continuity: both elements sharing an edge must place the same
physical points on it. A wrong direction convention would swap the two
asymmetric Gauss-Lobatto edge nodes and break continuity at ~1e-2.
"""

import os

import numpy as np
import pytest

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run
from remhos_tpu.umesh import load_general_mesh

DATA = os.environ.get("REMHOS_REF_DATA", "/root/reference/data")
STARQ3 = os.path.join(DATA, "star-q3.mesh")
STARQ2 = os.path.join(DATA, "star-q2.mesh")
UNSTR = os.path.join(DATA, "unstr.mesh")

needs_data = pytest.mark.skipif(not os.path.exists(STARQ3),
                                reason="no reference data")


def _face_lattice_ids(n1):
    """lex-lattice node ids along each local face (mesh.FACES_2D order:
    y-, x+, y+, x-), walking the face's tangential direction."""
    ix = np.arange(n1)
    return [ix,                       # y-: iy=0
            n1 - 1 + n1 * ix,         # x+: ix=n1-1
            n1 * (n1 - 1) + ix,       # y+: iy=n1-1
            n1 * ix]                  # x-: ix=0


@needs_data
@pytest.mark.parametrize("path,order", [(STARQ2, 2), (STARQ3, 3)])
def test_edge_geometric_continuity(path, order):
    m = load_general_mesh(path, rs_levels=1)
    assert m.mesh_order == order
    n1 = order + 1
    fid = _face_lattice_ids(n1)
    checked = 0
    for e in range(m.num_elements):
        for f in range(4):
            e2 = m.nbr_elem[e, f]
            if e2 < 0:
                continue
            f2 = m.nbr_face[e, f]
            own = m.x[e, fid[f]]
            nbr = m.x[e2, fid[f2]]
            if m.nbr_flip[e, f]:
                nbr = nbr[::-1]
            np.testing.assert_allclose(own, nbr, atol=1e-13)
            checked += 1
    assert checked > 0


@needs_data
def test_star_q3_remap_consistent_with_q2():
    """star-q2 and star-q3 describe the same domain at different geometric
    order; the 5-step auto-dt remap masses must agree to the geometry
    representation difference (~1e-3), with positive Jacobians."""
    res = {}
    for path in (STARQ2, STARQ3):
        r = run(RunConfig(mesh=path, problem=14, rs_levels=1, order=3,
                          pa=True, dt=-1.0, t_final=0.5, ho=3, lo=5, fct=2,
                          max_tsteps=5, verbose=False))
        res[path] = r.final_mass_u
    # star-q2 row is the reference's 16-digit in-process golden
    assert abs(res[STARQ2] - 0.8069675186775516) < 1e-11
    assert abs(res[STARQ3] - res[STARQ2]) < 1.5e-3


@needs_data
def test_unstr_mesh_transport_conserves():
    r = run(RunConfig(mesh=UNSTR, problem=1, rs_levels=0, order=2,
                      dt=0.01, t_final=0.1, ho=3, lo=4, fct=2,
                      verbose=False))
    assert r.mass_loss_u < 1e-9
    assert 0.9 < r.max_u <= 1.0 + 1e-12
