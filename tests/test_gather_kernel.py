"""Single-kernel Pallas neighbor gather == XLA structured gather.

The fused/mega stage kernels consume the face-neighbor trace
u_nbr[E, nf*fd] (ExchangeFaceNbrData equivalent, remhos_lo.cpp:57).
`gather_nbr_flat` produces it in ONE Pallas pass (3-block VMEM window);
these tests pin it bit-identical to `gather_nbr_structured` across
dims, shapes (incl. nblk=1 and last-axis |delta|==block-size faces,
the Mosaic zero-size-slice regression), and periodicity combinations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from remhos_tpu.mesh import make_mesh_from_breaks
from remhos_tpu.dofmaps import build_dofmaps
from remhos_tpu.structured import gather_nbr_structured
from remhos_tpu.ops import pallas_kernels as pk


def _case(shape, periodic, p):
    dim = len(shape)
    breaks = tuple(np.linspace(0.0, 1.0, s + 1) for s in shape)
    mesh = make_mesh_from_breaks(dim, breaks, tuple(periodic), 1)
    dm = build_dofmaps(mesh, p)
    E = int(np.prod(shape))
    nd = dm.nd
    rng = np.random.default_rng(hash((shape, tuple(periodic), p)) % 2**32)
    u = jnp.asarray(rng.standard_normal((E, nd)))
    ref = gather_nbr_structured(u, shape, tuple(periodic),
                                np.asarray(dm.nbr_dof_local))
    ref = ref.reshape(E, -1)
    meta = pk.gather_nbr_flat_meta(shape, tuple(periodic),
                                   np.asarray(dm.nbr_dof_local), nd)
    return u, ref, meta


CASES = [
    # dim=2: be = shape[0]; last-axis faces have |delta| == be
    ((8, 5), (True, True), 2),
    ((8, 5), (False, False), 2),
    ((16, 3), (True, False), 3),
    ((16, 3), (False, True), 1),
    ((8, 1), (True, True), 2),       # nblk == 1, periodic wrap-to-self
    ((8, 1), (False, False), 2),     # nblk == 1, both edges physical
    # dim=3: be = shape[0]*shape[1]
    ((8, 4, 3), (True, True, True), 2),
    ((8, 4, 3), (False, False, False), 2),
    ((8, 2, 2), (False, True, True), 1),
    ((8, 2, 4), (True, False, False), 3),
]


@pytest.mark.parametrize("shape,periodic,p", CASES)
def test_gather_flat_matches_xla(shape, periodic, p):
    u, ref, meta = _case(shape, periodic, p)
    assert meta is not None, "layout should be supported"
    out = pk.gather_nbr_flat(u, meta)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_flat_under_jit_and_f32():
    shape, periodic, p = (8, 4, 3), (True, False, True), 2
    u, ref, meta = _case(shape, periodic, p)
    u32 = u.astype(jnp.float32)
    out = jax.jit(lambda x: pk.gather_nbr_flat(x, meta))(u32)
    ref32 = gather_nbr_structured(
        u32, shape, periodic,
        np.asarray(build_dofmaps(
            make_mesh_from_breaks(
                3, tuple(np.linspace(0.0, 1.0, s + 1) for s in shape),
                periodic, 1), p).nbr_dof_local)).reshape(u.shape[0], -1)
    # same dtype in, bit-identical out (one-hot extraction is exact)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref32))


def test_meta_rejects_unsupported_layout():
    # be not a multiple of 8 -> fall back to the XLA gather
    shape, periodic = (6, 4), (True, True)
    breaks = tuple(np.linspace(0.0, 1.0, s + 1) for s in shape)
    mesh = make_mesh_from_breaks(2, breaks, periodic, 1)
    dm = build_dofmaps(mesh, 2)
    meta = pk.gather_nbr_flat_meta(shape, periodic,
                                   np.asarray(dm.nbr_dof_local), dm.nd)
    assert meta is None
