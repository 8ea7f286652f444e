"""Sharded general (unstructured / curved / periodic-table) meshes must
reproduce the unsharded results to round-off, for both bounds stencils,
transport and remap.

Device counts: the CI host has ONE physical core backing all virtual
devices; XLA's in-process AllGather rendezvous can thread-starve when 8
device programs with heavy per-stage compute (remap geometry, IDP
multi-stage) block simultaneously (xla::internal::AwaitAndLogIfStuck
aborts). Transport runs are validated on 8 devices; the remap/IDP runs
use 4 — the sharding code is identical, only the test harness' device
count differs."""

import os

import pytest

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run

DATA = os.environ.get("REMHOS_REF_DATA", "/root/reference/data")
UNSTR = os.path.join(DATA, "unstr.mesh")
HEX = os.path.join(DATA, "periodic-hexagon.mesh")
STARQ2 = os.path.join(DATA, "star-q2.mesh")

needs_data = pytest.mark.skipif(not os.path.exists(UNSTR),
                                reason="no reference data")


def _pair(cfg_kw, n=8):
    r1 = run(RunConfig(verbose=False, **cfg_kw))
    rn = run(RunConfig(verbose=False, n_shards=n, **cfg_kw))
    return r1, rn


@needs_data
@pytest.mark.parametrize("bt", [0, 1])
def test_unstr_sharded_matches(bt):
    # 888 elements after one refinement -> 111 per shard
    r1, r8 = _pair(dict(mesh=UNSTR, problem=1, rs_levels=1, order=2,
                        dt=0.02, t_final=0.08, ho=3, lo=3, fct=2,
                        bounds_type=bt))
    assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13 * abs(
        r1.final_mass_u)
    assert abs(r1.max_u - r8.max_u) < 1e-13


@needs_data
def test_hexagon_periodic_sharded_matches():
    r1, r8 = _pair(dict(mesh=HEX, problem=5, rs_levels=2, order=3,
                        dt=0.005, t_final=0.02, ho=3, lo=2, fct=2))
    assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13 * abs(
        r1.final_mass_u)
    assert abs(r1.max_u - r8.max_u) < 1e-13


@needs_data
def test_star_q2_curved_remap_sharded_matches():
    r1, r4 = _pair(dict(mesh=STARQ2, problem=14, rs_levels=1, order=3,
                        dt=0.005, t_final=0.02, ho=3, lo=5, fct=2), n=4)
    assert abs(r1.final_mass_u - r4.final_mass_u) < 1e-13 * abs(
        r1.final_mass_u)
    assert abs(r1.max_u - r4.max_u) < 1e-13


@needs_data
def test_sharded_general_subcell_rd_matches():
    # subcell RD (-lo 4) on a sharded general mesh: the global subcell
    # boundary-velocity mask rides shard_map like the other tables
    r1, r8 = _pair(dict(mesh=UNSTR, problem=1, rs_levels=1, order=2,
                        dt=0.02, t_final=0.04, ho=3, lo=4, fct=2), n=8)
    assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13 * abs(
        r1.final_mass_u)
    assert abs(r1.max_u - r8.max_u) < 1e-13


@needs_data
def test_sharded_general_rejects_mono():
    with pytest.raises(NotImplementedError):
        run(RunConfig(mesh=UNSTR, problem=0, rs_levels=1, order=2,
                      dt=0.02, t_final=0.04, mono=1, ho=0, lo=0, fct=0,
                      n_shards=8, verbose=False))


@needs_data
def test_dcn_device_order_single_slice_identical():
    """-dcn orders devices slice-major; on single-slice (CPU) platforms it
    reduces to id order and must not change results."""
    kw = dict(mesh=UNSTR, problem=1, rs_levels=1, order=2, dt=0.02,
              t_final=0.04, ho=3, lo=3, fct=2, n_shards=8)
    r = run(RunConfig(verbose=False, **kw))
    rd = run(RunConfig(verbose=False, dcn=True, **kw))
    assert r.final_mass_u == rd.final_mass_u
    assert r.max_u == rd.max_u


@needs_data
def test_product_remap_general_sharded_matches():
    kw = dict(mesh=STARQ2, problem=14, rs_levels=1, order=2, dt=0.005,
              t_final=0.015, ho=3, lo=5, fct=2, product_sync=True,
              ode_solver=12)
    r1, r4 = _pair(kw, n=4)
    assert abs(r1.final_mass_us - r4.final_mass_us) < 1e-12 * max(
        abs(r1.final_mass_us), 1.0)
    assert abs(r1.max_s - r4.max_s) < 1e-12
