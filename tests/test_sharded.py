"""Sharded == unsharded, on a virtual 8-device CPU mesh.

The reference's distributed testing contract (SURVEY.md §4): the same
goldens must come out under any rank count, up to round-off. Here we
assert much tighter: the halo-patched gathers reproduce the single-chip
gathers exactly, so sharded results match to ~1e-14.
"""

import jax
import numpy as np
import pytest

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _pair(n_shards, **kw):
    kw.setdefault("verbose", False)
    r1 = run(RunConfig(**kw))
    rn = run(RunConfig(n_shards=n_shards, **kw))
    return r1, rn


@needs_8
class TestShardedEqualsUnsharded:
    def test_transport_periodic(self):
        r1, r8 = _pair(8, mesh="periodic-square", problem=4, rs_levels=3,
                       order=3, dt=0.005, t_final=0.025, ho=3, lo=5, fct=2)
        assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13
        assert abs(r1.max_u - r8.max_u) < 1e-13

    def test_transport_resdist_nonperiodic_bounds(self):
        # inline-quad: non-periodic last axis exercises the halo edge masks;
        # RD exercises face flux lumping; bt=0 exercises CG plane exchange
        r1, r4 = _pair(4, mesh="inline-quad", problem=14, rs_levels=2,
                       order=3, dt=0.0015, t_final=0.75, max_tsteps=6,
                       ho=3, lo=3, fct=2)
        assert abs(r1.final_mass_u - r4.final_mass_u) < 1e-13
        assert abs(r1.max_u - r4.max_u) < 1e-13

    def test_remap_massbased(self):
        r1, r4 = _pair(4, mesh="cube01_hex", problem=10, rs_levels=1,
                       order=2, dt=0.02, t_final=0.7, max_tsteps=4,
                       ho=3, lo=5, fct=2)
        assert abs(r1.final_mass_u - r4.final_mass_u) < 1e-13
        assert abs(r1.max_u - r4.max_u) < 1e-13

    def test_sparsity_bounds_sharded(self):
        r1, r8 = _pair(8, mesh="periodic-square", problem=4, rs_levels=3,
                       order=2, dt=0.005, t_final=0.02, ho=3, lo=5, fct=2,
                       bounds_type=1)
        assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13
        assert abs(r1.max_u - r8.max_u) < 1e-13

    def test_discrete_upwind_sharded(self):
        r1, r8 = _pair(8, mesh="periodic-square", problem=4, rs_levels=3,
                       order=2, dt=0.005, t_final=0.02, ho=3, lo=1, fct=4)
        assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13
        assert abs(r1.max_u - r8.max_u) < 1e-13

    def test_product_remap_sharded(self):
        r1, r4 = _pair(4, mesh="inline-quad", problem=14, rs_levels=2,
                       order=3, dt=0.005, t_final=0.75, max_tsteps=4,
                       ho=3, lo=5, fct=2, product_sync=True, ode_solver=12)
        assert abs(r1.final_mass_us - r4.final_mass_us) < 1e-13
        assert abs(r1.max_s - r4.max_s) < 1e-12

    def test_weak_scaling_mesh(self):
        # -m default -epm contract: global NE = shards * elem_per_shard
        # (non-periodic box, so mass legitimately crosses the boundary;
        # assert sharded == unsharded instead of conservation)
        kw = dict(mesh="default", dim=2, elem_per_shard=32, problem=0,
                  order=2, dt=0.005, t_final=0.02, ho=3, lo=5, fct=2,
                  verbose=False)
        r8 = run(RunConfig(n_shards=8, **kw))
        r1 = run(RunConfig(n_shards=1, elem_per_shard=32 * 8 // 1, **{
            k: v for k, v in kw.items() if k != "elem_per_shard"}))
        assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13


@needs_8
class TestShardGrid2D:
    """2-D device mesh over the last two mesh axes (halos on both rings)."""

    def test_2d_grid_transport(self):
        kw = dict(mesh="periodic-cube", problem=0, rs_levels=1, order=2,
                  dt=0.015, t_final=2.0, max_tsteps=6, ho=3, lo=5, fct=2,
                  verbose=False)
        r1 = run(RunConfig(**kw))
        r24 = run(RunConfig(shard_grid=(2, 3), **kw))
        assert abs(r1.final_mass_u - r24.final_mass_u) < 1e-13
        assert abs(r1.max_u - r24.max_u) < 1e-13

    def test_2d_grid_remap_nonperiodic(self):
        kw = dict(mesh="cube01_hex", problem=10, rs_levels=1, order=2,
                  dt=0.02, t_final=0.7, max_tsteps=4, ho=3, lo=3, fct=2,
                  verbose=False)
        r1 = run(RunConfig(**kw))
        r22 = run(RunConfig(shard_grid=(2, 2), **kw))
        assert abs(r1.final_mass_u - r22.final_mass_u) < 1e-13
        assert abs(r1.max_u - r22.max_u) < 1e-13

    def test_2d_grid_2dmesh(self):
        kw = dict(mesh="periodic-square", problem=4, rs_levels=3, order=3,
                  dt=0.005, t_final=0.02, ho=3, lo=5, fct=2, verbose=False)
        r1 = run(RunConfig(**kw))
        r8 = run(RunConfig(shard_grid=(2, 4), **kw))
        assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13
        assert abs(r1.max_u - r8.max_u) < 1e-13

    def test_2d_grid_sparsity_bounds(self):
        kw = dict(mesh="periodic-square", problem=4, rs_levels=3, order=2,
                  dt=0.005, t_final=0.02, ho=3, lo=5, fct=2, bounds_type=1,
                  verbose=False)
        r1 = run(RunConfig(**kw))
        r8 = run(RunConfig(shard_grid=(4, 2), **kw))
        assert abs(r1.final_mass_u - r8.final_mass_u) < 1e-13
