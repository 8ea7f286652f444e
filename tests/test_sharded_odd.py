"""Odd / non-divisible shard counts (the reference's np=3 regression
intent, CMakeLists.txt:79-81): element counts that do not divide the
shard count run through the general-table path with ghost padding
(parallel/gsharded.py) and must match the unsharded run to round-off.
"""

import numpy as np

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run


def _pair(n_shards, **kw):
    kw.setdefault("verbose", False)
    r1 = run(RunConfig(**kw))
    rn = run(RunConfig(n_shards=n_shards, **kw))
    return r1, rn


class TestOddShardCounts:
    def test_inline_quad_3_shards(self):
        # E = 256 after rs=1 -> 256 % 3 != 0 -> 2 ghost elements
        r1, r3 = _pair(3, mesh="inline-quad", problem=4, rs_levels=1,
                       order=2, dt=0.005, t_final=0.02, ho=3, lo=5, fct=2)
        assert abs(r1.final_mass_u - r3.final_mass_u) < 1e-12
        assert abs(r1.max_u - r3.max_u) < 1e-12
        # non-periodic domain: boundary flux means mass is NOT conserved;
        # what matters is that sharding does not change the loss
        assert abs(r1.mass_loss_u - r3.mass_loss_u) < 1e-12

    def test_inline_quad_5_shards(self):
        r1, r5 = _pair(5, mesh="inline-quad", problem=4, rs_levels=1,
                       order=2, dt=0.005, t_final=0.02, ho=3, lo=3, fct=2)
        assert abs(r1.final_mass_u - r5.final_mass_u) < 1e-12
        assert abs(r1.max_u - r5.max_u) < 1e-12

    def test_cube_hex_3_shards(self):
        # 3D: cube01_hex rs=1 -> 8 elements -> 1 ghost at n=3
        r1, r3 = _pair(3, mesh="cube01_hex", problem=0, rs_levels=1,
                       order=2, dt=0.01, t_final=0.03, ho=3, lo=5, fct=2)
        assert abs(r1.final_mass_u - r3.final_mass_u) < 1e-12
        assert abs(r1.max_u - r3.max_u) < 1e-12

    def test_remap_3_shards(self):
        # remap mode exercises per-stage geometry on the padded tables
        r1, r3 = _pair(3, mesh="inline-quad", problem=14, rs_levels=1,
                       order=2, dt=0.01, t_final=1.0, max_tsteps=4,
                       ho=3, lo=5, fct=2)
        assert abs(r1.final_mass_u - r3.final_mass_u) < 1e-12
        assert abs(r1.max_u - r3.max_u) < 1e-12


class TestShardedSubcell:
    def test_subcell_rd_remap_sharded_matches(self):
        # regression: init-time computations (subcell boundary velocity)
        # must use the GLOBAL bounding box and a global-context boundary
        # mask — the local shard's box/edges silently changed velocities
        r1, r2 = _pair(2, mesh="inline-quad", problem=14, rs_levels=1,
                       order=2, dt=0.01, t_final=1.0, max_tsteps=4,
                       ho=3, lo=4, fct=2)
        assert abs(r1.final_mass_u - r2.final_mass_u) < 1e-13
        assert abs(r1.max_u - r2.max_u) < 1e-13

    def test_subcell_rd_remap_odd_shards(self):
        # same through the general-table fallback (n=3 + ghost padding)
        r1, r3 = _pair(3, mesh="inline-quad", problem=14, rs_levels=1,
                       order=2, dt=0.01, t_final=1.0, max_tsteps=4,
                       ho=3, lo=4, fct=2)
        assert abs(r1.final_mass_u - r3.final_mass_u) < 1e-13
        assert abs(r1.max_u - r3.max_u) < 1e-13
