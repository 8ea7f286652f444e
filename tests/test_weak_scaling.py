"""Weak scaling: fixed elements per shard, growing shard count.

The reference's weak-scaling harness is the `-epm` default mesh:
PartitionMPI builds a Cartesian mesh with exactly elem_per_mpi elements
per rank (remhos.cpp:453, verified :467-472; SURVEY.md C20/§2c). The TPU
equivalent is mesh.default_mesh(dim, n_shards, elem_per_shard): this test
pins, for shard counts 1 -> 8 on the virtual CPU mesh with elem/shard
FIXED,

  (a) the element-count contract NE == n_shards * elem_per_shard,
  (b) sharded == unsharded to round-off at every shard count (the
      goldens' rank-invariance requirement, autotest/test.sh:14), and
  (c) the per-shard halo payload scales with the LOCAL shard surface,
      not the global problem size — the property that makes weak scaling
      flat (DG face coupling is one element deep, SURVEY.md §5
      "long-context analog").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remhos_tpu import problems as prob
from remhos_tpu import steppers
from remhos_tpu.discretization import build_discretization
from remhos_tpu.driver import _integrate_mesh_velocity, _project_bernstein
from remhos_tpu.mesh import default_mesh
from remhos_tpu.operator import Advection, SolverConfig
from remhos_tpu.parallel.sharded import make_sharded_step, shard_arrays

EPM = 64        # elements per shard, fixed across the scan
ORDER = 2
PROBLEM = 10    # 3D remap (the FOM family)


def _one_step_pair(n_shards):
    """(sharded step result, unsharded reference, mesh, disc)."""
    mesh = default_mesh(3, n_shards, EPM)
    assert mesh.num_elements == n_shards * EPM     # (a) the -epm contract
    disc = build_discretization(mesh, ORDER)
    scfg = SolverConfig(problem=PROBLEM, ho=3, lo=5, fct=2, ode_solver=3)
    x0 = jnp.asarray(mesh.x)
    v = _integrate_mesh_velocity(mesh.x, disc.Bm, PROBLEM, mesh.bb_min,
                                 mesh.bb_max, 0.7, 0.1)
    u0, _ = _project_bernstein(
        x0, disc.Bm_at_unodes,
        lambda x: prob.u0_function(PROBLEM, x, mesh.bb_min, mesh.bb_max))
    S0 = jnp.stack([u0])
    infl = jnp.zeros_like(u0)

    dev_mesh, step, perm = make_sharded_step(mesh, scfg, ORDER,
                                             (n_shards,), 3)
    S, x0_sh, v_sh, infl_sh = shard_arrays(dev_mesh, dev_mesh.axis_names,
                                           S0, x0, v, infl, perm=perm)
    S_new, _ = step(S, jnp.asarray(0.0), jnp.asarray(0.01),
                    x0_sh, v_sh, infl_sh)

    adv1 = Advection(disc, scfg, x0, v, infl)
    S1, _ = jax.jit(steppers.make_rk_step(adv1.stage_function(), 3))(
        S0, jnp.asarray(0.0), jnp.asarray(0.01))
    return np.asarray(S_new), np.asarray(S1)[:, perm], mesh, disc


def halo_bytes_per_shard(mesh, n_shards, disc, itemsize=8):
    """Per-shard, per-gather u face-halo payload along the sharded (last)
    mesh axis: two cross-section slabs of face dofs each way."""
    if n_shards == 1:
        return 0
    cross = mesh.num_elements // mesh.shape[-1]    # elements per z-layer
    fd = (ORDER + 1) ** (mesh.dim - 1)             # face dofs
    return 2 * cross * fd * itemsize


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_weak_scaling_epm(n_shards):
    S_sh, S_ref, mesh, disc = _one_step_pair(n_shards)
    diff = float(np.abs(S_sh - S_ref).max())
    assert diff < 1e-13, f"sharded != unsharded at n={n_shards}: {diff:.3e}"

    # (c) the halo payload is a SHARD-LOCAL surface quantity: it equals
    # the local cross-section (local volume / local extent along the
    # sharded axis), independent of how many other shards exist
    hb = halo_bytes_per_shard(mesh, n_shards, disc)
    if n_shards > 1:
        local_cross = EPM // (mesh.shape[-1] // n_shards)
        fd = (ORDER + 1) ** (mesh.dim - 1)
        assert hb == 2 * local_cross * fd * 8
        # flat weak scaling: halo/work ratio bounded by the surface-to-
        # volume ratio of the local box at every shard count
        work = EPM * (ORDER + 1) ** mesh.dim * 8
        assert hb / work < 1.0
    print(f"n={n_shards}: NE={mesh.num_elements} "
          f"halo_bytes_per_shard={hb} diff={diff:.2e}")
