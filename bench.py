"""Benchmark: the reference's north-star metric on one TPU chip.

Runs the canonical FOM configuration (-ho 3 -lo 5 -fct 2: LocalInverse HO +
MassBasedAvg LO + ClipScale FCT; README.md:261-275) on a p=3 3D remap
problem and reports the combined FOM in the reference's units,
megaDOFs x RK-stages / second (remhos.cpp:1936-1952).

Baseline: the only absolute number recorded in the reference repo is the
dev-machine run in remhos_tests.cpp:53-58 -> total FOM ~= 2.31 MDOF*steps/s
(2.56M dofs * 5 steps / 5.537 s). vs_baseline is measured against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

DTYPE = os.environ.get("BENCH_DTYPE", "float64")
jax.config.update("jax_enable_x64", DTYPE == "float64")
_TAG = "f64" if DTYPE == "float64" else "f32"

BASELINE_FOM = 2.312  # MDOF*steps/s, remhos_tests.cpp:53-58


def main():
    from remhos_tpu import problems as prob
    from remhos_tpu import steppers
    from remhos_tpu.discretization import build_discretization
    from remhos_tpu.driver import _integrate_mesh_velocity, _project_bernstein
    from remhos_tpu.mesh import make_cartesian_mesh
    from remhos_tpu.operator import Advection, SolverConfig

    # p=3 3D remap (Taylor-Green mesh motion), ~0.88M dofs on one chip
    n = int(os.environ.get("BENCH_N", "24"))
    order, problem = 3, 10
    mesh = make_cartesian_mesh(3, (n, n, n), (0, 0, 0), (1, 1, 1),
                               (False, False, False))
    disc = build_discretization(mesh, order)
    scfg = SolverConfig(problem=problem, ho=3, lo=5, fct=2, ode_solver=3,
                        pa=True)  # the matrix-free TPU hot path

    dt = 0.02
    x0 = jnp.asarray(mesh.x)
    v = _integrate_mesh_velocity(mesh.x, disc.Bm, problem, mesh.bb_min,
                                 mesh.bb_max, 0.7, dt)
    u0, _ = _project_bernstein(
        x0, disc.Bm_at_unodes,
        lambda x: prob.u0_function(problem, x, mesh.bb_min, mesh.bb_max))
    S = jnp.stack([u0])
    ndofs = S.shape[1] * S.shape[2]

    adv = Advection(disc, scfg, x0, v, None)
    step = jax.jit(steppers.make_rk_step(adv.stage_function(), 3))

    # warmup/compile
    t = 0.0
    S_w, _ = step(S, t, dt)
    jax.block_until_ready(S_w)

    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    t0 = time.perf_counter()
    for i in range(n_steps):
        S, _ = step(S, t, dt)
        t += dt
    jax.block_until_ready(S)
    wall = time.perf_counter() - t0

    if os.environ.get("BENCH_PHASES"):
        from remhos_tpu.utils.fom import measure_phases, print_fom_report
        phases = measure_phases(adv, S[0], 0.1, dt)
        print_fom_report(phases, ndofs, n_steps * 3)

    stages = 3  # RK3: FOM counts stages (remhos.cpp:1340-1347)
    fom = 1e-6 * ndofs * n_steps * stages / wall
    result = {
        "metric": f"fom_total_p3_3d_remap_pa_{_TAG}",
        "value": round(fom, 3),
        "unit": "MDOF*stages/s",
        "vs_baseline": round(fom / BASELINE_FOM, 3),
    }
    print(json.dumps(result))
    print(f"# {ndofs} dofs, {n_steps} steps, {wall:.3f} s on "
          f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
