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

# Default: f32 (the TPU production precision; f64 is software-emulated on
# v5e and runs ~150x slower through the same code — see README). Set
# BENCH_DTYPE=float64 for the reference-precision run or BENCH_DUAL=1 for
# both in one line.
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
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
                        pa=True,  # the matrix-free TPU hot path
                        use_pallas=bool(os.environ.get("BENCH_PALLAS")))

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
    step = steppers.make_rk_step(adv.stage_function(), 3)
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))

    # whole-loop fusion: N steps inside one jit via lax.scan — no per-step
    # host dispatch (the driver uses a python loop for dt control; the
    # bench measures the pure compute throughput of the canonical config)
    @jax.jit
    def run_steps(S, t0):
        def body(carry, _):
            S, t = carry
            S_new, _ = step(S, t, dt)
            return (S_new, t + dt), ()
        (S, _), _ = jax.lax.scan(body, (S, t0), None, length=n_steps)
        return S

    S_w = run_steps(S, jnp.asarray(0.0))
    jax.block_until_ready(S_w)

    t0 = time.perf_counter()
    S = run_steps(S, jnp.asarray(0.0))
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


def main_dual():
    """Run f32 (headline) and f64 (reference-precision parity) in child
    processes; print ONE JSON line."""
    import subprocess
    env = dict(os.environ)
    vals = {}
    for dtype in ("float32", "float64"):
        env["BENCH_DTYPE"] = dtype
        env.pop("BENCH_DUAL", None)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                vals[dtype] = json.loads(line)
        print(out.stderr.strip().splitlines()[-1] if out.stderr else "",
              file=sys.stderr)
    f32 = vals.get("float32", {})
    f64 = vals.get("float64", {})
    result = {
        "metric": "fom_total_p3_3d_remap_pa_f32",
        "value": f32.get("value", 0.0),
        "unit": "MDOF*stages/s",
        "vs_baseline": f32.get("vs_baseline", 0.0),
        "f64_value": f64.get("value", 0.0),
        "f64_vs_baseline": f64.get("vs_baseline", 0.0),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_DUAL"):
        main_dual()
    else:
        main()
