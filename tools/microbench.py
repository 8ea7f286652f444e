"""Micro-benchmark of the remap-stage pieces on TPU (dev tool).

Each piece runs inside a lax.scan (single dispatch) because per-call
dispatch through the axon tunnel costs ~1.5-3 ms — individually jitted
ops measure dispatch, not compute. The scan result feeds back into the
carry so nothing is dead code (same methodology as utils/fom.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")

from remhos_tpu import problems as prob
from remhos_tpu import steppers
from remhos_tpu.discretization import build_discretization
from remhos_tpu.driver import _integrate_mesh_velocity, _project_bernstein
from remhos_tpu.mesh import make_cartesian_mesh
from remhos_tpu.operator import Advection, SolverConfig

N_INNER = 30


def scan_time(fn, u0, reps=3, n=N_INNER, jitter=jax.jit):
    """Per-iteration seconds for u -> u-shaped fn, single dispatch.
    Pass jitter=adv.bind_poly for anything closing over the poly tables
    (plain jit inlines them as MLIR constants; the remote compile helper
    rejects the oversized module).

    MB_FIT=1: measure at n and 3n and report the SLOPE — every dispatched
    program pays a fixed ~25 ms host<->device orchestration latency
    through the axon tunnel, so single-length numbers carry a +latency/n
    floor (~0.8 ms at n=30). The fit doubles compile cost; default off.
    """
    def timed(length):
        def loop(u):
            def body(c, _):
                r = fn(c)
                return c + 1e-12 * r, ()
            out, _ = jax.lax.scan(body, u, None, length=length)
            return out
        f = jitter(loop)
        jax.block_until_ready(f(u0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(u0))
            best = min(best, time.perf_counter() - t0)
        return best
    b1 = timed(n)
    if os.environ.get("MB_FIT", "0") not in ("0", "", "false"):
        b3 = timed(3 * n)
        return (b3 - b1) / (2 * n)
    return b1 / n


def main():
    n = int(os.environ.get("BENCH_N", "24"))
    p = int(os.environ.get("BENCH_P", "3"))
    problem = 10
    mesh = make_cartesian_mesh(3, (n, n, n), (0, 0, 0), (1, 1, 1),
                               (False, False, False))
    disc = build_discretization(mesh, p)
    scfg = SolverConfig(problem=problem, ho=3, lo=5, fct=2, ode_solver=3,
                        pa=True, use_pallas=True)
    dt = 0.02
    x0 = jnp.asarray(mesh.x)
    v = _integrate_mesh_velocity(mesh.x, disc.Bm, problem, mesh.bb_min,
                                 mesh.bb_max, 0.7, dt)
    u0, _ = _project_bernstein(
        x0, disc.Bm_at_unodes,
        lambda x: prob.u0_function(problem, x, mesh.bb_min, mesh.bb_max))
    w = jnp.float32
    x0, v, u0 = x0.astype(w), v.astype(w), u0.astype(w)
    adv = Advection(disc, scfg, x0, v, None, dtype=w)
    E, nd = u0.shape
    print(f"E={E} nd={nd} Q={len(disc.w_q)} fused_stage={adv._fused_stage}")

    from remhos_tpu.ops import pallas_kernels as pk
    from remhos_tpu import pa as pam
    from remhos_tpu import lo as lom
    from remhos_tpu import bounds as bnd
    from remhos_tpu import fct as fctm

    tables = adv._stage_tables
    xs = x0 + 0.1 * v
    Bu = jnp.asarray(disc.Bu, w)
    w_q = jnp.asarray(disc.w_q, w)

    unbr0 = jax.jit(lambda u: adv.gather_nbr(u).reshape(E, -1))(u0)
    print(f"gather_nbr      {1e3 * scan_time(lambda u: adv.gather_nbr(u).reshape(E, -1)[:, :nd], u0):8.3f} ms", flush=True)

    for be in [int(x) for x in
               os.environ.get("MB_BLOCKS", "128").split(",")]:
        print(f"fused be={be:4d}   "
              f"{1e3 * scan_time(lambda u, be=be: pk.fused_stage_ho(xs, v, u, unbr0, tables, mode=1.0, block_e=be)[0], u0):8.3f} ms",
              flush=True)
    print(f"fused (n_cg=0)  "
          f"{1e3 * scan_time(lambda u: pk.fused_stage_ho(xs, v, u, unbr0, tables, mode=1.0, n_cg=0, block_e=128)[0], u0):8.3f} ms",
          flush=True)

    du_HO, wdet = jax.jit(lambda u: pk.fused_stage_ho(
        xs, v, u, unbr0, tables, mode=1.0, block_e=128))(u0)
    detJ = wdet / w_q[None, :]
    ml = pam.lumped_mass_pa(wdet, Bu)

    print(f"mass_based_avg  "
          f"{1e3 * scan_time(lambda u: lom.mass_based_avg(u, u, dt, detJ, w_q, Bu), u0):8.3f} ms")

    def bounds_f(u):
        el_min, el_max = bnd.elements_min_max(u)
        return adv.compute_bounds(el_min, el_max)[0]
    print(f"bounds          {1e3 * scan_time(bounds_f, u0):8.3f} ms")

    x_min, x_max = jax.jit(lambda u: adv.compute_bounds(
        *bnd.elements_min_max(u)))(u0)
    print(f"clip_scale      "
          f"{1e3 * scan_time(lambda u: fctm.clip_scale(u, ml, u, 0.9 * u, x_min, x_max, dt), u0):8.3f} ms")

    f = adv.stage_function()
    print(f"full stage      "
          f"{1e3 * scan_time(lambda u: f(jnp.asarray(0.1, w), dt, u[None])[0][0], u0, jitter=adv.bind_poly):8.3f} ms")

    step = steppers.make_rk_step(f, 3)
    S = jnp.stack([u0])

    def loop_steps(S):
        def body(c, _):
            Sn, _ = step(c, jnp.asarray(0.1, w), dt)
            return Sn, ()
        out, _ = jax.lax.scan(body, S, None, length=10)
        return out
    g = adv.bind_poly(loop_steps)
    r = g(S)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(S))
        best = min(best, time.perf_counter() - t0)
    print(f"RK3 10-step loop {1e3 * best:8.3f} ms  "
          f"({1e3 * best / 30:.3f} ms/stage, FOM "
          f"{1e-6 * E * nd * 30 / best:.0f})")


if __name__ == "__main__":
    main()
