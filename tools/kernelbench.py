"""Differential timing of fused_stage_ho sections on TPU (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")

from remhos_tpu import problems as prob
from remhos_tpu.discretization import build_discretization
from remhos_tpu.driver import _integrate_mesh_velocity, _project_bernstein
from remhos_tpu.mesh import make_cartesian_mesh
from remhos_tpu.operator import Advection, SolverConfig

N_INNER = 50


def scan_time(fn, u0, reps=3, n=N_INNER):
    def loop(u):
        def body(c, _):
            r = fn(c)
            return c + 1e-12 * r, ()
        out, _ = jax.lax.scan(body, u, None, length=n)
        return out
    f = jax.jit(loop)
    jax.block_until_ready(f(u0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(u0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    n = int(os.environ.get("BENCH_N", "24"))
    p = int(os.environ.get("BENCH_P", "3"))
    mesh = make_cartesian_mesh(3, (n, n, n), (0, 0, 0), (1, 1, 1),
                               (False, False, False))
    disc = build_discretization(mesh, p)
    scfg = SolverConfig(problem=10, ho=3, lo=5, fct=2, ode_solver=3,
                        pa=True, use_pallas=True)
    x0 = jnp.asarray(mesh.x)
    v = _integrate_mesh_velocity(mesh.x, disc.Bm, 10, mesh.bb_min,
                                 mesh.bb_max, 0.7, 0.02)
    u0, _ = _project_bernstein(
        x0, disc.Bm_at_unodes,
        lambda x: prob.u0_function(10, x, mesh.bb_min, mesh.bb_max))
    w = jnp.float32
    x0, v, u0 = x0.astype(w), v.astype(w), u0.astype(w)
    adv = Advection(disc, scfg, x0, v, None, dtype=w)
    E, nd = u0.shape
    print(f"E={E} nd={nd} Q={len(disc.w_q)} nm={disc.Bm.shape[1]}",
          flush=True)

    from remhos_tpu.ops import pallas_kernels as pk
    tables = adv._stage_tables
    xs = x0 + 0.1 * v
    unbr = jax.jit(lambda u: adv.gather_nbr(u).reshape(E, -1))(u0)

    be = int(os.environ.get("KB_BE", "256"))
    cases = [
        ("volume only (n_cg=0)", dict(n_cg=0, with_face=False)),
        ("vol+face   (n_cg=0)", dict(n_cg=0)),
        ("vol+face   (n_cg=3)", dict(n_cg=3)),
    ]
    for label, kw in cases:
        if kw is None:
            fn = lambda u: pk.fused_geom_conv(xs, v, u, disc, 1.0,
                                              block_e=128)[0]
        else:
            fn = lambda u, kw=kw: pk.fused_stage_ho(
                xs, v, u, unbr, tables, mode=1.0, block_e=be, **kw)[0]
        print(f"{label}  {1e3 * scan_time(fn, u0):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
