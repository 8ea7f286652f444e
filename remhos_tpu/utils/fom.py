"""Per-phase kernel timing and the reference's figure-of-merit report.

TimingData/PrintTimingData equivalent (remhos_tools.hpp:52-64,
remhos.cpp:1918-1966): wall times for the RHS (K·u incl. per-stage remap
geometry), INV (mass inverse), LO and FCT phases, and the five FOMs in
megadofs × time steps / second. Only meaningful for the canonical config
-ho 3 -lo 5 -fct 2, like the reference.

Methodology: the reference accumulates stopwatches inside the solve; on
TPU that would force host syncs between fused kernels. Instead phases are
measured by COMPOSED ABLATION: scan loops running progressively larger
prefixes of the real stage pipeline (geometry+RHS -> +INV -> +LO -> +FCT),
each stage result feeding the next so XLA cannot dead-code-eliminate
anything. A phase time is the delta between consecutive prefixes, so the
phase times sum to (approximately) the full-pipeline scan time, which is
cross-checked against the independently measured total.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from .. import bounds as bnd
from .. import fct as fctm


def _timed(f, args, reps=3):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def measure_phases(adv, u0, dt, n_stages=30, reps=3):
    """Composed-ablation phase times (seconds per stage) for the canonical
    PA config. Returns dict with per-stage times for rhs (incl. remap
    geometry), inv, lo, fct, and the full-pipeline per-stage time."""
    assert adv.cfg.pa, "phase FOMs are reported for the PA hot path"

    def stage_prefix(level):
        # level 1: geometry+RHS; 2: +INV; 3: +LO; 4: +bounds+FCT
        def one(u, t):
            geom = adv.geometry(t)
            u_nbr = adv.gather_nbr(u)
            from .. import assembly as asm
            from .. import pa as pam
            if "va" not in geom:
                from ..ops import pallas_kernels as pk
                Ku, _ = pk.fused_geom_conv(geom["xs"], adv.v_nodes, u,
                                           adv.disc, 1.0)
            else:
                Ku = pam.conv_action(u, geom["va"], adv.Gu, adv.Bu_w)
            contrib = pam.face_full_apply(u[:, adv.bdr_dofs], u_nbr,
                                          adv.Bface, geom["wvn"])
            Ku = asm.scatter_face_add(Ku, contrib, adv.bdr_dofs)
            out = Ku
            if level >= 2:
                du_HO = pam.mass_solve_gl(Ku, geom["wdet"], adv.Bgl,
                                          adv.A_gl2b)
                out = du_HO
            if level >= 3:
                from .. import lo as lom
                du_LO = lom.mass_based_avg(u, du_HO, dt, geom["detJ"],
                                           adv.w_q, adv.Bu)
                out = du_LO
            if level >= 4:
                el_min, el_max = bnd.elements_min_max(u)
                x_min, x_max = adv.compute_bounds(el_min, el_max)
                out = fctm.clip_scale(u, geom["ml"], du_HO, du_LO,
                                      x_min, x_max, dt)
            return out

        def loop(u, t0):
            def body(c, _):
                u, t = c
                r = one(u, t)
                # feed the result back (tiny perturbation) so no stage is
                # dead code, without changing the numerics materially
                return (u + 1e-12 * r, t + dt / 3), ()
            (u, _), _ = jax.lax.scan(body, (u, t0), None, length=n_stages)
            return u

        return jax.jit(loop)

    times = {}
    prev = 0.0
    labels = {1: "rhs", 2: "inv", 3: "lo", 4: "fct"}
    t_args = (u0, jnp.asarray(0.1, u0.dtype))
    for level in (1, 2, 3, 4):
        w = _timed(stage_prefix(level), t_args, reps) / n_stages
        times[labels[level]] = w - prev
        prev = w
    times["pipeline_total"] = prev
    return times


def print_fom_report(phase_times, ndofs, stages, total_wall=None):
    """The reference's report block (remhos.cpp:1938-1952). `stages` is
    RK stages x steps; FOMs are megadofs x stages / second per phase."""
    T = {k: phase_times[k] * stages for k in ("rhs", "inv", "lo", "fct")}
    total = sum(T.values())
    ds = ndofs * stages
    print("---")
    print(f"RHS   kernel time: {T['rhs']:.6g}")
    print(f"L2inv kernel time: {T['inv']:.6g}")
    print(f"LO    kernel time: {T['lo']:.6g}")
    print(f"FCT   kernel time: {T['fct']:.6g}")
    print(f"Total kernel time: {total:.6g}")
    if total_wall is not None:
        print(f"(cross-check: measured full-step wall {total_wall:.6g}, "
              f"phase-sum covers "
              f"{100.0 * total / max(total_wall, 1e-30):.0f}%)")
    print("---")
    out = {}
    for k, label in (("rhs", "RHS"), ("inv", "INV"), ("lo", "LO "),
                     ("fct", "FCT")):
        out[f"fom_{k}"] = 1e-6 * ds / max(T[k], 1e-30)
        print(f"FOM {label}: {out[f'fom_{k}']:.6g}")
    out["fom"] = 1e-6 * ds / total
    print(f"FOM:     {out['fom']:.6g}")
    print("(megadofs x time steps / second)\n---")
    return out
