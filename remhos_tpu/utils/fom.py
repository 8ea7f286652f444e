"""Per-phase kernel timing and the reference's figure-of-merit report.

TimingData/PrintTimingData equivalent (remhos_tools.hpp:52-64,
remhos.cpp:1918-1966): wall times for the RHS (K·u incl. per-stage remap
geometry), INV (mass inverse), LO and FCT phases, and the five FOMs in
megadofs × time steps / second. Only meaningful for the canonical config
-ho 3 -lo 5 -fct 2, like the reference.

The reference accumulates stopwatches inside the solve; on TPU that would
force host syncs between fused kernels, so phases are measured by timing
each jitted sub-function standalone over the same inputs (amortized over
`reps` calls), which is what the phase times mean here.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from .. import bounds as bnd
from .. import fct as fctm
from .. import lo as lom
from .. import pa as pam


def _time(fn, args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_phases(adv, u, t, dt, reps=10):
    """Per-stage phase times (seconds) for the canonical PA config."""
    assert adv.cfg.pa, "phase FOMs are reported for the PA hot path"
    geom_fn = jax.jit(adv.geometry)
    geom = geom_fn(jnp.asarray(t))
    jax.block_until_ready(geom["ml"])

    def rhs(u, t):
        g = adv.geometry(t)
        u_nbr = adv.gather_nbr(u)
        Ku = pam.conv_action(u, g["va"], adv.Gu, adv.Bu_w)
        contrib = pam.face_full_apply(u[:, adv.bdr_dofs], u_nbr, adv.Bface,
                                      g["wvn"])
        from .. import assembly as asm
        return asm.scatter_face_add(Ku, contrib, adv.bdr_dofs), g

    rhs_j = jax.jit(rhs)
    Ku, _ = rhs_j(u, jnp.asarray(t))

    inv_j = jax.jit(lambda r, g: pam.mass_solve_gl(r, g["wdet"], adv.Bgl,
                                                   adv.A_gl2b))
    du_ho = inv_j(Ku, geom)

    lo_j = jax.jit(lambda uu, d, g: lom.mass_based_avg(uu, d, dt, g["detJ"],
                                                       adv.w_q, adv.Bu))
    du_lo = lo_j(u, du_ho, geom)

    def fct_fn(uu, dho, dlo, g):
        el_min, el_max = bnd.elements_min_max(uu)
        x_min, x_max = adv.compute_bounds(el_min, el_max)
        return fctm.clip_scale(uu, g["ml"], dho, dlo, x_min, x_max, dt)

    fct_j = jax.jit(fct_fn)
    _ = fct_j(u, du_ho, du_lo, geom)

    return {
        "rhs": _time(rhs_j, (u, jnp.asarray(t)), reps),
        "inv": _time(inv_j, (Ku, geom), reps),
        "lo": _time(lo_j, (u, du_ho, geom), reps),
        "fct": _time(fct_j, (u, du_ho, du_lo, geom), reps),
    }


def print_fom_report(phase_times, ndofs, steps):
    """The reference's report block (remhos.cpp:1938-1952)."""
    T = {k: v * steps for k, v in phase_times.items()}
    total = T["rhs"] + T["lo"] + T["fct"]
    ds = ndofs * steps
    print("---")
    print(f"RHS   kernel time: {T['rhs']:.6g}")
    print(f"L2inv kernel time: {T['inv']:.6g}")
    print(f"LO    kernel time: {T['lo']:.6g}")
    print(f"FCT   kernel time: {T['fct']:.6g}")
    print(f"Total kernel time: {total:.6g}")
    print("---")
    print(f"FOM RHS: {1e-6 * ds / T['rhs']:.6g}")
    print(f"FOM INV: {1e-6 * ds / T['inv']:.6g}")
    print(f"FOM LO:  {1e-6 * ds / T['lo']:.6g}")
    print(f"FOM FCT: {1e-6 * ds / T['fct']:.6g}")
    print(f"FOM:     {1e-6 * ds / total:.6g}")
    print("(megadofs x time steps / second)\n---")
    return {"fom_rhs": 1e-6 * ds / T["rhs"], "fom_inv": 1e-6 * ds / T["inv"],
            "fom_lo": 1e-6 * ds / T["lo"], "fom_fct": 1e-6 * ds / T["fct"],
            "fom": 1e-6 * ds / total}
