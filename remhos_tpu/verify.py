"""Dof-level runtime bounds verification (-vb), jit-compatible.

The reference's main debug instrument: with -vb every RK stage asserts
every dof against its per-dof admissible interval (check_violation,
remhos.cpp:1557-1594, call sites :1824-1837), the FCT product solvers
verify s_avg and the final us against the scaled bounds
(remhos_fct.cpp:84-101, 264-292, 568-610), and VerifyLOProduct checks the
compatible-LO product theorem (remhos_sync.cpp:180-228).

The reference aborts at the first violating dof. Inside jit we cannot
abort, so each check returns a violation COUNT; the counts are accumulated
into the step's aux channel (see operator.limit_mult) and the driver
raises as soon as a step reports a nonzero count — same observable
behavior (hard failure within one step of the violation), one device
fetch per step.
"""

from __future__ import annotations

import jax.numpy as jnp

TOL = 1e-12  # the reference's check tolerance (remhos.cpp:1826, 1835)


def count_out_of_bounds(u_new, u_min, u_max, tol=TOL, active=None):
    """Number of dofs with u_new outside [u_min - tol, u_max + tol]
    (check_violation, remhos.cpp:1557-1575)."""
    bad = (u_new + tol < u_min) | (u_new > u_max + tol)
    if active is not None:
        bad = bad & active
    return bad.sum(dtype=jnp.int32)


def check_violation(u, dt, du, u_min, u_max, tol=TOL, active=None):
    """check_violation on a forward-Euler update u + dt*du
    (remhos.cpp:1577-1594)."""
    return count_out_of_bounds(u + dt * du, u_min, u_max, tol, active)


def check_s_avg(mass_us, mass_u, s_avg, smin, smax, active_el, eps=TOL):
    """Per-element s_avg stencil-bounds check inside
    CalcCompatibleLOProduct (remhos_fct.cpp:84-101): s_avg = mass_us/mass_u
    must lie in the full active-dof stencil bounds [smin, smax] after the
    round-off fixes. Inputs are per-element [E]; returns a count."""
    bad = ((mass_us + eps < smin * mass_u) |
           (mass_us - eps > smax * mass_u) |
           (s_avg + eps < smin) |
           (s_avg - eps > smax))
    return (bad & active_el).sum(dtype=jnp.int32)


def check_final_us(us, dt, d_us, us_min, us_max, active_el, active_dofs,
                   eps=TOL):
    """Final product-solution bounds check after CalcFCTProduct
    (ClipScale remhos_fct.cpp:568-610; FluxBased :264-292): us + dt*d_us
    within [us_min - eps, us_max + eps] on active dofs of active
    elements."""
    us_new = us + dt * d_us
    bad = (us_new + eps < us_min) | (us_new - eps > us_max)
    act = active_el[:, None] & active_dofs
    return (bad & act).sum(dtype=jnp.int32)


def verify_lo_product(us_LO, u_LO, s_min, s_max, active_el, active_dofs,
                      eps=TOL):
    """Basic LO product theorem (VerifyLOProduct, remhos_sync.cpp:180-228):
    on every active dof of an active element, us_LO must lie in
    [smin_K * u_LO, smax_K * u_LO] where smin_K/smax_K are the element-wide
    extrema of the dof bounds over active dofs. Returns a count.

    us_LO / u_LO are the updated LO product and field values [E, nd].
    (Debug helper in the reference; never called by the driver there.)
    """
    smin_el = jnp.where(active_dofs, s_min, jnp.inf).min(axis=1)
    smax_el = jnp.where(active_dofs, s_max, -jnp.inf).max(axis=1)
    lo = smin_el[:, None] * u_LO
    hi = smax_el[:, None] * u_LO
    bad = (us_LO + eps < lo) | (us_LO - eps > hi)
    act = active_el[:, None] & active_dofs
    return (bad & act).sum(dtype=jnp.int32)
