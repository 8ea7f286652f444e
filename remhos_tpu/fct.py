"""FCT limiters: blend du_HO and du_LO under per-dof bounds, conserving
lumped mass. TPU-native versions of remhos_fct.cpp, as elementwise /
per-element-reduction sweeps over [E, nd]:

- ``clip_scale``            (ClipScaleSolver, remhos_fct.cpp:449-541; `-fct 2`)
- ``element_fct_projection``(ElementFCTProjection, remhos_fct.cpp:613-731;
                             `-fct 4`)
- product-remap helpers CalcCompatibleLOProduct / ScaleProductBounds
  (remhos_fct.cpp:26-153) used by CalcFCTProduct.

Flux-based (sparse, cross-element) FCT lives in fct_flux.py.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_CS = 1.0e-15   # ClipScale rescale guard (remhos_fct.cpp:486)
EPS_PROD = 1.0e-12  # product round-off guards (remhos_fct.cpp:34)


def clip_scale(u, m, du_ho, du_lo, u_min, u_max, dt):
    """Per-element clip of the antidiffusive flux to the dof bounds, then a
    mass-conserving rescale (remhos_fct.cpp:484-539)."""
    u_new_lo = u + dt * du_lo
    f_min = m / dt * (u_min - u_new_lo)
    f_max = m / dt * (u_max - u_new_lo)
    f = m * (du_ho - du_lo)
    f = jnp.minimum(f_max, jnp.maximum(f_min, f))

    sumNeg = jnp.minimum(f, 0.0).sum(axis=1, keepdims=True)
    sumPos = jnp.maximum(f, 0.0).sum(axis=1, keepdims=True)
    new_mass = sumNeg + sumPos

    fpos = jnp.maximum(f, 0.0)
    fneg = jnp.minimum(f, 0.0)
    f = jnp.where(new_mass > EPS_CS, fneg - fpos * (sumNeg / sumPos), f)
    f = jnp.where(new_mass < -EPS_CS, fpos - fneg * (sumPos / sumNeg), f)

    return du_lo + f / m


def element_fct_projection(u, du_HO, du_LO, u_min, u_max, M_elem, dt):
    """Per-element dense FCT projection with the local consistent mass
    matrix (remhos_fct.cpp:613-731)."""
    ML = M_elem.sum(axis=2)                       # row sums
    du_max = (u_max - u) / dt
    du_min = (u_min - u) / dt

    rhs = jnp.einsum("eij,ej->ei", M_elem, du_HO)
    beta = ML / ML.sum(axis=1, keepdims=True)
    z = rhs - ML * du_LO

    # antisymmetric pairwise fluxes:
    # F[i,j] = M[i,j](duHO_i - duHO_j) + (beta_j z_i - beta_i z_j)
    dho = du_HO[:, :, None] - du_HO[:, None, :]
    F = M_elem * dho + (beta[:, None, :] * z[:, :, None]
                        - beta[:, :, None] * z[:, None, :])
    nd = u.shape[1]
    off = 1.0 - jnp.eye(nd, dtype=u.dtype)
    F = F * off

    gp = jnp.maximum(F, 0.0).sum(axis=2)
    gm = jnp.minimum(F, 0.0).sum(axis=2)

    du = du_LO
    rp = jnp.maximum(ML * (du_max - du), 0.0)
    rm = jnp.minimum(ML * (du_min - du), 0.0)
    ap = jnp.where(rp < gp, rp / gp, 1.0)
    am = jnp.where(rm > gm, rm / gm, 1.0)

    # alpha_ij symmetric: min(ap_i, am_j) for F_ij >= 0 else min(am_i, ap_j)
    aij = jnp.where(F >= 0.0,
                    jnp.minimum(ap[:, :, None], am[:, None, :]),
                    jnp.minimum(am[:, :, None], ap[:, None, :]))
    du = du + (aij * F).sum(axis=2) / ML
    return du


# ---------------------------------------------------------------------------
# Product-field (us = u*s) helpers — remhos_fct.cpp:26-153
# ---------------------------------------------------------------------------


def calc_compatible_lo_product(us, m, d_us_HO, s_min, s_max, u_new,
                               active_el, active_dofs, dt):
    """Compatible LO product update and bound fixes (remhos_fct.cpp:26-119).

    Returns (d_us_LO_new, s_min_fixed, s_max_fixed, s_avg_violations),
    the last being the -vb s_avg stencil-bounds violation count
    (remhos_fct.cpp:84-101); callers ignore it unless verify_bounds is on.
    """
    us_new_HO = us + dt * d_us_HO
    mass_us = jnp.where(active_el[:, None], us_new_HO * m, 0.0).sum(1)
    mass_u = jnp.where(active_el[:, None], u_new * m, 0.0).sum(1)
    safe_mass_u = jnp.where(active_el, mass_u, 1.0)
    s_avg = jnp.where(active_el, mass_us / safe_mass_u, 0.0)

    smin = jnp.where(active_dofs, s_min, jnp.inf).min(1)
    smax = jnp.where(active_dofs, s_max, -jnp.inf).max(1)

    # round-off fixes on s_avg (remhos_fct.cpp:78-82)
    s_avg = jnp.where((s_avg < smin) & (mass_us + EPS_PROD > smin * mass_u),
                      smin, s_avg)
    s_avg = jnp.where((s_avg > smax) & (mass_us - EPS_PROD < smax * mass_u),
                      smax, s_avg)

    # -vb: s_avg must sit in the full active-dof stencil bounds after the
    # round-off fixes (remhos_fct.cpp:84-101)
    from . import verify as vfy
    has_active = active_dofs.any(axis=1)
    viol = vfy.check_s_avg(mass_us, mass_u, s_avg, smin, smax,
                           active_el & has_active)

    # widen local dof bounds to include s_avg (remhos_fct.cpp:103-106)
    sa = s_avg[:, None]
    widen = active_el[:, None] & active_dofs
    s_min = jnp.where(widen & (sa + EPS_PROD < s_min), sa, s_min)
    s_max = jnp.where(widen & (sa - EPS_PROD > s_max), sa, s_max)

    d_us_LO_new = jnp.where(active_el[:, None],
                            (u_new * sa - us) / dt, 0.0)
    return d_us_LO_new, s_min, s_max, viol


def scale_product_bounds(s_min, s_max, u_new, active_el, active_dofs):
    """(us_min, us_max) = (s_min*u_new, s_max*u_new) on active dofs
    (remhos_fct.cpp:121-153)."""
    act = active_el[:, None] & active_dofs
    us_min = jnp.where(act, s_min * u_new, 0.0)
    us_max = jnp.where(act, s_max * u_new, 0.0)
    return us_min, us_max
