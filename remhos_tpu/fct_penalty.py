"""Nonlinear-penalty FCT — `-fct 3`.

TPU-native version of NonlinearPenaltySolver (remhos_fct.cpp:760-996):
clip the HO update to the dof bounds, form non-conservative fluxes, then
restore elementwise conservation by solving a scalar nonlinearity
F(lambda) = delta - sum_j z_j(lambda) = 0 per element. The reference uses
a per-element bracketing + bisection loop; here it is one fixed-length
batched bisection over all elements at once (F is monotone in lambda, so
a fixed 110-iteration bisection reaches f64 precision deterministically —
compiler-friendly control flow instead of data-dependent loops).

The penalty scale eps uses element 0's size h/p (remhos_fct.cpp:963),
computed as vol^(1/dim) from the current-geometry quadrature volume.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sum_z(lam, w, fL):
    """sum_j z_j(lambda); z_j = lambda*w_j while |fL_j| >= lambda*|w_j|,
    else fL_j (remhos_fct.cpp:824-846). lam: [E,1], w/fL: [E,nd]."""
    z = jnp.where(jnp.abs(fL) >= lam * jnp.abs(w), lam * w, fL)
    return z, z.sum(axis=1)


def nonlinear_penalty(adv, geom, u, du_ho, du_lo, u_min, u_max, dt,
                      n_bisect=110):
    m = geom["ml"]
    # smoothness-indicator sharpening: relax the per-dof bounds toward the
    # new HO value in smooth regions BEFORE clipping (the reference's only
    # working FCT+SI path, remhos_fct.cpp:779-794; ClipScale aborts with
    # SI at :463-465 and FluxBased requires si==NULL at :160)
    if adv.cfg.smth_ind:
        si_dof = adv.smth.dof_values(adv.smth.compute(u))
        u_min, u_max = adv.smth.update_bounds(u + dt * du_ho, u_min, u_max,
                                              si_dof)
    # clipped HO update (uses u at the old time, remhos_fct.cpp:796-799)
    du_ho_star = jnp.minimum((u_max - u) / dt,
                             jnp.maximum(du_ho, (u_min - u) / dt))
    fL = m * (du_ho_star - du_lo)
    fH = m * (du_ho_star - du_ho)

    # per-element conservation defect
    fp = jnp.maximum(fL, 0.0).sum(axis=1)
    fn = jnp.minimum(fL, 0.0).sum(axis=1)
    delta = fp + fn                                      # [E]

    # penalty weights (remhos_fct.cpp:961-978)
    w_q, detJ = adv.w_q, geom["detJ"]
    vol0 = (w_q * detJ[0]).sum()
    dim = adv.disc.dim
    eps = vol0 ** (1.0 / dim) / adv.disc.p
    maxH = jnp.abs(fH).max(axis=1, keepdims=True)        # [E,1]
    w_pos = jnp.where(fL > 0.0, eps * jnp.abs(fL) + maxH, 0.0)
    w_neg = jnp.where(fL < 0.0, -eps * jnp.abs(fL) - maxH, 0.0)
    w = jnp.where((delta > 0.0)[:, None], w_pos, w_neg)

    # batched bisection for lambda: |sum_z| grows monotonically with lambda
    aw = jnp.abs(w)
    lam_hi0 = jnp.where(aw > 0.0, jnp.abs(fL) / jnp.where(aw > 0, aw, 1.0),
                        0.0).max(axis=1, keepdims=True) * 2.0 + 1.0
    lam_lo = jnp.zeros((u.shape[0], 1), u.dtype)
    lam_hi = lam_hi0
    ad = jnp.abs(delta)[:, None]
    for _ in range(n_bisect):
        mid = 0.5 * (lam_lo + lam_hi)
        _, G = _sum_z(mid, w, fL)
        go_right = jnp.abs(G)[:, None] < ad
        lam_lo = jnp.where(go_right, mid, lam_lo)
        lam_hi = jnp.where(go_right, lam_hi, mid)
    lam = 0.5 * (lam_lo + lam_hi)
    z, _ = _sum_z(lam, w, fL)

    # flux correction = -z on elements with a defect (remhos_fct.cpp:980-984)
    corr = jnp.where((delta != 0.0)[:, None], -z, 0.0)
    fL = fL + corr
    return du_lo + fL / m
