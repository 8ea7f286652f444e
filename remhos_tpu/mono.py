"""Monolithic residual-distribution solver (`-mono 1/2`).

TPU-native version of MonoRDSolver (remhos_mono.cpp:25-356): a single-pass
nonlinear scheme producing the limited solution directly, with per-dof
limiter alphas, nonlinear (conservation-rescaled) flux lumping, optional
subcell fluctuations, an optional smoothness indicator that relaxes the
limiters in smooth regions, and an inner fixed-point iteration restoring
consistent-mass accuracy (eqs. 27-29).

The reference's inner loop is explicitly serial per element
(remhos_mono.cpp:285-291, it walks the dense element mass block in
reverse); here it is re-derived as a batched masked fixed-point loop over
ALL elements at once — each element freezes when its residual drops below
tol, exactly reproducing the per-element early break.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import assembly as asm
from . import basis as B
from . import bounds as bnd
from . import lo as lom
from . import problems as prob

EPS = 1.0e-15
GAMMA = 10.0
BETA = 10.0
TOL = 1.0e-8


def velocity_scale(mesh, disc, problem, bb_min, bb_max):
    """scale[E] = vmax / (2 sqrt(dim) h / p) (remhos_mono.cpp:39-57); vmax
    sampled at the reference's quadrature (qOrdE = OrderW + 2p +
    2*OrderGrad, remhos_mono.cpp:46) on the initial mesh. Setup-time numpy."""
    dim, p, mo = mesh.dim, disc.p, mesh.mesh_order
    orderW = mo * dim - 1
    orderGrad = mo * (dim - 1) + p - 1
    q_ord = orderW + 2 * p + 2 * max(orderGrad, 0)
    n1 = B.min_gauss_points(q_ord)
    q1, _ = B.gauss_legendre(n1)
    gll_m = B.gauss_lobatto(mo + 1)
    Bm = B.tensor_mixed([B.lagrange_vals(gll_m, q1)] * dim)   # [Q, nm]
    x_q = np.einsum("qn,end->eqd", Bm, mesh.x)
    v = np.asarray(prob.velocity_function(problem, jnp.asarray(x_q),
                                          bb_min, bb_max))
    vmax = np.sqrt((v * v).sum(-1)).max(axis=1)               # [E]
    el_size = mesh.element_sizes()
    return vmax / (2.0 * (np.sqrt(dim) * el_size / p))


def nonlin_flux_lumping(u_face, u_nbr, bdrInt, alpha_face):
    """NonlinFluxLumping (remhos_tools.cpp:915-973): lumped face term plus a
    per-face conservation-rescaled high-order correction. [E,nf,fd]."""
    xd = u_nbr - u_face
    row = bdrInt.sum(axis=3)
    lumped = row * xd
    corr = jnp.einsum("efij,efj->efi", bdrInt, xd) - row * xd
    corr = corr * alpha_face
    sp = jnp.maximum(corr, 0.0).sum(axis=2, keepdims=True)
    sn = jnp.minimum(corr, 0.0).sum(axis=2, keepdims=True)
    tot = sp + sn
    cp = jnp.maximum(corr, 0.0)
    cn = jnp.minimum(corr, 0.0)
    corr = jnp.where(tot > EPS, cn - cp * (sn / jnp.where(sp != 0, sp, 1.0)),
                     jnp.where(tot < -EPS,
                               cp - cn * (sp / jnp.where(sn != 0, sn, 1.0)),
                               corr))
    return lumped + corr


def mono_rd_solution(adv, geom, u, dt):
    """MonoRDSolver::CalcSolution (remhos_mono.cpp:60-356), batched."""
    cfg = adv.cfg
    nd = u.shape[1]
    ml = geom["ml"]
    M = geom["M"]
    K = geom["K_elem"]
    bdrInt = geom["bdrInt"]
    mass_lim = cfg.problem not in (6, 7)   # remhos.cpp:999

    el_min, el_max = bnd.elements_min_max(u)
    xi_min, xi_max = adv.compute_bounds(el_min, el_max)

    si_dof = None
    if cfg.smth_ind:
        si_fine = adv.smth.compute(u)
        si_dof = adv.smth.dof_values(si_fine)

    z = jnp.einsum("eij,ej->ei", K, u)
    d_full = z

    # per-dof limiter alpha (remhos_mono.cpp:128-154)
    up = xi_max - u
    dn = u - xi_min
    alpha = jnp.minimum(1.0, BETA * jnp.minimum(up, dn)
                        / (jnp.maximum(up, dn) + EPS))
    if cfg.smth_ind:
        t = si_dof
        bndN = jnp.maximum(0.0, t * (2. * u - xi_max) + (1. - t) * xi_min)
        bndP = jnp.minimum(1.0, t * (2. * u - xi_min) + (1. - t) * xi_max)
        aN = jnp.minimum(1.0, BETA * (u - bndN) / (xi_max - u + EPS))
        aP = jnp.minimum(1.0, BETA * (bndP - u) / (u - xi_min + EPS))
        mid = xi_min + xi_max
        alpha = jnp.where(mid > 2. * u + EPS, aN,
                          jnp.where(mid < 2. * u - EPS, aP, alpha))

    du = alpha * z
    z = z - alpha * z

    # face contributions: nonlinear lumping with alpha (du) and alpha=1 (d)
    u_face = asm.gather_face(u, adv.bdr_dofs)
    u_nbr = adv.gather_nbr(u, bdr_value=adv._inflow_face_for(u))
    alpha_face = alpha[:, adv.bdr_dofs]
    du = asm.scatter_face_add(
        du, nonlin_flux_lumping(u_face, u_nbr, bdrInt, alpha_face),
        adv.bdr_dofs)
    d_full = asm.scatter_face_add(
        d_full, nonlin_flux_lumping(u_face, u_nbr, bdrInt,
                                    jnp.ones_like(alpha_face)),
        adv.bdr_dofs)

    # residual distribution of the unsplit part z
    du = du + _rd_weights(adv, geom, u, z, el_min, el_max)

    # inner consistent-mass iteration (remhos_mono.cpp:262-348)
    m_it = jnp.zeros_like(u)
    if mass_lim:
        scale = adv.mono_scale

        def body(c):
            m_it, done, it = c
            uDot = (du + m_it) / ml
            uDotMin = uDot.min(axis=1, keepdims=True)
            uDotMax = uDot.max(axis=1, keepdims=True)
            m_new = jnp.einsum("eij,ej->ei", M,
                               -uDot) + M.sum(axis=2) * uDot
            # = sum_j M_ij (uDot_i - uDot_j)
            diff = d_full - du
            t = si_dof if cfg.smth_ind else jnp.zeros_like(u)
            m_new = m_new + jnp.minimum(
                1.0, jnp.maximum(t, jnp.abs(m_new) / (jnp.abs(diff) + EPS))
            ) * diff
            a = jnp.minimum(1.0, BETA * scale[:, None]
                            * jnp.minimum(xi_max - u, u - xi_min)
                            / (jnp.maximum(uDotMax - uDot, uDot - uDotMin)
                               + EPS))
            if cfg.smth_ind:
                aG = jnp.minimum(1.0, BETA * scale[:, None]
                                 * jnp.minimum(1.0 - u, u)
                                 / (jnp.maximum(uDotMax - uDot,
                                                uDot - uDotMin) + EPS))
                a = jnp.minimum(jnp.maximum(si_dof, a), aG)
            m_new = m_new * a
            massP = jnp.maximum(m_new, 0.0).sum(axis=1, keepdims=True)
            massN = jnp.minimum(m_new, 0.0).sum(axis=1, keepdims=True)
            tot = massP + massN
            mp = jnp.maximum(m_new, 0.0)
            mn = jnp.minimum(m_new, 0.0)
            m_new = jnp.where(
                tot > EPS, mn - mp * (massN / jnp.where(massP != 0, massP,
                                                        1.0)),
                jnp.where(tot < -EPS,
                          mp - mn * (massP / jnp.where(massN != 0, massN,
                                                       1.0)),
                          m_new))
            m_it = jnp.where(done[:, None], m_it, m_new)
            res = m_new + du - ml * uDot
            res_norm = jnp.sqrt((res * res).sum(axis=1))
            done = done | (res_norm <= TOL)
            return m_it, done, it + 1

        def cond(c):
            m_it, done, it = c
            return (~done).any() & (it <= 100)

        done0 = jnp.zeros(u.shape[0], bool)
        m_it, _, _ = jax.lax.while_loop(cond, body, (m_it, done0, 0))

    return (du + m_it) / ml


def _rd_weights(adv, geom, u, z, el_min, el_max):
    """The RD weighting of the remaining fluctuation (remhos_mono.cpp:
    168-260), sharing residual_distribution_core's formulas."""
    cfg = adv.cfg
    du0 = jnp.zeros_like(u)
    sub_kw = {}
    if cfg.mono == 2:
        sub_kw = dict(subcell=True, subcell_weights=geom.get("sub_w"),
                      sub2ind=jnp.asarray(adv.disc.dofmaps.sub2ind),
                      gamma=GAMMA)
    # residual_distribution_core divides by ml and uses element extrema of
    # u itself — replicate its interior (without the ml division)
    out = lom.residual_distribution_core(u, z, du0, jnp.ones_like(u),
                                         **sub_kw)
    return out
