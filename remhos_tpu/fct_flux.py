"""Flux-based (Zalesak-style) FCT — `-fct 1`.

TPU-native reformulation of FluxBasedFCT (remhos_fct.cpp:155-446). The
reference builds a sparse flux matrix on the K_HO sparsity including MPI
ghost columns. Here the flux matrix collapses to *dense element blocks*:

The antidiffusive fluxes are F_ij = dt*d_ij*(u_i-u_j) + dt*M_ij*(duHO_i -
duHO_j) with d_ij = max(0, -k_ij, -k_ji) (remhos_fct.cpp:307-320). For the
Bernstein (Positive) basis required by the monotonicity machinery
(remhos.cpp:588-597), the cross-element entries of K_HO are
  k[i, j_nbr] = +∮ |min(v·n, 0)| φ_i φ_j  >= 0   (both sides),
because φ >= 0 pointwise — so the cross-element d_ij vanish identically,
and M is block-diagonal. All surviving fluxes are intra-element; the
ghost-column/alpha-exchange machinery of the reference is a no-op here.
The intra-element d_ij DO include the face own-own contributions of the
DG trace terms, reconstructed into the element-diagonal blocks below.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import sync as syncm


def k_ho_diag_blocks(K_elem, bdrInt, bdr_dofs):
    """Element-diagonal blocks of K_HO: convection + own-own DG trace terms.

    From the unified face action (Ku)_i += sum_j bdrInt[i,j](u_nbr - u_own)_j,
    the own-own coupling is -bdrInt scattered at the face dofs."""
    D = K_elem
    nf = bdrInt.shape[1]
    for f in range(nf):
        idx = bdr_dofs[f]
        D = D.at[:, idx[:, None], idx[None, :]].add(-bdrInt[:, f])
    return D


def _fct_iterations(F, u, du_lo, m, u_min, u_max, dt, iter_cnt,
                    zero_out=None):
    """Zalesak sweeps: flux sums -> alphas -> symmetric limited update
    (remhos_fct.cpp:344-446), on antisymmetric element flux blocks."""
    du = du_lo
    for _ in range(iter_cnt):
        gp = jnp.maximum(F, 0.0).sum(axis=2)
        gm = jnp.minimum(F, 0.0).sum(axis=2)

        u_lo_new = u + dt * du
        max_pos = jnp.maximum((u_max - u_lo_new) * m, 0.0)
        min_neg = jnp.minimum((u_min - u_lo_new) * m, 0.0)
        cp = jnp.where(gp > max_pos, max_pos / gp, 1.0)
        cn = jnp.where(gm < min_neg, min_neg / gm, 1.0)

        aij = jnp.where(F >= 0.0,
                        jnp.minimum(cp[:, :, None], cn[:, None, :]),
                        jnp.minimum(cn[:, :, None], cp[:, None, :]))
        fij = aij * F
        du = du + fij.sum(axis=2) / m / dt
        if zero_out is not None:
            du = zero_out(du)
        F = F - fij
    return du


def flux_based_fct(adv, geom, u, du_ho, du_lo, u_min, u_max, dt,
                   iter_cnt=1):
    """CalcFCTSolution (remhos_fct.cpp:155-181), iter_cnt=1 as the driver
    sets (remhos.cpp:1093)."""
    Dk = k_ho_diag_blocks(geom["K_elem"], geom["bdrInt"], adv.bdr_dofs)
    dij = jnp.maximum(jnp.maximum(0.0, -Dk), -jnp.swapaxes(Dk, 1, 2))
    nd = u.shape[1]
    off = 1.0 - jnp.eye(nd, dtype=u.dtype)
    F = dt * dij * (u[:, :, None] - u[:, None, :]) \
        + dt * geom["M"] * (du_ho[:, :, None] - du_ho[:, None, :])
    F = F * off
    return _fct_iterations(F, u, du_lo, geom["ml"], u_min, u_max, dt,
                           iter_cnt)


def flux_based_fct_product(adv, geom, us, d_us_HO, d_us_LO, dus_lo_fct,
                           s_min, s_max, us_min, us_max, u_new,
                           active_el, active_dofs, dt, iter_cnt=1):
    """CalcFCTProduct (remhos_fct.cpp:183-262): product-compatible flux
    matrix + Zalesak sweeps + empty-dof zeroing."""
    m = geom["ml"]
    Dk = k_ho_diag_blocks(geom["K_elem"], geom["bdrInt"], adv.bdr_dofs)
    dij = jnp.maximum(jnp.maximum(0.0, -Dk), -jnp.swapaxes(Dk, 1, 2))
    nd = us.shape[1]
    off = 1.0 - jnp.eye(nd, dtype=us.dtype)
    F = dt * dij * (us[:, :, None] - us[:, None, :]) \
        + dt * geom["M"] * (d_us_HO[:, :, None] - d_us_HO[:, None, :])
    F = F * off

    # product-compatible correction fluxes (remhos_fct.cpp:217-242)
    flux_el = m * dt * (d_us_LO - dus_lo_fct)          # [E, nd]
    beta = m * u_new
    bsum = jnp.where(active_el, beta.sum(axis=1), 1.0)
    beta = beta / bsum[:, None]
    A = (beta[:, None, :] * flux_el[:, :, None]
         - beta[:, :, None] * flux_el[:, None, :])     # antisymmetric
    F = F + jnp.where(active_el[:, None, None], A, 0.0) * off

    def zero_out(du):
        return syncm.zero_out_empty_dofs(active_el, active_dofs, du)

    return _fct_iterations(F, us, dus_lo_fct, m, us_min, us_max, dt,
                           iter_cnt, zero_out=zero_out)
