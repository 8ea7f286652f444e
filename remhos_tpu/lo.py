"""Low-order bound-preserving solvers.

TPU-native versions of remhos_lo.cpp, as fully vectorized masked sweeps
over ``[E, nd]`` — no element loops:

- ``mass_based_avg``     (MassBasedAvg, remhos_lo.cpp:247-324; `-lo 5`)
- ``residual_distribution`` (+ subcell variant)
                         (ResidualDistribution, remhos_lo.cpp:102-245;
                          `-lo 3` / `-lo 4`)
- ``discrete_upwind``    (DiscreteUpwind, remhos_lo.cpp:31-100; `-lo 1/2` —
  the reference's sparse K is block-diagonal since the `k` form has only a
  domain integrator, so D is built on dense element blocks)

All take precomputed geometry/operator arrays; face coupling enters through
gathered neighbor face values (the halo-exchange seam).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import assembly as asm

EPS = 1.0e-15


def mass_based_avg(u, du_HO, dt, detJ, w_q, Bu):
    """LO = per-element mass/volume average of the *new* HO solution at the
    current (stage-time) mesh position (remhos_lo.cpp:247-324)."""
    u_new = u + dt * du_HO
    wdet = w_q[None, :] * detJ                    # [E, Q]
    u_q = jnp.einsum("qj,ej->eq", Bu, u_new)
    mass = (wdet * u_q).sum(1)
    vol = wdet.sum(1)
    u_LO_new = mass / vol
    return (u_LO_new[:, None] - u) / dt


def _face_lumped_into_dofs(u, u_nbr, bdrInt, bdr_dofs):
    """LinearFluxLumping(alpha=0) accumulated into element dofs [E,nd]."""
    u_face = asm.gather_face(u, bdr_dofs)
    contrib = asm.face_term_lumped(u_face, u_nbr, bdrInt)
    return asm.scatter_face_add(jnp.zeros_like(u), contrib, bdr_dofs)


def residual_distribution(u, u_nbr, K_elem, bdrInt, ml, bdr_dofs,
                          subcell=False, subcell_weights=None, sub2ind=None):
    """Element-local redistribution of K·u residuals weighted by
    distance-to-extrema (remhos_lo.cpp:111-245, eqs. 46-47/58-59 of the
    Hajduk et al. subcell papers).

    subcell_weights: [E, numSubcells, numDofsSubcell] (Assembly::
    SubcellWeights); sub2ind: [numSubcells, numDofsSubcell].
    """
    z = jnp.einsum("eij,ej->ei", K_elem, u)
    du = _face_lumped_into_dofs(u, u_nbr, bdrInt, bdr_dofs)
    return residual_distribution_core(u, z, du, ml, subcell,
                                      subcell_weights, sub2ind)


def residual_distribution_core(u, z, du, ml, subcell=False,
                               subcell_weights=None, sub2ind=None,
                               gamma=1.0):
    """RD weights given the discretization residual z = K u and the
    face-lumped accumulator du (shared by the FA and PA paths).
    gamma: subcell blending factor (1.0 in remhos_lo.cpp:118; 10.0 in the
    monolithic solver, remhos_mono.cpp:68)."""
    nd = u.shape[1]

    xe_max = u.max(1)
    xe_min = u.min(1)
    x_sum = u.sum(1)
    rhoP = jnp.maximum(z, 0.0).sum(1)
    rhoN = jnp.minimum(z, 0.0).sum(1)
    sumWeightsP = nd * xe_max - x_sum + EPS
    sumWeightsN = nd * xe_min - x_sum - EPS

    weightP = (xe_max[:, None] - u) / sumWeightsP[:, None]
    weightN = (xe_min[:, None] - u) / sumWeightsN[:, None]

    if subcell:
        ndd = sub2ind.shape[1]
        u_sub = u[:, sub2ind]                            # [E, ns, ndd]
        fluct = (subcell_weights * u_sub).sum(-1)        # [E, ns]
        xmax_s = u_sub.max(-1)
        xmin_s = u_sub.min(-1)
        xsum_s = u_sub.sum(-1)
        swP = ndd * xmax_s - xsum_s + EPS
        swN = ndd * xmin_s - xsum_s - EPS
        fP = jnp.maximum(fluct, 0.0)
        fN = jnp.minimum(fluct, 0.0)
        sumFP = fP.sum(1)
        sumFN = fN.sum(1)
        # nodal weights: scatter subcell shares onto element dofs (eq. 58-59)
        nwP_sub = fP[:, :, None] * (xmax_s[:, :, None] - u_sub) / swP[:, :, None]
        nwN_sub = fN[:, :, None] * (xmin_s[:, :, None] - u_sub) / swN[:, :, None]
        E = u.shape[0]
        flat = sub2ind.reshape(-1)
        nwP = jnp.zeros_like(u).at[:, flat].add(nwP_sub.reshape(E, -1))
        nwN = jnp.zeros_like(u).at[:, flat].add(nwN_sub.reshape(E, -1))

        auxP = gamma / (rhoP + EPS)
        weightP = weightP * (1.0 - jnp.minimum(auxP * sumFP, 1.0))[:, None] \
            + jnp.minimum(auxP, 1.0 / (sumFP + EPS))[:, None] * nwP
        auxN = gamma / (rhoN - EPS)
        weightN = weightN * (1.0 - jnp.minimum(auxN * sumFN, 1.0))[:, None] \
            + jnp.maximum(auxN, 1.0 / (sumFN - EPS))[:, None] * nwN

    du = (du + weightP * rhoP[:, None] + weightN * rhoN[:, None]) / ml
    return du


def precond_convection_matrix(K_elem, M_elem):
    """PrecondConvectionIntegrator element matrix: ML * M^{-1} * K
    (remhos_tools.cpp:975-1031; ML = lumped element mass). Used by the
    `-lo 2` preconditioned discrete-upwind variant."""
    import jax
    ML = M_elem.sum(axis=2)
    L = jnp.linalg.cholesky(M_elem)
    Y = jax.lax.linalg.triangular_solve(L, K_elem, left_side=True, lower=True)
    MinvK = jax.lax.linalg.triangular_solve(jnp.swapaxes(L, 1, 2), Y,
                                            left_side=True, lower=False)
    return ML[:, :, None] * MinvK


def discrete_upwind_matrix(K_elem):
    """D[E,nd,nd] from element convection blocks: d_ij = max(0,-k_ij,-k_ji)
    added symmetrically, diagonal corrected to keep row sums
    (remhos_lo.cpp:76-100)."""
    Kt = jnp.swapaxes(K_elem, 1, 2)
    d = jnp.maximum(jnp.maximum(0.0, -K_elem), -Kt)
    nd = K_elem.shape[-1]
    eye = jnp.eye(nd, dtype=K_elem.dtype)
    d_off = d * (1.0 - eye)
    D = K_elem + d_off
    rowsum = d_off.sum(2)
    D = D - eye * rowsum[:, :, None]
    return D


def discrete_upwind(u, u_nbr, D, bdrInt, ml, bdr_dofs):
    """du = (D u + lumped face fluxes) / ml (remhos_lo.cpp:43-74)."""
    du = jnp.einsum("eij,ej->ei", D, u)
    du = du + _face_lumped_into_dofs(u, u_nbr, bdrInt, bdr_dofs)
    return du / ml
