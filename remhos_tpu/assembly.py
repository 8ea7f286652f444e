"""Batched full-assembly operators (mass, convection, DG face terms).

TPU-native replacement for MFEM's ParBilinearForm assembly used by the
reference (remhos.cpp:638-727) and for Assembly::ComputeFluxTerms /
LinearFluxLumping (remhos_tools.cpp:788-913). Matrices live as dense
per-element batches:

- ``M[E, nd, nd]``       element mass matrices (MassIntegrator)
- ``K[E, nd, nd]``       element convection (ConvectionIntegrator(v, sign))
- ``bdrInt[E, nf, fd, fd]`` upwind face matrices per element face, with the
  reference's sign convention: entries are >= 0 and the DG face action is
      (K_HO u)|face_i += sum_j bdrInt[e,f,i,j] * (u_nbr_j - u_own_j)
  (transport: vn = min(0, v.n); remap: vn = -max(0, v.n);
   remhos_tools.cpp:835-845).

Everything is jnp.einsum over all elements — batched MXU contractions.
Functions take the static Discretization via closure-free explicit args so
they can be reused inside jit / shard_map.
"""

from __future__ import annotations

import jax.numpy as jnp


def element_mass(detJ, Bu, w_q):
    """M[E,nd,nd] = sum_q w_q detJ[e,q] Bu[q,i] Bu[q,j]."""
    wdet = w_q[None, :] * detJ                    # [E, Q]
    return jnp.einsum("eq,qi,qj->eij", wdet, Bu, Bu)


def lumped_mass(M):
    """Row sums (LumpedIntegrator of MassIntegrator; remhos.cpp:705-720)."""
    return M.sum(axis=2)


def element_convection(v_q, adjJ, Bu, Gu, w_q, sign):
    """K[E,nd,nd] = sign * sum_q w_q Bu[q,i] (v . adjJ^{-T}...) Gu[q,j].

    v_q: [E,Q,dim] velocity at volume quad points (physical components).
    Uses detJ * J^{-T} grad_ref = adjJ^T grad_ref, so no division:
      K[i,j] = sign * sum_q w_q phi_i (v^T adjJ^T)_b Ghat_j,b
    """
    va = jnp.einsum("eqd,eqbd->eqb", v_q, adjJ)   # (adjJ v): v.grad_x = va.grad_ref
    # staged contraction keeps temps at [E,Q,nd] and feeds one MXU batched
    # matmul; a single 4-operand einsum lets XLA materialize [E,Q,nd,nd]
    vg = jnp.einsum("eqb,qjb->eqj", va, Gu)       # [E, Q, nd]
    return sign * jnp.einsum("qi,eqj->eij", Bu * w_q[:, None], vg)


def face_upwind_matrices(v_fq, nor, w_fq, Bface, exec_mode):
    """bdrInt[E,nf,fd,fd] from face velocities and scaled outward normals.

    v_fq: [E,nf,Qf,dim], nor: [E,nf,Qf,dim] (|nor| = surface Jacobian).
    vn_signed uses the *unnormalized* normal: min/max(0, v.n_hat)*|n| ==
    min/max(0, v.n).
    """
    vn = jnp.einsum("efqd,efqd->efq", v_fq, nor)
    if exec_mode == 0:
        vns = jnp.minimum(0.0, vn)
    else:
        vns = -jnp.maximum(0.0, vn)
    wvn = -(w_fq[None, None, :] * vns)            # [E,nf,Qf], >= 0
    return jnp.einsum("efq,qi,qj->efij", wvn, Bface, Bface)


def gather_face(u, bdr_dofs):
    """u_face[E,nf,fd] from u[E,nd]."""
    return u[:, bdr_dofs]


def gather_nbr_face(u, nbr_elem, nbr_dof_local, bdr_value=None, bdr_dofs=None):
    """u on the *neighbor* side of each face: [E,nf,fd].

    Boundary faces (nbr_elem == -1) take `bdr_value[E,nf,fd]` if given
    (inflow values at this element's own face dofs, matching the reference's
    inflow_gf(dofInd) convention in remhos_tools.cpp:891), else 0.
    """
    safe = jnp.maximum(nbr_elem, 0)               # [E,nf]
    if nbr_dof_local.ndim == 2:                   # shared table (structured)
        nbr_dof_local = nbr_dof_local[None, :, :]
    vals = u[safe[:, :, None], nbr_dof_local]
    mask = (nbr_elem >= 0)[:, :, None]
    if bdr_value is None:
        return jnp.where(mask, vals, 0.0)
    return jnp.where(mask, vals, bdr_value)


def scatter_face_add(y, contrib, bdr_dofs):
    """y[E,nd] += scatter of contrib[E,nf,fd] at bdr_dofs (dups accumulate)."""
    E = y.shape[0]
    flat_idx = bdr_dofs.reshape(-1)               # [nf*fd]
    return y.at[:, flat_idx].add(contrib.reshape(E, -1))


def face_term_full(u_face, u_nbr, bdrInt):
    """Full (Galerkin/HO, alpha=1) face contributions [E,nf,fd]:
       y_i += sum_j bdrInt[i,j] (u_nbr_j - u_own_j)."""
    return jnp.einsum("efij,efj->efi", bdrInt, u_nbr - u_face)


def face_term_lumped(u_face, u_nbr, bdrInt):
    """Lumped (LO, alpha=0) face contributions [E,nf,fd]:
       y_i += (sum_j bdrInt[i,j]) * (u_nbr_i - u_own_i)
    (LinearFluxLumping with alpha=0, remhos_tools.cpp:876-913)."""
    row = bdrInt.sum(axis=3)
    return row * (u_nbr - u_face)


def face_term_blended(u_face, u_nbr, bdrInt, alpha_face):
    """LinearFluxLumping with general per-dof alpha[E,nf,fd]:
       y_i += sum_j bdrInt[i,j] (xd_i + (xd_j - xd_i) a_i a_j)."""
    xd = u_nbr - u_face
    row = bdrInt.sum(axis=3)
    lumped = row * xd
    cross = jnp.einsum("efij,efj->efi", bdrInt, xd * alpha_face)
    own = jnp.einsum("efij,efj->efi", bdrInt, alpha_face) * xd
    return lumped + alpha_face * (cross - own)


def apply_K_HO(u, K_elem, bdrInt, u_nbr, bdr_dofs):
    """(K_HO u)[E,nd]: element convection + full DG face coupling.

    Matches K_HO = ConvectionIntegrator + Transpose(DGTraceIntegrator)
    (remhos.cpp:646-679); boundary faces use u_nbr as provided (zero for the
    HO operator — the reference adds no boundary lform to K_HO).
    """
    y = jnp.einsum("eij,ej->ei", K_elem, u)
    contrib = face_term_full(u[:, bdr_dofs], u_nbr, bdrInt)
    return scatter_face_add(y, contrib, bdr_dofs)
