"""Partial-assembly (matrix-free) operator actions — the TPU hot path.

The reference's GPU path is -pa: sum-factorized operator actions plus the
element-local DGMassInverse CG in the Gauss-Legendre basis
(remhos_ho.cpp:77-82,119-128; remhos_lo.cpp:336-1035). On TPU the natural
shape is different from CUDA sum factorization: every action is a single
large 2D matmul ``[E, nd] @ [nd, Q]`` that tiles straight onto the MXU,
batched over ALL elements at once — no per-element matrices, no
factorizations, no [E,nd,nd] storage:

- convection action   K u = ((u Gu_b^T) ∘ va_b) W Bu        (per ref dim b)
- mass action         M u = ((u Bu^T) ∘ wdet) Bu
- mass inverse        CG in the GL nodal basis, where the mass matrix is
                      near-diagonal (Jacobi-preconditioned local CG ==
                      MFEM DGMassInverse, BasisType::GaussLegendre,
                      abs_tol 1e-8, remhos_ho.cpp:79-80)
- DG face terms       face-quadrature flux ((u_nbr-u_own) Bface^T ∘ wvn) Bface

The quadrature data (wdet, va, wvn) is recomputed from node positions each
remap stage — the reference's RHS-FOM bottleneck becomes a handful of
einsums feeding these matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_action(u, va, Gu, Bu_w):
    """(K u)[E,nd] = sign * int (v.grad u) phi_i, matrix-free.

    va:   [E,Q,dim]  sign * (adjJ v) at quad points
    Gu:   [Q,nd,dim] reference gradients
    Bu_w: [Q,nd]     w_q * Bu (test functions pre-weighted)
    """
    # du_q[e,q] = sum_b va[e,q,b] * (d_b u)(q)
    du_q = jnp.einsum("ej,qjb,eqb->eq", u, Gu, va)
    return du_q @ Bu_w


def mass_action(u, wdet, Bu):
    """(M u)[E,nd] with wdet[E,Q] = w_q*detJ."""
    u_q = u @ Bu.T
    return (u_q * wdet) @ Bu


def lumped_mass_pa(wdet, Bu):
    """ml = M.1 = Bu^T (w detJ) (partition of unity)."""
    return wdet @ Bu


def face_flux_q(u_face, u_nbr, Bface, wvn):
    """Upwind flux at face quad points: [E,nf,Qf] = wvn * (u_nbr - u_own)_q.

    wvn[E,nf,Qf] = -w_fq * vn_signed >= 0 (same convention as bdrInt)."""
    diff_q = jnp.einsum("efj,qj->efq", u_nbr - u_face, Bface)
    return wvn * diff_q


def face_full_apply(u_face, u_nbr, Bface, wvn):
    """Full (Galerkin) DG face contributions [E,nf,fd]:
    equivalent to einsum(bdrInt, u_nbr-u_own) without materializing bdrInt."""
    fq = face_flux_q(u_face, u_nbr, Bface, wvn)
    return jnp.einsum("efq,qi->efi", fq, Bface)


def face_lumped_apply(u_face, u_nbr, Bface, wvn):
    """Lumped (alpha=0) face contributions [E,nf,fd]:
    rowsum_i(bdrInt) * (u_nbr_i - u_own_i); rowsum = Bface^T wvn."""
    row = jnp.einsum("efq,qi->efi", wvn, Bface)
    return row * (u_nbr - u_face)


def mass_solve_gl(rhs, wdet, Bgl, A_gl2b, rel_tol=None, max_iter=60,
                  all_sum=None):
    """Solve M_bern du = rhs via CG in the Gauss-Legendre nodal basis.

    With du = A g (A = GL->Bernstein basis change), M_bern A g = rhs becomes
    A^T M_bern A g = M_gl g = A^T rhs; M_gl is near-diagonal, so
    Jacobi-preconditioned CG converges in a few iterations. This is MFEM's
    DGMassInverse(space, BasisType::GaussLegendre) (remhos_ho.cpp:79-80),
    batched over all elements.

    Stopping is RELATIVE: |r| <= rel_tol * |b|. MFEM's nominal criterion is
    absolute (SetAbsTol(1e-8)), but mass-matrix rows scale with element
    volume, so an absolute target is mesh-size-dependent — on fine meshes
    it can be larger than |b| itself and stop at 0 iterations, silently
    returning du = 0. A relative target is the scale-free equivalent and
    converges to the working precision (f64 PA goldens still match FA to
    full printed digits)."""
    if rel_tol is None:
        rel_tol = 1e-6 if rhs.dtype == jnp.float32 else 1e-12
    # All internal dots run at Precision.HIGHEST: the GL<->Bernstein basis
    # change A is a cancellation hotspot (||A||_2 ~ 262 for p=3 3D while
    # ||A g|| ~ ||g||), and on TPU the tf32 default (3-pass bf16) loses
    # ~1 extra digit here. Full-f32 passes recover the f32-input accuracy
    # floor (~1.7e-3 rel du error, same as doing the transforms in f64)
    # at ~10% of the solve cost (docs/PERF.md). No-op for f64 inputs.
    HI = jax.lax.Precision.HIGHEST
    b = jnp.dot(rhs, A_gl2b, precision=HI)      # A^T rhs -> [E, nd]
    diag = jnp.dot(wdet, Bgl * Bgl, precision=HI)   # diag(M_gl)[e,i]
    inv_diag = 1.0 / diag

    def amul(g):
        gq = jnp.dot(g, Bgl.T, precision=HI)
        return jnp.dot(gq * wdet, Bgl, precision=HI)

    def dot(x, y):
        d = (x * y).sum()
        return d if all_sum is None else all_sum(d)

    x = jnp.zeros_like(b)
    r = b
    z = inv_diag * r
    p = z
    rz = dot(r, z)
    tol2 = rel_tol * rel_tol * dot(b, b)

    def cond(c):
        x, r, z, p, rz, rr, it = c
        return (rr > tol2) & (it < max_iter)

    def body(c):
        x, r, z, p, rz, rr, it = c
        Ap = amul(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, dot(r, r), it + 1)

    c0 = (x, r, z, p, rz, dot(r, r), 0)
    x, *_ = jax.lax.while_loop(cond, body, c0)
    return jnp.dot(x, A_gl2b.T, precision=HI)   # du = A g


def mass_solve_bern(rhs, wdet, Bu, rel_tol=1e-12, max_iter=500, all_sum=None):
    """Jacobi-CG on the Bernstein mass action (CGHOSolver's PA path:
    OperatorJacobiSmoother + rel_tol 1e-12, remhos_ho.cpp:40-65)."""
    if rhs.dtype == jnp.float32:
        rel_tol = max(rel_tol, 1e-6)
    diag = wdet @ (Bu * Bu)
    inv_diag = 1.0 / diag

    def dot(x, y):
        d = (x * y).sum()
        return d if all_sum is None else all_sum(d)

    x = jnp.zeros_like(rhs)
    r = rhs
    z = inv_diag * r
    p = z
    rz0 = dot(r, z)
    target = rel_tol * rel_tol * rz0

    def cond(c):
        x, r, z, p, rz, it = c
        return (rz > target) & (it < max_iter)

    def body(c):
        x, r, z, p, rz, it = c
        Ap = mass_action(p, wdet, Bu)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, it + 1)

    x, *_ = jax.lax.while_loop(cond, body, (x, r, z, p, rz0, 0))
    return x
