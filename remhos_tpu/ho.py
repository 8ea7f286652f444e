"""High-order (unlimited) solvers: du = M^{-1} K_HO u.

TPU-native versions of remhos_ho.cpp:

- ``local_inverse``: per-element dense mass solve, batched Cholesky over all
  elements at once (LocalInverseHOSolver, remhos_ho.cpp:84-128; the FA path
  factorizes per element, the PA path uses element-local CG — on TPU the
  batched Cholesky IS the fast path, XLA expands it without LAPACK).
- ``neumann``: lumped-mass Neumann iteration with lumped face fluxes
  (NeumannHOSolver, remhos_ho.cpp:136-187).
- ``cg``: Jacobi-preconditioned CG on the (block-diagonal) DG mass matrix
  (CGHOSolver, remhos_ho.cpp:30-70). Mathematically identical to
  local_inverse for DG; kept for parity and as the PA-style iterative path.

All are pure functions of arrays; K_HO action comes from assembly.apply_K_HO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mass_cholesky(M):
    """Batched Cholesky factors L[E,nd,nd] of SPD element mass matrices."""
    return jnp.linalg.cholesky(M)


def cho_solve(L, rhs):
    """Solve (L L^T) x = rhs batched; rhs[E,nd]."""
    y = jax.lax.linalg.triangular_solve(L, rhs[..., None], left_side=True,
                                        lower=True)
    x = jax.lax.linalg.triangular_solve(jnp.swapaxes(L, -1, -2), y,
                                        left_side=True, lower=False)
    return x[..., 0]


def local_inverse(Ku, chol_L):
    """du[E,nd] = M^{-1} (K_HO u), element-local (remhos_ho.cpp:84-128)."""
    return cho_solve(chol_L, Ku)


def cg_mass_solve(M, rhs, rel_tol=1e-12, max_iter=500, all_sum=None):
    """Jacobi-preconditioned CG for M du = rhs (CGHOSolver semantics).

    M is block diagonal over elements, so this is element-local in exact
    arithmetic; implemented as a fixed-shape while_loop (lax-friendly).
    `all_sum` reduces dot products across shards (psum) when sharded.
    """
    diag = jnp.einsum("eii->ei", M)
    inv_diag = 1.0 / diag

    def amul(x):
        return jnp.einsum("eij,ej->ei", M, x)

    def dot(a, b):
        d = (a * b).sum()
        return d if all_sum is None else all_sum(d)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = inv_diag * r0
    p0 = z0
    rz0 = dot(r0, z0)
    # MFEM CGSolver with rel_tol: stop when (r,z) <= rel_tol^2 * (r0,z0)
    target = rel_tol * rel_tol * rz0

    def cond(c):
        x, r, z, p, rz, it = c
        return (rz > target) & (it < max_iter)

    def body(c):
        x, r, z, p, rz, it = c
        Ap = amul(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, it + 1)

    x, *_ = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    return x


def neumann(u, Ku_lumped_faces, M, ml, abs_tol=1e-4, max_iter=20,
            all_sum=None):
    """Lumped-mass Neumann iteration (remhos_ho.cpp:136-187).

    Ku_lumped_faces: element K·u plus LinearFluxLumping(alpha=1) face terms
    and inflow contributions — assembled by the caller. `all_sum` reduces
    the residual norm across shards (the reference's MPI_Allreduce,
    remhos_ho.cpp:176).
    """
    rhs = Ku_lumped_faces

    def body(c):
        du, resid, it = c
        res = jnp.einsum("eij,ej->ei", M, du) - rhs
        rr = (res * res).sum()
        resid = jnp.sqrt(rr if all_sum is None else all_sum(rr))
        du = jnp.where(resid <= abs_tol, du, du - res / ml)
        return (du, resid, it + 1)

    def cond(c):
        du, resid, it = c
        return (resid > abs_tol) & (it < max_iter)

    du0 = jnp.zeros_like(u)
    du, _, _ = jax.lax.while_loop(cond, body,
                                  (du0, jnp.asarray(jnp.inf, u.dtype), 0))
    return du
