"""On-device geometric factors for (possibly curved, moving) tensor meshes.

TPU-native replacement for MFEM's GeometricFactors / FaceGeometricFactors /
ElementTransformation machinery (reference usage: remhos_lo.cpp:302-311,
remhos_tools.cpp:788-858, remhos.cpp:1598-1676). Everything is batched
jnp.einsum over all elements — in remap mode these run inside the jitted
RK stage at every mesh move, which is the reference's RHS-FOM hot spot.

Conventions:
- mesh nodes ``x[E, nm, dim]``, lexicographic tensor Gauss-Lobatto nodes
- Jacobian ``J[e,q,a,b] = d x_a / d xi_b``
- ``adjJ`` is the adjugate: adj(J) = det(J) * J^{-1}
- scaled outward face normal by Nanson's formula: n = adj(J)^T n_ref,
  equal to MFEM's CalcOrtho(face Jacobian) with outward orientation
  (remhos_tools.cpp:814).
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobians(x, Gm):
    """J[E, q, dim, dim] from nodes x[E, nm, dim] and grad table Gm[q, nm, dim]."""
    return jnp.einsum("end,qnb->eqdb", x, Gm)


def det_adj(J):
    """(detJ[E,q], adjJ[E,q,dim,dim]) without linear solves."""
    dim = J.shape[-1]
    if dim == 1:
        det = J[..., 0, 0]
        adj = jnp.ones_like(J)
        return det, adj
    if dim == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, d = J[..., 1, 0], J[..., 1, 1]
        det = a * d - b * c
        adj = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2)
        return det, adj
    # dim == 3: adj(J)[a,b] = cofactor(J)[b,a]
    c00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
    c01 = J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2]
    c02 = J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0]
    c10 = J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2]
    c11 = J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0]
    c12 = J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1]
    c20 = J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1]
    c21 = J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2]
    c22 = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    det = J[..., 0, 0] * c00 + J[..., 0, 1] * c01 + J[..., 0, 2] * c02
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], -1),
        jnp.stack([c01, c11, c21], -1),
        jnp.stack([c02, c12, c22], -1),
    ], -2)
    return det, adj


def volume_geometry(x, Bm, Gm):
    """Quad-point geometry for volume integrals.

    Returns dict with x_q[E,q,dim], detJ[E,q], adjJ[E,q,dim,dim].
    """
    J = jacobians(x, Gm)
    det, adj = det_adj(J)
    x_q = jnp.einsum("end,qn->eqd", x, Bm)
    return {"x_q": x_q, "detJ": det, "adjJ": adj}


def face_geometry(x, Bmf, Gmf, n_ref):
    """Face quad-point geometry for all element faces at once.

    x:     [E, nm, dim]    mesh nodes
    Bmf:   [nf, qf, nm]    mesh basis values at each face's quad points
    Gmf:   [nf, qf, nm, dim] mesh basis ref-gradients there
    n_ref: [nf, dim]       outward reference normals

    Returns x_fq[E,nf,qf,dim], scaled outward normal nor[E,nf,qf,dim]
    (|nor| = surface Jacobian).
    """
    J = jnp.einsum("end,fqnb->efqdb", x, Gmf)
    _, adj = det_adj(J)
    # Nanson: n = adj(J)^T n_ref
    nor = jnp.einsum("efqdb,fd->efqb", adj, n_ref)
    x_fq = jnp.einsum("end,fqn->efqd", x, Bmf)
    return x_fq, nor
