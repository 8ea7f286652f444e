"""On-device geometric factors for (possibly curved, moving) tensor meshes.

TPU-native replacement for MFEM's GeometricFactors / FaceGeometricFactors /
ElementTransformation machinery (reference usage: remhos_lo.cpp:302-311,
remhos_tools.cpp:788-858, remhos.cpp:1598-1676). In remap mode these run
inside the jitted RK stage at every mesh move — the reference's RHS-FOM
hot spot — so every contraction is expressed as one large reshaped 2D
matmul ``[E*dim, nm] @ [nm, ...]`` that tiles onto the MXU (generic
small-axis einsums lower poorly on TPU).

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


def _nodes_matrix(x):
    """x[E, nm, dim] -> [E*dim, nm] for one big contraction over nodes."""
    E, nm, dim = x.shape
    return x.transpose(0, 2, 1).reshape(E * dim, nm), E, dim


def interp_nodes(x, Bt):
    """Interpolate nodal field at points: Bt[P, nm] -> [E, P, dim]."""
    A, E, dim = _nodes_matrix(x)
    out = A @ Bt.T                                 # [E*dim, P]
    return out.reshape(E, dim, -1).transpose(0, 2, 1)


def jacobian_planes(x, Gm):
    """Jacobian as per-entry planes ``J[d][b] -> [E, Q]``.

    Avoids ever materializing an array whose minor axis has size ``dim``:
    the TPU (8,128) tile pads the last dimension to 128, so a packed
    ``[E, Q, dim, dim]`` Jacobian occupies ~42x its data in HBM when XLA
    decides to allocate it (observed: a 36.7 GB compile-time OOM at
    E=110k). One ``[nm, Q]`` matmul per reference column keeps every
    intermediate's minor axis at Q."""
    A, E, dim = _nodes_matrix(x)
    cols = [(A @ Gm[:, :, b].T).reshape(E, dim, -1) for b in range(dim)]
    return [[cols[b][:, d, :] for b in range(dim)] for d in range(dim)]


def jacobians(x, Gm):
    """J[E, Q, dim, dim] from nodes x[E, nm, dim], grad table Gm[Q, nm, dim].

    Only for small/FA paths — the packed [E, Q, dim, dim] layout pads the
    minor axis 42x if materialized; hot paths use jacobian_planes."""
    Jp = jacobian_planes(x, Gm)
    return jnp.stack([jnp.stack(row, -1) for row in Jp], -2)  # [E, Q, d, b]


def det_adj(J):
    """(detJ[...], adjJ[...,dim,dim]) without linear solves."""
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
    """Quad-point geometry for volume integrals:
    x_q[E,Q,dim], detJ[E,Q], adjJ[E,Q,dim,dim]."""
    J = jacobians(x, Gm)
    det, adj = det_adj(J)
    x_q = interp_nodes(x, Bm)
    return {"x_q": x_q, "detJ": det, "adjJ": adj}


def face_geometry(x, Bmf, Gmf, n_ref):
    """Face quad-point geometry for all element faces at once.

    x:     [E, nm, dim];  Bmf: [nf, Qf, nm];  Gmf: [nf, Qf, nm, dim]
    n_ref: [nf, dim] outward reference normals
    Returns x_fq[E,nf,qf,dim], scaled outward normal nor[E,nf,qf,dim]
    (|nor| = surface Jacobian).
    """
    A, E, dim = _nodes_matrix(x)
    nf, Qf, nm = Bmf.shape
    B2 = Bmf.transpose(2, 0, 1).reshape(nm, nf * Qf)
    x_fq = (A @ B2).reshape(E, dim, nf, Qf).transpose(0, 2, 3, 1)
    G2 = Gmf.transpose(2, 0, 1, 3).reshape(nm, nf * Qf * dim)
    J = (A @ G2).reshape(E, dim, nf, Qf, dim).transpose(0, 2, 3, 1, 4)
    _, adj = det_adj(J)
    # Nanson: n = adj(J)^T n_ref
    nor = jnp.einsum("efqdb,fd->efqb", adj, n_ref)
    return x_fq, nor


def face_tangent_tables(Gmf, n_ref):
    """Static preprocessing for the tangent-only face-normal path.

    Reference face normals of tensor elements are always +-e_k, so the
    Nanson normal adj(J)^T n_ref reduces to +-(column k of cof(J)) — the
    cross product of the OTHER (tangential) Jacobian columns. Computing
    only those columns cuts the face-Jacobian matmul and the adjugate
    algebra from dim*dim to dim*(dim-1) terms — the single hottest piece
    of the remap stage on TPU (FaceGeometricFactors equivalent,
    remhos_tools.cpp:788-858).

    Returns (Gmf_tan[nf,Qf,nm,dim-1], sign[nf]) as numpy, or None when
    dim == 1 or a normal is not axis-aligned (fall back to face_geometry).
    """
    import numpy as np
    Gmf = np.asarray(Gmf)
    n_ref = np.asarray(n_ref)
    nf, Qf, nm, dim = Gmf.shape
    if dim == 1:
        return None
    k = np.abs(n_ref).argmax(axis=1)
    s = np.take_along_axis(n_ref, k[:, None], 1)[:, 0]
    if not np.allclose(np.abs(n_ref).sum(1), np.abs(s)):
        return None                       # non-axis-aligned reference normal
    if dim == 3:
        # cof(J)[:, k] = J[:, (k+1)%3] x J[:, (k+2)%3]  (cyclic order)
        t_axes = np.stack([(k + 1) % 3, (k + 2) % 3], axis=1)
    else:
        # cof(J)[:, k] = (-1)^k * rot90(J[:, 1-k]),  rot90(x, y) = (y, -x)
        t_axes = (1 - k)[:, None]
        s = s * np.where(k == 0, 1.0, -1.0)
    Gt = np.take_along_axis(Gmf, t_axes[:, None, None, :], axis=3)
    return Gt, s


def volume_detj_va(x, Gm, v_q, sign):
    """(detJ[E,Q], va[E,Q,dim]) for the PA convection action, WITHOUT
    materializing the adjugate: va_b = sign * v . cof(J)[:, b] where the
    cofactor columns are cross products of Jacobian columns. One pass over
    J instead of J -> adjJ -> contract — the remap-stage geometry is the
    reference's RHS-FOM bottleneck (remhos.cpp:1598-1676), and on TPU this
    halves its HBM traffic. Works on Jacobian PLANES (jacobian_planes) so
    no intermediate carries a size-dim minor axis."""
    dim = x.shape[-1]
    if dim == 1:
        Jp = jacobian_planes(x, Gm)
        return Jp[0][0], sign * v_q
    Jp = jacobian_planes(x, Gm)                 # [d][b] -> [E, Q]
    vq = [v_q[..., d] for d in range(dim)]      # [E, Q] planes
    if dim == 2:
        # cof columns: k0 = ( J[1][1], -J[1][0]),  k1 = (-J[0][1], J[0][0])
        det = Jp[0][0] * Jp[1][1] - Jp[0][1] * Jp[1][0]
        va0 = vq[0] * Jp[1][1] - vq[1] * Jp[0][1]
        va1 = -vq[0] * Jp[1][0] + vq[1] * Jp[0][0]
        return det, sign * jnp.stack([va0, va1], -1)
    # dim == 3: cof(J)[:, b] = J[:, b+1] x J[:, b+2] (columns, cyclic)
    def cross_cols(b1, b2):
        return [Jp[(d + 1) % 3][b1] * Jp[(d + 2) % 3][b2]
                - Jp[(d + 1) % 3][b2] * Jp[(d + 2) % 3][b1]
                for d in range(3)]
    k = [cross_cols((b + 1) % 3, (b + 2) % 3) for b in range(3)]
    det = sum(Jp[d][0] * k[0][d] for d in range(3))
    va = jnp.stack([sum(vq[d] * k[b][d] for d in range(3))
                    for b in range(3)], -1)
    return det, sign * va


def face_normals_tangent(x, Gmf_tan, sign):
    """Scaled outward face normals only (no x_fq) — the remap PA stage
    needs just the normals since the face velocity is time-independent."""
    A, E, dim = _nodes_matrix(x)
    nf, Qf, nm, tdim = Gmf_tan.shape
    G2 = Gmf_tan.transpose(2, 0, 1, 3).reshape(nm, nf * Qf * tdim)
    T = (A @ G2).reshape(E, dim, nf, Qf, tdim).transpose(0, 2, 3, 1, 4)
    if dim == 3:
        nor = jnp.cross(T[..., 0], T[..., 1])
    else:
        t = T[..., 0]
        nor = jnp.stack([t[..., 1], -t[..., 0]], -1)
    return nor * sign[None, :, None, None]


def face_geometry_tangent(x, Bmf, Gmf_tan, sign):
    """face_geometry via tangential Jacobian columns only (see
    face_tangent_tables). Bitwise-equal cofactor arithmetic, ~dim/(dim-1)x
    less face-Jacobian compute and traffic."""
    A, E, dim = _nodes_matrix(x)
    nf, Qf, nm, tdim = Gmf_tan.shape
    B2 = Bmf.transpose(2, 0, 1).reshape(nm, nf * Qf)
    x_fq = (A @ B2).reshape(E, dim, nf, Qf).transpose(0, 2, 3, 1)
    G2 = Gmf_tan.transpose(2, 0, 1, 3).reshape(nm, nf * Qf * tdim)
    T = (A @ G2).reshape(E, dim, nf, Qf, tdim).transpose(0, 2, 3, 1, 4)
    if dim == 3:
        nor = jnp.cross(T[..., 0], T[..., 1])
    else:
        t = T[..., 0]
        nor = jnp.stack([t[..., 1], -t[..., 0]], -1)
    return x_fq, nor * sign[None, :, None, None]


def lumped_mass_poly(x0, v, disc):
    """Lumped mass as a polynomial in pseudotime: ml(t) = sum_k t^k ml_k.

    In remap the mesh moves linearly, x(t) = x0 + t*v (remhos.cpp:
    1128-1134, 1262-1274), so J(t) = J0 + t*Jv and det J(t) is a
    polynomial of degree `dim`; the lumped mass ml_i(t) = sum_q
    B_u[q,i] w_q det_q(t) (partition of unity, remhos.cpp:700-707)
    inherits the same coefficients. Returns (mlk[dim+1, E, nd],
    sig[dim+1]) with sig_k = sum_i ml_k[i] — everything computed in f64
    regardless of the input dtype (one-time setup; consumed by the f32
    production loop's conservative mass closure, steppers.mass_closure).
    """
    x0 = jnp.asarray(x0, jnp.float64)
    v = jnp.asarray(v, jnp.float64)
    Gm = jnp.asarray(disc.Gm, jnp.float64)
    dim = x0.shape[-1]
    J0 = jacobian_planes(x0, Gm)
    Jv = jacobian_planes(v, Gm)

    def prod2(a, b):
        """(a0 + t a1)(b0 + t b1) coefficients."""
        return (a[0] * b[0], a[0] * b[1] + a[1] * b[0], a[1] * b[1])

    def pair(d, b):
        return (J0[d][b], Jv[d][b])

    if dim == 1:
        det_c = (J0[0][0], Jv[0][0])
    elif dim == 2:
        p1 = prod2(pair(0, 0), pair(1, 1))
        p2 = prod2(pair(0, 1), pair(1, 0))
        det_c = tuple(a - b for a, b in zip(p1, p2))
    else:
        det_c = None
        for b in range(3):
            b1, b2 = (b + 1) % 3, (b + 2) % 3
            # cofactor C[0][b](t), quadratic
            c1 = prod2(pair(1, b1), pair(2, b2))
            c2 = prod2(pair(1, b2), pair(2, b1))
            cof = tuple(a - bb for a, bb in zip(c1, c2))
            j0, j1 = pair(0, b)
            term = (j0 * cof[0], j0 * cof[1] + j1 * cof[0],
                    j0 * cof[2] + j1 * cof[1], j1 * cof[2])
            det_c = term if det_c is None else tuple(
                p + q for p, q in zip(det_c, term))

    w_q = jnp.asarray(disc.w_q, jnp.float64)
    Bu = jnp.asarray(disc.Bu, jnp.float64)
    mlk = jnp.stack([(w_q[None, :] * dk) @ Bu for dk in det_c])
    sig = mlk.sum(axis=(1, 2))
    return mlk, sig
