"""Pallas TPU kernels for the remap hot path (the RHS/INV FOM phases).

Two fusions that XLA cannot do across HBM materialization points:

- ``fused_geom_conv``: per-stage geometry (J, adj(J), detJ from moving
  nodes) fused with the convection action. The XLA path materializes
  J/adjJ ([E, Q, dim, dim] — ~100 MB/stage at the bench size) to HBM;
  here they live only in VMEM per element block. One HBM read of
  (x, v, u), one write of (Ku, wdet).
- ``fused_gl_cg``: the element-local Gauss-Legendre mass-inverse CG with
  the whole Krylov state held in VMEM across iterations (the XLA
  while_loop round-trips ~6 [E, nd] arrays per iteration), with
  per-element convergence masking — the exact semantics of MFEM's
  DGMassInverse local CG (remhos_ho.cpp:79-80).

Written for the f32 production path (f64 is emulated on current TPUs and
runs through the XLA path); block size over elements is the tuning knob.
Numerical equivalence to the XLA path is tested in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rep(shape):
    """Replicated (non-gridded) VMEM block spec for a static table."""
    nd = len(shape)
    # i * 0 keeps every index-map component i32 (plain 0 becomes an
    # i64 constant under jax_enable_x64, which Mosaic cannot legalize)
    return pl.BlockSpec(shape, lambda i: (i * 0,) * nd,
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# fused geometry + convection action (remap: v is nodal mesh velocity)
# ---------------------------------------------------------------------------


def _geom_conv_kernel(xs_ref, v_ref, u_ref, Gmb_ref, BmT_ref, GuT_ref,
                      Bu_w_ref, w_q_ref, ku_ref, wdet_ref, *, dim, sign):
    # xs_ref/v_ref: [dim, TE, nm] (pre-transposed — Mosaic dislikes
    # in-kernel shape casts); all contractions are plain 2D dots.
    Q = w_q_ref.shape[1]
    dtype = xs_ref.dtype

    Jtab = [[jnp.dot(xs_ref[d], Gmb_ref[b], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
             for b in range(dim)] for d in range(dim)]   # [TE, Q] each

    def Jdb(d, b):
        return Jtab[d][b]

    if dim == 3:
        cof = (
            (Jdb(1, 1) * Jdb(2, 2) - Jdb(1, 2) * Jdb(2, 1),
             Jdb(1, 2) * Jdb(2, 0) - Jdb(1, 0) * Jdb(2, 2),
             Jdb(1, 0) * Jdb(2, 1) - Jdb(1, 1) * Jdb(2, 0)),
            (Jdb(0, 2) * Jdb(2, 1) - Jdb(0, 1) * Jdb(2, 2),
             Jdb(0, 0) * Jdb(2, 2) - Jdb(0, 2) * Jdb(2, 0),
             Jdb(0, 1) * Jdb(2, 0) - Jdb(0, 0) * Jdb(2, 1)),
            (Jdb(0, 1) * Jdb(1, 2) - Jdb(0, 2) * Jdb(1, 1),
             Jdb(0, 2) * Jdb(1, 0) - Jdb(0, 0) * Jdb(1, 2),
             Jdb(0, 0) * Jdb(1, 1) - Jdb(0, 1) * Jdb(1, 0)),
        )
        det = (Jdb(0, 0) * cof[0][0] + Jdb(0, 1) * cof[0][1]
               + Jdb(0, 2) * cof[0][2])
    else:
        cof = ((Jdb(1, 1), -Jdb(1, 0)), (-Jdb(0, 1), Jdb(0, 0)))
        det = Jdb(0, 0) * Jdb(1, 1) - Jdb(0, 1) * Jdb(1, 0)

    # velocity at quad points (nodal interpolation with the mesh basis)
    BmT = BmT_ref[:]
    v_q = [jnp.dot(v_ref[d], BmT, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
           for d in range(dim)]                          # [TE, Q] each

    # du_q = sum_b va_b * (d_b u)_q ;  va_b = sum_d cof[d][b] v_d
    u = u_ref[:]
    du_q = None
    for b in range(dim):
        va_b = cof[0][b] * v_q[0]
        for d in range(1, dim):
            va_b = va_b + cof[d][b] * v_q[d]
        g_b = jnp.dot(u, GuT_ref[b], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)  # [TE, Q]
        du_q = va_b * g_b if du_q is None else du_q + va_b * g_b
    du_q = sign * du_q

    ku_ref[:] = jnp.dot(du_q, Bu_w_ref[:], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
    wdet_ref[:] = w_q_ref[:] * det


def fused_geom_conv(xs, v, u, disc, sign, block_e=128, interpret=False):
    """(Ku_volume[E,nd], wdet[E,Q]) with geometry fused in VMEM.

    xs: current node positions (x0 + t*v computed by the caller)."""
    E, nm, dim = xs.shape
    nd = u.shape[1]
    dtype = u.dtype
    Gm = np.asarray(disc.Gm, np.float64)
    Q = Gm.shape[0]
    Gmb = jnp.asarray(np.stack([Gm[:, :, b].T for b in range(dim)]),
                      dtype)                                    # [dim, nm, Q]
    BmT = jnp.asarray(np.asarray(disc.Bm).T, dtype)             # [nm, Q]
    GuT = jnp.asarray(np.stack([np.asarray(disc.Gu)[:, :, b].T
                                for b in range(dim)]), dtype)   # [dim, nd, Q]
    Bu_w = jnp.asarray(np.asarray(disc.Bu) * np.asarray(disc.w_q)[:, None],
                       dtype)                                   # [Q, nd]
    w_q = jnp.asarray(np.asarray(disc.w_q)[None, :], dtype)     # [1, Q]

    xs_t = jnp.transpose(xs, (2, 0, 1))                         # [dim, E, nm]
    v_t = jnp.transpose(v.astype(dtype), (2, 0, 1))
    be = min(block_e, E)
    assert E % be == 0, (E, be)
    kern = functools.partial(_geom_conv_kernel, dim=dim, sign=sign)
    return pl.pallas_call(
        kern,
        grid=(E // be,),
        in_specs=[
            pl.BlockSpec((dim, be, nm), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, be, nm), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            _rep(Gmb.shape), _rep(BmT.shape), _rep(GuT.shape),
            _rep(Bu_w.shape), _rep(w_q.shape),
        ],
        out_specs=(
            pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, Q), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((E, nd), dtype),
                   jax.ShapeDtypeStruct((E, Q), dtype)),
        interpret=interpret,
    )(xs_t, v_t, u, Gmb, BmT, GuT, Bu_w, w_q)


# ---------------------------------------------------------------------------
# fused element-local GL mass-inverse CG
# ---------------------------------------------------------------------------


def _gl_cg_kernel(rhs_ref, wdet_ref, BglT_ref, Bgl_ref, Bgl2_ref, A_ref,
                  AT_ref, out_ref, *, n_iter, rel_tol2):
    dtype = rhs_ref.dtype
    wdet = wdet_ref[:]                                  # [TE, Q]
    b = jnp.dot(rhs_ref[:], A_ref[:], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
    diag = jnp.dot(wdet, Bgl2_ref[:], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
    inv_diag = 1.0 / diag
    BglT = BglT_ref[:]
    Bgl = Bgl_ref[:]

    def amul(g):
        gq = jnp.dot(g, BglT, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(gq * wdet, Bgl, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)

    x = jnp.zeros_like(b)
    r = b
    z = inv_diag * r
    p = z
    rz = (r * z).sum(axis=1, keepdims=True)             # per element
    rr = (r * r).sum(axis=1, keepdims=True)
    tol2 = rel_tol2 * rr                                # relative, per elem

    def body(i, c):
        x, r, z, p, rz, rr = c
        live = rr > tol2                                # [TE, 1]
        Ap = amul(p)
        pAp = (p * Ap).sum(axis=1, keepdims=True)
        alpha = jnp.where(live, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = (r * z).sum(axis=1, keepdims=True)
        beta = jnp.where(live, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = jnp.where(live, z + beta * p, p)
        rz = jnp.where(live, rz_new, rz)
        rr = jnp.where(live, (r * r).sum(axis=1, keepdims=True), rr)
        return x, r, z, p, rz, rr

    x, *_ = jax.lax.fori_loop(0, n_iter, body, (x, r, z, p, rz, rr))
    out_ref[:] = jnp.dot(x, AT_ref[:], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)


def fused_gl_cg(rhs, wdet, disc, rel_tol=None, n_iter=16, block_e=256,
                interpret=False):
    """Element-local DGMassInverse CG with per-element RELATIVE stopping
    (|r_e| <= rel_tol |b_e|; see pa.mass_solve_gl for why relative), all
    Krylov state in VMEM across iterations."""
    E, nd = rhs.shape
    dtype = rhs.dtype
    if rel_tol is None:
        rel_tol = 1e-6 if dtype == jnp.float32 else 1e-12
    Bgl = np.asarray(disc.Bgl)
    Q = Bgl.shape[0]
    BglT = jnp.asarray(Bgl.T, dtype)
    Bglj = jnp.asarray(Bgl, dtype)
    Bgl2 = jnp.asarray(Bgl * Bgl, dtype)
    A = jnp.asarray(disc.A_gl2b, dtype)
    AT = jnp.asarray(np.asarray(disc.A_gl2b).T, dtype)
    be = min(block_e, E)
    assert E % be == 0
    kern = functools.partial(_gl_cg_kernel, n_iter=n_iter,
                             rel_tol2=rel_tol * rel_tol)
    return pl.pallas_call(
        kern,
        grid=(E // be,),
        in_specs=[pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((be, Q), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
                  _rep(BglT.shape), _rep(Bglj.shape), _rep(Bgl2.shape),
                  _rep(A.shape), _rep(AT.shape)],
        out_specs=pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nd), dtype),
        interpret=interpret,
    )(rhs, wdet, BglT, Bglj, Bgl2, A, AT)


# ---------------------------------------------------------------------------
# geometry-only wdet (J -> detJ -> w*detJ without materializing J to HBM)
# ---------------------------------------------------------------------------


def _wdet_kernel(xs_ref, Gmb_ref, w_q_ref, wdet_ref, *, dim):
    dtype = xs_ref.dtype
    Jtab = [[jnp.dot(xs_ref[d], Gmb_ref[b], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
             for b in range(dim)] for d in range(dim)]

    def Jdb(d, b):
        return Jtab[d][b]

    if dim == 3:
        det = (Jdb(0, 0) * (Jdb(1, 1) * Jdb(2, 2) - Jdb(1, 2) * Jdb(2, 1))
               + Jdb(0, 1) * (Jdb(1, 2) * Jdb(2, 0) - Jdb(1, 0) * Jdb(2, 2))
               + Jdb(0, 2) * (Jdb(1, 0) * Jdb(2, 1) - Jdb(1, 1) * Jdb(2, 0)))
    elif dim == 2:
        det = Jdb(0, 0) * Jdb(1, 1) - Jdb(0, 1) * Jdb(1, 0)
    else:
        det = Jdb(0, 0)
    wdet_ref[:] = w_q_ref[:] * det


def fused_wdet(xs, disc, block_e=512, interpret=False):
    """wdet[E,Q] = w_q * detJ at the volume rule, J kept in VMEM."""
    E, nm, dim = xs.shape
    dtype = xs.dtype
    Gm = np.asarray(disc.Gm, np.float64)
    Q = Gm.shape[0]
    Gmb = jnp.asarray(np.stack([Gm[:, :, b].T for b in range(dim)]), dtype)
    w_q = jnp.asarray(np.asarray(disc.w_q)[None, :], dtype)
    xs_t = jnp.transpose(xs, (2, 0, 1))
    be = min(block_e, E)
    assert E % be == 0
    kern = functools.partial(_wdet_kernel, dim=dim)
    return pl.pallas_call(
        kern,
        grid=(E // be,),
        in_specs=[pl.BlockSpec((dim, be, nm), lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
                  _rep(Gmb.shape), _rep(w_q.shape)],
        out_specs=pl.BlockSpec((be, Q), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Q), dtype),
        interpret=interpret,
    )(xs_t, Gmb, w_q)
