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


def _auto_interpret(interpret):
    """interpret=None resolves to 'not on TPU': kernels run in interpret
    mode on CPU so tests and the f32 golden tier exercise the SAME code
    path the production TPU run uses."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


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


def fused_geom_conv(xs, v, u, disc, sign, block_e=128, interpret=None):
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
    be = _pick_block(E, block_e)
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
        interpret=_auto_interpret(interpret),
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
# fully fused HO stage: geometry + volume convection + DG face flux + GL CG
# ---------------------------------------------------------------------------
#
# The round-2 profile showed the DG face pipeline (tangent normals, upwind
# flux, face-dof scatter — pa.py:53-72) plus the XLA while_loop mass-inverse
# round-tripping HBM every CG iteration accounted for ~1.5 of the 2.1 ms
# FOM-phase time per stage. This kernel runs the ENTIRE HO solve
# (AdvectionOperator::MultUnlimited for -ho 3 -pa, remhos.cpp:1596-1710 +
# remhos_ho.cpp:119-128) in one pass over each element block:
#
#   read  x, v, u, u_nbr      (u_nbr = halo-gathered neighbor face dofs)
#   VMEM  J, cofactors, detJ, face tangents/normals, upwind flux, Krylov
#   write du_HO, wdet
#
# Every cross-dof contraction is a plain 2D dot so Mosaic tiles it onto the
# MXU. The face-dof scatter becomes a matmul with a static 0/1-weighted
# scatter table (SB below) — no dynamic scatter anywhere.


def _stage_ho_kernel(xs_ref, v_ref, u_ref, unbr_ref,
                     Gmb_ref, BmT_ref, GuT_ref, Buw_ref, wq_ref,
                     BmfT_ref, GT1_ref, GT2_ref, BD_ref, BDown_ref, SB_ref,
                     A_ref, AT_ref, BglT_ref, Bgl_ref, Bgl2_ref,
                     out_ref, wdet_ref, *, dim, sign, mode, n_cg, rel_tol2,
                     with_face=True, geom_prec=None):
    dtype = u_ref.dtype
    HI = jax.lax.Precision.HIGHEST
    GP = HI if geom_prec is None else geom_prec

    def dot(a, b, prec=HI):
        return jnp.dot(a, b, preferred_element_type=dtype, precision=prec)

    # --- volume geometry: J columns, all [TE, Q] ---
    Jtab = [[dot(xs_ref[d], Gmb_ref[b], GP) for b in range(dim)]
            for d in range(dim)]

    def Jdb(d, b):
        return Jtab[d][b]

    # --- volume convection: du_q = sum_b (cof[:,b].v) (d_b u)_q ---
    # cofactor columns are formed one b at a time (only 3 transient
    # [TE, Q] arrays live beyond Jtab/v_q — halves the VMEM peak vs
    # materializing the full cofactor table, enabling larger blocks)
    BmT = BmT_ref[:]
    v_q = [dot(v_ref[d], BmT, GP) for d in range(dim)]
    u = u_ref[:]
    du_q = None
    det = None
    for b in range(dim):
        if dim == 3:
            b1, b2 = (b + 1) % 3, (b + 2) % 3
            cof_b = [Jdb((d + 1) % 3, b1) * Jdb((d + 2) % 3, b2)
                     - Jdb((d + 1) % 3, b2) * Jdb((d + 2) % 3, b1)
                     for d in range(3)]
        elif b == 0:
            cof_b = [Jdb(1, 1), -Jdb(0, 1)]
        else:
            cof_b = [-Jdb(1, 0), Jdb(0, 0)]
        dd = Jdb(0, b) * cof_b[0]
        det = dd if b == 0 else det        # det = first cofactor expansion
        if dim == 3 and b > 0:
            # complete the row-0 expansion: det = sum_b J[0,b]*C[0,b]
            det = det + dd
        va_b = cof_b[0] * v_q[0]
        for d in range(1, dim):
            va_b = va_b + cof_b[d] * v_q[d]
        g_b = dot(u, GuT_ref[b])
        du_q = va_b * g_b if du_q is None else du_q + va_b * g_b
    if dim == 2:
        det = Jdb(0, 0) * Jdb(1, 1) - Jdb(0, 1) * Jdb(1, 0)
    Ku = dot(sign * du_q, Buw_ref[:])
    wdet = wq_ref[:] * det
    wdet_ref[:] = wdet

    # --- DG face pipeline: tangent normals -> upwind flux -> scatter ---
    # (face_normals_tangent + pa.face_full_apply + asm.scatter_face_add,
    # with the reference-normal sign folded into GT1 and w_fq into SB)
    if with_face:
        if dim == 3:
            T1 = [dot(xs_ref[d], GT1_ref[:]) for d in range(3)]
            T2 = [dot(xs_ref[d], GT2_ref[:]) for d in range(3)]
            nor = (T1[1] * T2[2] - T1[2] * T2[1],
                   T1[2] * T2[0] - T1[0] * T2[2],
                   T1[0] * T2[1] - T1[1] * T2[0])
        else:
            t0 = dot(xs_ref[0], GT1_ref[:])
            t1 = dot(xs_ref[1], GT1_ref[:])
            nor = (t1, -t0)
        BmfT = BmfT_ref[:]
        vn = None
        for d in range(dim):
            vfd = dot(v_ref[d], BmfT)
            vn = vfd * nor[d] if vn is None else vn + vfd * nor[d]
        up = jnp.maximum(0.0, mode * vn)                  # [TE, FQ]
        diff_q = dot(unbr_ref[:], BD_ref[:]) - dot(u, BDown_ref[:])
        Ku = Ku + dot(up * diff_q, SB_ref[:])

    if n_cg == 0:
        out_ref[:] = Ku
        return

    # --- GL mass inverse by Jacobi iteration, all state in VMEM ---
    # The Jacobi-scaled GL mass matrix has kappa ~ 1.005, i.e. spectral
    # radius of (I - D^-1 M) ~ 2.5e-3: each sweep multiplies the error by
    # that factor, so 3 sweeps reach the f32 floor and 8 the f64 floor —
    # same convergence regime as MFEM's DGMassInverse local CG
    # (remhos_ho.cpp:79-80) with no dot-product reductions at all.
    b = dot(Ku, A_ref[:])
    diag = dot(wdet, Bgl2_ref[:])
    inv_diag = 1.0 / diag
    BglT = BglT_ref[:]
    Bgl = Bgl_ref[:]

    def amul(g):
        return dot(dot(g, BglT) * wdet, Bgl)

    x = inv_diag * b
    for _ in range(n_cg):
        x = x + inv_diag * (b - amul(x))
    out_ref[:] = dot(x, AT_ref[:])


def stage_ho_tables(disc, dtype):
    """Static tables for fused_stage_ho (built once per Advection)."""
    from .. import geometry as geo
    dim = disc.dim
    nd, fd = disc.nd, disc.fd
    Bface = np.asarray(disc.Bface)
    Qf = Bface.shape[0]
    nf = disc.n_ref.shape[0]
    FQ = nf * Qf
    nm = disc.Bm.shape[1]
    w_fq = np.asarray(disc.w_fq)
    bdr = np.asarray(disc.dofmaps.bdr_dofs)               # [nf, fd]

    ft = geo.face_tangent_tables(disc.Gmf, disc.n_ref)
    assert ft is not None, "fused stage requires axis-aligned ref normals"
    Gt, sg = ft                                           # [nf,Qf,nm,tdim]
    Gt0 = Gt[..., 0] * sg[:, None, None]                  # sign folded
    GT1 = Gt0.transpose(2, 0, 1).reshape(nm, FQ)
    GT2 = (Gt[..., 1].transpose(2, 0, 1).reshape(nm, FQ)
           if dim == 3 else np.zeros((nm, FQ)))

    Gm = np.asarray(disc.Gm, np.float64)
    Gmb = np.stack([Gm[:, :, b].T for b in range(dim)])   # [dim, nm, Q]
    BmT = np.asarray(disc.Bm).T                           # [nm, Q]
    GuT = np.stack([np.asarray(disc.Gu)[:, :, b].T for b in range(dim)])
    Buw = np.asarray(disc.Bu) * np.asarray(disc.w_q)[:, None]   # [Q, nd]
    wq = np.asarray(disc.w_q)[None, :]
    Bmf = np.asarray(disc.Bmf)                            # [nf, Qf, nm]
    BmfT = Bmf.transpose(2, 0, 1).reshape(nm, FQ)

    BD = np.zeros((nf * fd, FQ))
    BDown = np.zeros((nd, FQ))
    SB = np.zeros((FQ, nd))
    for f in range(nf):
        BD[f * fd:(f + 1) * fd, f * Qf:(f + 1) * Qf] = Bface.T
        for j in range(fd):
            d = bdr[f, j]
            BDown[d, f * Qf:(f + 1) * Qf] += Bface[:, j]
            SB[f * Qf:(f + 1) * Qf, d] += w_fq * Bface[:, j]

    J = lambda a: jnp.asarray(a, dtype)
    return dict(Gmb=J(Gmb), BmT=J(BmT), GuT=J(GuT), Buw=J(Buw), wq=J(wq),
                BmfT=J(BmfT), GT1=J(GT1), GT2=J(GT2), BD=J(BD),
                BDown=J(BDown), SB=J(SB),
                A=J(disc.A_gl2b), AT=J(np.asarray(disc.A_gl2b).T),
                BglT=J(np.asarray(disc.Bgl).T), Bgl=J(disc.Bgl),
                Bgl2=J(np.asarray(disc.Bgl) * np.asarray(disc.Bgl)))


def _pick_block(E, target):
    be = min(target, E)
    while E % be != 0:
        be -= 1
    return be


def fused_stage_ho(xs, v, u, u_nbr_flat, tables, *, mode, n_cg=None,
                   rel_tol=None, block_e=None, interpret=None,
                   with_face=True, geom_prec=None):
    """(du_HO[E,nd], wdet[E,Q]) — the full -ho 3 PA stage solve fused.

    mode: +1 remap upwind (-max(0,vn) flux sign), -1 transport (min(0,vn));
    the volume sign matches (remap +1 / transport -1, remhos_tools.cpp:820).
    n_cg=0 returns (Ku, wdet) without the mass inverse (phase ablation);
    with_face=False skips the DG face pipeline (phase ablation only)."""
    E, nm, dim = xs.shape
    nd = u.shape[1]
    dtype = u.dtype
    Q = tables["Buw"].shape[0]
    if rel_tol is None:
        rel_tol = 1e-6 if dtype == jnp.float32 else 1e-12
    if n_cg is None:
        # kappa(Jacobi-scaled M_GL) ~ 1.005 -> the CG residual shrinks
        # ~1e-3/iteration; 3 iterations reach the f32 floor, 8 the f64
        # floor (per-element live masking freezes converged elements)
        n_cg = 3 if dtype == jnp.float32 else 8
    if block_e is None:
        # ~20 live [be, Q] scratch arrays; keep them within ~12 MB of the
        # 16 MB scoped VMEM (be=512 for p=3/Q=216 f32, smaller for p=4)
        budget = 150_000 if dtype == jnp.float32 else 75_000
        block_e = max(64, min(512, budget // Q))
    xs_t = jnp.transpose(xs, (2, 0, 1)).astype(dtype)     # [dim, E, nm]
    v_t = jnp.transpose(v, (2, 0, 1)).astype(dtype)
    be = _pick_block(E, block_e)
    kern = functools.partial(_stage_ho_kernel, dim=dim, sign=float(mode),
                             mode=float(mode), n_cg=n_cg,
                             rel_tol2=rel_tol * rel_tol,
                             with_face=with_face, geom_prec=geom_prec)
    t = tables
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
            pl.BlockSpec((be, u_nbr_flat.shape[1]), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            _rep(t["Gmb"].shape), _rep(t["BmT"].shape), _rep(t["GuT"].shape),
            _rep(t["Buw"].shape), _rep(t["wq"].shape), _rep(t["BmfT"].shape),
            _rep(t["GT1"].shape), _rep(t["GT2"].shape), _rep(t["BD"].shape),
            _rep(t["BDown"].shape), _rep(t["SB"].shape),
            _rep(t["A"].shape), _rep(t["AT"].shape), _rep(t["BglT"].shape),
            _rep(t["Bgl"].shape), _rep(t["Bgl2"].shape),
        ],
        out_specs=(
            pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, Q), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((E, nd), dtype),
                   jax.ShapeDtypeStruct((E, Q), dtype)),
        interpret=_auto_interpret(interpret),
    )(xs_t, v_t, u, u_nbr_flat, t["Gmb"], t["BmT"], t["GuT"], t["Buw"],
      t["wq"], t["BmfT"], t["GT1"], t["GT2"], t["BD"], t["BDown"], t["SB"],
      t["A"], t["AT"], t["BglT"], t["Bgl"], t["Bgl2"])


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


def fused_wdet(xs, disc, block_e=512, interpret=None):
    """wdet[E,Q] = w_q * detJ at the volume rule, J kept in VMEM."""
    E, nm, dim = xs.shape
    dtype = xs.dtype
    Gm = np.asarray(disc.Gm, np.float64)
    Q = Gm.shape[0]
    Gmb = jnp.asarray(np.stack([Gm[:, :, b].T for b in range(dim)]), dtype)
    w_q = jnp.asarray(np.asarray(disc.w_q)[None, :], dtype)
    xs_t = jnp.transpose(xs, (2, 0, 1))
    be = _pick_block(E, block_e)
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
        interpret=_auto_interpret(interpret),
    )(xs_t, Gmb, w_q)
