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
                     XT_ref, VT_ref, UT_ref, Buw_ref, wq_ref,
                     BD_ref, SB_ref,
                     A_ref, AT_ref, BglT_ref, Bgl_ref, Bgl2_ref,
                     out_ref, wdet_ref, *, dim, sign, mode, n_cg, seg,
                     with_face=True):
    """All cross-dof contractions are consolidated into a handful of FAT
    dots whose RHS tables concatenate 128-aligned zero-padded segments
    (profiling showed per-dot-instruction overhead, not MXU passes,
    dominated the many-small-dots formulation). Zero padding keeps every
    padded lane exactly 0 through the whole pipeline (0*0 products), so
    no masking is needed; wdet is emitted padded and sliced by the
    caller."""
    dtype = u_ref.dtype
    HI = jax.lax.Precision.HIGHEST
    S = seg

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=dtype, precision=HI)

    def sg(M, k):
        return M[:, k * S:(k + 1) * S]

    # X[d] segments: [J_col_b for b<dim] + [T1, T2 (3D)] — one dot per d
    X = [dot(xs_ref[d], XT_ref[:]) for d in range(dim)]
    # V[d] segments: [v_q, v_fq]
    V = [dot(v_ref[d], VT_ref[:]) for d in range(dim)]
    # U segments: [grad_b u for b<dim] + [u at face qpts]
    u = u_ref[:]
    U = dot(u, UT_ref[:])

    def Jdb(d, b):
        return sg(X[d], b)

    # --- volume convection: du_q = sum_b (cof[:,b].v) (d_b u)_q ---
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
        det = dd if b == 0 else det        # row-0 cofactor expansion
        if dim == 3 and b > 0:
            det = det + dd
        va_b = cof_b[0] * sg(V[0], 0)
        for d in range(1, dim):
            va_b = va_b + cof_b[d] * sg(V[d], 0)
        du_q = (va_b * sg(U, b) if du_q is None
                else du_q + va_b * sg(U, b))
    if dim == 2:
        det = Jdb(0, 0) * Jdb(1, 1) - Jdb(0, 1) * Jdb(1, 0)
    Ku = dot(sign * du_q, Buw_ref[:])
    wdet = wq_ref[:] * det
    wdet_ref[:] = wdet

    # --- DG face pipeline: tangent normals -> upwind flux -> scatter ---
    # (face_normals_tangent + pa.face_full_apply + asm.scatter_face_add,
    # reference-normal sign folded into the T1 table, w_fq into SB)
    if with_face:
        if dim == 3:
            T1 = [sg(X[d], 3) for d in range(3)]
            T2 = [sg(X[d], 4) for d in range(3)]
            nor = (T1[1] * T2[2] - T1[2] * T2[1],
                   T1[2] * T2[0] - T1[0] * T2[2],
                   T1[0] * T2[1] - T1[1] * T2[0])
        else:
            nor = (sg(X[1], 2), -sg(X[0], 2))
        vn = None
        for d in range(dim):
            vfd = sg(V[d], 1)
            vn = vfd * nor[d] if vn is None else vn + vfd * nor[d]
        up = jnp.maximum(0.0, mode * vn)                  # [TE, S]
        diff_q = dot(unbr_ref[:], BD_ref[:]) - sg(U, dim)
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
    # padded lanes of wdet are exactly 0 -> diag is exact; guard the
    # reciprocal only against them never being used (they aren't: Bgl2's
    # padded rows are 0)
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
    """Static tables for fused_stage_ho (built once per Advection).

    All quad-point-indexed tables are zero-padded to a shared 128-aligned
    segment size S = align(max(Q, FQ)) and concatenated so the kernel
    issues ONE dot per operand source (see _stage_ho_kernel)."""
    from .. import geometry as geo
    dim = disc.dim
    nd, fd = disc.nd, disc.fd
    Bface = np.asarray(disc.Bface)
    Qf = Bface.shape[0]
    nf = disc.n_ref.shape[0]
    FQ = nf * Qf
    nm = disc.Bm.shape[1]
    Q = len(disc.w_q)
    S = ((max(Q, FQ) + 127) // 128) * 128
    w_fq = np.asarray(disc.w_fq)
    bdr = np.asarray(disc.dofmaps.bdr_dofs)               # [nf, fd]

    def padc(a):
        """pad columns to S."""
        out = np.zeros(a.shape[:-1] + (S,))
        out[..., :a.shape[-1]] = a
        return out

    def padr(a):
        """pad rows to S."""
        out = np.zeros((S,) + a.shape[1:])
        out[:a.shape[0]] = a
        return out

    ft = geo.face_tangent_tables(disc.Gmf, disc.n_ref)
    assert ft is not None, "fused stage requires axis-aligned ref normals"
    Gt, sg = ft                                           # [nf,Qf,nm,tdim]
    Gt0 = Gt[..., 0] * sg[:, None, None]                  # sign folded
    GT1 = Gt0.transpose(2, 0, 1).reshape(nm, FQ)
    GT2 = (Gt[..., 1].transpose(2, 0, 1).reshape(nm, FQ)
           if dim == 3 else None)

    Gm = np.asarray(disc.Gm, np.float64)
    Gmb = [Gm[:, :, b].T for b in range(dim)]             # [nm, Q] each
    BmT = np.asarray(disc.Bm).T                           # [nm, Q]
    GuT = [np.asarray(disc.Gu)[:, :, b].T for b in range(dim)]
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

    # consolidated, segment-padded tables
    xsegs = [padc(g) for g in Gmb] + [padc(GT1)]
    if dim == 3:
        xsegs.append(padc(GT2))
    XT = np.concatenate(xsegs, axis=1)                    # [nm, (dim+t)*S]
    VT = np.concatenate([padc(BmT), padc(BmfT)], axis=1)  # [nm, 2S]
    UT = np.concatenate([padc(g) for g in GuT] + [padc(BDown)],
                        axis=1)                           # [nd, (dim+1)*S]

    J = lambda a: jnp.asarray(a, dtype)
    out = dict(XT=J(XT), VT=J(VT), UT=J(UT),
               Buw=J(padr(Buw)), wq=J(padc(wq)),
               BD=J(padc(BD)), SB=J(padr(SB)),
               A=J(disc.A_gl2b), AT=J(np.asarray(disc.A_gl2b).T),
               BglT=J(padc(np.asarray(disc.Bgl).T)),
               Bgl=J(padr(disc.Bgl)),
               Bgl2=J(padr(np.asarray(disc.Bgl) * np.asarray(disc.Bgl))),
               BuT=J(padc(np.asarray(disc.Bu).T)),
               BuP=J(padr(np.asarray(disc.Bu))),
               seg=S, Q=Q)
    if dtype == jnp.float32:
        # bf16 hi/lo split tables ([2, rows, cols]) for the 3-pass RHS
        # dots in _poly_stage_core (dot3). f64 mode never builds them.
        def s3(a):
            a32 = jnp.asarray(a, jnp.float32)
            hi = a32.astype(jnp.bfloat16)
            lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.stack([hi, lo])
        out.update(UT3=s3(UT), Buw3=s3(padr(Buw)), BD3=s3(padc(BD)),
                   SB3=s3(padr(SB)),
                   BglT3=s3(padc(np.asarray(disc.Bgl).T)),
                   Bgl3=s3(padr(disc.Bgl)))
    # one-hot class->dof expansion for the element-class bounds stencil
    # ([E, 3^dim] -> [E, nd] inside the mega kernel): per axis a dof is
    # class 0 (GLL endpoint seeing the low neighbor), 1 (interior), or 2
    # (endpoint seeing the high neighbor). Exact under matmul: each row
    # sums exactly one product 1.0 * v.
    n1 = round(nd ** (1.0 / dim))
    cls = lambda k: 0 if k == 0 else (2 if k == n1 - 1 else 1)
    EXP = np.zeros((3 ** dim, nd))
    for i in range(nd):
        ks = [(i // n1 ** a) % n1 for a in range(dim)]     # kx, ky, kz
        col = 0
        for a in reversed(range(dim)):
            col = col * 3 + cls(ks[a])
        EXP[col, i] = 1.0
    out["EXP"] = J(EXP)
    return out


def _pick_block(E, target):
    be = min(target, E)
    while E % be != 0:
        be -= 1
    return be


def fused_stage_ho(xs, v, u, u_nbr_flat, tables, *, mode, n_cg=None,
                   rel_tol=None, block_e=None, interpret=None,
                   with_face=True):
    """(du_HO[E,nd], wdet[E,Q]) — the full -ho 3 PA stage solve fused.

    mode: +1 remap upwind (-max(0,vn) flux sign), -1 transport (min(0,vn));
    the volume sign matches (remap +1 / transport -1, remhos_tools.cpp:820).
    n_cg=0 returns (Ku, wdet) without the mass inverse (phase ablation);
    with_face=False skips the DG face pipeline (phase ablation only)."""
    E, nm, dim = xs.shape
    nd = u.shape[1]
    dtype = u.dtype
    S = tables["seg"]
    Q = tables["Q"]
    if n_cg is None:
        # Jacobi contraction ~2.5e-3/sweep (see kernel): 1 sweep leaves
        # ~6e-6 relative error (below the f32-input floor), 8 reach f64
        n_cg = 1 if dtype == jnp.float32 else 8
    if block_e is None:
        # ~16 live [be, S] scratch arrays; keep them within ~12 MB of the
        # 16 MB scoped VMEM (be=512 for p=3/S=256 f32, smaller for p=4)
        budget = 180_000 if dtype == jnp.float32 else 90_000
        block_e = max(64, min(512, budget // S))
    xs_t = jnp.transpose(xs, (2, 0, 1)).astype(dtype)     # [dim, E, nm]
    v_t = jnp.transpose(v, (2, 0, 1)).astype(dtype)
    be = _pick_block(E, block_e)
    kern = functools.partial(_stage_ho_kernel, dim=dim, sign=float(mode),
                             mode=float(mode), n_cg=n_cg, seg=S,
                             with_face=with_face)
    t = tables
    du, wdet_p = pl.pallas_call(
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
            _rep(t["XT"].shape), _rep(t["VT"].shape), _rep(t["UT"].shape),
            _rep(t["Buw"].shape), _rep(t["wq"].shape),
            _rep(t["BD"].shape), _rep(t["SB"].shape),
            _rep(t["A"].shape), _rep(t["AT"].shape), _rep(t["BglT"].shape),
            _rep(t["Bgl"].shape), _rep(t["Bgl2"].shape),
        ],
        out_specs=(
            pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, S), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((E, nd), dtype),
                   jax.ShapeDtypeStruct((E, S), dtype)),
        interpret=_auto_interpret(interpret),
    )(xs_t, v_t, u, u_nbr_flat, t["XT"], t["VT"], t["UT"], t["Buw"],
      t["wq"], t["BD"], t["SB"],
      t["A"], t["AT"], t["BglT"], t["Bgl"], t["Bgl2"])
    # padded lanes are exact zeros; the XLA slice fuses into consumers
    return du, wdet_p[:, :Q]


# ---------------------------------------------------------------------------
# stage-time polynomial geometry (remap): J(t) is AFFINE in t
# ---------------------------------------------------------------------------
#
# In remap mode the mesh moves as x(t) = x0 + t*v with a STATIC velocity
# (remhos.cpp:1598-1608), so the Jacobian J(t) = J0 + t*Jv is affine in
# the stage time. Everything the stage kernel needs from geometry is a
# low-degree polynomial in t:
#
#   va_b  = cof(J)^T v |_b      quadratic (3D) / affine (2D)
#   w*det(J)                    cubic (3D) / quadratic (2D)
#   vn    = v_f . nor(J_f)      quadratic (3D) / affine (2D)
#
# The coefficient tables are built ONCE per run (device arrays, ~230 MB
# at the bench size) and the per-stage geometry becomes a handful of
# reads + FMAs instead of the J/cofactor/tangent compute that dominated
# the stage (the reference reassembles all of this every stage — this is
# remap structure the TPU formulation can exploit and a CPU/GPU
# reassembly pass cannot cheaply).


_EPS_CS = 1.0e-15   # ClipScale rescale guard (remhos_fct.cpp:486)


def _poly_stage_core(t, u, unbr, P, T, T3=None, *, dim, mode, n_cg, seg,
                     nkv, nkd, nkn, P16=None):
    """Shared in-VMEM math of the polynomial-geometry stage solve: no
    J/cofactor/tangent compute — geometry enters as t-polynomial
    coefficient reads from ONE concatenated operand P = [VA | WDET | VN]
    (see build_poly_tables). T maps table names to their VMEM refs.
    Returns (du_HO, wdet) — or (Ku, wdet) when n_cg == 0 (phase
    ablation's mass-solve-off mode).

    P16 (experiment, docs/PERF.md "P-stream precision"): the VA and VN
    coefficient planes arrive as a separate bf16 operand [VA16 | VN16]
    and P holds only the f32 WDET planes — halving ~3/4 of the dominant
    poly stream. wdet stays f32 unconditionally: it feeds the lumped
    mass / LO average, where bf16 would bias conservation directly."""
    dtype = u.dtype
    HI = jax.lax.Precision.HIGHEST
    S = seg

    def dot(a, b, prec=HI):
        return jnp.dot(a, b, preferred_element_type=dtype, precision=prec)

    # bf16x3 3-pass dots for the WELL-CONDITIONED RHS contractions (grad/
    # face interpolation of u, the weighted-divergence and face-scatter
    # maps): both operands split into bf16 hi+lo, three single-pass MXU
    # dots (a_hi b_hi + a_hi b_lo + a_lo b_hi, f32 accumulation) instead
    # of HIGHEST's six — relative accuracy ~1.5e-5, 50x below the f32-
    # input accuracy floor (~7e-4, docs/PERF.md). NOT used for the
    # Bernstein<->GL basis changes (A/AT/Bgl: kappa ~ 4.3e4 — bf16-class
    # products there produced O(10) du errors in round 2) nor for the
    # conservation-critical LO/lumped-mass dots. Gates: 320-step mass
    # drift (4e-8/step) + the 2-step f32-vs-f64 cross check in the bench.
    # Tables arrive pre-split ([2, rows, cols] bf16, stage_ho_tables);
    # only f32 mode builds them (T3 is None in f64 -> HIGHEST path).
    def dot3(a, b3_ref):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(dtype)).astype(jnp.bfloat16)
        bh, bl = b3_ref[0], b3_ref[1]
        # explicit DEFAULT: the global jax_default_matmul_precision=f32
        # would request an fp32 contract on bf16 inputs (Mosaic rejects)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=dtype,
                                 precision=jax.lax.Precision.DEFAULT)
        return d(ah, bh) + (d(ah, bl) + d(al, bh))

    def cdot(a, key):
        """RHS contraction: bf16x3 when split tables are present (f32
        production mode), HIGHEST otherwise (f64 / no-split)."""
        if T3 is not None:
            return dot3(a, T3[key + "3"])
        return dot(a, T[key][:])

    def sg(M, k):
        return M[:, k * S:(k + 1) * S].astype(dtype)

    def horner(M, ks):
        acc = sg(M, ks[-1])
        for k in reversed(ks[:-1]):
            acc = sg(M, k) + t * acc
        return acc

    U = cdot(u, "UT")
    # segment offsets: monolithic P = [VA | WDET | VN]; split mode keeps
    # WDET alone in P and VA/VN in the bf16 operand P16 = [VA16 | VN16]
    Pva = P16 if P16 is not None else P
    off_wd = 0 if P16 is not None else nkv * dim
    off_vn = nkv * dim if P16 is not None else nkv * dim + nkd
    du_q = None
    for b in range(dim):
        va_b = horner(Pva, [k * dim + b for k in range(nkv)])
        g_b = sg(U, b)
        du_q = va_b * g_b if du_q is None else du_q + va_b * g_b
    Ku = cdot(mode * du_q, "Buw")
    wdet = horner(P, [off_wd + k for k in range(nkd)])

    vn = horner(Pva, [off_vn + k for k in range(nkn)])
    up = jnp.maximum(0.0, mode * vn)
    diff_q = cdot(unbr, "BD") - sg(U, dim)
    Ku = Ku + cdot(up * diff_q, "SB")

    if n_cg == 0:
        return Ku, wdet

    b_ = dot(Ku, T["A"][:])
    # the Jacobi preconditioner only needs an approximate diagonal —
    # DEFAULT (single-pass) precision is plenty
    diag = dot(wdet, T["Bgl2"][:], jax.lax.Precision.DEFAULT)
    inv_diag = 1.0 / diag
    BglT = T["BglT"][:]
    Bgl = T["Bgl"][:]

    def amul(g):
        # the GL mass apply is well-conditioned (kappa(diag-scaled M_GL)
        # ~ 1.005): bf16x3 here perturbs the Jacobi iterate by ~1.5e-5,
        # which the AT transform amplifies to at most ~4e-3 absolute on
        # du — bounded by the bench's f32-vs-f64 cross check
        if T3 is not None:
            gq = dot3(g, T3["BglT3"])
            return dot3(gq * wdet, T3["Bgl3"])
        return dot(dot(g, BglT) * wdet, Bgl)

    x = inv_diag * b_
    for _ in range(n_cg):
        x = x + inv_diag * (b_ - amul(x))
    return dot(x, T["AT"][:]), wdet


def _mass_based_avg_core(u, du, dt, wdet, BuT_ref):
    """MassBasedAvg LO: element average of u + dt*du_HO at the stage-time
    mesh (remhos_lo.cpp:247-324); all operands already in VMEM."""
    HI = jax.lax.Precision.HIGHEST
    u_new = u + dt * du
    u_new_q = jnp.dot(u_new, BuT_ref[:], preferred_element_type=u.dtype,
                      precision=HI)
    mass = (wdet * u_new_q).sum(axis=1, keepdims=True)
    vol = wdet.sum(axis=1, keepdims=True)
    return ((mass / vol) - u) / dt


def _stage_ho_poly_kernel(t_ref, u_ref, unbr_ref, P_ref,
                          UT_ref, Buw_ref, BD_ref, SB_ref,
                          A_ref, AT_ref, BglT_ref, Bgl_ref, Bgl2_ref,
                          BuT_ref, *rest, dim,
                          mode, n_cg, seg, nkv, nkd, nkn, with_lo,
                          with_t3=False, with_p16=False):
    """(du_HO, wdet[, du_LO]) outputs of the polynomial stage solve.
    with_lo additionally emits the MassBasedAvg LO solution — valid only
    when the caller's du_HO is this kernel's unmodified output (the
    standard-RK stage path). with_t3: 4 extra bf16 hi/lo split-table
    inputs precede the outputs (see _poly_stage_core's dot3). with_p16:
    one more input after those — the bf16 VA/VN plane operand."""
    T = dict(UT=UT_ref, Buw=Buw_ref, BD=BD_ref, SB=SB_ref, A=A_ref,
             AT=AT_ref, BglT=BglT_ref, Bgl=Bgl_ref, Bgl2=Bgl2_ref)
    T3 = None
    if with_t3:
        T3 = dict(zip(("UT3", "Buw3", "BD3", "SB3", "BglT3", "Bgl3"), rest[:6]))
        rest = rest[6:]
    P16 = None
    if with_p16:
        P16, rest = rest[0][:], rest[1:]
    out_ref, wdet_ref = rest[0], rest[1]
    lo_ref = rest[2] if with_lo else None
    u = u_ref[:]
    du, wdet = _poly_stage_core(t_ref[0, 0], u, unbr_ref[:], P_ref[:], T,
                                T3, dim=dim, mode=mode, n_cg=n_cg, seg=seg,
                                nkv=nkv, nkd=nkd, nkn=nkn, P16=P16)
    out_ref[:] = du
    wdet_ref[:] = wdet
    if with_lo:
        if n_cg == 0:
            lo_ref[:] = du
            return
        lo_ref[:] = _mass_based_avg_core(u, du, t_ref[0, 1], wdet, BuT_ref)


def _stage_mega_kernel(t_ref, u_ref, unbr_ref, P_ref, xmin_ref, xmax_ref,
                       UT_ref, Buw_ref, BD_ref, SB_ref,
                       A_ref, AT_ref, BglT_ref, Bgl_ref, Bgl2_ref,
                       BuT_ref, BuP_ref, *rest, dim, mode, n_cg, seg,
                       nkv, nkd, nkn, with_t3=False, with_exp=False,
                       with_p16=False, stencil_T=False):
    """The FULL limited stage in one kernel: HO solve + MassBasedAvg LO +
    lumped mass + ClipScale FCT (remhos_fct.cpp:484-539). Emits ONLY the
    limited du — du_HO/du_LO/wdet never touch HBM. Valid on the
    standard-RK -ho 3 -lo 5 -fct 2 path (limit_mult's du_HO is the HO
    solve's unmodified output); per-dof bounds enter as operands (they
    depend on u only, so the caller computes them before the kernel)."""
    T = dict(UT=UT_ref, Buw=Buw_ref, BD=BD_ref, SB=SB_ref, A=A_ref,
             AT=AT_ref, BglT=BglT_ref, Bgl=Bgl_ref, Bgl2=Bgl2_ref)
    T3 = None
    if with_t3:
        T3 = dict(zip(("UT3", "Buw3", "BD3", "SB3", "BglT3", "Bgl3"), rest[:6]))
        rest = rest[6:]
    P16 = None
    if with_p16:
        P16, rest = rest[0][:], rest[1:]
    EXP_ref = None
    if with_exp:
        EXP_ref, rest = rest[0], rest[1:]
    out_ref = rest[0]
    u = u_ref[:]
    dt = t_ref[0, 1]
    du, wdet = _poly_stage_core(t_ref[0, 0], u, unbr_ref[:], P_ref[:], T,
                                T3, dim=dim, mode=mode, n_cg=n_cg, seg=seg,
                                nkv=nkv, nkd=nkd, nkn=nkn, P16=P16)
    du_lo = _mass_based_avg_core(u, du, dt, wdet, BuT_ref)
    HI = jax.lax.Precision.HIGHEST
    ml = jnp.dot(wdet, BuP_ref[:], preferred_element_type=u.dtype,
                 precision=HI)

    # ClipScale: clip the antidiffusive flux to the dof bounds, then a
    # mass-conserving rescale (remhos_fct.cpp:484-539). Padded lanes have
    # ml == 0 -> f == 0 there, so the row sums are exact; the final
    # division puts NaN only in lanes the block store discards.
    hx = jax.lax.Precision.HIGHEST
    if stencil_T:
        # class-MAJOR stencil blocks [3^dim, be] (overlap_stencil_T's
        # lane-efficient layout, E on lanes): the same exact one-hot EXP
        # expansion with the contraction on dim 0 — the MXU takes the
        # transposed feed natively, so no VPU transpose and no [E, 3^dim]
        # lane-padded intermediate anywhere
        dn = (((0,), (0,)), ((), ()))
        x_min = jax.lax.dot_general(xmin_ref[:], EXP_ref[:], dn,
                                    preferred_element_type=u.dtype,
                                    precision=hx)
        x_max = jax.lax.dot_general(xmax_ref[:], EXP_ref[:], dn,
                                    preferred_element_type=u.dtype,
                                    precision=hx)
    elif with_exp:
        # element-class bounds stencil [TE, 3^dim] -> per-dof [TE, nd]
        # via the exact one-hot expansion (stage_ho_tables EXP)
        x_min = jnp.dot(xmin_ref[:], EXP_ref[:],
                        preferred_element_type=u.dtype, precision=hx)
        x_max = jnp.dot(xmax_ref[:], EXP_ref[:],
                        preferred_element_type=u.dtype, precision=hx)
    else:
        x_min, x_max = xmin_ref[:], xmax_ref[:]
    u_new_lo = u + dt * du_lo
    f_min = ml / dt * (x_min - u_new_lo)
    f_max = ml / dt * (x_max - u_new_lo)
    f = ml * (du - du_lo)
    f = jnp.minimum(f_max, jnp.maximum(f_min, f))

    sum_neg = jnp.minimum(f, 0.0).sum(axis=1, keepdims=True)
    sum_pos = jnp.maximum(f, 0.0).sum(axis=1, keepdims=True)
    new_mass = sum_neg + sum_pos
    fpos = jnp.maximum(f, 0.0)
    fneg = jnp.minimum(f, 0.0)
    f = jnp.where(new_mass > _EPS_CS, fneg - fpos * (sum_neg / sum_pos), f)
    f = jnp.where(new_mass < -_EPS_CS, fpos - fneg * (sum_pos / sum_neg), f)
    out_ref[:] = du_lo + f / ml


def fused_stage_ho_poly(t, u, u_nbr_flat, poly, tables, *, dim, mode,
                        n_cg=None, block_e=None, interpret=None,
                        dt=None, with_lo=False):
    """(du_HO[E,nd], wdet[E,Q][, du_LO]) via polynomial stage geometry."""
    E, nd = u.shape
    dtype = u.dtype
    S = tables["seg"]
    Q = tables["Q"]
    if n_cg is None:
        # Jacobi contraction ~2.5e-3/sweep: the x0 = D^-1 b start is
        # already within ~2.5e-3, so ONE sweep reaches ~6e-6 relative —
        # at the bf16x3 amul noise floor (~1.5e-5); a second sweep buys
        # nothing measurable (f32-vs-f64 cross check unchanged at 2.7e-6)
        n_cg = 1 if dtype == jnp.float32 else 8
    if block_e is None:
        # the poly operand blocks are fat ([be, (2 dim + 3) S] + scratch,
        # double-buffered): small blocks overlap the streaming reads best
        # (measured: be=128 beats 256/512 on v5e)
        budget = 90_000 if dtype == jnp.float32 else 45_000
        block_e = max(64, min(128, budget // S))
    be = _pick_block(E, block_e)
    t_arr = jnp.stack([jnp.asarray(t, dtype),
                       jnp.asarray(0.0 if dt is None else dt, dtype)]
                      ).reshape(1, 2)
    with_t3 = dtype == jnp.float32 and "UT3" in tables
    with_p16 = "P16" in poly
    kern = functools.partial(_stage_ho_poly_kernel, dim=dim,
                             mode=float(mode), n_cg=n_cg, seg=S,
                             nkv=dim, nkd=dim + 1, nkn=dim,
                             with_lo=with_lo, with_t3=with_t3,
                             with_p16=with_p16)
    tb = tables

    def blk(a):
        return pl.BlockSpec((be, a.shape[1]), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((be, S), lambda i: (i, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((E, nd), dtype),
                 jax.ShapeDtypeStruct((E, S), dtype)]
    if with_lo:
        out_specs.append(pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((E, nd), dtype))

    t3_keys = (("UT3", "Buw3", "BD3", "SB3", "BglT3", "Bgl3")
               if with_t3 else ())
    p16_ops = [poly["P16"]] if with_p16 else []
    res = pl.pallas_call(
        kern,
        grid=(E // be,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
            blk(u), blk(u_nbr_flat), blk(poly["P"]),
            _rep(tb["UT"].shape), _rep(tb["Buw"].shape),
            _rep(tb["BD"].shape), _rep(tb["SB"].shape),
            _rep(tb["A"].shape), _rep(tb["AT"].shape),
            _rep(tb["BglT"].shape), _rep(tb["Bgl"].shape),
            _rep(tb["Bgl2"].shape), _rep(tb["BuT"].shape),
        ] + [_rep(tb[k].shape) for k in t3_keys]
          + [blk(a) for a in p16_ops],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_auto_interpret(interpret),
    )(t_arr, u, u_nbr_flat, poly["P"],
      tb["UT"], tb["Buw"], tb["BD"], tb["SB"],
      tb["A"], tb["AT"], tb["BglT"], tb["Bgl"], tb["Bgl2"], tb["BuT"],
      *[tb[k] for k in t3_keys], *p16_ops)
    du, wdet_p = res[0], res[1]
    if with_lo:
        return du, wdet_p[:, :Q], res[2]
    return du, wdet_p[:, :Q]


def fused_stage_mega_poly(t, dt, u, u_nbr_flat, x_min, x_max, poly, tables,
                          *, dim, mode, n_cg=None, block_e=None,
                          interpret=None, bounds_stencil=False):
    """du_limited[E, nd]: the complete -ho 3 -lo 5 -fct 2 stage (HO solve,
    MassBasedAvg LO, lumped mass, ClipScale) in ONE kernel. Only the
    limited du reaches HBM; the per-dof bounds (functions of u alone)
    enter as operands — per-dof [E, nd]; with bounds_stencil=True the
    element-class stencil [E, 3^dim] expanded in-kernel by the exact
    one-hot EXP dot; or with bounds_stencil="T" the TRANSPOSED
    class-major stencil [3^dim, E] (overlap_stencil_T — E on lanes, so
    the XLA stencil pass carries no lane-padded [E, c] intermediates)
    blocked as [3^dim, be] and expanded by the dim-0-contracting dot.
    (A fully in-kernel stencil from padded per-element min/max rows was
    built and REJECTED by Mosaic: dynamic lane-dim slices must be
    128-aligned, and neighbor offsets are +-1/N/N^2 — docs/PERF.md.)"""
    E, nd = u.shape
    dtype = u.dtype
    S = tables["seg"]
    s_T = bounds_stencil == "T"
    with_exp = bool(bounds_stencil)
    if s_T:
        assert x_min.shape == (3 ** dim, E)
    else:
        assert not with_exp or x_min.shape[1] == 3 ** dim
    import os
    if block_e is None and os.environ.get("REMHOS_BLOCK_E"):
        block_e = int(os.environ["REMHOS_BLOCK_E"])   # tuning knob
    if n_cg is None:
        # Jacobi contraction ~2.5e-3/sweep: the x0 = D^-1 b start is
        # already within ~2.5e-3, so ONE sweep reaches ~6e-6 relative —
        # at the bf16x3 amul noise floor (~1.5e-5); a second sweep buys
        # nothing measurable (f32-vs-f64 cross check unchanged at 2.7e-6)
        n_cg = 1 if dtype == jnp.float32 else 8
    if block_e is None:
        budget = 90_000 if dtype == jnp.float32 else 45_000
        block_e = max(64, min(128, budget // S))
    be = _pick_block(E, block_e)
    t_arr = jnp.stack([jnp.asarray(t, dtype), jnp.asarray(dt, dtype)]
                      ).reshape(1, 2)
    with_t3 = dtype == jnp.float32 and "UT3" in tables
    with_p16 = "P16" in poly
    kern = functools.partial(_stage_mega_kernel, dim=dim, mode=float(mode),
                             n_cg=n_cg, seg=S, nkv=dim, nkd=dim + 1,
                             nkn=dim, with_t3=with_t3, with_exp=with_exp,
                             with_p16=with_p16, stencil_T=s_T)
    tb = tables

    def blk(a):
        return pl.BlockSpec((be, a.shape[1]), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    # transposed stencil: block the LANE (element) axis — i*be starts
    # are 128-aligned, which Mosaic requires on the minor dim
    bspec = (pl.BlockSpec((3 ** dim, be), lambda i: (i * 0, i),
                          memory_space=pltpu.VMEM) if s_T else None)
    t3_keys = (("UT3", "Buw3", "BD3", "SB3", "BglT3", "Bgl3")
               if with_t3 else ())
    p16_ops = [poly["P16"]] if with_p16 else []
    exp_ops = [tb["EXP"]] if with_exp else []
    return pl.pallas_call(
        kern,
        grid=(E // be,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
            blk(u), blk(u_nbr_flat), blk(poly["P"]),
            bspec or blk(x_min), bspec or blk(x_max),
            _rep(tb["UT"].shape), _rep(tb["Buw"].shape),
            _rep(tb["BD"].shape), _rep(tb["SB"].shape),
            _rep(tb["A"].shape), _rep(tb["AT"].shape),
            _rep(tb["BglT"].shape), _rep(tb["Bgl"].shape),
            _rep(tb["Bgl2"].shape), _rep(tb["BuT"].shape),
            _rep(tb["BuP"].shape),
        ] + [_rep(tb[k].shape) for k in t3_keys]
          + [blk(a) for a in p16_ops]
          + [_rep(a.shape) for a in exp_ops],
        out_specs=pl.BlockSpec((be, nd), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, nd), dtype),
        interpret=_auto_interpret(interpret),
    )(t_arr, u, u_nbr_flat, poly["P"], x_min, x_max,
      tb["UT"], tb["Buw"], tb["BD"], tb["SB"],
      tb["A"], tb["AT"], tb["BglT"], tb["Bgl"], tb["Bgl2"], tb["BuT"],
      tb["BuP"], *[tb[k] for k in t3_keys], *p16_ops, *exp_ops)


def build_poly_tables(x0, v, disc, dtype=None, va_vn_bf16=False):
    """Device coefficient tables for the polynomial stage geometry.

    Returns dict(P=[E, nseg*S]) concatenating [VA | WDET | VN] with
    128-aligned zero-padded segments (segment (k, b) of VA holds the
    t^k coefficient of va_b at the volume rule; WDET has w_q and the
    quadrature-weight padding folded in; VN holds vn t^k coefficients at
    the face rule). Call under jit (eager TPU layouts are pathological).

    va_vn_bf16 (experiment, docs/PERF.md "P-stream precision"): the VA
    and VN planes — (2*dim)/(2*dim+3) of the poly stream in 3D — move to
    a separate bf16 operand, dict(P=[WDET f32], P16=[VA16|VN16] bf16).
    This halves the dominant byte stream at the cost of ~bf16-eps (4e-3)
    relative error on the advective RHS, and — because volume (va) and
    face (vn) geometry round INDEPENDENTLY — breaks the discrete
    volume/face telescoping that makes du_HO conservative, so the mass
    closure absorbs the resulting drift and its injection budget is the
    gate (bench.py verify)."""
    from .. import geometry as geo
    dim = disc.dim
    if dtype is None:
        dtype = jnp.asarray(x0).dtype
    x0 = jnp.asarray(x0, dtype)
    v = jnp.asarray(v, dtype)
    E = x0.shape[0]
    Gm = np.asarray(disc.Gm, np.float64)
    Q = Gm.shape[0]
    nm = Gm.shape[1]
    Bface = np.asarray(disc.Bface)
    nf = disc.n_ref.shape[0]
    Qf = Bface.shape[0]
    FQ = nf * Qf
    S = ((max(Q, FQ) + 127) // 128) * 128
    HI = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jnp.dot(a, b, precision=HI)

    x0_t = jnp.transpose(x0, (2, 0, 1))                    # [dim, E, nm]
    v_t = jnp.transpose(v, (2, 0, 1))
    Gmb = [jnp.asarray(Gm[:, :, b].T, dtype) for b in range(dim)]
    J0 = [[dot(x0_t[d], Gmb[b]) for b in range(dim)] for d in range(dim)]
    Jv = [[dot(v_t[d], Gmb[b]) for b in range(dim)] for d in range(dim)]
    BmT = jnp.asarray(np.asarray(disc.Bm).T, dtype)
    v_q = [dot(v_t[d], BmT) for d in range(dim)]           # [E, Q] each

    def minor_coeffs(a, b, c, d):
        """poly coeffs of A*B - C*D where A = a0 + t a1 etc."""
        (a0, a1), (b0, b1), (c0, c1), (d0, d1) = a, b, c, d
        return (a0 * b0 - c0 * d0,
                a0 * b1 + a1 * b0 - c0 * d1 - c1 * d0,
                a1 * b1 - c1 * d1)

    def Jp(d, b):
        return (J0[d][b], Jv[d][b])

    # cof(t)[d][b] coefficients, then va_kb = sum_d cof_k[d][b] v_q[d]
    nkv = 3 if dim == 3 else 2
    va = [[None] * dim for _ in range(nkv)]                # [k][b] -> [E,Q]
    det_c = None
    if dim == 3:
        for b in range(3):
            b1, b2 = (b + 1) % 3, (b + 2) % 3
            cof_b = [minor_coeffs(Jp((d + 1) % 3, b1), Jp((d + 2) % 3, b2),
                                  Jp((d + 1) % 3, b2), Jp((d + 2) % 3, b1))
                     for d in range(3)]
            for k in range(3):
                acc = cof_b[0][k] * v_q[0]
                for d in range(1, 3):
                    acc = acc + cof_b[d][k] * v_q[d]
                va[k][b] = acc
            # det = sum_b J(0,b)(t) * cof_b[0](t): affine * quadratic
            j0, j1 = Jp(0, b)
            c = cof_b[0]
            term = (j0 * c[0], j0 * c[1] + j1 * c[0],
                    j0 * c[2] + j1 * c[1], j1 * c[2])
            det_c = term if det_c is None else tuple(
                p + q for p, q in zip(det_c, term))
    else:
        # cof columns: b=0 -> [J11, -J01], b=1 -> [-J10, J00] (affine)
        cols = [[Jp(1, 1), tuple(-x for x in Jp(0, 1))],
                [tuple(-x for x in Jp(1, 0)), Jp(0, 0)]]
        for b in range(2):
            for k in range(2):
                va[k][b] = (cols[b][0][k] * v_q[0]
                            + cols[b][1][k] * v_q[1])
        det_c = minor_coeffs(Jp(0, 0), Jp(1, 1), Jp(0, 1), Jp(1, 0))

    # face normals from tangent tables: T affine in t
    ft = geo.face_tangent_tables(disc.Gmf, disc.n_ref)
    assert ft is not None
    Gt, sgn = ft
    Gt0 = Gt[..., 0] * sgn[:, None, None]
    GT1 = jnp.asarray(Gt0.transpose(2, 0, 1).reshape(nm, FQ), dtype)
    Bmf = np.asarray(disc.Bmf)
    BmfT = jnp.asarray(Bmf.transpose(2, 0, 1).reshape(nm, FQ), dtype)
    vfq = [dot(v_t[d], BmfT) for d in range(dim)]          # [E, FQ]
    T1 = [(dot(x0_t[d], GT1), dot(v_t[d], GT1)) for d in range(dim)]
    nkn = 3 if dim == 3 else 2
    if dim == 3:
        GT2 = jnp.asarray(Gt[..., 1].transpose(2, 0, 1).reshape(nm, FQ),
                          dtype)
        T2 = [(dot(x0_t[d], GT2), dot(v_t[d], GT2)) for d in range(dim)]
        vn = [None] * 3
        for d in range(3):
            d1, d2 = (d + 1) % 3, (d + 2) % 3
            nor_d = minor_coeffs(T1[d1], T2[d2], T1[d2], T2[d1])
            for k in range(3):
                t_ = vfq[d] * nor_d[k]
                vn[k] = t_ if vn[k] is None else vn[k] + t_
    else:
        # nor = (t_y, -t_x), t affine
        vn = [vfq[0] * T1[1][k] - vfq[1] * T1[0][k] for k in range(2)]

    w_q = jnp.asarray(np.asarray(disc.w_q), dtype)

    # ONE concatenated operand [VA | WDET | VN] so the kernel streams a
    # single fat block per grid step; coefficient counts are dim-derived
    # (nkv = nkn = dim, nkd = dim + 1) so the dict stays jit-transparent
    va_segs = [(va[k][b], Q) for k in range(nkv) for b in range(dim)]
    wd_segs = [(w_q[None, :] * c, Q) for c in det_c]
    vn_segs = [(a, FQ) for a in vn]

    def pack(segs, dt_):
        M = jnp.zeros((E, len(segs) * S), dt_)
        for i, (a, n) in enumerate(segs):
            M = M.at[:, i * S:i * S + n].set(a.astype(dt_))
        return M

    if va_vn_bf16:
        return dict(P=pack(wd_segs, dtype),
                    P16=pack(va_segs + vn_segs, jnp.bfloat16))
    return dict(P=pack(va_segs + wd_segs + vn_segs, dtype))


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


# ---------------------------------------------------------------------------
# fused neighbor-face gather (structured grid)
# ---------------------------------------------------------------------------
#
# The round-4 device trace showed the XLA neighbor gather (one-hot dot +
# six flat element-axis rolls + edge selects, structured.py) costing
# 83.5 us/stage — 20% of the stage and the largest glue bucket, all of it
# VMEM-resident op overhead rather than HBM traffic. This kernel does the
# whole gather in ONE pass: u is passed three times with block index maps
# (i-1, i, i+1 mod nblk), so every neighbor offset (|delta| <= H = the
# last-axis stride = the block size) is reachable inside the 3-block VMEM
# window; per face, the shifted rows are masked (physical edges -> 0,
# periodic inner axes -> wrapped offset) and contracted with the exact
# one-hot face-extraction table. Bit-identical to
# structured.gather_nbr_structured (tested), zero HBM side buffers.
#
# MEASURED NEGATIVE RESULT (round 4, v5e): wired into the production
# stage this kernel costs ~90 us/stage vs the ~23 us of XLA glue it
# actually replaces (FOM 1847 -> 1536 at N=24 p=3). The trace's 83.5 us
# "structured.py" bucket was dominated by the BOUNDS-stencil rolls
# (60.9 us), not the u_nbr gather; and a separate pallas_call cannot
# amortize its fixed cost (grid setup + 3x window DMA of u) against a
# mere [E, nf*fd] one-hot contraction the way XLA's fused roll+select
# graph does. Kept (with tests/test_gather_kernel.py pinning it
# bit-identical) as the documented dead end; the production path keeps
# the XLA gather. Fusing the gather INTO the mega kernel's existing
# 3-block window remains the open follow-up.


def _gather_nbr_kernel(L_ref, C_ref, R_ref, M_ref, G_ref, out_ref, *,
                       be, fd, faces_meta, nblk, mask_last):
    i = pl.program_id(0)
    dtype = C_ref.dtype
    L, C, R = L_ref[:], C_ref[:], R_ref[:]
    if mask_last:
        # non-periodic last axis: the (i-1)%nblk / (i+1)%nblk wrap blocks
        # carry garbage at the grid ends; those rows are physical-edge
        # reads that must be zero
        L = L * (i > 0).astype(dtype)
        R = R * (i < nblk - 1).astype(dtype)

    def shifted(d):
        if d == 0:
            return C
        # |d| == be (last-axis faces): the shifted window IS the whole
        # neighbor block — concatenate with a zero-size slice fails
        # Mosaic lowering ("vector types must have positive sizes")
        if d == be:
            return R
        if d == -be:
            return L
        if d > 0:
            return jnp.concatenate([C[d:], R[:d]], axis=0)
        return jnp.concatenate([L[be + d:], C[:be + d]], axis=0)

    HI = jax.lax.Precision.HIGHEST
    outs = []
    for f, (delta, wrap, mode) in enumerate(faces_meta):
        v = shifted(delta)
        if mode == 2:        # periodic inner axis: edge rows read the wrap
            m = M_ref[:, f:f + 1]
            v = jnp.where(m > 0.5, shifted(wrap), v)
        elif mode == 1:      # non-periodic inner axis: edge rows are 0
            v = v * (1.0 - M_ref[:, f:f + 1])
        # one-hot extraction: HIGHEST so values pass through unrounded
        outs.append(jnp.dot(v, G_ref[:, f * fd:(f + 1) * fd],
                            preferred_element_type=dtype, precision=HI))
    out_ref[:] = jnp.concatenate(outs, axis=1)


_GATHER_META_CACHE = {}


def gather_nbr_flat_meta(shape, periodic, nbr_np, nd):
    """Static tables for gather_nbr_flat; None if the layout is
    unsupported (caller falls back to the XLA gather)."""
    key = (tuple(shape), tuple(periodic), nbr_np.tobytes(), nd)
    if key in _GATHER_META_CACHE:
        return _GATHER_META_CACHE[key]
    from ..mesh import faces_for_dim
    from ..structured import _face_gather_matrix
    dim = len(shape)
    E = int(np.prod(shape))

    def edge_mask_np(axis, side):
        """Pure-numpy [E] bool: element on the (axis, side) physical edge
        (structured._edge_mask returns jnp, which cannot be built while
        tracing — e.g. Advection.__init__ under shard_map)."""
        grid_shape = tuple(reversed(shape))
        m = np.zeros(grid_shape, dtype=bool)
        idx = [slice(None)] * dim
        idx[dim - 1 - axis] = -1 if side == 1 else 0
        m[tuple(idx)] = True
        return m.reshape(E)
    strides = [1]
    for a in range(1, dim):
        strides.append(strides[-1] * shape[a - 1])
    be = strides[-1]                      # last-axis stride = block size
    meta = None
    if dim >= 2 and E % be == 0 and be % 8 == 0 and E // be >= 1:
        faces = faces_for_dim(dim)
        nf, fd = nbr_np.shape
        G = _face_gather_matrix(nbr_np, nd)           # [nd, nf*fd]
        masks = np.zeros((E, nf))
        faces_meta = []
        for f, (axis, side) in enumerate(faces):
            dirn = 1 if side == 1 else -1
            delta = dirn * strides[axis]
            wrap = 0
            mode = 0
            if axis < dim - 1:            # inner axes need masking
                edge = edge_mask_np(axis, side)
                if periodic[axis]:
                    mode = 2
                    wrap = -dirn * (shape[axis] - 1) * strides[axis]
                else:
                    mode = 1
                masks[:, f] = edge.astype(float)
            faces_meta.append((int(delta), int(wrap), mode))
        meta = dict(be=be, nblk=E // be, fd=fd, nf=nf, G=G, masks=masks,
                    faces_meta=tuple(faces_meta),
                    mask_last=not periodic[dim - 1])
    _GATHER_META_CACHE[key] = meta
    return meta


def gather_nbr_flat(u, meta, interpret=None):
    """u_nbr[E, nf*fd] (face-major flat) in one Pallas kernel; equals
    gather_nbr_structured(u, ...).reshape(E, -1) with zero boundary
    fill. See module comment above for the windowing scheme."""
    E, nd = u.shape
    dtype = u.dtype
    be, nblk, fd = meta["be"], meta["nblk"], meta["fd"]
    G = jnp.asarray(meta["G"], dtype)
    M = jnp.asarray(meta["masks"], dtype)
    kern = functools.partial(_gather_nbr_kernel, be=be, fd=fd,
                             faces_meta=meta["faces_meta"], nblk=nblk,
                             mask_last=meta["mask_last"])
    ublk = lambda im: pl.BlockSpec((be, nd), im, memory_space=pltpu.VMEM)
    # index maps use lax.rem on explicit i32: jnp's % (dtype promotion)
    # and jnp.where (scalar select) both hit infinite _convert_helper
    # recursion in Mosaic's transform-func lowering under jax_enable_x64.
    # np.int32 (not jnp): a jnp scalar built outside the index map is a
    # captured tracer, which BlockSpec index maps reject
    def _wrap(expr):
        return jax.lax.rem(expr.astype(jnp.int32) + np.int32(nblk),
                           np.int32(nblk))

    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            ublk(lambda i: (_wrap(i - 1), i * 0)),
            ublk(lambda i: (i, i * 0)),
            ublk(lambda i: (_wrap(i + 1), i * 0)),
            pl.BlockSpec((be, meta["nf"]), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            _rep(G.shape),
        ],
        out_specs=pl.BlockSpec((be, meta["nf"] * fd), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, meta["nf"] * fd), dtype),
        interpret=_auto_interpret(interpret),
    )(u, u, u, M, G)
