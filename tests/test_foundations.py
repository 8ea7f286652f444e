"""Foundations: basis tables, mesh topology, geometry, FA assembly."""

import numpy as np
import jax.numpy as jnp
import pytest

from remhos_tpu import basis as B
from remhos_tpu import assembly as asm
from remhos_tpu import geometry as geo
from remhos_tpu.mesh import load_mesh, make_cartesian_mesh
from remhos_tpu.discretization import build_discretization


def test_bernstein_partition_of_unity():
    x = np.linspace(0, 1, 13)
    for p in (1, 2, 3, 4):
        v = B.bernstein_vals(p, x)
        assert np.allclose(v.sum(1), 1.0, atol=1e-14)
        g = B.bernstein_grads(p, x)
        assert np.allclose(g.sum(1), 0.0, atol=1e-12)
        # endpoint interpolation
        assert np.allclose(B.bernstein_vals(p, np.array([0.0]))[0],
                           np.eye(p + 1)[0])
        assert np.allclose(B.bernstein_vals(p, np.array([1.0]))[0],
                           np.eye(p + 1)[p])


def test_gll_points():
    assert np.allclose(B.gauss_lobatto(2), [0, 1])
    assert np.allclose(B.gauss_lobatto(3), [0, 0.5, 1])
    # GLL4 interior points at (1 ± 1/sqrt(5))/2
    g4 = B.gauss_lobatto(4)
    assert np.allclose(g4, [0, (1 - 1/np.sqrt(5))/2, (1 + 1/np.sqrt(5))/2, 1])


def test_quadrature_exactness():
    for n in (2, 4, 6):
        x, w = B.gauss_legendre(n)
        for k in range(2 * n):
            assert np.isclose((w * x ** k).sum(), 1.0 / (k + 1), atol=1e-14)


def test_mesh_neighbors_periodic():
    m = make_cartesian_mesh(2, (3, 3), (0, 0), (1, 1), (True, True))
    # element 0 (corner), faces: 0=bottom(y-),1=right(x+),2=top(y+),3=left(x-)
    assert m.nbr_elem[0].tolist() == [6, 1, 3, 2]
    m2 = make_cartesian_mesh(2, (3, 3), (0, 0), (1, 1), (False, False))
    assert m2.nbr_elem[0].tolist() == [-1, 1, 3, -1]
    assert m2.nbr_elem[4].tolist() == [1, 5, 7, 3]


def test_mesh_refine():
    m = load_mesh("inline-quad", rs_levels=2)
    assert m.shape == (16, 16)
    assert m.num_elements == 256
    assert m.x.shape == (256, 9, 2)  # mesh_order 2 -> 9 nodes/elem


def test_geometry_affine():
    m = load_mesh("inline-quad", rs_levels=1)  # 8x8, h = 1/8
    disc = build_discretization(m, p=2)
    g = geo.volume_geometry(jnp.asarray(m.x), disc.Bm, disc.Gm)
    h = 1.0 / 8.0
    assert np.allclose(g["detJ"], h * h, atol=1e-13)
    assert np.allclose(np.asarray(g["adjJ"][..., 0, 1]), 0.0, atol=1e-13)
    # total volume
    vol = (disc.w_q[None, :] * np.asarray(g["detJ"])).sum()
    assert np.isclose(vol, 1.0, atol=1e-12)
    # face normals: scaled outward normal has |n| = h on each face
    x_fq, nor = geo.face_geometry(jnp.asarray(m.x), disc.Bmf, disc.Gmf,
                                  disc.n_ref)
    assert np.allclose(np.linalg.norm(np.asarray(nor), axis=-1), h, atol=1e-13)
    # face 3 is x- : normal = (-h, 0)
    assert np.allclose(np.asarray(nor)[:, 3, :, 0], -h, atol=1e-13)


def test_mass_matrix_exact():
    # 1 element, p=1, unit square: M = h^2/36 * [[4,2,2,1],...] (bilinear)
    m = make_cartesian_mesh(2, (1, 1), (0, 0), (1, 1), (False, False))
    disc = build_discretization(m, p=1)
    g = geo.volume_geometry(jnp.asarray(m.x), disc.Bm, disc.Gm)
    M = np.asarray(asm.element_mass(g["detJ"], disc.Bu, disc.w_q))[0]
    M_exact = np.array([[4, 2, 2, 1], [2, 4, 1, 2], [2, 1, 4, 2],
                        [1, 2, 2, 4]]) / 36.0
    assert np.allclose(M, M_exact, atol=1e-14)
    # lumped mass sums to the volume
    assert np.isclose(np.asarray(asm.lumped_mass(M[None]))[0].sum(), 1.0,
                      atol=1e-14)


def test_convection_column_identity():
    """sum_i K[i,j] = sign * int v.grad(phi_j): check against quadrature."""
    m = load_mesh("periodic-square", rs_levels=1)
    disc = build_discretization(m, p=3)
    g = geo.volume_geometry(jnp.asarray(m.x), disc.Bm, disc.Gm)
    # divergence-free rotation v = (y, -x)
    v_q = jnp.stack([g["x_q"][..., 1], -g["x_q"][..., 0]], axis=-1)
    K = asm.element_convection(v_q, g["adjJ"], disc.Bu, disc.Gu, disc.w_q,
                               sign=-1.0)
    # row sums: sum_j K[i,j] = -int v.grad(sum_j phi_j) phi_i = 0 exactly
    assert np.allclose(np.asarray(K).sum(axis=2), 0.0, atol=1e-13)


def test_face_coupling_consistency():
    """Face matrices of both sides of an interior face must transpose-match:
    bdrInt[e,f,i,j] (transport) uses vn- from e's side; the neighbor sees
    vn- of the flipped normal; upwind: exactly one side is nonzero for
    uniform v."""
    m = load_mesh("periodic-square", rs_levels=0)
    disc = build_discretization(m, p=2)
    x = jnp.asarray(m.x)
    x_fq, nor = geo.face_geometry(x, disc.Bmf, disc.Gmf, disc.n_ref)
    v = jnp.broadcast_to(jnp.array([1.0, 0.0]), x_fq.shape)
    bdrInt = asm.face_upwind_matrices(v, nor, disc.w_fq, disc.Bface, 0)
    b = np.asarray(bdrInt)
    # v=(1,0): inflow on face 3 (x-), outflow on face 1 (x+)
    assert (b[:, 3] > 0).any() and np.allclose(b[:, 1], 0.0)
    assert np.allclose(b[:, 0], 0.0) and np.allclose(b[:, 2], 0.0)


def test_dg_transport_conservation():
    """Total Ku (element + faces) vanishes on a periodic mesh for
    divergence-free polynomial velocity: discrete conservation."""
    m = load_mesh("periodic-square", rs_levels=2)
    disc = build_discretization(m, p=3)
    dm = disc.dofmaps
    x = jnp.asarray(m.x)
    g = geo.volume_geometry(x, disc.Bm, disc.Gm)
    x_fq, nor = geo.face_geometry(x, disc.Bmf, disc.Gmf, disc.n_ref)
    v_q = jnp.stack([g["x_q"][..., 1], -g["x_q"][..., 0]], -1)
    v_fq = jnp.stack([x_fq[..., 1], -x_fq[..., 0]], -1)
    K = asm.element_convection(v_q, g["adjJ"], disc.Bu, disc.Gu, disc.w_q, -1.0)
    bdrInt = asm.face_upwind_matrices(v_fq, nor, disc.w_fq, disc.Bface, 0)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((m.num_elements, dm.nd)))
    u_nbr = asm.gather_nbr_face(u, jnp.asarray(dm.nbr_elem),
                                jnp.asarray(dm.nbr_dof_local))
    Ku = asm.apply_K_HO(u, K, bdrInt, u_nbr, jnp.asarray(dm.bdr_dofs))
    total = float(np.asarray(Ku).sum())
    scale = float(np.abs(np.asarray(Ku)).sum())
    assert abs(total) < 1e-12 * max(scale, 1.0)


def test_pallas_kernels_interpret():
    """Fused Pallas kernels == the XLA PA path (interpret mode on CPU)."""
    import jax
    from remhos_tpu.operator import Advection, SolverConfig
    from remhos_tpu import pa as pam
    from remhos_tpu.ops import pallas_kernels as pk

    m = make_cartesian_mesh(3, (4, 4, 4), (0, 0, 0), (1, 1, 1),
                            (False, False, False))
    disc = build_discretization(m, p=3)
    scfg = SolverConfig(problem=10, ho=3, lo=5, fct=2, pa=True)
    x0 = jnp.asarray(m.x)
    v = 0.1 * jnp.sin(x0)
    adv = Advection(disc, scfg, x0, v, None)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((64, 64)))
    t = 0.37
    geom = adv.geometry(t)
    Ku_ref = np.asarray(pam.conv_action(u, geom["va"], adv.Gu, adv.Bu_w))
    Ku, wdet = pk.fused_geom_conv(x0 + t * v, v, u, disc, 1.0, block_e=64,
                                  interpret=True)
    assert np.abs(np.asarray(Ku) - Ku_ref).max() < 1e-14
    assert np.abs(np.asarray(wdet) - np.asarray(geom["wdet"])).max() < 1e-14
    wd2 = pk.fused_wdet(x0 + t * v, disc, block_e=64, interpret=True)
    assert np.abs(np.asarray(wd2) - np.asarray(geom["wdet"])).max() < 1e-14
    du = pk.fused_gl_cg(Ku, wdet, disc, interpret=True, block_e=64)
    resid = pam.mass_action(du, geom["wdet"], adv.Bu) - Ku
    assert float(jnp.abs(resid).max()) < 1e-7


def test_fused_stage_ho_interpret():
    """fused_stage_ho (geometry+conv+face+CG in one kernel) == the XLA PA
    composition, and the operator-level fused path == the unfused path."""
    from remhos_tpu.operator import Advection, SolverConfig
    from remhos_tpu.ops import pallas_kernels as pk

    for dims, shape in ((3, (4, 4, 4)), (2, (6, 6))):
        m = make_cartesian_mesh(dims, shape, (0,) * dims, (1,) * dims,
                                (False,) * dims)
        disc = build_discretization(m, p=3)
        scfg = SolverConfig(problem=10, ho=3, lo=5, fct=2, pa=True)
        x0 = jnp.asarray(m.x)
        v = 0.1 * jnp.sin(x0)
        adv = Advection(disc, scfg, x0, v, None)      # XLA reference path
        rng = np.random.default_rng(1)
        E = m.num_elements
        u = jnp.asarray(rng.standard_normal((E, disc.nd)))
        t = 0.37
        geom = adv.geometry(t)
        du_ref = np.asarray(adv._ho_solution(geom, u))

        tables = pk.stage_ho_tables(disc, None)
        u_nbr = adv.gather_nbr(u).reshape(E, -1)
        du, wdet = pk.fused_stage_ho(x0 + t * v, v, u, u_nbr, tables,
                                     mode=1.0, block_e=64, interpret=True)
        assert np.abs(np.asarray(wdet) - np.asarray(geom["wdet"])).max() \
            < 1e-13
        scale = np.abs(du_ref).max()
        assert np.abs(np.asarray(du) - du_ref).max() < 1e-9 * scale

        # polynomial stage geometry (the production path): same answers
        poly = pk.build_poly_tables(x0, v, disc)
        du_p, wdet_p = pk.fused_stage_ho_poly(
            jnp.asarray(t), u, u_nbr, poly, tables, dim=dims, mode=1.0,
            block_e=64, interpret=True)
        assert np.abs(np.asarray(wdet_p) - np.asarray(geom["wdet"])).max() \
            < 1e-12
        assert np.abs(np.asarray(du_p) - du_ref).max() < 1e-9 * scale

    # operator-level: use_pallas Advection runs the fused stage (interpret
    # mode on CPU) and its stage function matches the unfused one
    m = make_cartesian_mesh(3, (4, 4, 4), (0, 0, 0), (1, 1, 1),
                            (False, False, False))
    disc = build_discretization(m, p=3)
    x0 = jnp.asarray(m.x)
    v = 0.1 * jnp.sin(x0)
    pcfg = SolverConfig(problem=10, ho=3, lo=5, fct=2, pa=True,
                        use_pallas=True)
    advp = Advection(disc, pcfg, x0, v, None)
    assert advp._fused_stage
    # the single-field standard-RK stage routes through the mega kernel
    # (HO+LO+lumped mass+ClipScale in one pallas_call)
    assert advp._mega_stage_eligible()
    rng = np.random.default_rng(2)
    u0 = jnp.asarray(rng.random((m.num_elements, disc.nd)))
    S = jnp.stack([u0])
    scfg = SolverConfig(problem=10, ho=3, lo=5, fct=2, pa=True)
    adv = Advection(disc, scfg, x0, v, None)
    dS_ref, _ = adv.stage_function()(0.3, 0.01, S)
    dS_fused, _ = advp.stage_function()(0.3, 0.01, S)
    scale = np.abs(np.asarray(dS_ref)).max()
    assert np.abs(np.asarray(dS_fused) - np.asarray(dS_ref)).max() \
        < 1e-9 * scale
    # and the non-mega fused composition (the IDP-path building blocks)
    # agrees too: force it by disabling the mega route
    dS_parts = advp.mult_unlimited(0.3, 0.01, S)
    dS_parts, _ = advp.limit_mult(0.3, 0.01, S, dS_parts)
    assert np.abs(np.asarray(dS_parts) - np.asarray(dS_ref)).max() \
        < 1e-9 * scale


def test_mega_stage_inline_stencil_bit_identical():
    """The class-major transposed stencil path (bounds_stencil="T":
    overlap_stencil_T rows + the dim-0-contracting EXP dot) must
    reproduce the [E, 3^dim]-stencil mega stage BIT-identically: the
    same neighbor min/max sets, and the EXP expansion contracts one
    exact one-hot product per output either way."""
    import os
    from remhos_tpu.operator import Advection, SolverConfig

    for dims, shape in ((3, (4, 3, 2)), (2, (6, 4))):
        m = make_cartesian_mesh(dims, shape, (0,) * dims, (1,) * dims,
                                (False,) * dims)
        disc = build_discretization(m, p=3)
        x0 = jnp.asarray(m.x)
        v = 0.1 * jnp.sin(x0)
        pcfg = SolverConfig(problem=10, ho=3, lo=5, fct=2, pa=True,
                            use_pallas=True)
        advp = Advection(disc, pcfg, x0, v, None)
        rng = np.random.default_rng(7)
        S = jnp.stack([jnp.asarray(rng.random((m.num_elements, disc.nd)))])
        prev = os.environ.get("REMHOS_STENCIL")
        try:
            os.environ["REMHOS_STENCIL"] = "T"
            dS_inline, _ = advp.stage_function()(0.3, 0.01, S)
            os.environ["REMHOS_STENCIL"] = "cols"
            dS_cols, _ = advp.stage_function()(0.3, 0.01, S)
            os.environ["REMHOS_STENCIL"] = "flat"
            dS_flat, _ = advp.stage_function()(0.3, 0.01, S)
        finally:
            if prev is None:
                os.environ.pop("REMHOS_STENCIL", None)
            else:
                os.environ["REMHOS_STENCIL"] = prev
        assert np.array_equal(np.asarray(dS_inline), np.asarray(dS_cols))
        assert np.array_equal(np.asarray(dS_inline), np.asarray(dS_flat))

    # periodic mesh: T handles wrap rolls natively; stage runs and is
    # finite
    mp = make_cartesian_mesh(2, (4, 4), (0, 0), (1, 1), (True, True))
    discp = build_discretization(mp, p=2)
    x0p = jnp.asarray(mp.x)
    advpp = Advection(discp, SolverConfig(problem=10, ho=3, lo=5, fct=2,
                                          pa=True, use_pallas=True),
                      x0p, 0.05 * jnp.cos(x0p), None)
    Sp = jnp.stack([jnp.asarray(
        np.random.default_rng(8).random((mp.num_elements, discp.nd)))])
    dSp, _ = advpp.stage_function()(0.2, 0.01, Sp)
    assert np.isfinite(np.asarray(dSp)).all()


def test_poly_bf16_split_stream():
    """P-stream precision experiment (build_poly_tables va_vn_bf16): the
    split bf16 va/vn operand reproduces the f32 path to bf16 scale on du
    while wdet — which stays f32 because it feeds the lumped mass — is
    bit-identical. docs/PERF.md 'P-stream precision'."""
    from remhos_tpu.ops import pallas_kernels as pk

    for dims, shape in ((3, (4, 4, 4)), (2, (6, 6))):
        m = make_cartesian_mesh(dims, shape, (0,) * dims, (1,) * dims,
                                (False,) * dims)
        disc = build_discretization(m, p=3)
        x0 = jnp.asarray(m.x, jnp.float32)
        v = (0.1 * jnp.sin(x0)).astype(jnp.float32)
        rng = np.random.default_rng(5)
        E = m.num_elements
        u = jnp.asarray(rng.standard_normal((E, disc.nd)), jnp.float32)
        tables = pk.stage_ho_tables(disc, jnp.float32)
        from remhos_tpu.operator import Advection, SolverConfig
        adv = Advection(disc, SolverConfig(problem=10, ho=3, lo=5, fct=2,
                                           pa=True), x0, v, None,
                        dtype=jnp.float32)
        u_nbr = adv.gather_nbr(u).reshape(E, -1)
        t = jnp.float32(0.37)
        p32 = pk.build_poly_tables(x0, v, disc)
        p16 = pk.build_poly_tables(x0, v, disc, va_vn_bf16=True)
        assert p16["P16"].dtype == jnp.bfloat16
        du32, wd32 = pk.fused_stage_ho_poly(t, u, u_nbr, p32, tables,
                                            dim=dims, mode=1.0, block_e=64,
                                            interpret=True)
        du16, wd16 = pk.fused_stage_ho_poly(t, u, u_nbr, p16, tables,
                                            dim=dims, mode=1.0, block_e=64,
                                            interpret=True)
        assert np.array_equal(np.asarray(wd32), np.asarray(wd16))
        scale = np.abs(np.asarray(du32)).max()
        err = np.abs(np.asarray(du16) - np.asarray(du32)).max()
        # bf16 rounding of va/vn: ~4e-3 relative on the advective RHS
        assert 1e-7 * scale < err < 3e-2 * scale, err


def test_rk6_tableau_is_mfem_verner():
    """The -s 6 tableau must be MFEM's RK6Solver (Verner 8-stage, order 6):
    validate row sums, quadrature conditions through order 6, deeper order
    trees, and empirical 6th-order convergence on a nonlinear ODE."""
    import numpy as np

    from remhos_tpu.steppers import RK6_BUTCHER

    tab = RK6_BUTCHER
    s = len(tab["b"])
    assert s == 8
    A = np.zeros((s, s))
    for i, row in enumerate(tab["a"]):
        A[i, : len(row)] = row
    b = np.asarray(tab["b"])
    c = np.asarray(tab["c"])
    assert np.abs(A.sum(1) - c).max() < 1e-13
    for p in range(6):
        assert abs((b * c ** p).sum() - 1.0 / (p + 1)) < 1e-12
    Ac = A @ c
    assert abs(b @ Ac - 1 / 6) < 1e-11
    assert abs(b @ (c * Ac) - 1 / 8) < 1e-11
    assert abs(b @ (A @ c ** 2) - 1 / 12) < 1e-11
    assert abs(b @ (A @ Ac) - 1 / 24) < 1e-11

    # empirical order on a pendulum: halving h must cut the error ~2^6
    def rk_step(f, t, y, h):
        K = []
        for i in range(s):
            yi = y + h * sum(A[i, j] * K[j] for j in range(i))
            K.append(f(t + c[i] * h, yi))
        return y + h * sum(b[i] * K[i] for i in range(s))

    def f(t, y):
        return np.array([y[1], -np.sin(y[0])])

    def integrate(h, T=4.0):
        y = np.array([1.5, 0.0])
        t = 0.0
        for _ in range(int(round(T / h))):
            y = rk_step(f, t, y, h)
            t += h
        return y

    ref = integrate(1 / 256)
    e1 = np.abs(integrate(1 / 2) - ref).max()
    e2 = np.abs(integrate(1 / 4) - ref).max()
    assert e1 / e2 > 50.0   # 2^6 = 64 up to higher-order terms


def test_bounds_stencil_expansion_exact():
    """The element-class bounds stencil (overlap_bounds_structured with 3
    classes/axis) expanded through the one-hot EXP table equals the
    per-dof overlap bounds EXACTLY — the identity the mega stage kernel
    relies on to stream [E, 3^dim] instead of [E, nd] bounds."""
    from remhos_tpu import structured as strm
    from remhos_tpu.ops import pallas_kernels as pk

    cases = [(3, (4, 3, 2), 3, (False,) * 3),
             (3, (4, 4, 4), 2, (True,) * 3),
             (2, (5, 4), 3, (False, True)),
             (3, (3, 3, 3), 1, (False,) * 3)]
    rng = np.random.default_rng(7)
    for dim, shape, p, per in cases:
        m = make_cartesian_mesh(dim, shape, (0,) * dim, (1,) * dim, per)
        disc = build_discretization(m, p)
        E = int(np.prod(shape))
        el_min = jnp.asarray(rng.standard_normal(E))
        el_max = el_min + jnp.asarray(rng.random(E))
        ref = strm.overlap_bounds_structured(el_min, el_max, shape, per, p)
        st = strm.overlap_bounds_structured(el_min, el_max, shape, per, 2)
        EXP = np.asarray(pk.stage_ho_tables(disc, None)["EXP"])
        for got, want in zip(st, ref):
            assert np.array_equal(np.asarray(got) @ EXP, np.asarray(want))


def test_overlap_stencil_flat_matches_grid():
    """overlap_stencil_flat (element-axis rolls, no grid reshape) must be
    bit-identical to the grid-roll element-class stencil
    overlap_bounds_structured(..., p=2) — the identity that lets the hot
    path drop the reshape/transpose glue (docs/PERF.md round-4 notes)."""
    from remhos_tpu import structured as strm

    cases = [(3, (4, 3, 2), (False,) * 3),
             (3, (4, 4, 4), (True,) * 3),
             (3, (5, 3, 4), (True, False, True)),
             (2, (5, 4), (False, True)),
             (2, (6, 6), (True, True)),
             (1, (7,), (False,)),
             (1, (6,), (True,))]
    rng = np.random.default_rng(11)
    for dim, shape, per in cases:
        E = int(np.prod(shape))
        el_min = jnp.asarray(rng.standard_normal(E))
        el_max = el_min + jnp.asarray(rng.random(E))
        ref = strm.overlap_bounds_structured(el_min, el_max, shape, per, 2)
        got = strm.overlap_stencil_flat(el_min, el_max, shape, per)
        for g, w in zip(got, ref):
            assert np.array_equal(np.asarray(g), np.asarray(w)), (dim, shape,
                                                                  per)
        # layout variants (lane-packing experiments, docs/PERF.md): same
        # values, different array layouts
        cols = strm.overlap_stencil_cols(el_min, el_max, shape, per)
        for g, w in zip(cols, ref):
            assert np.array_equal(np.asarray(g), np.asarray(w)), (
                "cols", dim, shape, per)
        tr = strm.overlap_stencil_T(el_min, el_max, shape, per)
        for g, w in zip(tr, ref):
            assert np.array_equal(np.asarray(g).T, np.asarray(w)), (
                "T", dim, shape, per)


def test_compensated_rk_matches_plain():
    """compensated=True must reproduce the plain combine to round-off on
    every RK kind and remove f32 accumulation bias on a long run."""
    import jax
    from remhos_tpu import steppers

    def f(t, dt, u):
        # stiff-ish linear decay + rotation-like coupling
        du = -0.37 * u + 0.11 * jnp.roll(u, 1)
        return du, jnp.asarray(jnp.inf, u.dtype)

    u0 = jnp.asarray(np.linspace(0.3, 1.7, 64))
    for kind in (1, 2, 3, 4, 6):
        plain = steppers.make_rk_step(f, kind)
        comp = steppers.make_rk_step(f, kind, compensated=True)
        u1, _ = plain(u0, 0.0, 0.01)
        u2, c2, _ = comp(u0, jnp.zeros_like(u0), 0.0, 0.01)
        # increment-form combine == nested combine to round-off (f64)
        assert float(jnp.abs(u1 - u2).max()) < 1e-14, kind

    # f32 long-run accumulation: compensated tracks the f64 trajectory's
    # SUM far better than the plain combine (the Kahan carry removes the
    # per-step rounding bias of u += delta)
    def run(kind, compensated, dtype, n=4000):
        u = u0.astype(dtype)
        c = jnp.zeros_like(u)
        step = steppers.make_rk_step(f, kind, compensated=compensated)
        dt = jnp.asarray(2e-4, dtype)

        def body(carry, _):
            if compensated:
                u, c = carry
                u, c, _ = step(u, c, 0.0, dt)
                return (u, c), ()
            u, = carry
            u, _ = step(u, 0.0, dt)
            return (u,), ()
        carry = (u, c) if compensated else (u,)
        out, _ = jax.lax.scan(body, carry, None, length=n)
        return np.asarray(out[0], np.float64)

    ref = run(3, False, jnp.float64)
    err_plain = abs(run(3, False, jnp.float32).sum() - ref.sum())
    err_comp = abs(run(3, True, jnp.float32).sum() - ref.sum())
    assert err_comp <= err_plain
    assert err_comp < 1e-4 * abs(ref.sum())
