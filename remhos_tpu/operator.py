"""The advection operator: per-stage geometry + HO/LO/FCT/mono dispatch.

TPU-native equivalent of the reference's AdvectionOperator
(remhos.cpp:115-198, 1596-1916): a factory producing pure, jit-safe
``mult_unlimited`` / ``limit_mult`` stage functions over the block state
``S[nfields, E, nd]`` (field 0 = u, field 1 = us for product remap).

Remap mode re-derives all geometric factors, mass/convection matrices and
face matrices from ``x = x0 + t*v`` inside the stage (the reference's
per-stage reassembly, remhos.cpp:1598-1676) — on TPU this is a handful of
batched einsums instead of a matrix reassembly pass.

The ``gather_nbr`` seam abstracts face-neighbor access: the single-chip
implementation gathers directly; the sharded implementation exchanges
halos via collective permutes (parallel/halo.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import assembly as asm
from . import bounds as bnd
from . import fct as fctm
from . import geometry as geo
from . import ho as hom
from . import lo as lom
from . import pa as pam
from . import problems as prob
from . import structured as strm
from . import sync as syncm
from .discretization import Discretization


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Solver selection, mirroring the reference CLI (remhos.cpp:249-334)."""

    problem: int = 4
    ho: int = 3          # 0 none, 1 Neumann, 2 CG, 3 LocalInverse
    lo: int = 0          # 0 none, 1 DU, 2 DU-prec, 3 RD, 4 RD-subcell, 5 MassBased
    fct: int = 0         # 0 none, 1 FluxBased, 2 ClipScale, 3 NonlinPenalty, 4 ElemProj
    mono: int = 0        # 0 none, 1 RDMono, 2 RDMonoSubcell
    ode_solver: int = 3
    bounds_type: int = 0
    dt_control: int = 0  # 0 fixed, 1 LO bounds violation
    product_sync: bool = False
    smth_ind: int = 0
    pa: bool = False     # matrix-free (partial assembly) hot path
    use_pallas: bool = False  # fused Pallas kernels (remap PA path, TPU)
    poly_bf16: bool = False   # bf16 va/vn poly-geometry streams (experiment,
    #                           docs/PERF.md "P-stream precision"; f32 only)
    verify_bounds: bool = False  # -vb dof-level stage checks (remhos.cpp:324)
    use_masks: bool = False   # IDP stage masks (remhos_solvers.hpp:100)

    @property
    def exec_mode(self) -> int:
        return prob.exec_mode_of(self.problem)


class Advection:
    """Bundles static tables + stage functions. Not a pytree; its arrays are
    passed explicitly through `params` to keep jit caches clean."""

    def __init__(self, disc: Discretization, cfg: SolverConfig,
                 x0_nodes, v_nodes=None, inflow=None, dtype=None):
        """dtype: explicit working precision for all tables/fields (e.g.
        jnp.float32 for the TPU production f32 mode; the mass solve runs
        its ill-conditioned basis-change dots at Precision.HIGHEST,
        pa.mass_solve_gl). None = ambient default."""
        self.disc = disc
        self.cfg = cfg
        self.dtype = dtype
        dm = disc.dofmaps

        def J(a):
            return jnp.asarray(a) if dtype is None else jnp.asarray(a, dtype)

        self.bdr_dofs = jnp.asarray(dm.bdr_dofs)
        self.nbr_elem = jnp.asarray(dm.nbr_elem)
        self.nbr_dof_local = jnp.asarray(dm.nbr_dof_local)
        self.x0_nodes = J(x0_nodes)
        self.v_nodes = None if v_nodes is None else J(v_nodes)
        self.inflow = None if inflow is None else J(inflow)
        # inflow values at each element's face dofs (used as the neighbor
        # value at physical boundaries in flux lumping,
        # remhos_tools.cpp:891)
        self.inflow_face = (None if inflow is None
                            else self.inflow[:, self.bdr_dofs])
        # static tables as jnp
        self.Bu = J(disc.Bu)
        self.Gu = J(disc.Gu)
        self.Bm = J(disc.Bm)
        self.Gm = J(disc.Gm)
        self.w_q = J(disc.w_q)
        self.w_fq = J(disc.w_fq)
        self.Bface = J(disc.Bface)
        self.Bmf = J(disc.Bmf)
        self.Gmf = J(disc.Gmf)
        self.n_ref = J(disc.n_ref)
        self.Bgl = J(disc.Bgl)
        self.A_gl2b = J(disc.A_gl2b)
        # tangent-only face-normal tables (None -> adjugate fallback)
        _ft = geo.face_tangent_tables(disc.Gmf, disc.n_ref)
        self._face_tan = (None if _ft is None else
                          (J(_ft[0]), J(_ft[1])))
        # remap: the mesh velocity is time-independent, so its volume- and
        # face-quad-point interpolations are static — hoist them out of the
        # per-stage geometry recompute (remhos.cpp:1612-1643 reassembles
        # them every stage; here they're computed once)
        self._v_q_static = None
        self._v_fq_static = None
        if cfg.exec_mode == 1 and self.v_nodes is not None:
            self._v_q_static = geo.interp_nodes(self.v_nodes, self.Bm)
            nf, Qf, nm = self.Bmf.shape
            self._v_fq_static = geo.interp_nodes(
                self.v_nodes, self.Bmf.reshape(nf * Qf, nm)).reshape(
                    self.v_nodes.shape[0], nf, Qf, -1)
        self.Bu_w = self.Bu * self.w_q[:, None]
        # sharded subclasses pre-set the GLOBAL bounding box before calling
        # super().__init__ (velocity fields scale with it; the local
        # shard's box would silently change problem velocities)
        if not hasattr(self, "bb_min"):
            self.bb_min = disc.mesh.bb_min
            self.bb_max = disc.mesh.bb_max
        # roll-based structured neighbor gather (fast path); general
        # meshes use the index-table gather from assembly.py
        mesh = disc.mesh
        if getattr(mesh, "structured", True):
            self.gather_nbr = partial(strm.gather_nbr_structured,
                                      shape=mesh.shape,
                                      periodic=mesh.periodic,
                                      nbr_dof_local=dm.nbr_dof_local)
        else:
            self.gather_nbr = partial(asm.gather_nbr_face,
                                      nbr_elem=self.nbr_elem,
                                      nbr_dof_local=self.nbr_dof_local)
        if cfg.lo == 4 or cfg.mono == 2:
            from . import subcell as subm
            self._subcell_nodes = subm.subcell_node_setup(self)
        if cfg.smth_ind:
            from .si import SmoothnessIndicator
            self.smth = SmoothnessIndicator(cfg.smth_ind, disc,
                                            self.bb_min, self.bb_max)
        if cfg.mono != 0:
            from . import mono as monom
            self.mono_scale = jnp.asarray(monom.velocity_scale(
                disc.mesh, disc, cfg.problem, self.bb_min, self.bb_max))
        # fully fused stage path (ops/pallas_kernels.fused_stage_ho):
        # geometry + volume convection + DG face flux + GL mass-inverse CG
        # in one Pallas kernel. Covers the canonical FOM config family
        # (-ho 3 [-lo 5] [-fct 2] -pa, remap); other configs use the
        # fused_geom_conv + XLA composition.
        self._fused_stage = bool(
            cfg.pa and cfg.use_pallas and cfg.exec_mode == 1
            and cfg.ho == 3 and cfg.lo in (0, 5) and cfg.fct in (0, 2)
            and cfg.mono == 0 and cfg.smth_ind == 0
            and self._face_tan is not None and disc.dim in (2, 3))
        # tables must be built OUTSIDE any trace (asarray with a dtype cast
        # stages a convert op; caching it from inside jit leaks a tracer)
        if self._fused_stage:
            from .ops import pallas_kernels as pk
            self._stage_tables = pk.stage_ho_tables(disc, dtype)
            # polynomial stage geometry: J(t) = J0 + t*Jv in remap, so
            # va/wdet/vn are low-degree polynomials in t whose coefficient
            # tables are built once (jitted; eager TPU layouts are
            # pathological) — the per-stage geometry compute disappears
            vbf16 = bool(cfg.poly_bf16) and dtype == jnp.float32
            self._poly = jax.jit(
                lambda x0, v: pk.build_poly_tables(x0, v, disc,
                                                   va_vn_bf16=vbf16))(
                    self.x0_nodes, self.v_nodes)

    def _stage_ho_fused(self, geom, u, n_cg=None):
        """Run the fused HO stage kernel; populate geom's wdet/detJ/ml on
        first use (one kernel per field, same stage geometry). When the
        stage function marked this geom fused_lo-eligible (standard-RK
        path: limit_mult's du_HO is this kernel's unmodified output), the
        kernel also emits the MassBasedAvg LO solution."""
        from .ops import pallas_kernels as pk
        u_nbr = self.gather_nbr(u).reshape(u.shape[0], -1)
        with_lo = (bool(geom.get("fused_lo")) and n_cg != 0
                   and "du_LO_fused" not in geom)
        res = pk.fused_stage_ho_poly(geom["t"], u, u_nbr, self._poly,
                                     self._stage_tables,
                                     dim=self.disc.dim, mode=1.0,
                                     n_cg=n_cg, dt=geom.get("dt"),
                                     with_lo=with_lo)
        du, wdet = res[0], res[1]
        if with_lo:
            geom["du_LO_fused"] = res[2]
        if "wdet" not in geom:
            geom["wdet"] = wdet
            geom["detJ"] = wdet / self.w_q[None, :]
            geom["ml"] = pam.lumped_mass_pa(wdet, self.Bu)
        return du

    def _ensure_stage_geom(self, geom):
        """Fused-stage geom dicts get wdet/detJ/ml as kernel by-products;
        if limit_mult runs before any fused kernel has (e.g. standalone),
        derive them here."""
        if not self._fused_stage or "wdet" in geom:
            return geom
        from .ops import pallas_kernels as pk
        wdet = pk.fused_wdet(geom["xs"], self.disc)
        geom["wdet"] = wdet
        geom["detJ"] = wdet / self.w_q[None, :]
        geom["ml"] = pam.lumped_mass_pa(wdet, self.Bu)
        return geom

    # ------------------------------------------------------------------
    # geometry / operators at a stage time
    # ------------------------------------------------------------------

    def geometry(self, t):
        """All stage-dependent operator data (remhos.cpp:1598-1676).

        Computed ONCE per stage and threaded through both mult_unlimited
        and limit_mult (see stage_function / make_idp_step; the reference
        reuses its per-stage assembly the same way, and XLA cannot CSE the
        Pallas custom-calls across the two halves)."""
        cfg = self.cfg
        sub_w = None
        if cfg.lo == 4 or cfg.mono == 2:
            from . import subcell as subm
            sub_w = subm.subcell_weights(self, t)
        if cfg.exec_mode == 1:
            x = self.x0_nodes + t * self.v_nodes
        else:
            x = self.x0_nodes

        if self._fused_stage:
            # everything stage-dependent happens inside the fused stage
            # kernel (polynomial geometry keyed on t); wdet/detJ/ml are
            # populated as kernel by-products
            return dict(t=t, xs=x, sub_w=sub_w)

        if cfg.pa and cfg.exec_mode == 1:
            # remap PA hot path (the reference's RHS-FOM bottleneck,
            # remhos.cpp:1598-1676): static velocity interps + fused
            # cofactor-column geometry — no adjugate, no x_q/x_fq
            v_q, v_fq = self._v_q_static, self._v_fq_static
            if self._face_tan is not None:
                nor = geo.face_normals_tangent(x, *self._face_tan)
            else:
                _, nor = geo.face_geometry(x, self.Bmf, self.Gmf,
                                           self.n_ref)
            vn = jnp.einsum("efqd,efqd->efq", v_fq, nor)
            wvn = -(self.w_fq[None, None, :] * (-jnp.maximum(0.0, vn)))
            if cfg.use_pallas:
                # fused-Pallas variant: J/adjJ/va never touch HBM; the
                # convection action fuses with geometry per field in
                # _ho_solution (ops/pallas_kernels.py)
                from .ops import pallas_kernels as pk
                wdet = pk.fused_wdet(x, self.disc)
                ml = pam.lumped_mass_pa(wdet, self.Bu)
                detJ = wdet / self.w_q[None, :]
                return dict(detJ=detJ, wdet=wdet, wvn=wvn, ml=ml, xs=x,
                            sub_w=sub_w)
            detJ, va = geo.volume_detj_va(x, self.Gm, v_q, 1.0)
            wdet = self.w_q[None, :] * detJ
            ml = pam.lumped_mass_pa(wdet, self.Bu)
            return dict(detJ=detJ, wdet=wdet, va=va, wvn=wvn, ml=ml,
                        sub_w=sub_w)

        vol = geo.volume_geometry(x, self.Bm, self.Gm)
        if self._face_tan is not None:
            x_fq, nor = geo.face_geometry_tangent(x, self.Bmf,
                                                  *self._face_tan)
        else:
            x_fq, nor = geo.face_geometry(x, self.Bmf, self.Gmf, self.n_ref)
        if cfg.exec_mode == 0:
            # bb_min/bb_max are numpy f64 — cast back so an f32 operator
            # stays f32 (numpy operands are not weak-typed)
            v_q = prob.velocity_function(cfg.problem, vol["x_q"],
                                         self.bb_min, self.bb_max
                                         ).astype(vol["x_q"].dtype)
            v_fq = prob.velocity_function(cfg.problem, x_fq,
                                          self.bb_min, self.bb_max
                                          ).astype(x_fq.dtype)
            sign = -1.0
        else:
            v_q = self._v_q_static
            v_fq = self._v_fq_static
            sign = 1.0

        if cfg.pa:
            # transport PA: geometry is time-independent — XLA hoists it
            # out of the step, so the adjugate path costs nothing per stage
            wdet = self.w_q[None, :] * vol["detJ"]
            va = sign * jnp.einsum("eqd,eqbd->eqb", v_q, vol["adjJ"])
            vn = jnp.einsum("efqd,efqd->efq", v_fq, nor)
            vns = (jnp.minimum(0.0, vn) if cfg.exec_mode == 0
                   else -jnp.maximum(0.0, vn))
            wvn = -(self.w_fq[None, None, :] * vns)
            ml = pam.lumped_mass_pa(wdet, self.Bu)
            return dict(detJ=vol["detJ"], wdet=wdet, va=va, wvn=wvn, ml=ml,
                        sub_w=sub_w)

        K_elem = asm.element_convection(v_q, vol["adjJ"], self.Bu, self.Gu,
                                        self.w_q, sign)
        bdrInt = asm.face_upwind_matrices(v_fq, nor, self.w_fq, self.Bface,
                                          cfg.exec_mode)
        M = asm.element_mass(vol["detJ"], self.Bu, self.w_q)
        ml = asm.lumped_mass(M)
        geom = dict(detJ=vol["detJ"], K_elem=K_elem, bdrInt=bdrInt, M=M,
                    ml=ml, sub_w=sub_w)
        if cfg.ho == 3 or cfg.fct != 0 or cfg.mono != 0:
            geom["chol_L"] = hom.mass_cholesky(M)
        if cfg.lo == 1:
            geom["D"] = lom.discrete_upwind_matrix(K_elem)
        elif cfg.lo == 2:
            geom["D"] = lom.discrete_upwind_matrix(
                lom.precond_convection_matrix(K_elem, M))
        return geom

    # ------------------------------------------------------------------
    # solvers
    # ------------------------------------------------------------------

    def _ho_solution(self, geom, u):
        cfg = self.cfg
        if self._fused_stage:
            return self._stage_ho_fused(geom, u)
        if cfg.pa and cfg.ho in (2, 3):
            u_nbr = self.gather_nbr(u)
            if "va" not in geom:
                from .ops import pallas_kernels as pk
                Ku, _ = pk.fused_geom_conv(geom["xs"], self.v_nodes, u,
                                           self.disc, 1.0)
            else:
                Ku = pam.conv_action(u, geom["va"], self.Gu, self.Bu_w)
            contrib = pam.face_full_apply(u[:, self.bdr_dofs], u_nbr,
                                          self.Bface, geom["wvn"])
            Ku = asm.scatter_face_add(Ku, contrib, self.bdr_dofs)
            if cfg.ho == 3:
                # XLA's dynamic-exit CG beats the fixed-iteration Pallas
                # fused_gl_cg here (kappa(M_gl) ~ 1.005 -> 3-4 iterations);
                # the Pallas win is the fused geometry+conv above
                return pam.mass_solve_gl(Ku, geom["wdet"], self.Bgl,
                                         self.A_gl2b,
                                         all_sum=self.all_sum_fn())
            return pam.mass_solve_bern(Ku, geom["wdet"], self.Bu,
                                       all_sum=self.all_sum_fn())
        if cfg.ho in (2, 3):
            u_nbr = self.gather_nbr(u)     # zero at physical boundaries
            Ku = asm.apply_K_HO(u, geom["K_elem"], geom["bdrInt"], u_nbr,
                                self.bdr_dofs)
            if cfg.ho == 3:
                return hom.local_inverse(Ku, geom["chol_L"])
            return hom.cg_mass_solve(geom["M"], Ku, all_sum=self.all_sum_fn())
        if cfg.ho == 1:
            rhs = jnp.einsum("eij,ej->ei", geom["K_elem"], u)
            u_face = asm.gather_face(u, self.bdr_dofs)
            u_nbr = self.gather_nbr(u, bdr_value=self._inflow_face_for(u))
            contrib = asm.face_term_full(u_face, u_nbr, geom["bdrInt"])
            rhs = asm.scatter_face_add(rhs, contrib, self.bdr_dofs)
            return hom.neumann(u, rhs, geom["M"], geom["ml"],
                               all_sum=self.all_sum_fn())
        raise ValueError("no HO solver selected")

    def _inflow_face_for(self, u):
        if self.inflow_face is None:
            return None
        return self.inflow_face

    def compute_bounds(self, el_min, el_max, active_el=None):
        """Per-dof bounds; overridden by the sharded operator to include
        cross-shard halo contributions."""
        mesh = self.disc.mesh
        if self.cfg.bounds_type == 0 and getattr(mesh, "structured", True):
            return strm.overlap_bounds_structured(
                el_min, el_max, mesh.shape, mesh.periodic, self.disc.p,
                active_el=active_el)
        return bnd.compute_bounds(el_min, el_max, self.disc.dofmaps,
                                  self.cfg.bounds_type, active_el=active_el)

    def compute_bounds_stencil(self, el_min, el_max):
        """Element-class overlap-bounds stencil [E, 3^dim] for the mega
        kernel's in-kernel per-dof expansion: the same separable pass as
        compute_bounds but with 3 classes per axis (low endpoint /
        interior / high endpoint) instead of p+1 dof positions — the
        per-dof values are recovered exactly by the one-hot EXP table
        (stage_ho_tables). None -> caller falls back to per-dof bounds.
        The sharded operator overrides this with its halo exchanges."""
        mesh = self.disc.mesh
        if not (self.cfg.bounds_type == 0
                and getattr(mesh, "structured", True)):
            return None
        # 1-D column stencil: bit-identical to the grid-roll stencil
        # (tested) with no [E, c<=9] lane-padded intermediates — the
        # grid-roll variant measured 60.9 us/stage (round-4 trace), the
        # flat [E, c] variant ~26 us (concat/copy chain), the separate
        # 1-D columns ~3 us (docs/PERF.md round-5 notes).
        # REMHOS_STENCIL=flat|grid are A/B knobs.
        import os
        v = os.environ.get("REMHOS_STENCIL", "cols")
        if v == "grid":
            return strm.overlap_bounds_structured(
                el_min, el_max, mesh.shape, mesh.periodic, 2)
        if v == "flat":
            return strm.overlap_stencil_flat(
                el_min, el_max, mesh.shape, mesh.periodic)
        return strm.overlap_stencil_cols(
            el_min, el_max, mesh.shape, mesh.periodic)

    def bind_poly(self, fn):
        """jit `fn(*args)` with the polynomial geometry tables passed as a
        RUNTIME argument. Closing over the eager device arrays would make
        jax inline them as dense MLIR constants (~226 MB of module text at
        the bench size — the remote compile helper rejects the request);
        as an argument they are runtime buffers. The tables are rebound on
        self only while tracing (restored after), so retraces see fresh
        tracers and cache hits never execute the wrapper body."""
        if not (self._fused_stage and getattr(self, "_poly", None)):
            return jax.jit(fn)

        def inner(poly, *args):
            prev = self._poly
            self._poly = poly
            try:
                return fn(*args)
            finally:
                self._poly = prev

        jitted = jax.jit(inner)
        poly = self._poly

        class _Bound:
            """Callable + .lower() (bench AOT-compiles the loop)."""
            def __call__(self, *args):
                return jitted(poly, *args)

            def lower(self, *args):
                low = jitted.lower(poly, *args)

                class _Lowered:
                    def compile(self):
                        comp = low.compile()
                        class _Compiled:
                            def __call__(self, *args2):
                                return comp(poly, *args2)
                            def cost_analysis(self):
                                return comp.cost_analysis()
                        return _Compiled()
                return _Lowered()

        return _Bound()

    def lumped_mass(self, t):
        """ml at time t (driver mass reports); works on both the fused-
        stage minimal geom and the full geom dicts."""
        geom = self.geometry(t)
        self._ensure_stage_geom(geom)
        return geom["ml"]

    def all_min(self, x):
        """Global min hook (identity on one shard; pmin when sharded)."""
        return x

    def all_sum_fn(self):
        """Cross-shard sum reducer for iterative solvers (None = local)."""
        return None

    def _lo_solution(self, geom, u, du_HO=None, dt=None):
        cfg = self.cfg
        bdr_value = self._inflow_face_for(u)
        if cfg.lo == 5:
            if du_HO is not None and "du_LO_fused" in geom:
                # already computed inside the fused stage kernel (valid:
                # the stage function guarantees du_HO is the kernel's
                # unmodified output at the same dt)
                return geom["du_LO_fused"]
            if du_HO is None:
                du_HO = self._ho_solution(geom, u)
            return lom.mass_based_avg(u, du_HO, dt, geom["detJ"], self.w_q,
                                      self.Bu)
        u_nbr = self.gather_nbr(u, bdr_value=bdr_value)
        if cfg.lo in (1, 2):
            if cfg.pa:
                raise ValueError("discrete upwind has no PA path "
                                 "(matches the reference)")
            return lom.discrete_upwind(u, u_nbr, geom["D"], geom["bdrInt"],
                                       geom["ml"], self.bdr_dofs)
        if cfg.lo in (3, 4):
            sub_kw = dict(subcell=(cfg.lo == 4),
                          subcell_weights=geom.get("sub_w"),
                          sub2ind=jnp.asarray(self.disc.dofmaps.sub2ind))
            if cfg.pa and "va" not in geom:
                from .ops import pallas_kernels as pk
                z, _ = pk.fused_geom_conv(geom["xs"], self.v_nodes, u,
                                          self.disc, 1.0)
                contrib = pam.face_lumped_apply(u[:, self.bdr_dofs], u_nbr,
                                                self.Bface, geom["wvn"])
                duf = asm.scatter_face_add(jnp.zeros_like(u), contrib,
                                           self.bdr_dofs)
                return lom.residual_distribution_core(u, z, duf, geom["ml"],
                                                      **sub_kw)
            if cfg.pa:
                z = pam.conv_action(u, geom["va"], self.Gu, self.Bu_w)
                contrib = pam.face_lumped_apply(u[:, self.bdr_dofs], u_nbr,
                                                self.Bface, geom["wvn"])
                duf = asm.scatter_face_add(jnp.zeros_like(u), contrib,
                                           self.bdr_dofs)
                return lom.residual_distribution_core(u, z, duf, geom["ml"],
                                                      **sub_kw)
            return lom.residual_distribution(u, u_nbr, geom["K_elem"],
                                             geom["bdrInt"], geom["ml"],
                                             self.bdr_dofs, **sub_kw)
        raise ValueError("no LO solver selected")

    def _dt_ratio(self, u, du, x_min, x_max, dt):
        """LO-bounds dt estimate (remhos.cpp:1968-1998): largest dt keeping
        x_min <= u + dt*du <= x_max, as a ratio to the current dt."""
        eps = 1e-12
        up = jnp.where(du > eps, (x_max - u) / jnp.where(du > eps, du, 1.0),
                       jnp.inf)
        dn = jnp.where(du < -eps, (x_min - u) / jnp.where(du < -eps, du, 1.0),
                       jnp.inf)
        dt_est = self.all_min(jnp.minimum(up.min(), dn.min()))
        return dt_est / dt

    # ------------------------------------------------------------------
    # stage functions (over the block state S[nfields, E, nd])
    # ------------------------------------------------------------------

    def mult_unlimited(self, t, dt, S, geom=None):
        """HO (or mono/LO-only) update for all fields
        (AdvectionOperator::MultUnlimited, remhos.cpp:1596-1739)."""
        cfg = self.cfg
        if geom is None:
            geom = self.geometry(t)
        outs = []
        for k in range(S.shape[0]):
            u = S[k]
            if cfg.mono != 0:
                from . import mono as monom
                du = monom.mono_rd_solution(self, geom, u, dt)
            elif cfg.fct != 0:
                du = self._ho_solution(geom, u)
            elif cfg.lo != 0:
                du = self._lo_solution(geom, u, dt=dt)
            else:
                du = self._ho_solution(geom, u)
            outs.append(du)
        return jnp.stack(outs)

    def _aux(self, ratio, viol):
        """Pack the per-stage side channel: [dt_ratio, -violations].
        Steppers combine stages with elementwise minimum, which takes the
        min ratio AND the max violation count (negated); psum-free and
        shape-stable whether or not -vb is active."""
        return jnp.stack([ratio, -viol.astype(ratio.dtype)])

    def limit_mult(self, t, dt, S, dS, geom=None):
        """FCT limiting for all fields (AdvectionOperator::LimitMult,
        remhos.cpp:1798-1916). Returns (dS_limited, aux) with
        aux = [dt_ratio, -bounds_violations] (see _aux)."""
        cfg = self.cfg
        ratio = jnp.asarray(jnp.inf, S.dtype)
        viol = jnp.zeros((), jnp.int32)
        if cfg.fct == 0:
            if cfg.dt_control != 0 and cfg.lo != 0:
                u = S[0]
                el_min, el_max = bnd.elements_min_max(u)
                x_min, x_max = self.compute_bounds(el_min, el_max)
                ratio = self._dt_ratio(u, dS[0], x_min, x_max, dt)
            return dS, self._aux(ratio, viol)

        if geom is None:
            geom = self.geometry(t)
        self._ensure_stage_geom(geom)
        u, du_HO = S[0], dS[0]
        du_LO = self._lo_solution(geom, u, du_HO=du_HO, dt=dt)
        el_min, el_max = bnd.elements_min_max(u)
        x_min, x_max = self.compute_bounds(el_min, el_max)
        if cfg.verify_bounds:
            # "LimitMult LO u" (remhos.cpp:1824-1828)
            from . import verify as vfy
            viol = viol + vfy.check_violation(u, dt, du_LO, x_min, x_max)
        du = self._fct_solution(geom, u, du_HO, du_LO, x_min, x_max, dt)
        if cfg.verify_bounds:
            # "LimitMult FCT solution u" (remhos.cpp:1833-1837)
            from . import verify as vfy
            viol = viol + vfy.check_violation(u, dt, du, x_min, x_max)
        if cfg.dt_control != 0:
            ratio = self._dt_ratio(u, du_LO, x_min, x_max, dt)
        outs = [du]

        if S.shape[0] > 1:
            d_us, viol_p = self._limit_product(geom, t, dt, S, dS, du)
            outs.append(d_us)
            viol = viol + viol_p
        return jnp.stack(outs), self._aux(ratio, viol)

    def _fct_solution(self, geom, u, du_HO, du_LO, x_min, x_max, dt):
        cfg = self.cfg
        if cfg.fct == 2:
            return fctm.clip_scale(u, geom["ml"], du_HO, du_LO, x_min, x_max,
                                   dt)
        if cfg.fct == 4:
            return fctm.element_fct_projection(u, du_HO, du_LO, x_min, x_max,
                                               geom["M"], dt)
        if cfg.fct == 1:
            from . import fct_flux
            return fct_flux.flux_based_fct(self, geom, u, du_HO, du_LO,
                                           x_min, x_max, dt)
        if cfg.fct == 3:
            from . import fct_penalty
            return fct_penalty.nonlinear_penalty(self, geom, u, du_HO, du_LO,
                                                 x_min, x_max, dt)
        raise ValueError(f"unsupported fct type {cfg.fct}")

    def _limit_product(self, geom, t, dt, S, dS, d_u_limited):
        """Product-field block of LimitMult (remhos.cpp:1848-1915).
        Returns (d_us, violation_count)."""
        cfg = self.cfg
        us, d_us_HO = S[1], dS[1]
        u = S[0]

        needs_lo_product = (cfg.fct == 1)  # FluxBasedFCT::NeedsLOProductInput
        d_us_LO = (self._lo_solution(geom, us, du_HO=d_us_HO, dt=dt)
                   if needs_lo_product else jnp.zeros_like(us))

        # s = us/u on old active dofs; bounds for s on the active stencil
        s, s_el, s_dofs = syncm.compute_ratio(us, u)
        el_min, el_max = bnd.elements_min_max(s, active_el=s_el,
                                              active_dof=s_dofs)
        s_min, s_max = self.compute_bounds(el_min, el_max, active_el=s_el)

        # evolve u, new activity
        u_new = u + dt * d_u_limited
        el_new, dofs_new = syncm.bool_indicators(u_new)

        return self._fct_product(geom, us, d_us_HO, d_us_LO, s_min, s_max,
                                 u_new, el_new, dofs_new, dt)

    def _fct_product(self, geom, us, d_us_HO, d_us_LO, s_min, s_max, u_new,
                     active_el, active_dofs, dt):
        """CalcFCTProduct for clip-scale-style solvers
        (remhos_fct.cpp:543-566 / 733-758). Returns (d_us, violations)."""
        cfg = self.cfg
        m = geom["ml"]
        dus_lo_fct, s_min, s_max, viol = fctm.calc_compatible_lo_product(
            us, m, d_us_HO, s_min, s_max, u_new, active_el, active_dofs, dt)
        if not cfg.verify_bounds:
            viol = jnp.zeros((), jnp.int32)
        us_min, us_max = fctm.scale_product_bounds(s_min, s_max, u_new,
                                                   active_el, active_dofs)
        if cfg.fct == 2:
            d_us = fctm.clip_scale(us, m, d_us_HO, dus_lo_fct, us_min, us_max,
                                   dt)
        elif cfg.fct == 4:
            d_us = fctm.element_fct_projection(us, d_us_HO, dus_lo_fct,
                                               us_min, us_max, geom["M"], dt)
        elif cfg.fct == 1:
            from . import fct_flux
            d_us = fct_flux.flux_based_fct_product(
                self, geom, us, d_us_HO, d_us_LO, dus_lo_fct, s_min, s_max,
                us_min, us_max, u_new, active_el, active_dofs, dt)
        else:
            raise ValueError(f"unsupported fct product type {cfg.fct}")
        d_us = syncm.zero_out_empty_dofs(active_el, active_dofs, d_us)
        if cfg.verify_bounds:
            # final product bounds check (remhos_fct.cpp:264-292, 568-610)
            from . import verify as vfy
            viol = viol + vfy.check_final_us(us, dt, d_us, us_min, us_max,
                                             active_el, active_dofs)
        return d_us, viol

    def compute_mask(self, S):
        """IDP stage mask (AdvectionOperator::ComputeMask,
        remhos.cpp:1741-1796): with a product field, a dof participates in
        the high-order RK recombination only if EVERY dof of its element is
        active in u (element-consistent activity); the u mask is applied to
        all fields — new-element activation then propagates via plain
        forward Euler. Without a product field, everything is active."""
        if S.shape[0] <= 1:
            return jnp.ones(S.shape, bool)
        _, active_dofs = syncm.bool_indicators(S[0])
        el_fully_active = active_dofs.all(axis=1)
        return jnp.broadcast_to(el_fully_active[None, :, None], S.shape)

    # ------------------------------------------------------------------

    def _mega_stage_eligible(self):
        """The whole -ho 3 -lo 5 -fct 2 standard-RK stage collapses into
        ONE Pallas kernel when nothing outside it needs the intermediate
        du_HO/du_LO/wdet (no -vb checks, no dt control, single field)."""
        cfg = self.cfg
        return (self._fused_stage and cfg.lo == 5 and cfg.fct == 2
                and not cfg.verify_bounds and cfg.dt_control == 0)

    def _mega_stage(self, t, dt, S):
        """Single-kernel limited stage: bounds (a function of u alone) in
        XLA, then HO+LO+lumped-mass+ClipScale fused (fused_stage_mega_poly).
        Only the limited du touches HBM. On an unsharded structured mesh
        the stencil runs class-MAJOR ([3^dim, E], overlap_stencil_T — E
        on the lane axis, so none of the [E, c<=9] lane-padded
        intermediates of the round-4 flat stencil exist) and feeds the
        kernel as aligned [3^dim, be] lane blocks. (A fully in-kernel
        stencil was built and rejected by Mosaic: dynamic lane slices
        must be 128-aligned — docs/PERF.md round-5 notes.)"""
        import os
        from .ops import pallas_kernels as pk
        u = S[0]
        el_min, el_max = bnd.elements_min_max(u)
        mesh = self.disc.mesh
        t_ok = (self.cfg.bounds_type == 0
                and getattr(self, "axes_spec", None) is None
                and getattr(mesh, "structured", True)
                and os.environ.get("REMHOS_STENCIL", "T") == "T")
        if t_ok:
            smin, smax = strm.overlap_stencil_T(el_min, el_max,
                                                mesh.shape, mesh.periodic)
            u_nbr = self.gather_nbr(u).reshape(u.shape[0], -1)
            du = pk.fused_stage_mega_poly(
                t, dt, u, u_nbr, smin, smax, self._poly,
                self._stage_tables, dim=self.disc.dim, mode=1.0,
                bounds_stencil="T")
            ratio = jnp.asarray(jnp.inf, S.dtype)
            return jnp.stack([du]), self._aux(ratio,
                                              jnp.zeros((), jnp.int32))
        stencil = self.compute_bounds_stencil(el_min, el_max)
        if stencil is not None:
            x_min, x_max = stencil
        else:
            x_min, x_max = self.compute_bounds(el_min, el_max)
        u_nbr = self.gather_nbr(u).reshape(u.shape[0], -1)
        du = pk.fused_stage_mega_poly(t, dt, u, u_nbr, x_min, x_max,
                                      self._poly, self._stage_tables,
                                      dim=self.disc.dim, mode=1.0,
                                      bounds_stencil=stencil is not None)
        ratio = jnp.asarray(jnp.inf, S.dtype)
        return jnp.stack([du]), self._aux(ratio, jnp.zeros((), jnp.int32))

    def stage_function(self):
        """f(t, dt, S) -> (dS, aux) for the standard RK path
        (LimitedTimeDependentOperator::Mult). The stage geometry is
        computed once and shared by both halves."""
        def f(t, dt, S):
            if S.shape[0] == 1 and self._mega_stage_eligible():
                return self._mega_stage(t, dt, S)
            geom = self.geometry(t)
            if self._fused_stage and self.cfg.lo == 5 and self.cfg.fct == 2:
                # on this path limit_mult's du_HO is mult_unlimited's
                # output unchanged, so the kernel can emit du_LO too
                # (IDP recombines between the calls — no flag there)
                geom["fused_lo"] = True
                geom["dt"] = dt
            dS = self.mult_unlimited(t, dt, S, geom=geom)
            return self.limit_mult(t, dt, S, dS, geom=geom)
        return f
