"""Dof-level -vb verification and IDP stage masks.

The reference treats -vb as a first-class debug mode (SURVEY §4): every RK
stage asserts per-dof bounds (check_violation, remhos.cpp:1557-1594,
:1824-1837) and the FCT product solvers verify s_avg / final us
(remhos_fct.cpp:84-101, 264-292, 568-610). These tests check that
(a) clean runs pass with -vb on, (b) a deliberately-broken limiter trips
the checks, (c) the verify primitives count exactly, and (d) the IDP
stage-mask path (ComputeMask/UpdateMask/AddMasked,
remhos_solvers.cpp:97-147) matches its reference semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from remhos_tpu import steppers, verify
from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run


def _run(**kw):
    kw.setdefault("verbose", False)
    return run(RunConfig(**kw))


class TestVerifyPrimitives:
    def test_count_out_of_bounds(self):
        u = jnp.asarray([[0.5, 1.5, -0.1], [0.0, 1.0, 0.3]])
        lo = jnp.zeros_like(u)
        hi = jnp.ones_like(u)
        assert int(verify.count_out_of_bounds(u, lo, hi)) == 2
        active = jnp.asarray([[True, False, True], [True, True, True]])
        assert int(verify.count_out_of_bounds(u, lo, hi, active=active)) == 1

    def test_check_violation_fwd_euler(self):
        u = jnp.asarray([[0.5, 0.5]])
        du = jnp.asarray([[10.0, 0.0]])
        lo, hi = jnp.zeros_like(u), jnp.ones_like(u)
        assert int(verify.check_violation(u, 0.1, du, lo, hi)) == 1
        assert int(verify.check_violation(u, 0.01, du, lo, hi)) == 0

    def test_verify_lo_product(self):
        # 1 element, 3 dofs: s bounds [1, 2]; us_LO = s*u_LO must hold
        u_LO = jnp.asarray([[1.0, 2.0, 1.0]])
        s_min = jnp.full((1, 3), 1.0)
        s_max = jnp.full((1, 3), 2.0)
        act_el = jnp.asarray([True])
        act_d = jnp.ones((1, 3), bool)
        us_ok = jnp.asarray([[1.5, 3.0, 2.0]])     # s = 1.5, 1.5, 2.0
        us_bad = jnp.asarray([[0.5, 3.0, 2.5]])    # s = 0.5 (<1), -, 2.5 (>2)
        assert int(verify.verify_lo_product(us_ok, u_LO, s_min, s_max,
                                            act_el, act_d)) == 0
        assert int(verify.verify_lo_product(us_bad, u_LO, s_min, s_max,
                                            act_el, act_d)) == 2
        # inactive element is skipped (remhos_sync.cpp:190)
        assert int(verify.verify_lo_product(us_bad, u_LO, s_min, s_max,
                                            jnp.asarray([False]), act_d)) == 0


class TestVBRuns:
    # NOTE: -vb checks the LO solution against the per-dof stencil bounds
    # (remhos.cpp:1824-1828). That invariant holds for the genuinely
    # bound-preserving LO solvers (DU -lo 1/2, RD -lo 3/4) but NOT for
    # MassBasedAvg (-lo 5), whose element-average of the UNLIMITED HO
    # update can exceed the stencil bounds — the reference aborts there
    # identically. So the clean -vb runs use -lo 1/3.
    def test_vb_clean_canonical(self):
        r = _run(mesh="periodic-square", problem=4, rs_levels=1, order=2,
                 dt=0.005, t_final=0.02, ho=3, lo=3, fct=2,
                 verify_bounds=True)
        assert r.mass_loss_u < 1e-12

    def test_vb_clean_flux_based(self):
        r = _run(mesh="periodic-square", problem=4, rs_levels=1, order=2,
                 dt=0.005, t_final=0.02, ho=3, lo=3, fct=1,
                 verify_bounds=True)
        assert r.mass_loss_u < 1e-12

    def test_vb_trips_on_mass_based_avg_lo(self):
        # the documented lo=5 behavior: the LO check fires (genuine — the
        # element average of the unlimited HO update violates dof bounds)
        with pytest.raises(RuntimeError, match="-vb"):
            _run(mesh="periodic-square", problem=4, rs_levels=1, order=2,
                 dt=0.005, t_final=0.02, ho=3, lo=5, fct=2,
                 verify_bounds=True)

    def test_vb_clean_product_remap(self):
        # exercises the s_avg stencil check + the final-us bounds check
        r = _run(mesh="inline-quad", problem=14, rs_levels=1, order=3,
                 dt=0.005, t_final=0.75, max_tsteps=6,
                 ho=3, lo=1, fct=2, product_sync=True, ode_solver=3,
                 verify_bounds=True)
        assert r.mass_loss_us < 1e-6

    def test_vb_idp_product_needs_masks(self):
        # The IDP recombination (d = [2, -1] for -s 12) amplifies the HO
        # product update in nearly-empty elements, pushing s_avg out of the
        # active stencil — the precise scenario ComputeMask exists for
        # (remhos.cpp:1741-1796). Unmasked trips the s_avg -vb check;
        # masked passes it.
        kw = dict(mesh="inline-quad", problem=14, rs_levels=1, order=3,
                  dt=0.005, t_final=0.75, max_tsteps=6,
                  ho=3, lo=1, fct=2, product_sync=True, ode_solver=12,
                  verify_bounds=True)
        with pytest.raises(RuntimeError, match="-vb"):
            _run(**kw)
        # masked-out (partially active) elements advance by plain forward
        # Euler (remhos.cpp:1789-1792 note), which departs from the exact
        # Butcher recombination there — a small O(dt) conservation cost at
        # the activation front is inherent to the masked scheme
        r = _run(use_masks=True, **kw)
        assert r.mass_loss_us < 5e-5

    def test_vb_trips_on_broken_limiter(self, monkeypatch):
        # a "limiter" that returns the raw HO update must violate the
        # per-dof bounds and abort the run, like the reference's MFEM_ABORT
        from remhos_tpu import fct as fctm

        def broken_clip_scale(u, m, du_ho, du_lo, u_min, u_max, dt):
            return du_ho

        monkeypatch.setattr(fctm, "clip_scale", broken_clip_scale)
        with pytest.raises(RuntimeError, match="-vb"):
            _run(mesh="periodic-square", problem=4, rs_levels=2, order=3,
                 dt=0.01, t_final=0.05, ho=3, lo=3, fct=2,
                 verify_bounds=True)

    def test_broken_limiter_passes_without_vb_dof_checks(self, monkeypatch):
        # sanity: the same broken limiter goes UNDETECTED by the global
        # min/max check alone for a few steps of a smooth interior profile
        # where local violations cancel globally -> the dof-level check is
        # strictly stronger. (Here we only assert the run completes with
        # -vb off; the global check still guards the extrema.)
        from remhos_tpu import fct as fctm

        def mild_broken(u, m, du_ho, du_lo, u_min, u_max, dt):
            # blend that slightly exceeds bounds but keeps global extrema
            return 0.9 * du_lo + 0.1 * du_ho

        monkeypatch.setattr(fctm, "clip_scale", mild_broken)
        r = _run(mesh="periodic-square", problem=4, rs_levels=1, order=2,
                 dt=0.005, t_final=0.01, ho=3, lo=5, fct=2,
                 verify_bounds=False)
        assert np.isfinite(r.final_mass_u)


class TestIDPMasks:
    def _linear_ops(self):
        # toy "solver": du = -u (decay); limiter is identity
        def mult_unlimited(t, dt, u):
            return -u

        def limit_mult(t, dt, u, du):
            return du, jnp.asarray([jnp.inf, 0.0], u.dtype)

        return mult_unlimited, limit_mult

    def test_all_true_mask_matches_unmasked(self):
        mu, lm = self._linear_ops()
        u0 = jnp.asarray(np.random.default_rng(0).random((2, 6, 4)))

        def mask_all(u):
            return jnp.ones(u.shape, bool)

        for kind in (12, 13, 14, 16):
            s_plain = steppers.make_idp_step(mu, lm, kind)
            s_mask = steppers.make_idp_step(mu, lm, kind,
                                            compute_mask=mask_all,
                                            use_masks=True)
            a, _ = s_plain(u0, 0.0, 0.1)
            b, _ = s_mask(u0, 0.0, 0.1)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-15)

    def test_false_mask_gives_forward_euler_stages(self):
        # With mask == False everywhere, every stage keeps its raw
        # unlimited update (AddMasked contributes nothing,
        # remhos_solvers.cpp:222-231): replicate the recurrence by hand.
        mu, lm = self._linear_ops()
        u0 = jnp.asarray(np.random.default_rng(1).random((1, 4, 3)))

        def mask_none(u):
            return jnp.zeros(u.shape, bool)

        kind = 12   # midpoint IDP: c = [0.5], stages advance at 0.5, 1.0
        s_mask = steppers.make_idp_step(mu, lm, kind,
                                        compute_mask=mask_none,
                                        use_masks=True)
        got, _ = s_mask(u0, 0.0, 0.1)
        # hand recurrence: x1 = x0 + 0.05*(-x0); x2 = x1 + 0.05*(-x1)
        x1 = u0 + 0.05 * (-u0)
        x2 = x1 + 0.05 * (-x1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x2),
                                   rtol=0, atol=1e-15)

    def test_compute_mask_semantics(self):
        from remhos_tpu.discretization import build_discretization
        from remhos_tpu.mesh import load_mesh
        from remhos_tpu.operator import Advection, SolverConfig

        mesh = load_mesh("inline-quad", 0)
        disc = build_discretization(mesh, 1)
        adv = Advection(disc, SolverConfig(problem=14, ho=3, lo=5, fct=2),
                        jnp.asarray(mesh.x), jnp.zeros_like(jnp.asarray(mesh.x)),
                        None)
        E, nd = mesh.num_elements, disc.dofmaps.nd
        u = jnp.ones((E, nd))
        u = u.at[0, 0].set(0.0)      # element 0: partially active -> masked out
        u = u.at[1].set(0.0)         # element 1: fully inactive -> masked out
        S = jnp.stack([u, 2.0 * u])
        mask = adv.compute_mask(S)
        assert mask.shape == S.shape
        m = np.asarray(mask)
        assert not m[:, 0].any()     # element-consistent deactivation
        assert not m[:, 1].any()
        assert m[:, 2:].all()
        # single field: everything active (remhos.cpp:1746-1752)
        S1 = jnp.stack([u])
        assert bool(adv.compute_mask(S1).all())

    def test_masked_product_remap_runs(self):
        # end-to-end: -s 12 -ps with masks on; conservation + s bounds hold
        r = _run(mesh="inline-quad", problem=14, rs_levels=1, order=3,
                 dt=0.005, t_final=0.75, max_tsteps=8,
                 ho=3, lo=1, fct=2, product_sync=True, ode_solver=12,
                 use_masks=True, verify_bounds=True)
        # forward-Euler propagation at the activation front costs O(dt)
        # conservation (see test_vb_idp_product_needs_masks)
        assert r.mass_loss_us < 5e-5
        assert r.max_s <= 3.0 + 1e-8

    def test_masked_matches_unmasked_on_fully_active_field(self):
        # transport of an everywhere-positive u (single field): mask is
        # all-true, so -um must not change the trajectory at all
        kw = dict(mesh="periodic-square", problem=4, rs_levels=1, order=2,
                  dt=0.005, t_final=0.02, ho=3, lo=5, fct=2, ode_solver=13)
        r0 = _run(**kw)
        r1 = _run(use_masks=True, **kw)
        assert r0.final_mass_u == r1.final_mass_u
        assert r0.max_u == r1.max_u
