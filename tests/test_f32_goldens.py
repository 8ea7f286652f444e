"""f32 production-mode golden tier.

The f32 hot path had two silent-degradation bugs in round 2 (a mass solve
stopping at 0 iterations, bf16-poisoned basis transforms) that mass/bounds
checks alone could not see. This tier runs one representative row per
method family in BOTH precisions and requires the f32 trajectory to track
the f64 one at f32-appropriate tolerances — a state-level guard, not just
an invariant check. The `pa`+`use_pallas` rows exercise the SAME fused
Pallas kernels the TPU production path uses (interpret mode on CPU via
pallas_kernels._auto_interpret).

Run with: pytest -k f32
"""

import pytest

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run


def _pair(**kw):
    """(f64 result, f32 result) for the same configuration."""
    base = dict(verbose=False, vis_steps=0)
    base.update(kw)
    r64 = run(RunConfig(**base))
    r32 = run(RunConfig(dtype="float32", **base))
    return r64, r32


def _check(r64, r32, mass_tol=1e-5, max_tol=1e-3):
    # conservation in f32 arithmetic
    assert r32.mass_loss_u < max(1e-5, 50 * r64.mass_loss_u), \
        f"f32 conservation broken: {r32.mass_loss_u:g}"
    # trajectory tracking: both silent-f32 failure modes sit orders above
    # these tolerances (du=0 freezes max_u at its initial value; bf16
    # transforms produce O(1) state garbage)
    rel = abs(r32.final_mass_u - r64.final_mass_u) / abs(r64.final_mass_u)
    assert rel < mass_tol, f"f32 final mass drifted: rel {rel:g}"
    assert abs(r32.max_u - r64.max_u) < max_tol, \
        f"f32 max drifted: {r32.max_u} vs {r64.max_u}"


class TestF32Goldens:
    def test_f32_transport_rd_clipscale(self):
        r64, r32 = _pair(mesh="periodic-square", problem=5, rs_levels=1,
                         order=3, dt=0.01, t_final=0.1,
                         ho=3, lo=3, fct=2)
        _check(r64, r32)

    def test_f32_transport_du_fluxfct(self):
        r64, r32 = _pair(mesh="periodic-square", problem=5, rs_levels=1,
                         order=3, dt=0.01, t_final=0.1,
                         ho=3, lo=1, fct=1)
        _check(r64, r32)

    def test_f32_transport_elemproj_idp(self):
        r64, r32 = _pair(mesh="periodic-square", problem=5, rs_levels=1,
                         order=3, dt=0.01, t_final=0.1,
                         ho=3, lo=3, fct=4, ode_solver=12)
        _check(r64, r32)

    def test_f32_remap_fa(self):
        r64, r32 = _pair(mesh="inline-quad", problem=14, rs_levels=1,
                         order=3, dt=0.0015, t_final=0.75, max_tsteps=8,
                         ho=3, lo=5, fct=2)
        _check(r64, r32)

    def test_f32_remap_pa_pallas_2d(self):
        """The production TPU path: PA + fused Pallas stage (interpret)."""
        r64, r32 = _pair(mesh="inline-quad", problem=14, rs_levels=1,
                         order=3, dt=0.0015, t_final=0.75, max_tsteps=6,
                         ho=3, lo=5, fct=2, pa=True, use_pallas=True)
        _check(r64, r32)

    def test_f32_remap_pa_pallas_3d(self):
        """3D remap through the fused stage kernel (the bench config)."""
        r64, r32 = _pair(mesh="cube01_hex", problem=10, rs_levels=1,
                         order=2, dt=0.02, t_final=0.2, max_tsteps=6,
                         ho=3, lo=5, fct=2, pa=True, use_pallas=True)
        _check(r64, r32)

    def test_f32_product_remap(self):
        r64, r32 = _pair(mesh="inline-quad", problem=14, rs_levels=1,
                         order=3, dt=0.005, t_final=0.75, max_tsteps=6,
                         ho=3, lo=5, fct=2, product_sync=True,
                         ode_solver=1)
        _check(r64, r32)
        assert abs(r32.final_mass_us - r64.final_mass_us) \
            < 1e-4 * abs(r64.final_mass_us)

    def test_f32_neumann_ho(self):
        r64, r32 = _pair(mesh="periodic-square", problem=0, rs_levels=1,
                         order=3, dt=0.01, t_final=0.1,
                         ho=1, lo=2, fct=2)
        _check(r64, r32)
