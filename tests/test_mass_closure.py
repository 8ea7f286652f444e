"""Polynomial lumped mass + conservative f32 mass closure.

In remap the mesh moves linearly (x(t) = x0 + t*v, remhos.cpp:1128-1134),
so det J(t) — and with it the lumped mass ml(t) — is an exact polynomial
of degree `dim` in pseudotime. `geometry.lumped_mass_poly` returns its
coefficients; `steppers.make_mass_closure` uses them to pin the f64 mass
functional <ml(t), u+c> of the f32 Kahan state (u, c) to the t=0
invariant, matching the reference's f64-round-off conservation
(remhos.cpp:1423-1436) on the f32 production path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from remhos_tpu import geometry as geo
from remhos_tpu import pa as pam
from remhos_tpu import steppers
from remhos_tpu.discretization import build_discretization
from remhos_tpu.mesh import make_cartesian_mesh


def _case(dim, shape, order, seed=0):
    mesh = make_cartesian_mesh(dim, shape, (0.0,) * dim, (1.0,) * dim,
                               (False,) * dim)
    disc = build_discretization(mesh, order)
    x0 = jnp.asarray(mesh.x, jnp.float64)
    rng = np.random.default_rng(seed)
    # any smooth-ish nodal velocity works: the polynomial identity in t
    # is exact for every v; keep it small so det J stays positive
    v = jnp.asarray(0.08 * rng.standard_normal(x0.shape))
    return disc, x0, v


def _ml_direct(x0, v, disc, t):
    g = geo.volume_geometry(x0 + t * v, jnp.asarray(disc.Bm, jnp.float64),
                            jnp.asarray(disc.Gm, jnp.float64))
    wdet = jnp.asarray(disc.w_q, jnp.float64)[None, :] * g["detJ"]
    return pam.lumped_mass_pa(wdet, jnp.asarray(disc.Bu, jnp.float64))


@pytest.mark.parametrize("dim,shape,order", [
    (2, (5, 4), 3),
    (3, (3, 4, 2), 2),
])
def test_lumped_mass_poly_exact(dim, shape, order):
    disc, x0, v = _case(dim, shape, order)
    mlk, sig = geo.lumped_mass_poly(x0, v, disc)
    assert mlk.shape[0] == dim + 1
    for t in (0.0, 0.13, 0.7, 1.0):
        ml_poly = sum((t ** k) * mlk[k] for k in range(dim + 1))
        ml_ref = _ml_direct(x0, v, disc, t)
        np.testing.assert_allclose(np.asarray(ml_poly), np.asarray(ml_ref),
                                   rtol=1e-13, atol=1e-15)
        # sig_k = sum(mlk_k): S(t) is the total measure at t
        S = float(sum((t ** k) * sig[k] for k in range(dim + 1)))
        assert abs(S - float(ml_ref.sum())) <= 1e-12 * abs(S)


def _mass(mlk32, state, t):
    """f64 mass functional in the f32-mlk metric (the closure's own)."""
    K = mlk32.shape[0]
    tk = np.array([t ** k for k in range(K)])
    dots = np.array([float(mlk32[k].astype(jnp.float64).reshape(-1)
                           @ state.reshape(-1)) for k in range(K)])
    return float(dots @ tk)


def test_mass_closure_pins_invariant():
    disc, x0, v = _case(3, (3, 3, 3), 2, seed=1)
    mlk, sig = geo.lumped_mass_poly(x0, v, disc)
    mlk32 = mlk.astype(jnp.float32)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.uniform(0.1, 1.0, mlk.shape[1:]), jnp.float32)
    c = jnp.asarray(1e-7 * rng.standard_normal(mlk.shape[1:]), jnp.float32)
    t = 0.37
    s64 = u.astype(jnp.float64) + c.astype(jnp.float64)
    M0 = _mass(mlk32, s64, t)
    # target an invariant the drifted state misses by ~1e-5 relative
    m_target = M0 * (1.0 + 1.3e-5)
    close = steppers.make_mass_closure(mlk32, np.asarray(sig), m_target)
    c_new, deficit = close(u, c, jnp.float64(t))
    s_new = u.astype(jnp.float64) + c_new.astype(jnp.float64)
    M1 = _mass(mlk32, s_new, t)
    # deficit shrinks by ~eps_f32 (err is rounded once into the f32 c)
    assert abs(M1 - m_target) <= 1e-6 * abs(M0 - m_target) \
        + 1e-14 * abs(m_target)
    # the reported deficit is the injected mass (signed)
    assert abs(float(deficit) - (m_target - M0)) <= 1e-10 * abs(m_target)
    # uniformity: the shift is the same for every dof
    d = np.asarray(c_new - c, np.float64)
    assert np.ptp(d) <= 1e-6 * (abs(d).max() + 1e-30)


def test_mass_closure_noop_at_target():
    disc, x0, v = _case(2, (4, 4), 2, seed=3)
    mlk, sig = geo.lumped_mass_poly(x0, v, disc)
    mlk32 = mlk.astype(jnp.float32)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.uniform(0.1, 1.0, mlk.shape[1:]), jnp.float32)
    c = jnp.zeros_like(u)
    t = 0.61
    M0 = _mass(mlk32, u.astype(jnp.float64), t)
    close = steppers.make_mass_closure(mlk32, np.asarray(sig), M0)
    c_new, deficit = close(u, c, jnp.float64(t))
    # already on target: the correction is at the f64-dot noise level
    assert float(jnp.abs(c_new).max()) <= 1e-12 * float(jnp.abs(u).max())
    assert abs(float(deficit)) <= 1e-12 * abs(M0)


def test_mass_closure_incremental_tracks_and_anchors():
    """make_mass_closure_inc: per-step f32 increment tracking holds the
    true f64 mass functional near the invariant (errors enter scaled by
    the increment), and one exact f64 anchor closes the residual. The
    synthetic per-step deficits here are ~1e-3 relative — six orders
    HARSHER than the production drift (5e-9/step) — so the bound below
    is a stress test of the formula, not a tuned tolerance."""
    disc, x0, v = _case(3, (3, 3, 3), 2, seed=5)
    mlk, sig = geo.lumped_mass_poly(x0, v, disc)
    mlk32 = mlk.astype(jnp.float32)
    sig_np = np.asarray(sig)
    K = mlk.shape[0]
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.uniform(0.1, 1.0, mlk.shape[1:]), jnp.float32)
    c = jnp.zeros_like(u)

    def true_mass(u, c, t):
        # exact f64 mass in the closure's OWN metric (the f32-quantized
        # mlk — the invariant the closure pins; the f64-mlk metric
        # differs by the eps_f32/sqrt(ndofs) quantization documented in
        # bench.py's closure setup)
        s = (u.astype(jnp.float64) + c.astype(jnp.float64)).reshape(-1)
        tk = jnp.asarray(t ** np.arange(K))
        return float(jnp.einsum("kn,n,k->",
                                mlk32.astype(jnp.float64).reshape(K, -1),
                                s, tk))

    t, dt = 0.0, 1e-3
    m0 = true_mass(u, c, 0.0)
    close_inc = steppers.make_mass_closure_inc(mlk32, sig_np, block=256)
    close_full = steppers.make_mass_closure(mlk32, sig_np, m0)
    worst = 0.0
    for _ in range(60):
        delta = jnp.asarray(
            rng.standard_normal(u.shape) * 1e-3 * np.abs(np.asarray(u)),
            jnp.float32)
        u2, c2 = steppers.kahan_add(u, c, delta)
        c2, deficit = close_inc(u2, c2, delta, t, t + dt)
        assert np.isfinite(float(deficit))
        u, c, t = u2, c2, t + dt
        worst = max(worst, abs(true_mass(u, c, t) - m0) / abs(m0))
    # tracked mass holds the invariant at f32-of-the-increment scale
    assert worst < 5e-9, worst
    # one exact f64 anchor pins the residual to round-off
    c_end, _ = close_full(u, c, jnp.float64(t))
    assert abs(true_mass(u, c_end, t) - m0) / abs(m0) < 1e-12


def test_mass_closure_inc_coefs_matches_scalar_path():
    """The hot-loop form (host-precomputed (tk0, dtk, S) per-step scalars,
    steppers.closure_coefs) must agree with the in-device t^k scalar
    chain to f64 round-off: same block dots, only the scalar-combination
    arithmetic differs (one fused multiply-reduce vs integer_pow chains,
    which cost ~50 us/stage of emulated-f64 dispatch on v5e)."""
    disc, x0, v = _case(3, (3, 3, 3), 2, seed=7)
    mlk, sig = geo.lumped_mass_poly(x0, v, disc)
    mlk32 = mlk.astype(jnp.float32)
    sig_np = np.asarray(sig)
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.uniform(0.1, 1.0, mlk.shape[1:]), jnp.float32)
    c = jnp.zeros_like(u)
    close_inc = steppers.make_mass_closure_inc(mlk32, sig_np, block=256)
    n_steps, dt = 7, 1e-2
    tk0, dtk, S = close_inc.coefs(dt, n_steps)
    for i in range(n_steps):
        delta = jnp.asarray(
            rng.standard_normal(u.shape) * 1e-3 * np.abs(np.asarray(u)),
            jnp.float32)
        u2, c2 = steppers.kahan_add(u, c, delta)
        t0, t1 = i * dt, (i + 1) * dt
        c_a, d_a = close_inc(u2, c2, delta, t0, t1)
        c_b, d_b = close_inc(u2, c2, delta, t0, t1,
                             coefs=(jnp.asarray(tk0[i]), jnp.asarray(dtk[i]),
                                    jnp.asarray(S[i])))
        assert abs(float(d_a) - float(d_b)) <= 1e-14 * max(
            abs(float(d_a)), 1e-30) + 1e-18
        assert float(jnp.abs(c_a - c_b).max()) == 0.0
        u, c = u2, c_b
