"""Explicit time integrators.

- Standard RK (Forward Euler, RK2(1), RK3-SSP, RK4) with MFEM's exact stage
  times and update forms (mfem ode.cpp; selected by -s 1/2/3/4 in
  remhos.cpp:486-492). Each stage evaluates f = LimitMult∘MultUnlimited
  (LimitedTimeDependentOperator::Mult, remhos_solvers.hpp:46-50).
- IDP (invariant-domain-preserving) RK: every stage re-expressed as a
  limited forward-Euler update via coefficients d from the Butcher tableau
  (RKIDPSolver, remhos_solvers.cpp:40-249; -s 11/12/13/14/16). Stage masks
  (ComputeMask/UpdateMask/AddMasked) are implemented and enabled with -um;
  default off like the reference driver's UseMask(false)
  (remhos.cpp:502-506).

`f(t, dt_stage_for_limiter, u)` -> du; steppers are pure and jit-safe.
The `dt` passed to f is what the limiter uses as SetDt (for standard RK the
reference sets it once per step to dt_real; for IDP it is the stage dt).
"""

from __future__ import annotations

import numpy as np


def construct_d(a, b, c, s):
    """Convert a Butcher tableau into forward-Euler recombination factors
    (RKIDPSolver::ConstructD, remhos_solvers.cpp:40-95). Pure float python,
    run once at setup."""
    a = list(a)
    b = list(b)
    c = list(c)
    d = np.zeros(s * (s + 1) // 2)
    a_n_off = 0          # offset into a (or b for the last stage)
    a_o_off = 0
    use_b_n = False
    i_o = -1
    c_o = 0.0
    use_b_o = False

    def coeff(off, use_b, j):
        return (b[j] if use_b else a[off + j])

    for i in range(s):
        c_n = c[i] if i < s - 1 else 1.0
        dc = c_n - c_o
        di = i * (i + 1) // 2
        for j in range(i):
            a_oj = coeff(a_o_off, use_b_o, j) if j <= i_o else 0.0
            m = (coeff(a_n_off, use_b_n, j) - a_oj) / dc
            if m == 0.0:
                d[di + j] = 0.0
                continue
            dj = j * (j + 1) // 2
            dij = m / d[dj + j]
            for k in range(j):
                d[di + k] -= d[dj + k] * dij
            d[di + j] = dij
        d[di + i] = coeff(a_n_off, use_b_n, i) / dc

        c_next = c[i + 1] if i < s - 2 else 1.0
        if c_next > c_n:
            i_o = i
            c_o = c_n
            a_o_off, use_b_o = a_n_off, use_b_n
        if i < s - 2:
            a_n_off += i + 1
        else:
            a_n_off, use_b_n = 0, True
    return d


# IDP tableaus (remhos_solvers.cpp:251-279)
IDP_TABLEAUS = {
    12: dict(s=2, a=[.5], b=[0., 1.], c=[.5]),
    13: dict(s=3, a=[1. / 3., 0., 2. / 3.], b=[.25, 0., .75],
             c=[1. / 3., 2. / 3.]),
    14: dict(s=4, a=[1. / 3., -1. / 3., 1., 1., -1., 1.],
             b=[1. / 8., 3. / 8., 3. / 8., 1. / 8.], c=[1. / 3., 2. / 3., 1.]),
    16: dict(s=6,
             a=[.25, 1. / 8., 1. / 8., 0., -.5, 1., 3. / 16., 0., 0., 9. / 16.,
                -3. / 7., 2. / 7., 12. / 7., -12. / 7., 8. / 7.],
             b=[7. / 90., 0., 32. / 90., 12. / 90., 32. / 90., 7. / 90.],
             c=[.25, .25, .5, .75, 1.]),
}


def kahan_add(u, c, delta):
    """Neumaier-compensated state accumulation: (u + c) + delta carried as
    a hi/lo f32 pair. Removes the systematic ~0.6-ulp/step rounding bias
    of the plain RK combine `u += delta` (measured 3.7e-8/step relative
    mass drift on the f32 production path; with compensation the state
    accumulation is exact to O(eps^2) and only stage-compute round-off
    remains). Returns (u_new, c_new)."""
    import jax.numpy as jnp

    y = delta + c
    t = u + y
    # Neumaier branch: valid whichever addend dominates
    c_new = jnp.where(jnp.abs(u) >= jnp.abs(y), (u - t) + y, (y - t) + u)
    return t, c_new


def make_mass_closure(mlk, sig, m_target):
    """Conservative mass closure for the f32 production loop.

    The compensated (Kahan) combine removes the state-ACCUMULATION
    rounding bias, but ~5e-9/step of stage-COMPUTE product rounding in
    the conservative sums remains (measured path-independent: identical
    on the Pallas and pure-XLA f32 paths). This closes it exactly: the
    integrator state is the Kahan pair (u, c) with u_exact = u + c, so
    the true mass functional M(t) = <ml(t), u + c> is measurable in f64
    (ml(t) from the degree-dim pseudotime polynomial,
    geometry.lumped_mass_poly) and the deficit against the t=0 invariant
    can be injected as a uniform shift of the compensation array c —
    sub-ulp amounts that a plain f32 `u +=` would round away entirely
    flow into u through the next kahan_add as they become representable.
    The reference conserves at f64 round-off (remhos.cpp:1423-1436);
    with this closure the f32 path pins <ml(t),u+c> to the initial mass
    up to O(eps^2) Kahan residue and the f32 quantization of mlk
    (~1e-10 relative over 320 steps, measured).

    The closure is NOT allowed to hide a conservation bug: close() also
    returns the f64 mass deficit it absorbed, and the caller must budget
    the ACCUMULATED injection against the known drift scale (bench.py
    asserts it; a broken FCT/lumping shows up there at 1e-3+, exactly as
    it did in the un-closed mass_rel_loss).

    mlk: [K, E, nd] poly coefficients (any dtype; stored f32 halves the
    closure's read traffic, products are exact in the f64 dot; the f32
    quantization error of the metric itself is ~eps_f32/sqrt(ndofs)
    relative on the f64-metric mass — ~1e-10 at 9e5 dofs).
    sig:  [K] f64 per-coefficient totals sum(mlk[k]).
    m_target: f64 scalar, the conserved mass.
    Returns close(u, c, t) -> (c_new, deficit) with deficit =
    m_target - <ml(t), u+c> (f64, signed — the mass injected this call).
    """
    import jax.numpy as jnp

    K = int(mlk.shape[0])
    mlk2 = mlk.reshape(K, -1)

    def close(u, c, t):
        t64 = jnp.asarray(t, jnp.float64)
        s = (u.astype(jnp.float64) + c.astype(jnp.float64)).reshape(-1)
        dots = mlk2.astype(jnp.float64) @ s                       # [K]
        tk = t64 ** jnp.arange(K)
        M = jnp.dot(dots, tk)
        S = jnp.dot(jnp.asarray(sig, jnp.float64), tk)
        deficit = jnp.asarray(m_target, jnp.float64) - M
        return c + (deficit / S).astype(c.dtype), deficit

    return close


def make_mass_closure_inc(mlk, sig, block=1024):
    """Incremental conservative mass closure: per-step f32 work only.

    The full closure (make_mass_closure) does a [K, ndofs] f64 matvec
    every step — unusable per-step on TPU v5e, where f64 is software-
    emulated: ONE 884k-element f64 dot measures 4.9 ms vs 34 us for the
    f32 matvec (230x), which showed up as 2.68 ms/stage of "steppers"
    glue and a 1959 -> 256 FOM regression in the round-4 bench.

    This variant exploits that the PREVIOUS step left the state exactly
    closed, so the new deficit is minus the mass INCREMENT, and both
    increment terms carry only O(dt)-relative magnitudes (s1 = s0 + d
    the post-step state, d the step increment):

        M(t1, s1) - M(t0, s1 - d)
            = <ml(t0), d> + <ml(t1) - ml(t0), s1>
            = sum_k t0^k <mlk, d>  +  sum_{k>=1} (t1^k - t0^k) <mlk, s1>

    with d the step's explicit Kahan increment (make_rk_step
    with_delta=True; u_new + c_new = (u + c) + d to O(eps^2)) and s1
    evaluated as fl32(u_new + c_new) — the single f32 rounding there
    enters scaled by (t1^k - t0^k) ~ O(dt), i.e. ~1e-11 relative. f32
    dot rounding likewise enters SCALED BY THE INCREMENT: ~eps_f32 *
    O(dt) * M ~ 1e-10 M per step. Block partial sums in f32 with an
    exact f64 outer sum over the ~N/block partials keep the reduction
    error at that scale independent of how XLA schedules the in-block
    tree. The residual tracking error random-walks to ~1e-9 over 320
    steps and is re-anchored by ONE exact f64 closure after the scan
    (the caller runs make_mass_closure once on the final state — 8 ms
    total, O(1) per run).

    Returns close(u_new, c_new, delta, t0, t1) -> (c_out, deficit);
    the f64 deficit is budgeted by the caller exactly like the full
    closure's.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    K = int(mlk.shape[0])
    N = int(np.prod(mlk.shape[1:]))
    nb = -(-N // block)
    pad = nb * block - N
    mlkb = jnp.pad(mlk.reshape(K, -1), ((0, 0), (0, pad))
                   ).reshape(K, nb, block)
    sig64 = jnp.asarray(sig, jnp.float64)

    def _dots(u, c, delta):
        s1 = (u + c).reshape(-1)                 # post-step state, fl32
        X = jnp.stack([delta.reshape(-1), s1])                  # [2, N]
        X = jnp.pad(X, ((0, 0), (0, pad))).reshape(2, nb, block)
        # [K, 2, nb] f32 block partials as a broadcast VPU multiply +
        # in-block tree reduce. NOT a dot_general: the [K,nb,block] x
        # [2,nb,block] batched-dot shape is MXU-hostile (864 tiny 4x2
        # matmuls; the systolic array is 128x128) and the HIGHEST-
        # precision einsum measured 112.8 us/step on v5e vs 19.1 us for
        # this form (two-length fit, /tmp/probe_closure4) at identical
        # accuracy (rel 1.4e-7 — f32 block-dot rounding either way).
        # The cross-block sum is exact f64 but SMALL (K*2*nb).
        parts = (mlkb[:, None] * X[None]).sum(-1)
        return parts.astype(jnp.float64).sum(-1)                 # [K, 2]

    def close(u, c, delta, t0, t1, coefs=None):
        dots = _dots(u, c, delta)
        if coefs is not None:
            # hot-loop form: the t-dependent f64 scalars are precomputed
            # on the HOST (closure_coefs) and enter as scan xs. The
            # in-loop t^k chains + length-4 f64 dots below lower to ~112
            # tiny UNFUSED emulated-f64 XLA ops per step on v5e (f64 is
            # software double-double) — measured 50+ us/stage of pure
            # op-dispatch overhead in the device trace.
            tk0, dtk, S = coefs
            dM = (tk0 * dots[:, 0] + dtk * dots[:, 1]).sum()
        else:
            t064 = jnp.asarray(t0, jnp.float64)
            t164 = jnp.asarray(t1, jnp.float64)
            # Python-int exponents lower to lax.integer_pow (exact
            # multiply chains); an array exponent would lower to
            # exp(k*log(t)), which is NaN at t0 = 0 on TPU.
            tk0 = jnp.stack([t064 ** k for k in range(K)])
            tk1 = jnp.stack([t164 ** k for k in range(K)])
            dM = (tk0 * dots[:, 0] + (tk1 - tk0) * dots[:, 1]).sum()
            S = jnp.dot(sig64, tk1)
        deficit = -dM
        return c + (deficit / S).astype(c.dtype), deficit

    close.coefs = lambda dt, n_steps: closure_coefs(sig, dt, n_steps)
    return close


def closure_coefs(sig, dt, n_steps):
    """Host-precomputed per-step f64 scalars for make_mass_closure_inc:
    (tk0 [n,K], dtk [n,K], S [n]) with tk0 = t0^k, dtk = t1^k - t0^k,
    S = <sig, t1^k> at t0 = i*dt, t1 = (i+1)*dt — fed to the scan as xs
    so the loop contains ZERO in-device f64 scalar-chain ops."""
    import numpy as np
    sig = np.asarray(sig, np.float64)
    K = sig.shape[0]
    i = np.arange(n_steps, dtype=np.float64)
    t0 = i * dt
    t1 = (i + 1.0) * dt
    tk0 = t0[:, None] ** np.arange(K)
    tk1 = t1[:, None] ** np.arange(K)
    return tk0, tk1 - tk0, tk1 @ sig


def make_rk_step(f, kind: int, compensated: bool = False,
                 with_delta: bool = False):
    """Standard RK step(u, t, dt) -> (u_new, aux); f(t, dt, u) -> (du, aux).

    `aux` is a scalar side channel (the LO-bounds dt ratio when -dtc 1,
    remhos.cpp:1968-1998) combined with min across stages; +inf when unused.
    The limiter dt is the full step dt for all stages (the reference calls
    adv.SetDt(dt_real) once per step, remhos.cpp:1154).

    compensated=True returns step(u, c, t, dt) -> (u_new, c_new, aux): the
    per-step increment is formed explicitly (mathematically identical to
    the nested update, e.g. RK3-SSP's u/3 + 2/3(y2 + dt k3) ==
    u + dt/6 (k1 + k2 + 4 k3)) and Kahan/Neumaier-accumulated into the
    state with carried compensation c (see kahan_add). Intermediate stage
    states are formed exactly as in the plain path, so stage values and
    limiter decisions are unchanged; only the final combine's round-off
    differs (ulp-level).

    with_delta=True (compensated only) appends the step's explicit
    increment to the return: (u_new, c_new, aux, delta). The Kahan pair
    satisfies u_new + c_new = (u + c) + delta to O(eps^2), so delta IS
    the exact state change — the incremental mass closure
    (make_mass_closure_inc) consumes it.
    """
    import jax.numpy as jnp

    if kind == 1:
        def step(u, t, dt):
            k1, a1 = f(t, dt, u)
            return u + dt * k1, a1

        def cstep(u, c, t, dt):
            k1, a1 = f(t, dt, u)
            delta = dt * k1
            u2, c2 = kahan_add(u, c, delta)
            return u2, c2, a1, delta
    elif kind == 2:  # MFEM RK2Solver(1.0)
        def step(u, t, dt):
            k1, a1 = f(t, dt, u)
            y = u + dt * k1
            k2, a2 = f(t + dt, dt, y)
            return u + 0.5 * dt * (k1 + k2), jnp.minimum(a1, a2)

        def cstep(u, c, t, dt):
            k1, a1 = f(t, dt, u)
            y = u + dt * k1
            k2, a2 = f(t + dt, dt, y)
            delta = 0.5 * dt * (k1 + k2)
            u2, c2 = kahan_add(u, c, delta)
            return u2, c2, jnp.minimum(a1, a2), delta
    elif kind == 3:  # MFEM RK3SSPSolver
        def step(u, t, dt):
            k, a1 = f(t, dt, u)
            y = u + dt * k
            k, a2 = f(t + dt, dt, y)
            y = 0.75 * u + 0.25 * (y + dt * k)
            k, a3 = f(t + dt / 2, dt, y)
            return (u / 3.0 + 2.0 / 3.0 * (y + dt * k),
                    jnp.minimum(a1, jnp.minimum(a2, a3)))

        def cstep(u, c, t, dt):
            k1, a1 = f(t, dt, u)
            y = u + dt * k1
            k2, a2 = f(t + dt, dt, y)
            y = 0.75 * u + 0.25 * (y + dt * k2)
            k3, a3 = f(t + dt / 2, dt, y)
            delta = (dt / 6.0) * (k1 + k2 + 4.0 * k3)
            u2, c2 = kahan_add(u, c, delta)
            return u2, c2, jnp.minimum(a1, jnp.minimum(a2, a3)), delta
    elif kind == 4:  # classic RK4
        def step(u, t, dt):
            k1, a1 = f(t, dt, u)
            k2, a2 = f(t + dt / 2, dt, u + dt / 2 * k1)
            k3, a3 = f(t + dt / 2, dt, u + dt / 2 * k2)
            k4, a4 = f(t + dt, dt, u + dt * k3)
            aux = jnp.minimum(jnp.minimum(a1, a2), jnp.minimum(a3, a4))
            return u + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4), aux

        def cstep(u, c, t, dt):
            k1, a1 = f(t, dt, u)
            k2, a2 = f(t + dt / 2, dt, u + dt / 2 * k1)
            k3, a3 = f(t + dt / 2, dt, u + dt / 2 * k2)
            k4, a4 = f(t + dt, dt, u + dt * k3)
            aux = jnp.minimum(jnp.minimum(a1, a2), jnp.minimum(a3, a4))
            delta = dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            u2, c2 = kahan_add(u, c, delta)
            return u2, c2, aux, delta
    elif kind == 6:
        return make_tableau_rk_step(f, RK6_BUTCHER, compensated=compensated,
                                    with_delta=with_delta)
    else:
        raise ValueError(f"unsupported RK type {kind}")
    if not compensated:
        return step
    if with_delta:
        return cstep

    def cstep3(u, c, t, dt):
        u2, c2, aux, _ = cstep(u, c, t, dt)
        return u2, c2, aux
    return cstep3


def make_idp_step(mult_unlimited, limit_mult, kind: int, compute_mask=None,
                  use_masks=False, geometry=None):
    """IDP-RK step mirroring RKIDPSolver::Step (remhos_solvers.cpp:171-249).

    mult_unlimited(t, dt, u) -> du_unlimited
    limit_mult(t, dt, u, du) -> (du_limited, aux)
    compute_mask(u) -> bool mask, same shape as u (ComputeMask,
    remhos.cpp:1741-1796); only used when use_masks is True.
    geometry(t) -> stage geometry dict, computed once per distinct stage
    time and threaded through both halves (Advection.geometry; the
    reference likewise reuses its per-stage assembly across
    MultUnlimited/LimitMult). None keeps the plain 3-arg calls.

    With use_masks the high-order recombination is applied only on masked
    dofs; unmasked dofs keep the plain stage update (forward Euler), so
    newly activated product-field elements propagate monotonically
    (UpdateMask/AddMasked, remhos_solvers.cpp:97-147, 202-232). The
    reference driver runs UseMask(false) (remhos.cpp:502-506); masks are
    the opt-in `-um` path here, mirroring RKIDPSolver::UseMask.
    """
    import jax.numpy as jnp

    if use_masks and compute_mask is None:
        raise ValueError("use_masks requires a compute_mask function")

    if geometry is None:
        def mu(t, dt, u, _cache=None, _key=None):
            return mult_unlimited(t, dt, u)

        def lm(t, dt, u, du, _cache=None, _key=None):
            return limit_mult(t, dt, u, du)
    else:
        # stage times are t + c*dt with static c, so a per-step cache
        # keyed on c shares one geometry per distinct stage time
        def _geom(cache, key, t):
            if cache is not None and key in cache:
                return cache[key]
            g = geometry(t)
            if cache is not None:
                cache[key] = g
            return g

        def mu(t, dt, u, _cache=None, _key=None):
            return mult_unlimited(t, dt, u, geom=_geom(_cache, _key, t))

        def lm(t, dt, u, du, _cache=None, _key=None):
            return limit_mult(t, dt, u, du, geom=_geom(_cache, _key, t))

    if kind == 11:
        def step(u, t, dt):
            cache = {}
            du = mu(t, dt, u, cache, 0.0)
            du, aux = lm(t, dt, u, du, cache, 0.0)
            return u + dt * du, aux
        return step

    tab = IDP_TABLEAUS[kind]
    s = tab["s"]
    c = list(tab["c"])
    # python floats (weak-typed): np.float64 scalars would silently
    # promote an f32 state to f64 in the recombination
    d = [float(v) for v in construct_d(tab["a"], tab["b"], tab["c"], s)]

    def step(u, t, dt):
        cache = {}
        dxs = []
        aux = jnp.asarray(jnp.inf, dtype=u.dtype)
        mask = None
        # stage 0
        dt0 = c[0] * dt
        dx = mu(t, dt0, u, cache, 0.0)
        dx, a = lm(t, dt0, u, dx, cache, 0.0)
        aux = jnp.minimum(aux, a)
        dxs.append(dx)
        c_o = 0.0
        x = u
        t_stage = t
        c_next = c[1] if s > 2 else 1.0
        if c_next > c[0]:
            x = x + dt0 * dx
            t_stage = t + dt0
            c_o = c[0]
            if use_masks:
                mask = compute_mask(x)          # remhos_solvers.cpp:186
        elif use_masks:
            mask = compute_mask(x + dt0 * dx)   # remhos_solvers.cpp:191-195
        for i in range(1, s):
            c_n = c[i] if i < s - 1 else 1.0
            dc = c_n - c_o
            dct = dc * dt
            dx = mu(t_stage, dct, x, cache, c_o)
            if use_masks:
                # UpdateMask: AND with activity of the unlimited HO update
                # (remhos_solvers.cpp:127-147, 213)
                mask = mask & compute_mask(x + dct * dx)
            di = i * (i + 1) // 2
            if use_masks:
                # AddMasked: unmasked dofs keep dx (forward Euler);
                # masked dofs get the full d-recombination
                # (remhos_solvers.cpp:218-232)
                rec = dx * d[di + i]
                for j in range(i):
                    if d[di + j] != 0.0:
                        rec = rec + d[di + j] * dxs[j]
                dx = jnp.where(mask, rec, dx)
            else:
                dx = dx * d[di + i]
                for j in range(i):
                    if d[di + j] != 0.0:
                        dx = dx + d[di + j] * dxs[j]
            dx, a = lm(t_stage, dct, x, dx, cache, c_o)
            aux = jnp.minimum(aux, a)
            dxs.append(dx)
            c_next = c[i + 1] if i < s - 2 else 1.0
            if i == s - 1 or c_next > c_n:
                t_stage = t + c_n * dt
                x = x + dct * dx
                c_o = c_n
        return x, aux

    return step


# MFEM's RK6Solver: Verner's "most efficient" 8-stage 6(5) method (mfem
# ode.cpp; selected by -s 6 at remhos.cpp:492). Using the same tableau
# makes -s 6 trajectories match the reference's bit-for-bit modulo
# round-off ordering. Row sums, the quadrature conditions sum(b c^k) =
# 1/(k+1) for k<=5, the deeper trees b'Ac = 1/6, b'(c∘Ac) = 1/8,
# b'Ac² = 1/12, b'A²c = 1/24, and an empirical order-6 convergence check
# all validate these digits (tests/test_foundations.py).
RK6_BUTCHER = dict(
    c=[0.0, .6e-1, .9593333333333333333333333333333333333333e-1, .1439,
       .4973, .9725, .9995, 1.0],
    a=[[],
       [.6e-1],
       [.1923996296296296296296296296296296296296e-1,
        .7669337037037037037037037037037037037037e-1],
       [.35975e-1, 0.0, .107925],
       [1.318683415233148260919747276431735612861, 0.0,
        -5.042058063628562225427761634715637693344,
        4.220674648395413964508014358283902080483],
       [-41.87259166432751461803757780644346812905, 0.0,
        159.4325621631374917700365669070346830453,
        -122.1192135650100309202516203389242140663,
        5.531743066200053768252631238332999150076],
       [-54.43015693531650433250642051294142461271, 0.0,
        207.0672513650184644273657173866509835987,
        -158.6108137845899991828742424365058599469,
        6.991816585950242321992597280791793907096,
        -.1859723106220323397765171799549294623692e-1],
       [-54.66374178728197680241215648050386959351, 0.0,
        207.9528062553893734515824816699834244238,
        -159.2889574744995071508959805871426654216,
        7.018743740796944434698170760964252490817,
        -.1833878590504572306472782005141738268361e-1,
        -.5119484997882099077875432497245168395840e-3]],
    b=[.3438957868357036009278820124728322386520e-1, 0.0, 0.0,
       .2582624555633503404659558098586120858767,
       .4209371189673537150642551514069801967032,
       4.405396469669310170148836816197095664891,
       -176.4831190242986576151740942499002125029,
       172.3641334014150730294022582711902413315],
)


def make_tableau_rk_step(f, tab, compensated: bool = False,
                         with_delta: bool = False):
    """Generic explicit RK from a Butcher tableau; f(t, dt, u) -> (du, aux)."""
    import jax.numpy as jnp

    A, b, c = tab["a"], tab["b"], tab["c"]
    s = len(b)

    def stages(u, t, dt):
        ks = []
        aux = None
        for i in range(s):
            ui = u
            for j, aij in enumerate(A[i]):
                if aij != 0.0:
                    ui = ui + dt * aij * ks[j]
            k, a = f(t + c[i] * dt, dt, ui)
            aux = a if aux is None else jnp.minimum(aux, a)
            ks.append(k)
        return ks, aux

    def step(u, t, dt):
        ks, aux = stages(u, t, dt)
        out = u
        for i in range(s):
            if b[i] != 0.0:
                out = out + dt * b[i] * ks[i]
        return out, aux

    def cstep(u, comp, t, dt):
        ks, aux = stages(u, t, dt)
        delta = None
        for i in range(s):
            if b[i] != 0.0:
                term = dt * b[i] * ks[i]
                delta = term if delta is None else delta + term
        u2, c2 = kahan_add(u, comp, delta)
        return (u2, c2, aux, delta) if with_delta else (u2, c2, aux)

    return cstep if compensated else step
