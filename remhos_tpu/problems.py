"""Problem library: velocity fields, initial conditions, inflow.

Vectorized jnp re-derivations of the reference's hard-coded problem setup
(velocity_function remhos.cpp:2001-2120, u0_function :2201-2355,
s0_function :2357-2361, inflow_function :2363-2381). All functions map
point arrays x[..., dim] -> values, broadcasting over leading axes, so the
same code evaluates at projection nodes and at quadrature points inside jit.

Execution mode follows the reference convention (remhos.cpp:437-440):
problem < 10 -> transport, 10 <= problem < 20 -> remap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def exec_mode_of(problem: int) -> int:
    if problem < 10:
        return 0
    if problem < 20:
        return 1
    raise ValueError("Unspecified execution mode.")


def _ref_coords(x, bb_min, bb_max):
    """Map physical coords to the reference [-1,1] box (remhos.cpp:2005-2011)."""
    bb_min = jnp.asarray(bb_min)
    bb_max = jnp.asarray(bb_max)
    center = 0.5 * (bb_min + bb_max)
    return 2.0 * (x - center) / (bb_max - bb_min)


def velocity_function(problem: int, x, bb_min, bb_max):
    """v[..., dim] at points x[..., dim]."""
    dim = x.shape[-1]
    X = _ref_coords(x, bb_min, bb_max)
    pe = problem % 20

    if pe == 0:
        comps = {1: [1.0], 2: [np.sqrt(2. / 3.), np.sqrt(1. / 3.)],
                 3: [np.sqrt(3. / 6.), np.sqrt(2. / 6.), np.sqrt(1. / 6.)]}[dim]
        return jnp.broadcast_to(jnp.array(comps), x.shape)
    if pe in (1, 2, 4):
        w = np.pi / 2
        if dim == 1:
            return jnp.ones_like(x)
        v = [-w * X[..., 1], w * X[..., 0]] + ([jnp.zeros_like(X[..., 0])]
                                               if dim == 3 else [])
        return jnp.stack(v, axis=-1)
    if pe == 3:
        w = np.pi / 2
        if dim == 1:
            return jnp.ones_like(x)
        d = (jnp.maximum((X[..., 0] + 1.) * (1. - X[..., 0]), 0.) *
             jnp.maximum((X[..., 1] + 1.) * (1. - X[..., 1]), 0.)) ** 2
        v = [d * w * X[..., 1], -d * w * X[..., 0]] + (
            [jnp.zeros_like(d)] if dim == 3 else [])
        return jnp.stack(v, axis=-1)
    if pe == 5:
        return jnp.ones_like(x)
    if pe in (6, 7):
        if dim == 1:
            return jnp.ones_like(x)
        v = [x[..., 1], -x[..., 0]] + ([jnp.zeros_like(x[..., 0])]
                                       if dim == 3 else [])
        return jnp.stack(v, axis=-1)
    if pe == 11:
        # Gresho deformation (remap mesh motion).
        r = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        v0 = jnp.where(r < 0.2, 5.0 * x[..., 1],
                       jnp.where(r < 0.4, 2.0 * x[..., 1] / r - 5.0 * x[..., 1],
                                 0.0))
        v1 = jnp.where(r < 0.2, -5.0 * x[..., 0],
                       jnp.where(r < 0.4, -2.0 * x[..., 0] / r + 5.0 * x[..., 0],
                                 0.0))
        comps = [v0, v1] + ([jnp.zeros_like(v0)] if dim == 3 else [])
        return jnp.stack(comps, axis=-1)
    if pe in (10, 12, 13, 14, 15, 16, 17):
        # Taylor-Green deformation (remap mesh motion).
        Y = X * 0.5 + 0.5
        v0 = jnp.sin(np.pi * Y[..., 0]) * jnp.cos(np.pi * Y[..., 1])
        v1 = -jnp.cos(np.pi * Y[..., 0]) * jnp.sin(np.pi * Y[..., 1])
        if dim == 3:
            cz = jnp.cos(np.pi * Y[..., 2])
            return jnp.stack([v0 * cz, v1 * cz, jnp.zeros_like(v0)], axis=-1)
        return jnp.stack([v0, v1], axis=-1)
    raise ValueError(f"velocity not defined for problem {problem}")


def _box2d(p1, p2, theta, origin, x, y):
    s, c = np.sin(theta * np.pi / 180), np.cos(theta * np.pi / 180)
    ox, oy = origin
    xn = c * (x - ox) - s * (y - oy) + ox
    yn = s * (x - ox) + c * (y - oy) + oy
    return jnp.where((xn > p1[0]) & (xn < p2[0]) & (yn > p1[1]) & (yn < p2[1]),
                     1.0, 0.0)


def _box3d(xmin, xmax, ymin, ymax, zmin, zmax, theta, ox, oy, x, y, z):
    s, c = np.sin(theta * np.pi / 180), np.cos(theta * np.pi / 180)
    xn = c * (x - ox) - s * (y - oy) + ox
    yn = s * (x - ox) + c * (y - oy) + oy
    return jnp.where((xn > xmin) & (xn < xmax) & (yn > ymin) & (yn < ymax) &
                     (z > zmin) & (z < zmax), 1.0, 0.0)


def _cross(r1, r2):
    return r1 + r2 - r1 * r2


def _ring(rin, rout, c, y):
    r = jnp.sqrt(((y - jnp.asarray(c)) ** 2).sum(-1))
    return jnp.where((r > rin) & (r < rout), 1.0, 0.0)


def u0_function(problem: int, x, bb_min, bb_max):
    """Initial condition at points x[..., dim] (remhos.cpp:2201-2355)."""
    dim = x.shape[-1]
    X = _ref_coords(x, bb_min, bb_max)
    pe = problem % 10

    if pe in (0, 1):
        if dim == 1:
            return jnp.exp(-40.0 * (X[..., 0] - 0.5) ** 2)
        rx, ry, cx, cy, w = 0.45, 0.25, 0.0, -0.2, 10.0
        if dim == 3:
            s = 1.0 + 0.25 * jnp.cos(2 * np.pi * X[..., 2])
            rx, ry = rx * s, ry * s
        from jax.scipy.special import erfc
        return (erfc(w * (X[..., 0] - cx - rx)) * erfc(-w * (X[..., 0] - cx + rx)) *
                erfc(w * (X[..., 1] - cy - ry)) * erfc(-w * (X[..., 1] - cy + ry))
                ) / 16.0
    if pe == 2:
        rho = jnp.hypot(X[..., 0], X[..., 1])
        phi = jnp.arctan2(X[..., 1], X[..., 0])
        return jnp.sin(np.pi * rho) ** 2 * jnp.sin(3 * phi)
    if pe == 3:
        return 0.5 * (jnp.sin(np.pi * X[..., 0]) * jnp.sin(np.pi * X[..., 1]) + 1.)
    if pe == 4:
        # Zalesak solid-body-rotation trio: slotted cylinder, cone, hump.
        scale = 0.0225
        coef = 0.5 / np.sqrt(scale)
        slit = ((X[..., 0] <= -0.05) | (X[..., 0] >= 0.05) | (X[..., 1] >= 0.7))
        cone = coef * jnp.sqrt(X[..., 0] ** 2 + (X[..., 1] + 0.5) ** 2)
        hump = coef * jnp.sqrt((X[..., 0] + 0.5) ** 2 + X[..., 1] ** 2)
        cyl = jnp.where(slit & (X[..., 0] ** 2 + (X[..., 1] - 0.5) ** 2
                                <= 4 * scale), 1.0, 0.0)
        con = (1.0 - cone) * jnp.where(X[..., 0] ** 2 + (X[..., 1] + 0.5) ** 2
                                       <= 4 * scale, 1.0, 0.0)
        hmp = 0.25 * (1.0 + jnp.cos(np.pi * hump)) * jnp.where(
            (X[..., 0] + 0.5) ** 2 + X[..., 1] ** 2 <= 4 * scale, 1.0, 0.0)
        return cyl + con + hmp
    if pe == 5:
        # balls and jacks
        y = 50.0 * (x + 1.0)
        if dim == 2:
            r1 = _box2d((14., 3.), (17., 26.), -45., (15.5, 11.5),
                        y[..., 0], y[..., 1])
            r2 = _box2d((7., 10.), (32., 13.), -45., (15.5, 11.5),
                        y[..., 0], y[..., 1])
            cross = _cross(r1, r2)
            ring1 = _ring(7., 10., [40., 40.], y)
            ring2 = _ring(3., 7., [40., 20.], y)
            return cross + ring1 + ring2
        elif dim == 3:
            r1 = _box3d(7., 32., 10., 13., 10., 13., -45., 15.5, 11.5,
                        y[..., 0], y[..., 1], y[..., 2])
            r2 = _box3d(14., 17., 3., 26., 10., 13., -45., 15.5, 11.5,
                        y[..., 0], y[..., 1], y[..., 2])
            r3 = _box3d(14., 17., 10., 13., 3., 26., -45., 15.5, 11.5,
                        y[..., 0], y[..., 1], y[..., 2])
            cross = _cross(_cross(r1, r2), r3)
            c1, c2 = [40., 40., 40.], [40., 20., 20.]
            shell1 = _ring(7., 10., c1, y)
            shell2 = _ring(3., 7., c2, y)
            dom2 = cross + shell1 + shell2
            r1 = _box3d(2., 27., 30., 33., 30., 33., 0., 0., 0.,
                        y[..., 0], y[..., 1], y[..., 2])
            r2 = _box3d(9., 12., 23., 46., 30., 33., 0., 0., 0.,
                        y[..., 0], y[..., 1], y[..., 2])
            r3 = _box3d(9., 12., 30., 33., 23., 46., 0., 0., 0.,
                        y[..., 0], y[..., 1], y[..., 2])
            cross = _cross(_cross(r1, r2), r3)
            ball1 = _ring(0., 7., c1, y)
            ball2 = _ring(0., 3., c2, y)
            shell3 = _ring(7., 10., c2, y)
            dom3 = cross + ball1 + ball2 + shell3
            dom1 = 1.0 - _cross(dom2, dom3)
            return dom1 + 2.0 * dom2 + 3.0 * dom3
        raise ValueError("problem 5 not supported in 1D")
    if pe == 6:
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.where((r >= 0.15) & (r < 0.45), 1.0,
                         jnp.where((r >= 0.55) & (r < 0.85),
                                   jnp.cos(10. * np.pi * (r - 0.7) / 3.) ** 2,
                                   0.0))
    if pe == 7:
        r = jnp.linalg.norm(x, axis=-1)
        a, b, c = 0.5, 3.e-2, 0.1
        return 0.25 * (1. + jnp.tanh((r + c - a) / b)) * \
            (1. - jnp.tanh((r - c - a) / b))
    return jnp.zeros(x.shape[:-1])


def s0_function(x):
    """Product-field ratio initial condition (remhos.cpp:2357-2361)."""
    return 2.0 + jnp.sin(2 * np.pi * x[..., 0]) * jnp.sin(2 * np.pi * x[..., 1])


def inflow_function(problem: int, x):
    """Inflow BC values (remhos.cpp:2363-2381)."""
    r = jnp.linalg.norm(x, axis=-1)
    pe = problem % 10
    if pe == 6 and x.shape[-1] == 2:
        return jnp.where((r >= 0.15) & (r < 0.45), 1.0,
                         jnp.where((r >= 0.55) & (r < 0.85),
                                   jnp.cos(10. * np.pi * (r - 0.7) / 3.) ** 2,
                                   0.0))
    if pe == 7:
        a, b, c = 0.5, 3.e-2, 0.1
        return 0.25 * (1. + jnp.tanh((r + c - a) / b)) * \
            (1. - jnp.tanh((r - c - a) / b))
    return jnp.zeros(x.shape[:-1])
