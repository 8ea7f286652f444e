"""1D bases and quadrature for tensor-product DG elements.

TPU-native reimplementation of the finite-element basis subset that the
reference miniapp (CEED/Remhos) pulls from MFEM:

- Bernstein ("Positive") basis for the DG solution space
  (reference: remhos.cpp:588-589, ``DG_FECollection(order, dim,
  BasisType::Positive)``). Bernstein is required for the monotonicity
  machinery: its coefficients bound the polynomial (convex hull), its
  endpoint-interpolation property makes element faces couple only through
  face dofs, and it is nonnegative so lumped masses are positive.
- Gauss-Lobatto-Legendre (GLL) nodal basis for mesh geometry
  (remhos.cpp:515-523) and for the bounds space (remhos_tools.cpp:356-362).
- Gauss-Legendre quadrature, matching MFEM's ``IntRules.Get(geom, order)``
  tensor rules used by MassIntegrator / ConvectionIntegrator /
  DGTraceIntegrator.

Everything here is *setup-time* code: plain float64 numpy, producing static
tables that the jitted compute path closes over. No torch, no MFEM.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np
from math import comb


def _binom(n: int, k: int) -> float:
    return float(comb(n, k))


# ---------------------------------------------------------------------------
# Quadrature
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def gauss_legendre(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre rule on [0, 1] (points, weights)."""
    x, w = np.polynomial.legendre.leggauss(n)
    # map [-1, 1] -> [0, 1]
    return (0.5 * (x + 1.0)), (0.5 * w)


@lru_cache(maxsize=None)
def gauss_lobatto(n: int) -> np.ndarray:
    """n Gauss-Lobatto-Legendre points on [0, 1] (includes endpoints), n >= 2.

    Interior points are the roots of P'_{n-1}; computed as eigenvalues of the
    Jacobi matrix of the (1,1) Jacobi polynomials, which is exact to roundoff.
    """
    if n == 2:
        return np.array([0.0, 1.0])
    m = n - 2  # number of interior points = roots of P'_{n-1} ~ Jacobi(1,1)_{m}
    k = np.arange(1, m, dtype=np.float64)
    # Jacobi(1,1) recurrence: subdiagonal b_k = sqrt(k(k+2)/((2k+1)(2k+3)))
    b = np.sqrt(k * (k + 2.0) / ((2.0 * k + 1.0) * (2.0 * k + 3.0)))
    J = np.diag(b, 1) + np.diag(b, -1)
    interior = np.sort(np.linalg.eigvalsh(J))
    pts = np.concatenate([[-1.0], interior, [1.0]])
    return 0.5 * (pts + 1.0)


def min_gauss_points(order: int) -> int:
    """Number of 1D Gauss points integrating polynomials of `order` exactly.

    Mirrors MFEM's IntRules.Get(geom, order) for tensor geometries, which
    returns the tensor rule with ceil((order+1)/2) points per dimension.
    """
    return order // 2 + 1


# ---------------------------------------------------------------------------
# 1D bases
# ---------------------------------------------------------------------------


def bernstein_vals(p: int, x: np.ndarray) -> np.ndarray:
    """Bernstein basis values B_i^p(x) on [0,1]; returns [len(x), p+1]."""
    x = np.asarray(x, dtype=np.float64)[:, None]
    i = np.arange(p + 1)[None, :]
    c = np.array([_binom(p, k) for k in range(p + 1)])[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        v = c * np.power(x, i) * np.power(1.0 - x, p - i)
    # 0^0 := 1 handled by np.power for integer exponents (returns 1.0), but be
    # safe at exact endpoints:
    v = np.where(np.isnan(v), 0.0, v)
    return v


def bernstein_grads(p: int, x: np.ndarray) -> np.ndarray:
    """d/dx of Bernstein basis; returns [len(x), p+1]."""
    x = np.asarray(x, dtype=np.float64)
    if p == 0:
        return np.zeros((len(x), 1))
    lower = bernstein_vals(p - 1, x)  # [nq, p]
    g = np.zeros((len(x), p + 1))
    g[:, :-1] -= p * lower
    g[:, 1:] += p * lower
    return g


def lagrange_vals(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Lagrange basis (at `nodes`) values at `x`; returns [len(x), len(nodes)]."""
    nodes = np.asarray(nodes, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(nodes)
    v = np.ones((len(x), n))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            v[:, i] *= (x - nodes[j]) / (nodes[i] - nodes[j])
    return v


def lagrange_grads(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """d/dx of Lagrange basis at `x`; returns [len(x), len(nodes)]."""
    nodes = np.asarray(nodes, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(nodes)
    g = np.zeros((len(x), n))
    for i in range(n):
        for k in range(n):
            if k == i:
                continue
            term = np.ones_like(x) / (nodes[i] - nodes[k])
            for j in range(n):
                if j == i or j == k:
                    continue
                term *= (x - nodes[j]) / (nodes[i] - nodes[j])
            g[:, i] += term
    return g


# ---------------------------------------------------------------------------
# Tensor-product helpers (lexicographic ordering, x fastest)
# ---------------------------------------------------------------------------


def tensor_vals(vals_1d: np.ndarray, dim: int) -> np.ndarray:
    """Tensor product of a 1D basis table with itself `dim` times.

    vals_1d: [nq1, nb1]  ->  [nq1**dim, nb1**dim], both lexicographic
    (x fastest) so that index = i + nb1*j + nb1^2*k.
    """
    out = vals_1d
    for _ in range(dim - 1):
        # out: [Q, B]; new axis is slower (y, then z)
        out = np.einsum("qb,rc->rqcb", out, vals_1d).reshape(
            out.shape[0] * vals_1d.shape[0], out.shape[1] * vals_1d.shape[1]
        )
    return out


def tensor_mixed(tables: list[np.ndarray]) -> np.ndarray:
    """Tensor-compose per-axis tables (axis 0 first = fastest).

    tables[a]: [nq_a, nb_a]  ->  [prod nq, prod nb], q and basis indices both
    lexicographic with axis 0 fastest.
    """
    out = tables[0]
    for t in tables[1:]:
        out = np.einsum("qb,rc->rqcb", out, t).reshape(
            out.shape[0] * t.shape[0], out.shape[1] * t.shape[1])
    return out


def tensor_mixed_grads(vals: list[np.ndarray], grads: list[np.ndarray]) -> np.ndarray:
    """Per-axis derivative tables of a mixed tensor basis: [Q, B, dim]."""
    dim = len(vals)
    return np.stack(
        [tensor_mixed([grads[a] if a == d else vals[a] for a in range(dim)])
         for d in range(dim)], axis=-1)


def tensor_grads(vals_1d: np.ndarray, grads_1d: np.ndarray, dim: int) -> np.ndarray:
    """Gradients of the `dim`-d tensor basis: [nq1**dim, nb1**dim, dim]."""
    nq1, nb1 = vals_1d.shape
    tabs = []
    for d in range(dim):
        facs = [grads_1d if a == d else vals_1d for a in range(dim)]
        out = facs[0]
        for f in facs[1:]:
            out = np.einsum("qb,rc->rqcb", out, f).reshape(
                out.shape[0] * f.shape[0], out.shape[1] * f.shape[1]
            )
        tabs.append(out)
    return np.stack(tabs, axis=-1)


# ---------------------------------------------------------------------------
# Basis bundles
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Basis1D:
    """Static 1D basis tables evaluated at a quadrature rule."""

    p: int                 # polynomial order
    kind: str              # 'bernstein' | 'gll' | 'gl' (nodal at those pts)
    qpts: np.ndarray       # [nq] on [0,1]
    qwts: np.ndarray       # [nq]
    B: np.ndarray          # [nq, p+1] values
    G: np.ndarray          # [nq, p+1] derivatives
    B0: np.ndarray         # [p+1] values at x=0
    B1: np.ndarray         # [p+1] values at x=1

    @staticmethod
    def make(p: int, kind: str, qpts: np.ndarray, qwts: np.ndarray) -> "Basis1D":
        ends = np.array([0.0, 1.0])
        if kind == "bernstein":
            B, G = bernstein_vals(p, qpts), bernstein_grads(p, qpts)
            E = bernstein_vals(p, ends)
        elif kind in ("gll", "gl", "uniform"):
            nodes = {
                "gll": lambda: gauss_lobatto(p + 1),
                "gl": lambda: gauss_legendre(p + 1)[0],
                "uniform": lambda: np.linspace(0.0, 1.0, p + 1),
            }[kind]()
            B, G = lagrange_vals(nodes, qpts), lagrange_grads(nodes, qpts)
            E = lagrange_vals(nodes, ends)
        else:
            raise ValueError(kind)
        return Basis1D(p, kind, np.asarray(qpts), np.asarray(qwts), B, G, E[0], E[1])


def nodes_1d(p: int, kind: str) -> np.ndarray:
    if kind == "bernstein" or kind == "uniform":
        return np.linspace(0.0, 1.0, p + 1)
    if kind == "gll":
        return gauss_lobatto(p + 1)
    if kind == "gl":
        return gauss_legendre(p + 1)[0]
    raise ValueError(kind)


def tensor_nodes(p: int, kind: str, dim: int) -> np.ndarray:
    """Reference-element node coordinates [ (p+1)^dim, dim ], lexicographic."""
    n1 = nodes_1d(p, kind)
    grids = np.meshgrid(*([n1] * dim), indexing="ij")
    # meshgrid 'ij' puts first axis slowest when raveled with order='C'... we
    # want x fastest: build explicitly.
    coords = np.stack([g.ravel(order="F") for g in grids], axis=-1)
    return coords
