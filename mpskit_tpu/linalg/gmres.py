"""Linear solves (GMRES) on pytrees — replaces KrylovKit `linsolve`
(reference src/environments/mpohaminfenv.jl:95, geometric-series environment
solves; src/algorithms/excitation/exci_transfer_system.jl)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.scipy.sparse.linalg import gmres

from ..utils.tree import tree_norm, tree_add, tree_scale


def linsolve(matvec: Callable, b, x0=None, a0=1.0, a1=1.0, tol=1e-12,
             restart: int = 30, maxiter: int = 40):
    """Solve (a0 + a1 * A) x = b for pytree b.

    Mirrors KrylovKit's linsolve(f, b, x0, a0, a1) signature used throughout
    the reference's environment code: a0=1, a1=-1 gives (1 - T) x = b.
    """
    if x0 is None:
        x0 = b

    def op(x):
        return tree_add(tree_scale(a0, x), matvec(x), alpha=a1)

    x, _ = gmres(op, b, x0=x0, tol=tol, atol=tol * tree_norm(b),
                 restart=restart, maxiter=maxiter, solve_method="batched")
    return x


def linsolve_info(matvec: Callable, b, x0=None, a0=1.0, a1=1.0, tol=1e-12,
                  restart: int = 30, maxiter: int = 40):
    """`linsolve` that also returns the measured relative residual
    ||(a0 + a1 A) x - b|| / ||b|| (one extra matvec), so callers can surface
    non-convergence the way the reference warns on every unconverged solve
    (reference src/environments/mpohaminfenv.jl:97-98,
    src/algorithms/fixedpoint.jl:12-14 — jax.scipy's gmres returns no
    convergence history, so the residual is recomputed explicitly)."""
    if x0 is None:
        x0 = b

    def op(x):
        return tree_add(tree_scale(a0, x), matvec(x), alpha=a1)

    x, _ = gmres(op, b, x0=x0, tol=tol, atol=tol * tree_norm(b),
                 restart=restart, maxiter=maxiter, solve_method="batched")
    relres = tree_norm(tree_add(op(x), b, alpha=-1.0)) / jnp.maximum(
        tree_norm(b), 1e-30)
    return x, relres


def linsolve_cg(matvec, b, x0=None, tol=1e-10, maxiter: int = 200):
    """Hand-rolled conjugate gradient for Hermitian positive(-semi)definite
    pytree operators. Unlike jax.scipy's cg/gmres this builds no
    custom_linear_solve primitive, so it can be nested inside other solvers
    (needed by fidelity_susceptibility, whose operator itself contains GMRES
    environment solves)."""
    import jax
    import jax.numpy as jnp
    from ..utils.tree import tree_inner

    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)

    r0 = tree_add(b, matvec(x0), alpha=-1.0)
    bnorm = tree_norm(b)

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(k < maxiter,
                               tree_norm(r) > tol * jnp.maximum(bnorm, 1e-30))

    def body(state):
        x, r, p, rs, k = state
        Ap = matvec(p)
        alpha = rs / tree_inner(p, Ap)
        x = tree_add(x, p, alpha=alpha)
        r = tree_add(r, Ap, alpha=-alpha)
        rs_new = tree_inner(r, r)
        beta = rs_new / rs
        p = tree_add(r, p, alpha=beta)
        return x, r, p, rs_new, k + 1

    state = (x0, r0, r0, tree_inner(r0, r0), jnp.zeros((), jnp.int32))
    x, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x
