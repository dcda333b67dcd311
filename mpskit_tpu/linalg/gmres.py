"""Linear solves (GMRES) on pytrees — replaces KrylovKit `linsolve`
(reference src/environments/mpohaminfenv.jl:95, geometric-series environment
solves; src/algorithms/excitation/exci_transfer_system.jl)."""

from __future__ import annotations

from typing import Callable, Optional

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
