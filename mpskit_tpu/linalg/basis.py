"""Stacked-pytree Krylov basis helpers.

A Krylov basis over pytree vectors is stored as the same pytree with an
extra leading axis of (static) length m. Gram-Schmidt projections then become
single einsums per leaf — large, batched, MXU-friendly — instead of loops
over basis vectors.

Plays the role of KrylovKit.jl's OrthonormalBasis (the reference delegates
all Krylov linear algebra to KrylovKit, cf. reference Project.toml and
src/algorithms/groundstate/vumps.jl eigsolve calls); redesigned here as
fixed-shape stacked arrays so the whole basis lives on-device and every
reorthogonalization is one batched matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def basis_zeros(x, m: int):
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros((m,) + l.shape, l.dtype), x
    )


def basis_get(V, j):
    return jax.tree_util.tree_map(lambda l: l[j], V)


def basis_set(V, j, x):
    return jax.tree_util.tree_map(
        lambda Vl, xl: jax.lax.dynamic_update_index_in_dim(Vl, xl, j, 0), V, x
    )


def basis_inner_all(V, w):
    """c[k] = <V[k], w> for all k at once. Zero (unfilled) slots give 0."""
    leaves_V = jax.tree_util.tree_leaves(V)
    leaves_w = jax.tree_util.tree_leaves(w)
    total = None
    for Vl, wl in zip(leaves_V, leaves_w):
        m = Vl.shape[0]
        c = jnp.conj(Vl.reshape(m, -1)) @ wl.reshape(-1)
        total = c if total is None else total + c
    return total


def basis_combine(V, c):
    """x = sum_k c[k] V[k]."""
    return jax.tree_util.tree_map(
        lambda Vl: jnp.tensordot(c.astype(Vl.dtype), Vl, axes=1), V
    )
