"""Pytree vector-space helpers.

The reference makes its states Krylov-compatible by implementing the
VectorInterface API (reference src/states/quasiparticle_state.jl:357-411);
in JAX every pytree is already a vector — these helpers provide the inner
product / scaling / addition used by the on-device Krylov solvers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_inner(x, y):
    """<x, y> = sum of vdot over leaves (conjugate-linear in x)."""
    leaves_x = jax.tree_util.tree_leaves(x)
    leaves_y = jax.tree_util.tree_leaves(y)
    parts = [jnp.vdot(a, b) for a, b in zip(leaves_x, leaves_y)]
    return sum(parts[1:], parts[0])


def tree_norm(x):
    leaves = jax.tree_util.tree_leaves(x)
    sq = sum(jnp.sum(jnp.abs(l) ** 2) for l in leaves)
    return jnp.sqrt(sq)


def tree_scale(a, x):
    return jax.tree_util.tree_map(lambda l: a * l, x)


def tree_add(x, y, alpha=None):
    """x + alpha * y (alpha defaults to 1)."""
    if alpha is None:
        return jax.tree_util.tree_map(jnp.add, x, y)
    return jax.tree_util.tree_map(lambda a, b: a + alpha * b, x, y)


def tree_conj(x):
    return jax.tree_util.tree_map(jnp.conj, x)


def tree_real_if(x, holomorphic: bool):
    """Cast to real part when operating over a real vector space."""
    if holomorphic:
        return x
    return jax.tree_util.tree_map(lambda l: l.real, x)


def tree_zeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def tree_randn_like(key, x, dtype=None):
    leaves, treedef = jax.tree_util.tree_flatten(x)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, l in zip(keys, leaves):
        dt = dtype or l.dtype
        if jnp.issubdtype(dt, jnp.complexfloating):
            rdt = jnp.zeros((), dt).real.dtype
            out.append(
                (jax.random.normal(k, l.shape, rdt)
                 + 1j * jax.random.normal(jax.random.fold_in(k, 1), l.shape, rdt)).astype(dt)
            )
        else:
            out.append(jax.random.normal(k, l.shape, dt))
    return jax.tree_util.tree_unflatten(treedef, out)
