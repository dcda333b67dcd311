"""Uniform (infinite) matrix product states — placeholder, filled in by the
infinite stack (gauging + VUMPS milestone)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class InfiniteMPS:
    """Uniform MPS in mixed canonical form over a unit cell of L sites:
    AL, AR, AC (L, D, d, D); C (L, D, D) with C[i] the bond matrix to the
    *right* of site i (reference src/states/infinitemps.jl:46-50)."""

    AL: jnp.ndarray
    AR: jnp.ndarray
    AC: jnp.ndarray
    C: jnp.ndarray

    def tree_flatten(self):
        return (self.AL, self.AR, self.AC, self.C), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def period(self) -> int:
        return self.AL.shape[0]

    def __len__(self) -> int:
        return self.period

    @property
    def D(self) -> int:
        return self.AL.shape[1]

    @property
    def physicaldim(self) -> int:
        return self.AL.shape[2]

    @property
    def dtype(self):
        return self.AL.dtype
