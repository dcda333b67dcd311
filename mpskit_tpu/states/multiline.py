"""Multiline MPS: a periodic stack of InfiniteMPS rows, the boundary ansatz
for 2D partition functions (reference src/states/mpsmultiline.jl +
src/utility/multiline.jl)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax

from .infinitemps import InfiniteMPS


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MPSMultiline:
    rows: Tuple[InfiniteMPS, ...]

    def tree_flatten(self):
        return tuple(self.rows), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children))

    @property
    def nrows(self) -> int:
        return len(self.rows)

    @property
    def period(self) -> int:
        return self.rows[0].period

    def row(self, r) -> InfiniteMPS:
        return self.rows[r % self.nrows]

    @staticmethod
    def from_mps(psi: InfiniteMPS, nrows: int = 1) -> "MPSMultiline":
        return MPSMultiline(tuple([psi] * nrows))
