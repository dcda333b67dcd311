"""Projection operators and linear combinations.

`ProjectionOperator(psi)` represents |psi><psi| — used as the penalty term
in excited-state searches (reference src/operators/projection.jl:8-10,
src/algorithms/excitation/dmrgexcitation.jl). `LinearCombination` applies
sum_i c_i O_i (reference src/utility/linearcombination.jl:1-7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class ProjectionOperator:
    ket: Any  # a FiniteMPS


@dataclasses.dataclass(frozen=True)
class LinearCombination:
    opps: Tuple[Any, ...]
    coeffs: Tuple[complex, ...]
