"""Lazy sums and (time-dependent) scalar-multiplied operators.

Counterparts of the reference's `LazySum` (src/operators/lazysum.jl),
`MultipliedOperator`/`TimedOperator`/`UntimedOperator`
(src/operators/multipliedoperator.jl) and the time-dependence traits
(src/operators/timedependence.jl).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Union


@dataclasses.dataclass(frozen=True)
class MultipliedOperator:
    """f * op where f is a number (UntimedOperator) or a callable of time
    (TimedOperator)."""

    op: Any
    f: Union[float, complex, Callable]

    @property
    def is_timed(self) -> bool:
        return callable(self.f)

    def coeff(self, t=0.0):
        return self.f(t) if callable(self.f) else self.f

    def eval_at(self, t=0.0):
        """Materialize into a plain scaled operator at time t."""
        return self.coeff(t) * self.op

    def __mul__(self, a):
        if callable(self.f):
            f = self.f
            return MultipliedOperator(self.op, lambda t: a * f(t))
        return MultipliedOperator(self.op, a * self.f)

    __rmul__ = __mul__


def TimedOperator(op, f: Callable) -> MultipliedOperator:
    return MultipliedOperator(op, f)


def UntimedOperator(op, c) -> MultipliedOperator:
    return MultipliedOperator(op, c)


class LazySum:
    """A lazily-evaluated sum of operators. Indexing/iteration yields the
    summands; calling with a time evaluates time-dependent coefficients
    into UntimedOperators (reference src/operators/lazysum.jl:16-48)."""

    def __init__(self, ops: Sequence):
        self.ops = list(ops)

    def __len__(self):
        return len(self.ops)

    def __iter__(self):
        return iter(self.ops)

    def __getitem__(self, i):
        return self.ops[i]

    @property
    def is_timed(self) -> bool:
        return any(isinstance(o, MultipliedOperator) and o.is_timed
                   for o in self.ops)

    def __call__(self, t) -> "LazySum":
        out = []
        for o in self.ops:
            if isinstance(o, MultipliedOperator):
                out.append(UntimedOperator(o.op, o.coeff(t)))
            else:
                out.append(o)
        return LazySum(out)

    def __add__(self, other):
        if isinstance(other, LazySum):
            return LazySum(self.ops + other.ops)
        return LazySum(self.ops + [other])

    __radd__ = __add__

    def __mul__(self, a):
        return LazySum([
            o * a if isinstance(o, MultipliedOperator) else UntimedOperator(o, a)
            for o in self.ops
        ])

    __rmul__ = __mul__

    def sum_materialized(self, t=0.0):
        """Eagerly sum the summands (requires all to support +)."""
        parts = []
        for o in self.ops:
            parts.append(o.eval_at(t) if isinstance(o, MultipliedOperator) else o)
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return total
