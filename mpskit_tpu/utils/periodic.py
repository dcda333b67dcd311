"""PeriodicArray — mod-indexed sequence (reference
src/utility/periodicarray.jl:29-82).

The framework's internal convention for unit cells is a leading axis of a
stacked `jnp.ndarray` plus `jnp.roll` (compiler-friendly; see
docs/conventions.md), so nothing inside `mpskit_tpu` needs this class.
It is provided for user code ported from the reference, where
`PeriodicArray`/`PeriodicVector` wrap every unit-cell collection: indexing
is periodic in every integer index (Python 0-based here, any integer —
negative or beyond the length — wraps with `%`).
"""

from __future__ import annotations

from typing import Iterable


class PeriodicArray:
    """1-D periodic view over any sequence. `p[i]` wraps i modulo len;
    slices are materialized over one period; iteration yields one period."""

    __slots__ = ("data",)

    def __init__(self, data: Iterable):
        self.data = list(data)
        if not self.data:
            raise ValueError("PeriodicArray cannot be empty")

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i):
        if isinstance(i, slice):
            start = 0 if i.start is None else i.start
            stop = len(self.data) if i.stop is None else i.stop
            step = 1 if i.step is None else i.step
            return [self[j] for j in range(start, stop, step)]
        return self.data[int(i) % len(self.data)]

    def __setitem__(self, i, value):
        self.data[int(i) % len(self.data)] = value

    def __iter__(self):
        return iter(self.data)

    def __repr__(self) -> str:
        return f"PeriodicArray({self.data!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, PeriodicArray):
            return self.data == other.data
        return NotImplemented

    def repeat(self, n: int) -> "PeriodicArray":
        """Tile the unit cell n times (reference `repeat`)."""
        return PeriodicArray(self.data * int(n))


PeriodicVector = PeriodicArray
