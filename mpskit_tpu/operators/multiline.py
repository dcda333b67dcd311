"""Multiline (multi-row) MPOs for 2D partition functions.

Counterpart of reference src/operators/mpomultiline.jl: a periodic stack of
DenseMPO rows. Row r acts on the boundary MPS row r.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from .mpo import DenseMPO


@dataclasses.dataclass(frozen=True)
class MPOMultiline:
    rows: Tuple[DenseMPO, ...]

    @property
    def nrows(self) -> int:
        return len(self.rows)

    @property
    def period(self) -> int:
        return self.rows[0].period

    def row(self, r) -> DenseMPO:
        return self.rows[r % self.nrows]

    @staticmethod
    def from_mpo(mpo: DenseMPO, nrows: int = 1) -> "MPOMultiline":
        return MPOMultiline(tuple([mpo] * nrows))
