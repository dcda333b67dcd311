"""Multiline (multi-row) MPOs for 2D partition functions.

Counterpart of reference src/operators/mpomultiline.jl:14-18: a periodic
stack of MPO rows, each either a DenseMPO or a sparse-FSM MPOHamiltonian
(the reference admits Union{SparseMPO, DenseMPO} rows). Row r acts on the
boundary MPS row r. Sparse rows flow into `leading_boundary` /
`mpo_environments` directly through their stacked site tensors — no
SVD densification pass (`to_densempo`) is required.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

from .mpo import DenseMPO, MPOHamiltonian


@dataclasses.dataclass(frozen=True)
class MPOMultiline:
    rows: Tuple[Union[DenseMPO, MPOHamiltonian], ...]

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
