"""time_evolve: iterate `timestep` over a time span (reference
src/algorithms/timestep/time_evolve.jl:17-37), or evolve by repeatedly
applying a `make_time_mpo` evolution operator with variational
re-compression (the W^I/W^II method)."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..states.finitemps import FiniteMPS
from .tdvp import TDVP, TDVP2, timestep
from .timeevmpo import make_time_mpo, WII, TaylorCluster


def time_evolve(psi, H, t_span: Sequence[float], alg=None, envs=None,
                verbosity: int = 0):
    """Evolve psi through the times in t_span (pairwise steps). Returns
    (psi, envs)."""
    if alg is None:
        alg = TDVP()
    t_span = list(t_span)
    out_envs = None
    for t0, t1 in zip(t_span[:-1], t_span[1:]):
        dt = t1 - t0
        if isinstance(alg, (TDVP, TDVP2)):
            psi, out_envs = timestep(psi, H, t0, dt, alg, envs=out_envs)
        elif isinstance(alg, (WII, TaylorCluster)):
            U = make_time_mpo(H, dt, alg)
            from ..operators.apply import apply_densempo_finite

            assert isinstance(psi, FiniteMPS), \
                "MPO evolution currently targets finite states"
            psi = apply_densempo_finite(U, psi).normalize()
        else:
            raise TypeError(type(alg))
    return psi, out_envs
