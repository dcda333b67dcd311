"""Dynamic inner-solver tolerances.

Mirrors the reference's `DynamicTol`/`updatetol`
(reference src/utility/dynamictols.jl:26-58): the tolerance of inner Krylov
solves tracks the outer convergence measure, clamped to [tol_min, tol_max]
and tightened as sqrt(iter).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Defaults


def updatetol(
    epsilon,
    iter,
    tol_factor: float = Defaults.tol_factor,
    tol_min: float = Defaults.tol_min,
    tol_max: float = Defaults.tol_max,
):
    """tol = clamp(eps * factor / sqrt(iter), tol_min, tol_max).

    Works on traced values (returns a jnp scalar) as well as python floats.
    """
    return jnp.clip(epsilon * tol_factor / jnp.sqrt(jnp.maximum(iter, 1) * 1.0),
                    tol_min, tol_max)
