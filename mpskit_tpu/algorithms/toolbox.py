"""Measurement toolbox (reference src/algorithms/toolbox.jl).

entropy, entanglement_spectrum, calc_galerkin, variance, correlation_length
and friends. Spectrum-valued functions return fixed-width arrays with
zero-padding beyond the physical rank (static shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..states.finitemps import FiniteMPS
from ..tensors.ops import leftorth, safe_xlogx
from ..environments.finite import finite_environments, stack_W
from .derivatives import ac_apply


def entanglement_spectrum(psi, bond: int = None):
    """Schmidt values across `bond` (to the right of site bond-1 for finite
    states; defaults to the middle bond / after-center bond).
    (Reference src/algorithms/toolbox.jl:65-69.)"""
    if isinstance(psi, FiniteMPS):
        if bond is None:
            bond = psi.length // 2
        p = psi.move_center(max(bond - 1, 0))
        if bond == 0:
            return jnp.ones((1,), jnp.float64)
        C = p.bond_matrix()
        S = jnp.linalg.svd(C, compute_uv=False)
        return S / jnp.maximum(jnp.linalg.norm(S), 1e-300)
    # infinite states: singular values of C[bond]
    from ..states.infinitemps import InfiniteMPS

    if isinstance(psi, InfiniteMPS):
        C = psi.C[(bond if bond is not None else 0) % psi.period]
        S = jnp.linalg.svd(C, compute_uv=False)
        return S / jnp.maximum(jnp.linalg.norm(S), 1e-300)
    raise TypeError(type(psi))


def entropy(psi, bond: int = None):
    """Von Neumann entanglement entropy at a bond
    (reference src/algorithms/toolbox.jl:2-5)."""
    S = entanglement_spectrum(psi, bond)
    p = S**2
    return -jnp.sum(safe_xlogx(p))


def calc_galerkin(psi, H, envs=None):
    """Galerkin residual ||(1 - P_tangent) H_eff AC|| at the center site
    (reference src/algorithms/toolbox.jl:17-38)."""
    if isinstance(psi, FiniteMPS):
        if envs is None:
            envs = finite_environments(psi, H)
        c = psi.center
        W = stack_W(H, psi.length)[c]
        y = ac_apply(envs.leftenv(c), W, envs.rightenv(c), psi.AC)
        AL, _ = leftorth(psi.AC)
        z = jnp.einsum("lpm,lpr->mr", AL.conj(), y)
        return jnp.linalg.norm(y - jnp.einsum("lpm,mr->lpr", AL, z))
    raise TypeError(type(psi))
