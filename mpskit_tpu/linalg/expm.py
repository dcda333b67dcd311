"""Krylov matrix-exponential application — replaces KrylovKit
`exponentiate` (reference src/algorithms/timestep/integrators.jl:20-25,
src/algorithms/timestep/timeevmpo.jl:150-207).

`expm_multiply`: y = exp(tau * A) v for Hermitian A (Lanczos + eigh of the
small tridiagonal, fully on-device). `tau` may be complex (e.g. -i*dt for
TDVP). `expm_multiply_arnoldi`: general A (Arnoldi + Pade expm of the small
Hessenberg).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm as _dense_expm

from ..utils.tree import tree_norm, tree_scale
from .basis import basis_combine
from .lanczos import lanczos_factorize, _tridiag
from .arnoldi import arnoldi_factorize


def _expm_multiply_impl(matvec: Callable, v, tau, m: int):
    n0 = tree_norm(v)
    V, alpha, beta, nvalid = lanczos_factorize(matvec, v, m)
    T = _tridiag(alpha, beta, nvalid, 0.0)
    # mask: make invalid block strictly decoupled (sentinel 0 keeps eigh sane)
    evals, evecs = jnp.linalg.eigh(T)
    e1 = jnp.zeros((m,), evecs.dtype).at[0].set(1.0)
    # exp(tau T) e1 = Q exp(tau evals) Q^H e1 — restrict to valid block via
    # the factorization itself (invalid rows are zero so they don't mix)
    coeff = evecs @ (jnp.exp(tau * evals) * (evecs.conj().T @ e1))
    y = basis_combine(V, jnp.pad(coeff, (0, 1)))  # V carries m+1 slots
    # Saad's a-posteriori estimate of the Krylov truncation error: the norm
    # of the first neglected term, |beta_last| * |coeff_last| (relative to
    # ||v||). KrylovKit's exponentiate reports the analogous info.normres,
    # which the reference surfaces when unconverged.
    last = jnp.clip(nvalid - 1, 0, m - 1)
    err = jnp.abs(beta[last]) * jnp.abs(coeff[last])
    return tree_scale(n0, y), err


@partial(jax.jit, static_argnums=(0, 3))
def expm_multiply(matvec: Callable, v, tau, m: int = 30):
    """exp(tau*A) v with A Hermitian. The Krylov dimension m is static; for
    |tau|*||A|| beyond ~10 increase m or split the step."""
    return _expm_multiply_impl(matvec, v, tau, m)[0]


@partial(jax.jit, static_argnums=(0, 3))
def expm_multiply_err(matvec: Callable, v, tau, m: int = 30):
    """exp(tau*A) v plus a relative Krylov truncation-error estimate
    (|beta_last * coeff_last|) — drivers aggregate the worst estimate per
    step and warn on the host when the Krylov dimension was too small
    (the reference's exponentiate convergence warnings)."""
    return _expm_multiply_impl(matvec, v, tau, m)


@partial(jax.jit, static_argnums=(0, 3))
def expm_multiply_arnoldi(matvec: Callable, v, tau, m: int = 30):
    """exp(tau*A) v for general A."""
    n0 = tree_norm(v)
    V, H, nvalid = arnoldi_factorize(matvec, v, m)
    mask = jnp.arange(m) < nvalid
    Hm = jnp.where(mask[:, None] & mask[None, :], H[:m, :m], 0.0)
    E = _dense_expm(tau * Hm)
    coeff = jnp.pad(E[:, 0], (0, 1))
    y = basis_combine(V, coeff)
    return tree_scale(n0, y)
