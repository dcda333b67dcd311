"""Infinite-state expectation values (reference src/algorithms/expval.jl:
111-173).

`expval_infinite_mpoham` returns the per-site energy density array ens[i]
(reference convention: the contributions that close into the final FSM
level at site i, paired with the right cap)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..states.infinitemps import InfiniteMPS
from ..operators.mpo import MPOHamiltonian, DenseMPO
from ..environments.infinite_ham import (
    hamiltonian_environments, pairing,
)


def expval_infinite_mpoham(psi: InfiniteMPS, H: MPOHamiltonian, envs=None):
    """Per-site energy density (L,) real array."""
    if envs is None:
        envs = hamiltonian_environments(psi, H)
    L, w = psi.period, H.odim
    ens = []
    for i in range(L):
        W = H.site(i).astype(psi.dtype)
        GL = envs.GLs[i]
        A = psi.AL[i]
        # push everything into the final FSM level through site i
        t = jnp.einsum("axy,ytn->axtn", GL, A)
        t = jnp.einsum("axtn,ast->xsn", t, W[:, w - 1])
        closed = jnp.einsum("xsm,xsn->mn", A.conj(), t)
        ens.append(jnp.real(pairing(closed, psi.rho_right(i).astype(psi.dtype))))
    return jnp.stack(ens)


def expval_infinite_local(psi: InfiniteMPS, O, site: int):
    AC = psi.AC[site % psi.period]
    num = jnp.einsum("lsr,st,ltr->", AC.conj(), jnp.asarray(O, psi.dtype), AC)
    den = jnp.vdot(AC, AC)
    return num / den


def expval_infinite_densempo(psi: InfiniteMPS, O: DenseMPO, envs=None):
    """Leading-eigenvalue density of a transfer MPO: <psi|O|psi> per site,
    computed from the dominant mixed fixed points
    (reference src/operators/densempo.jl:89-97). Returns lambda^(1/L)."""
    from ..environments.infinite_mpo import mpo_environments

    if envs is None:
        envs = mpo_environments(psi, O)
    return envs.lambda_cell ** (1.0 / psi.period)
