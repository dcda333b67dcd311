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


def expval_infinite_ranged(psi: InfiniteMPS, H: MPOHamiltonian, rng,
                           envs=None):
    """Energy of the MPO Hamiltonian restricted to a window of sites
    (reference src/algorithms/expval.jl:127-152): returns f + n*e_density,
    where f is the boundary free-energy-like constant. The left environment
    at rng.start is closed with C on both layers, transferred through the
    window in the AR gauge, and paired with the right environment."""
    from ..transfermatrix.transfer import transfer_left_mpo

    if isinstance(rng, int):
        rng = range(0, rng)
    if envs is None:
        envs = hamiltonian_environments(psi, H)
    L = psi.period
    start, stop = rng.start, rng.stop - 1  # inclusive stop site
    dtype = psi.dtype

    C0 = psi.C[(start - 1) % L].astype(dtype)
    # close the left env onto the bond basis: x[a, bra, ket]
    x = jnp.einsum("axy,xm,yn->amn", envs.GLs[start % L], C0.conj(), C0)
    for i in range(start, stop + 1):
        W = H.site(i).astype(dtype)
        A = psi.AR[i % L]
        x = transfer_left_mpo(x, W, A, A)
    tot = jnp.einsum("axy,axy->", x, envs.GRs[stop % L])
    return tot
