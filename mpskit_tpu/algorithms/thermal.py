"""Finite-temperature (purification) toolbox.

The reference ships the ingredients — `infinite_temperature` identity
density matrix (src/algorithms/toolbox.jl:7-10) and evolution MPOs
(src/algorithms/timestep/timeevmpo.jl) — and leaves thermal workflows to
the user. Here the workflow is first-class:

    rho(beta) = e^{-beta H}  is represented by its purification
    |rho(beta/2)> = (e^{-(beta/2) H} (x) 1) |vec 1>,

an MPS with a doubled (d^2) physical leg. Thermal averages are plain MPS
expectation values of the ket-lifted operator:

    <O>_beta = <psi| (O (x) 1) |psi> / <psi|psi>,   psi = |rho(beta/2)>.

Imaginary-time evolution reuses make_time_mpo with dt = -i*dbeta
(so exp(-i H dt) = exp(-dbeta H)), lifted to act on the ket leg only.
Everything stays on the standard FiniteMPS static-D path (MXU shapes).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..operators.mpo import MPOHamiltonian, DenseMPO
from ..states.finitemps import FiniteMPS


def purification_mps(d: int, L: int, D: int, dtype=jnp.complex128) -> FiniteMPS:
    """|vec 1>^{(x)L}: the infinite-temperature purified state (each site
    carries the maximally entangled ket-bra pair, physical dimension d^2,
    ket-major index s*d + sigma)."""
    A = np.zeros((L, D, d * d, D), np.complex128)
    v = np.eye(d).reshape(-1) / np.sqrt(d)
    A[:, 0, :, 0] = v
    return FiniteMPS.from_tensors(jnp.asarray(A, dtype))


def lift_hamiltonian(H: MPOHamiltonian) -> MPOHamiltonian:
    """H (x) 1: act with H on the ket leg of the purification (the bra leg
    rides along on an identity)."""
    W = np.asarray(H.W)
    L, w, _, d, _ = W.shape
    eye = np.eye(d)
    Wl = np.einsum("iabst,uv->iabsutv", W, eye).reshape(L, w, w, d * d, d * d)
    return MPOHamiltonian.from_dense_W(Wl)


def lift_densempo(U: DenseMPO) -> DenseMPO:
    """U (x) 1 on the doubled physical leg, site by site."""
    out = []
    for i in range(len(U.Os)):
        O = np.asarray(U.site(i))
        wl, wr, d, _ = O.shape
        eye = np.eye(d)
        out.append(jnp.asarray(
            np.einsum("abst,uv->absutv", O, eye).reshape(
                wl, wr, d * d, d * d)))
    return DenseMPO(tuple(out))


def thermal_state(H: MPOHamiltonian, L: int, beta: float, dbeta: float,
                  Dmax: int, alg=None) -> FiniteMPS:
    """Purification of rho(beta) = e^{-beta H}: evolve |vec 1> through
    beta/2 of imaginary time in steps of dbeta (the MPO approximant error
    is O(dbeta^2) per step for WII / TaylorCluster(2)). Returns a
    normalized FiniteMPS with bond dimension Dmax."""
    from .timeevmpo import make_time_mpo, WII
    from ..operators.apply import apply_densempo_finite

    if alg is None:
        alg = WII()
    nsteps = int(round((beta / 2) / dbeta))
    assert abs(nsteps * dbeta - beta / 2) < 1e-12, \
        "beta/2 must be an integer number of dbeta steps"
    U = lift_densempo(make_time_mpo(H, -1j * dbeta, alg))
    psi = purification_mps(H.physicaldim, L, Dmax, dtype=jnp.complex128)
    for _ in range(nsteps):
        psi = apply_densempo_finite(U, psi, Dmax=Dmax).normalize()
    return psi


def thermal_expectation(psi: FiniteMPS, H: MPOHamiltonian):
    """<H>_beta from the purification psi = |rho(beta/2)> (total, not
    per-site)."""
    from .expval import expectation_value

    Hl = lift_hamiltonian(H)
    es = expectation_value(psi, Hl)
    n = jnp.real(psi.dot(psi))
    return jnp.sum(jnp.real(jnp.asarray(es))) / n
