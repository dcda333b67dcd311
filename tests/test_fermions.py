"""Fermionic models (models/fermions.py): JW-constructed MPOs against
independent fermionic oracles (BdG free-fermion diagonalization; explicit
Fock-space operator construction)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpskit_tpu.models.fermions import (
    kitaev_chain, free_fermions, hubbard, kitaev_bdg_energy,
)


def _fock_ops(n_modes):
    """Explicit fermionic creation operators on the 2^n Fock space built
    directly from the antisymmetric algebra (independent of the MPO code's
    JW bookkeeping)."""
    dim = 2 ** n_modes
    ops = []
    for k in range(n_modes):
        M = np.zeros((dim, dim))
        for s in range(dim):
            if (s >> k) & 1:
                continue
            sgn = (-1) ** bin(s & ((1 << k) - 1)).count("1")
            M[s | (1 << k), s] = sgn
        ops.append(M)
    return ops


def test_kitaev_chain_ed_vs_fock():
    """to_matrix of the JW-built MPO equals the Fock-space Hamiltonian."""
    L, t, mu, d = 4, 1.0, 0.7, 0.4
    H = kitaev_chain(t=t, mu=mu, delta=d)
    M = np.real(H.to_matrix(L))
    cd = _fock_ops(L)
    c = [x.T for x in cd]
    Hf = np.zeros_like(M)
    for i in range(L - 1):
        Hf += -t * (cd[i] @ c[i + 1] + cd[i + 1] @ c[i])
        Hf += d * (cd[i] @ cd[i + 1] + c[i + 1] @ c[i])
    for i in range(L):
        Hf += -mu * (cd[i] @ c[i])
    # JW maps occupation bit k to qubit k; to_matrix orders site 0 as the
    # most significant qubit — compare spectra (basis-order independent)
    np.testing.assert_allclose(np.linalg.eigvalsh(M),
                               np.linalg.eigvalsh(Hf), atol=1e-10)


def test_kitaev_bdg_energy_parity():
    L, t, mu, d = 8, 1.0, 0.5, 0.3
    H = kitaev_chain(t=t, mu=mu, delta=d)
    e_ed = np.linalg.eigvalsh(np.real(H.to_matrix(L)))[0]
    e_bdg = kitaev_bdg_energy(L, t, mu, d)
    np.testing.assert_allclose(e_ed, e_bdg, atol=1e-10)


def test_hubbard_ed_vs_fock():
    """Spinful Hubbard MPO vs explicit Fock construction (mode ordering
    1up, 1dn, 2up, 2dn) — catches any internal-JW sign error."""
    L, t, U, mu = 3, 1.0, 2.5, 0.3
    H = hubbard(t=t, U=U, mu=mu)
    M = np.real(H.to_matrix(L))
    cd = _fock_ops(2 * L)   # mode 2i = i-up, 2i+1 = i-dn
    c = [x.T for x in cd]
    Hf = np.zeros_like(M)
    for i in range(L - 1):
        for s in (0, 1):
            a, b = 2 * i + s, 2 * (i + 1) + s
            Hf += -t * (cd[a] @ c[b] + cd[b] @ c[a])
    for i in range(L):
        nu, nd = cd[2 * i] @ c[2 * i], cd[2 * i + 1] @ c[2 * i + 1]
        Hf += U * (nu @ nd) - mu * (nu + nd)
    np.testing.assert_allclose(np.linalg.eigvalsh(M),
                               np.linalg.eigvalsh(Hf), atol=1e-10)


def test_hubbard_dimer_analytic():
    """Half-filled Hubbard dimer: E = (U - sqrt(U^2 + 16 t^2)) / 2."""
    t, U = 1.0, 4.0
    H = hubbard(t=t, U=U, mu=0.0)
    ev = np.linalg.eigvalsh(np.real(H.to_matrix(2)))
    e_half = (U - np.sqrt(U * U + 16 * t * t)) / 2
    assert np.min(np.abs(ev - e_half)) < 1e-10


@pytest.mark.slow
def test_kitaev_dmrg_groundstate():
    """DMRG on the Kitaev chain reproduces the BdG ground energy."""
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.find_groundstate import find_groundstate
    from mpskit_tpu.algorithms.dmrg import DMRG
    from mpskit_tpu.algorithms.expval import expectation_value

    L, t, mu, d = 12, 1.0, 0.5, 0.3
    H = kitaev_chain(t=t, mu=mu, delta=d)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, 16,
                           dtype=jnp.float64)
    psi, envs, eps = find_groundstate(psi, H, DMRG(tol=1e-9, maxiter=30,
                                                   verbosity=0))
    e = float(np.real(expectation_value(psi, H)))
    np.testing.assert_allclose(e, kitaev_bdg_energy(L, t, mu, d), atol=1e-7)


@pytest.mark.slow
def test_free_fermion_number_sector_dmrg():
    """U(1) particle-number masks (the fermionic sector machinery of
    symmetry/charges.py with phys_charges = occupation) constrain DMRG to a
    fixed filling: N=L/2 tight-binding energy = sum of the lowest L/2
    single-particle modes."""
    from mpskit_tpu.symmetry.charges import (
        SymmetricFiniteMPS, find_groundstate_symmetric,
    )
    from mpskit_tpu.algorithms.dmrg import DMRG
    from mpskit_tpu.algorithms.expval import expectation_value

    L, t = 8, 1.0
    H = free_fermions(t=t, mu=0.0, dtype=np.float64)
    k = np.pi * np.arange(1, L + 1) / (L + 1)
    e1p = -2 * t * np.cos(k)
    e_exact = np.sum(np.sort(e1p)[: L // 2])
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(1), L, (0, 1), 16,
                                     total=L // 2, dtype=jnp.float64)
    spsi, envs, eps = find_groundstate_symmetric(
        spsi, H, DMRG(tol=1e-9, maxiter=40, verbosity=0))
    e = float(np.real(expectation_value(spsi.state, H)))
    np.testing.assert_allclose(e, e_exact, atol=1e-6)
