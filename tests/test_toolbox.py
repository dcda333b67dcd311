import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.models.spins import pauli
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.toolbox import (
    variance, correlation_length, transfer_spectrum, exact_diagonalization,
    periodic_boundary_conditions, calc_galerkin,
)
from mpskit_tpu.algorithms.correlators import correlator
from mpskit_tpu.algorithms.find_groundstate import find_groundstate
from mpskit_tpu.algorithms.grassmann import (
    GradientGrassmann, find_groundstate_grassmann,
)


def test_variance_finite():
    L, g, D = 8, 1.5, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    v = float(variance(psi, H))
    assert abs(v) < 1e-7


def test_variance_infinite():
    g, D = 1.5, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=150))
    v = float(variance(psi, H, envs))
    assert v < 1e-6


def test_correlator_and_correlation_length():
    g, D = 1.2, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=200))
    X, _, Z, _ = pauli()
    js = list(range(2, 12))
    cc = np.asarray(correlator(psi, Z, Z, 1, js))
    m2 = abs(complex(correlator(psi, Z, Z, 1, 200)))
    conn = np.abs(cc) - m2
    # connected correlations decay with the correlation length
    xi = float(correlation_length(psi))
    assert xi > 0
    ratio = conn[6] / conn[2]
    xi_est = 4 / -np.log(ratio)
    assert abs(xi_est - xi) / xi < 0.35

    lams = np.asarray(transfer_spectrum(psi, num=3))
    np.testing.assert_allclose(abs(lams[0]), 1.0, atol=1e-8)


def test_exact_diagonalization():
    L, g = 8, 1.3
    H = transverse_field_ising(g=g)
    es, states = exact_diagonalization(H, L, num=2)
    w = np.linalg.eigvalsh(H.to_matrix(L))
    np.testing.assert_allclose(np.asarray(es), w[:2], atol=1e-8)


def test_pbc_vs_ed():
    L, g = 6, 1.1
    H = transverse_field_ising(g=g)
    Hp = periodic_boundary_conditions(H, L)
    # dense ring Hamiltonian
    X = np.array([[0, 1], [1, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    I = np.eye(2)

    def kronN(ops):
        out = np.array([[1.0]])
        for o in ops:
            out = np.kron(out, o)
        return out

    Hd = np.zeros((2**L, 2**L), complex)
    for i in range(L):
        j = (i + 1) % L
        ops = [I] * L
        ops[i], ops[j] = Z, Z
        Hd -= kronN(ops)
        for s in (i, j):
            ops = [I] * L
            ops[s] = X
            Hd -= (g / 2) * kronN(ops)
    M = Hp.to_matrix(L)
    np.testing.assert_allclose(M, Hd, atol=1e-12)


def test_find_groundstate_dispatch_and_grassmann():
    g, D = 2.0, 8
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, D)
    psi, envs, eps = find_groundstate(psi, H, tol=1e-8, maxiter=100)
    from scipy.integrate import quad

    exact = -quad(lambda k: np.sqrt(1 + g**2 - 2 * g * np.cos(k)),
                  0, np.pi)[0] / np.pi
    e = float(expectation_value(psi, H, envs=envs)[0])
    assert abs(e - exact) < 1e-6

    # pure gradient descent also reaches the ground state
    psi2 = InfiniteMPS.random(jax.random.PRNGKey(4), 1, 2, D)
    psi2, envs2, gn = find_groundstate_grassmann(
        psi2, H, GradientGrassmann(tol=1e-6, maxiter=400))
    e2 = float(expectation_value(psi2, H, envs=envs2)[0])
    assert abs(e2 - exact) < 1e-4
