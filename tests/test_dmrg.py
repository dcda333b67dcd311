import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value


def _ed_groundenergy(H, L):
    M = H.to_matrix(L)
    return float(np.linalg.eigvalsh(M)[0])


def test_dmrg_tfim_vs_ed():
    L, g, D = 8, 1.2, 16  # D=16 >= 2^4: exact representation
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, eps = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    E = float(expectation_value(psi, H, envs=envs))
    E_exact = _ed_groundenergy(H, L)
    assert abs(E - E_exact) < 1e-8
    assert eps < 1e-8


def test_dmrg_heisenberg_vs_ed():
    L, D = 6, 12
    H = heisenberg_XXX(spin=0.5)
    psi = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D)
    psi, envs, eps = find_groundstate_dmrg(psi, H, DMRG(tol=1e-9, maxiter=60))
    E = float(expectation_value(psi, H, envs=envs))
    E_exact = _ed_groundenergy(H, L)
    assert abs(E - E_exact) < 1e-7


def test_dmrg_real_dtype():
    # real float64 path (the fast path on TPU where complex128 is absent)
    L, g, D = 8, 0.7, 16
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(2), L, 2, D, dtype=jnp.float64)
    psi, envs, eps = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    E = float(expectation_value(psi, H, envs=envs))
    E_exact = _ed_groundenergy(transverse_field_ising(g=g), L)
    assert abs(E - E_exact) < 1e-8


def test_mps_gauge_invariants():
    # AL and AR stacks are isometric on their supported blocks
    L, D = 8, 8
    psi = FiniteMPS.random(jax.random.PRNGKey(3), L, 2, D)
    psi2 = psi.move_center(4)
    from mpskit_tpu.states.finitemps import physical_bond_dims
    dims = physical_bond_dims(L, 2, D)
    for i in range(4):
        AL = psi2.ALs[i]
        gram = jnp.einsum("lpm,lpr->mr", AL.conj(), AL)
        k = dims[i + 1]
        np.testing.assert_allclose(gram[:k, :k], np.eye(k), atol=1e-11)
    for i in range(5, L):
        AR = psi2.ARs[i]
        gram = jnp.einsum("lpr,mpr->lm", AR, AR.conj())
        k = dims[i]
        np.testing.assert_allclose(gram[:k, :k], np.eye(k), atol=1e-11)
    # norm preserved under center moves
    np.testing.assert_allclose(float(psi2.norm()), float(psi.norm()), atol=1e-11)
    # overlap with itself = 1
    np.testing.assert_allclose(complex(psi.dot(psi)), 1.0, atol=1e-11)
