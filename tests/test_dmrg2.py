import numpy as np
import jax
import jax.numpy as jnp

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import expectation_value
from mpskit_tpu.algorithms.dmrg2 import DMRG2, find_groundstate_dmrg2
from mpskit_tpu.algorithms.toolbox import entropy, entanglement_spectrum
from mpskit_tpu.tensors.ops import truncbelow


def _ed_groundenergy(H, L):
    return float(np.linalg.eigvalsh(H.to_matrix(L))[0])


def test_dmrg2_tfim_vs_ed():
    L, g, D = 8, 1.1, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, eps = find_groundstate_dmrg2(
        psi, H, DMRG2(tol=1e-11, maxiter=40, trscheme=truncbelow(1e-9)))
    E = float(expectation_value(psi, H, envs=envs))
    assert abs(E - _ed_groundenergy(H, L)) < 1e-8


def test_entropy_bell_pairs():
    # product of singlets across the middle bond: entropy = log 2 per pair
    L, D = 6, 8
    H = heisenberg_XXX(spin=0.5)
    psi = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg2(
        psi, H, DMRG2(tol=1e-10, maxiter=40))
    S = entanglement_spectrum(psi, L // 2)
    # Schmidt values normalized
    np.testing.assert_allclose(float(jnp.sum(S**2)), 1.0, atol=1e-10)
    ent = float(entropy(psi, L // 2))
    assert 0.0 < ent < np.log(2**(L // 2)) + 1e-9
