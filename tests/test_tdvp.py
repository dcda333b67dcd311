import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms import expectation_value
from mpskit_tpu.algorithms.tdvp import TDVP, TDVP2, timestep
from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg


def test_tdvp_finite_energy_conservation():
    # evolve a random state: energy must be conserved (reference
    # test/algorithms.jl:96-158)
    L, D = 5, 8
    H = heisenberg_XXX(spin=0.5)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    E0 = float(expectation_value(psi, H))
    for _ in range(3):
        psi, _ = timestep(psi, H, 0.0, 0.1, TDVP())
    E1 = float(expectation_value(psi, H))
    assert abs(E1 - E0) < 1e-2
    # norm conserved
    np.testing.assert_allclose(float(psi.norm()), 1.0, atol=1e-9)


def test_tdvp_finite_groundstate_phase():
    # the ground state only picks up a phase: energy exactly conserved
    L, g, D = 6, 1.3, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=40))
    E0 = float(expectation_value(psi, H, envs=envs))
    psi_t, _ = timestep(psi, H, 0.0, 0.05, TDVP())
    E1 = float(expectation_value(psi_t, H))
    assert abs(E1 - E0) < 1e-8


@pytest.mark.slow
def test_tdvp_infinite_energy_conservation():
    D = 10
    H = heisenberg_XXX(spin=1)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 3, D)
    e0 = float(expectation_value(psi, H)[0])
    for _ in range(4):
        psi, _ = timestep(psi, H, 0.0, 0.025, TDVP())
    e1 = float(expectation_value(psi, H)[0])
    # first-order splitting: O(dt^2) energy drift per step
    assert abs(e1 - e0) < 1e-2


def test_tdvp2_finite():
    L, D = 6, 12
    H = heisenberg_XXX(spin=0.5)
    psi = FiniteMPS.random(jax.random.PRNGKey(3), L, 2, D)
    E0 = float(expectation_value(psi, H))
    psi, _ = timestep(psi, H, 0.0, 0.05, TDVP2())
    E1 = float(expectation_value(psi, H))
    assert abs(E1 - E0) < 1e-3
