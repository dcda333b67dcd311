import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.expval import expectation_value


def tfim_exact_density(g):
    """e0 of H = -sum [Z Z + g X] per site."""
    from scipy.integrate import quad

    f = lambda k: np.sqrt(1 + g**2 - 2 * g * np.cos(k))
    val, _ = quad(f, 0, np.pi)
    return -val / np.pi


def test_vumps_tfim():
    g, D = 1.5, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D)
    psi, envs, eps = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=150))
    e = float(expectation_value(psi, H, envs=envs)[0])
    assert abs(e - tfim_exact_density(g)) < 1e-7
    assert abs(float(envs.e_density) - tfim_exact_density(g)) < 1e-7


@pytest.mark.slow
def test_vumps_tfim_two_site_cell():
    g, D = 2.0, 10
    H = transverse_field_ising(g=g, period=2)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 2, 2, D)
    psi, envs, eps = find_groundstate_vumps(psi, H, VUMPS(tol=1e-8, maxiter=150))
    ens = np.asarray(expectation_value(psi, H, envs=envs))
    assert np.allclose(ens, tfim_exact_density(g), atol=1e-7)


@pytest.mark.slow
def test_vumps_heisenberg_spin1():
    # H = 4 sum S.S ; e0/site = 4 * (-1.401484038971...)
    D = 24
    H = heisenberg_XXX(spin=1)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 3, D)
    psi, envs, eps = find_groundstate_vumps(psi, H, VUMPS(tol=1e-7, maxiter=120))
    e = float(expectation_value(psi, H, envs=envs)[0])
    assert abs(e - 4 * (-1.401484038971)) < 2e-3
