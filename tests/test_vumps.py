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


def test_vumps_scan_batch_matches_single():
    """_vumps_iterations_scan(n) == n chained _vumps_iteration calls
    (exact same math, device-side batching only), and the driver with
    device_batch > 1 converges to the same energy."""
    from mpskit_tpu.algorithms.vumps import (_vumps_iteration,
                                             _vumps_iterations_scan)

    g, D = 1.5, 8
    H = transverse_field_ising(g=g)
    psi0 = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, D)
    tol = jnp.asarray(1e-8, jnp.float64)

    # one single iteration to materialize the environment carry
    psi1, eps1, env1, _ = _vumps_iteration(psi0, H, 10, 4, 1e-10, 1e-12,
                                           tol)
    psi_a, env_a = psi1, env1
    for _ in range(3):
        psi_a, eps_a, env_a, _ = _vumps_iteration(psi_a, H, 10, 4, 1e-10,
                                                  1e-12, tol,
                                                  env_guess=env_a)
    psi_b, eps_b, env_b, diag_b = _vumps_iterations_scan(
        psi1, H, 10, 4, 1e-10, 1e-12, 3, tol, envs=env1)
    np.testing.assert_allclose(np.asarray(psi_b.AL), np.asarray(psi_a.AL),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(psi_b.C), np.asarray(psi_a.C),
                               atol=1e-12)
    assert abs(float(eps_b) - float(eps_a)) < 1e-12

    psi, envs, eps = find_groundstate_vumps(
        psi0, H, VUMPS(tol=1e-9, maxiter=40, device_batch=8))
    e = float(expectation_value(psi, H, envs=envs)[0])
    assert abs(e - tfim_exact_density(g)) < 1e-7
