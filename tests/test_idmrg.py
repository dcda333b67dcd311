import numpy as np
import jax
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.idmrg import (
    IDMRG1, IDMRG2, find_groundstate_idmrg1, find_groundstate_idmrg2,
)
from mpskit_tpu.algorithms.expval import expectation_value
from mpskit_tpu.tensors.ops import truncbelow


def tfim_exact_density(g):
    from scipy.integrate import quad

    f = lambda k: np.sqrt(1 + g**2 - 2 * g * np.cos(k))
    return -quad(f, 0, np.pi)[0] / np.pi


@pytest.mark.slow
def test_idmrg1_tfim():
    g, D = 1.4, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D)
    psi, envs, err = find_groundstate_idmrg1(
        psi, H, IDMRG1(tol=1e-10, maxiter=300))
    e = float(expectation_value(psi, H, envs=envs)[0])
    assert abs(e - tfim_exact_density(g)) < 1e-6


@pytest.mark.slow
def test_idmrg2_tfim():
    g, D = 1.4, 12
    H = transverse_field_ising(g=g, period=2)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 2, 2, D)
    psi, envs, err = find_groundstate_idmrg2(
        psi, H, IDMRG2(tol=1e-10, maxiter=200, trscheme=truncbelow(1e-10)))
    ens = np.asarray(expectation_value(psi, H, envs=envs))
    assert np.allclose(ens, tfim_exact_density(g), atol=1e-6)
