import numpy as np
import jax
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations_infinite_batched,
)

pytestmark = pytest.mark.slow


def test_batched_dispersion_tfim():
    # full dispersion curve in one vmapped solve:
    # eps(k) = 2 sqrt(1 + g^2 - 2 g cos k)
    g, D = 1.5, 8
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=150))
    ks = np.array([0.0, 2 * np.pi / 3, np.pi])
    es = np.asarray(excitations_infinite_batched(
        H, QuasiparticleAnsatz(tol=1e-6), ks, psi, envs=envs))
    expected = 2 * np.sqrt(1 + g**2 - 2 * g * np.cos(ks))
    np.testing.assert_allclose(es, expected, atol=5e-3)
