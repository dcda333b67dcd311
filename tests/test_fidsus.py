import numpy as np
import jax
import pytest

from mpskit_tpu.operators import MPOHamiltonian
from mpskit_tpu.models.spins import pauli
from mpskit_tpu.models.hamiltonians import _two_site
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.toolbox import fidelity_susceptibility

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("lam", [2.0, 4.0])
def test_fidelity_susceptibility_tfim(lam):
    # reference test/algorithms.jl:368-396: chi = |1/(16 lam^2 (lam^2-1))|
    X, _, Z, _ = pauli()
    H_X = MPOHamiltonian.from_local(X)
    H_ZZ = MPOHamiltonian.from_local(_two_site(Z, Z))
    H = H_ZZ + lam * H_X
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 16)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=120))
    chi = fidelity_susceptibility(psi, H, [H_X], envs=envs, tol=1e-8)
    expected = abs(1.0 / (16 * lam**2 * (lam**2 - 1)))
    assert abs(abs(complex(chi[0, 0])) - expected) < 1e-2
