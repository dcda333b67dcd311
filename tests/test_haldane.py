import numpy as np
import jax
import pytest

from mpskit_tpu.models import heisenberg_XXX
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations_infinite,
)

pytestmark = pytest.mark.slow


def test_haldane_gap():
    """Flagship oracle: spin-1 Heisenberg Haldane gap at p = pi is
    0.41047925 (reference test/algorithms.jl:205-210, atol 1e-4).
    The fixture Hamiltonian is 4 * S.S, so the raw gap is 4x."""
    H = heisenberg_XXX(spin=1)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 3, 48)
    psi, envs, eps = find_groundstate_vumps(
        psi, H, VUMPS(tol=1e-9, maxiter=200))
    es, _ = excitations_infinite(
        H, QuasiparticleAnsatz(tol=1e-6), np.pi, psi, envs=envs, num=1)
    gap = float(es[0, 0]) / 4
    assert abs(gap - 0.41047925) < 1e-4
