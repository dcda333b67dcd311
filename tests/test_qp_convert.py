import numpy as np
import jax
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.quasiparticle import qp_to_finitemps
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations_finite,
)


def test_qp_energy_consistency():
    # E(qp) from the tangent eigensolve == <phi|H|phi> - E0 of the embedded
    # FiniteMPS (reference test/states.jl:150-197 energy consistency)
    L, g, D = 8, 2.5, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    E0 = float(expectation_value(psi, H, envs=envs))
    es, qps = excitations_finite(H, QuasiparticleAnsatz(tol=1e-9), psi, num=1)
    phi = qp_to_finitemps(qps[0])
    nrm = complex(phi.dot(phi)).real
    E_embed = float(expectation_value(phi.normalize(), H))
    np.testing.assert_allclose(nrm, 1.0, atol=1e-8)  # X normalized
    np.testing.assert_allclose(E_embed - E0, float(es[0]), atol=1e-6)
