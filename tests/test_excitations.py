import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations, excitations_finite,
    excitations_infinite,
)


def _ed_spectrum(H, L, k=4):
    M = H.to_matrix(L)
    w = np.linalg.eigvalsh(M)
    return w[:k]


def test_finite_qp_tfim_vs_ed():
    # small chain: QP gap must match ED first excitation
    L, g, D = 8, 3.0, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    es, qps = excitations_finite(H, QuasiparticleAnsatz(tol=1e-8), psi, num=2)
    w = _ed_spectrum(H, L)
    gaps = w[1:3] - w[0]
    np.testing.assert_allclose(np.sort(np.asarray(es)), gaps, atol=1e-4)


@pytest.mark.slow
def test_finite_qp_tfim_large_g():
    # reference oracle: gap = 2(g-1) at g=10, rtol 1e-2
    # (reference docs/src/man/algorithms.md:150-165; uniform-field
    # convention so the bulk magnon lies below the edge modes)
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice

    L, g, D = 16, 10.0, 24
    H = transverse_field_ising_lattice(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-9, maxiter=40))
    es, _ = excitations_finite(H, QuasiparticleAnsatz(tol=1e-6), psi, num=1)
    assert abs(float(es[0]) - 2 * (g - 1)) / (2 * (g - 1)) < 1e-2


@pytest.mark.slow
def test_infinite_qp_tfim_gap():
    # TFIM H = -sum[ZZ + g X]: single-particle dispersion
    # eps(k) = 2 sqrt(1 + g^2 - 2 g cos k); gap at k=0 is 2(g-1) for g>1
    g, D = 1.5, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-10, maxiter=150))
    for p, expected in [(0.0, 2 * (g - 1)),
                        (np.pi, 2 * (g + 1))]:
        es, _ = excitations_infinite(
            H, QuasiparticleAnsatz(tol=1e-7), p, psi, envs=envs, num=1)
        assert abs(float(es[0, 0]) - expected) < 5e-3, (p, float(es[0, 0]))
