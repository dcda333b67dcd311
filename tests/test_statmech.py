import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models.statmech import classical_ising, sixvertex
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.statmech import (
    leading_boundary, VUMPS_Boundary, VOMPS,
)
from mpskit_tpu.algorithms.expval import expectation_value

pytestmark = pytest.mark.slow


def test_classical_ising_vumps():
    # reference oracle: expectation_value of the critical classical-Ising
    # boundary = 2.5337 (reference test/algorithms.jl:185-201)
    O = classical_ising()
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 13)
    psi, envs, eps = leading_boundary(
        psi, O, VUMPS_Boundary(tol=1e-9, maxiter=200))
    lam = complex(expectation_value(psi, O, envs=envs))
    assert abs(lam.real - 2.5337) < 1e-3
    assert abs(lam.imag) < 1e-6


def test_classical_ising_vomps():
    O = classical_ising()
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, 8)
    psi, envs, eps = leading_boundary(psi, O, VOMPS(tol=1e-7, maxiter=350))
    lam = complex(expectation_value(psi, O, envs=envs))
    assert abs(lam.real - 2.5337) < 2e-3


def test_sixvertex_runs():
    O = sixvertex()
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 2, 2, 10)
    psi, envs, eps = leading_boundary(
        psi, O, VUMPS_Boundary(tol=1e-7, maxiter=200))
    lam = complex(expectation_value(psi, O, envs=envs))
    assert np.isfinite(lam.real) and abs(lam) > 0.1


def test_classical_ising_grassmann():
    # GradientGrassmann also drives leading_boundary (reference
    # find_groundstate/gradient_grassmann.jl used for statmech cost)
    from mpskit_tpu.algorithms.grassmann import GradientGrassmann

    O = classical_ising()
    psi = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, 10)
    # short VOMPS warmup, then gradient refinement
    psi, _, _ = leading_boundary(psi, O, VOMPS(tol=1e-3, maxiter=60))
    psi, envs, gnorm = leading_boundary(
        psi, O, GradientGrassmann(tol=1e-7, maxiter=200))
    lam = complex(expectation_value(psi, O, envs=envs))
    assert abs(lam.real - 2.5337) < 1e-3
    # CG plateaus at a small but finite gradient norm (same behaviour as
    # the Hamiltonian GradientGrassmann); the eigenvalue oracle above is
    # the meaningful check
    assert gnorm < 0.1
