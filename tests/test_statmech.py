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
