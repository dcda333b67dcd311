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


def test_leading_boundary_sparsempo_row():
    """SparseMPO (sparse-FSM MPOHamiltonian) rows are accepted directly
    (reference mpomultiline.jl:14-18 Union{SparseMPO,DenseMPO}): a
    block-diagonal FSM whose level-0 block is the classical-Ising transfer
    matrix (level 1 a 0.5-scaled copy = structural zeros off-diagonal)
    must converge to the same boundary as the plain DenseMPO."""
    from mpskit_tpu.operators.mpo import MPOHamiltonian

    O = classical_ising()
    T = np.asarray(O.site(0))                  # (2, 2, 2, 2) dense row
    w = T.shape[0]
    W = np.zeros((1, 2 * w, 2 * w, 2, 2), T.dtype)
    W[0, :w, :w] = T
    W[0, w:, w:] = 0.5 * T
    H_sparse = MPOHamiltonian.from_dense_W(W)
    # structural zeros recorded in the static metadata
    nz = np.asarray(H_sparse.nonzero_mask)
    assert not nz[:w, w:].any() and not nz[w:, :w].any()

    psi = InfiniteMPS.random(jax.random.PRNGKey(5), 1, 2, 13)
    psi, envs, eps = leading_boundary(
        psi, H_sparse, VUMPS_Boundary(tol=1e-9, maxiter=200))
    lam = complex(expectation_value(psi, O, envs=None))
    assert abs(lam.real - 2.5337) < 1e-3


def test_multiline_sparsempo_rows():
    """MPOMultiline with mixed Dense/Sparse rows drives the multirow
    leading_boundary."""
    from mpskit_tpu.operators.mpo import MPOHamiltonian
    from mpskit_tpu.operators.multiline import MPOMultiline
    from mpskit_tpu.states.multiline import MPSMultiline

    O = classical_ising()
    T = np.asarray(O.site(0))
    H_sparse = MPOHamiltonian.from_dense_W(T[None])
    mo = MPOMultiline((O, H_sparse))
    psi = MPSMultiline(tuple(
        InfiniteMPS.random(jax.random.PRNGKey(10 + r), 1, 2, 8)
        for r in range(2)))
    psi, envs, eps = leading_boundary(
        psi, mo, VUMPS_Boundary(tol=1e-5, maxiter=40))
    lam = complex(expectation_value(psi.rows[0], O, envs=None))
    assert abs(lam.real - 2.5337) < 5e-3
