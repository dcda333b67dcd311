"""Fibonacci-anyon backend (symmetry/fibonacci.py) and the hard-hexagon
transfer MPO (reference examples/classic2d/1.hard-hexagon/main.jl,
MPSKitModels hard_hexagon over Vect[FibonacciAnyon])."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpskit_tpu.models import hard_hexagon, hard_hexagon_fibonacci
from mpskit_tpu.symmetry.fibonacci import (
    PHI, QDIMS, FIB_PAIRS, FibonacciInfiniteMPS, fibonacci_bond_labels,
    fibonacci_masks, fibonacci_env_mask, anyonic_schmidt, anyonic_entropy,
    leading_boundary_fibonacci,
)


def _ring_transfer(W, n):
    """Flat ring trace of an MPO over n sites: T[s-config, t-config]."""
    from itertools import product

    w, _, d, _ = W.shape
    T = np.zeros((d ** n, d ** n))
    for s in product(range(d), repeat=n):
        for t in product(range(d), repeat=n):
            M = np.eye(w)
            for i in range(n):
                M = M @ W[:, :, s[i], t[i]]
            T[int("".join(map(str, s)), d), int("".join(map(str, t)), d)] = \
                np.trace(M)
    return T


def test_hard_hexagon_fibonacci_matches_lattice_gas():
    """The F-symbol (Temperley-Lieb) height MPO and the occupation-basis
    lattice gas at z_c are the same Baxter model: ring transfer spectra
    agree ratio-by-ratio (models/statmech.py derivation)."""
    Wf = np.asarray(hard_hexagon_fibonacci().site(0))
    Wg = np.asarray(hard_hexagon().site(0))
    for n in (4, 5):
        ef = np.abs(np.linalg.eigvals(_ring_transfer(Wf, n)))
        eg = np.abs(np.linalg.eigvals(_ring_transfer(Wg, n)))
        ef = np.sort(ef[ef > 1e-10])[::-1]
        eg = np.sort(eg[eg > 1e-10])[::-1]
        assert len(ef) == len(eg)
        np.testing.assert_allclose(ef / ef[0], eg / eg[0], atol=1e-9)


def test_fibonacci_masks_and_labels():
    lab = fibonacci_bond_labels(10)
    # n_tau/n_1 ~ phi
    n1, nt = int(np.sum(lab == 0)), int(np.sum(lab == 1))
    assert n1 + nt == 10 and nt > n1
    A, C = fibonacci_masks(lab, L=3)
    assert A.shape == (3, 10, 2, 10) and C.shape == (3, 10, 10)
    # path rule: no vacuum -> vacuum step; physical index = right label
    for l in range(10):
        for r in range(10):
            assert not A[0, l, 0, r] or (lab[r] == 0 and lab[l] == 1)
            assert not A[0, l, 1, r] or lab[r] == 1
    M = fibonacci_env_mask(lab)
    assert M.shape == (3, 10, 10)
    for k, (y, x) in enumerate(FIB_PAIRS):
        assert M[k].sum() == np.sum(lab == y) * np.sum(lab == x)


def test_anyonic_entropy_quantum_trace():
    """S = -sum_a d_a sum_i p log p with sum_a d_a sum_i p = 1: check on a
    hand-built two-sector C against a direct computation."""
    from mpskit_tpu.states.infinitemps import InfiniteMPS

    lab = np.array([0, 0, 1, 1, 1])
    s = {0: np.array([0.8, 0.3]), 1: np.array([0.5, 0.2, 0.1])}
    C = np.zeros((5, 5))
    C[:2, :2] = np.diag(s[0])
    C[2:, 2:] = np.diag(s[1])
    spsi = FibonacciInfiniteMPS(
        InfiniteMPS(jnp.zeros((1, 5, 2, 5)), jnp.zeros((1, 5, 2, 5)),
                    jnp.zeros((1, 5, 2, 5)), jnp.asarray(C)[None]),
        tuple(int(x) for x in lab))
    probs = anyonic_schmidt(spsi)
    norm = sum(QDIMS[a] * float(np.sum(s[a] ** 2)) for a in (0, 1))
    for a in (0, 1):
        np.testing.assert_allclose(probs[a], s[a] ** 2 / norm, atol=1e-12)
    S = anyonic_entropy(spsi)
    S_ref = -sum(QDIMS[a] * float(np.sum(
        (s[a] ** 2 / norm) * np.log(s[a] ** 2 / norm))) for a in (0, 1))
    np.testing.assert_allclose(S, S_ref, atol=1e-12)


@pytest.mark.slow
def test_hard_hexagon_boundary_L3():
    """Boundary VUMPS with the 3-site unit cell converges on the critical
    anyonic MPO and reproduces the known per-site eigenvalue (ring-ED
    extrapolation gives lambda ~ 0.8802, reference benchmark: the
    hard-hexagon partition function per site at z_c)."""
    from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
    from mpskit_tpu.algorithms.toolbox import correlation_length, entropy
    from mpskit_tpu.states.infinitemps import InfiniteMPS

    O = hard_hexagon_fibonacci()
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 3, 2, 8,
                             dtype=jnp.float64)
    psi, envs, eps = leading_boundary(
        psi, O, VUMPS_Boundary(tol=1e-9, maxiter=250, verbosity=0))
    assert eps < 1e-5
    lam_site = float(jnp.abs(envs.lambda_cell)) ** (1 / 3)
    assert abs(lam_site - 0.8802) < 5e-3
    S = float(entropy(psi))
    xi = float(correlation_length(psi))
    assert 0.5 < S < 1.2 and xi > 5.0


@pytest.mark.slow
def test_fibonacci_masked_backend_converges():
    """The sector-masked (fusion-path) backend finds the same fixed point:
    lambda within a few permille of the ring-ED value, with the path masks
    exactly preserved."""
    O = hard_hexagon_fibonacci()
    spsi = FibonacciInfiniteMPS.random(jax.random.PRNGKey(7), 8, L=1,
                                       dtype=jnp.complex128)
    from mpskit_tpu.algorithms.statmech import VUMPS_Boundary

    spsi, envs, eps = leading_boundary_fibonacci(
        spsi, O, VUMPS_Boundary(tol=1e-8, maxiter=150, verbosity=0))
    lam = abs(complex(envs.lambda_cell))
    assert abs(lam - 0.8802) < 5e-3
    A_mask, C_mask = spsi.masks
    leak = float(jnp.linalg.norm(spsi.state.AL * (1 - jnp.asarray(A_mask))))
    assert leak < 1e-10
    S = anyonic_entropy(spsi)
    assert np.isfinite(S) and S > 0


@pytest.mark.slow
def test_anyonic_entropy_sector_recovery():
    """anyonic_entropy_state recovers the sector split of a converged
    masked state from the dense tensors alone (no labels), matching the
    label-based quantum-trace entropy exactly."""
    from mpskit_tpu.symmetry.fibonacci import anyonic_entropy_state
    from mpskit_tpu.algorithms.statmech import VUMPS_Boundary

    O = hard_hexagon_fibonacci()
    spsi = FibonacciInfiniteMPS.random(jax.random.PRNGKey(7), 8, L=1,
                                       dtype=jnp.complex128)
    spsi, envs, eps = leading_boundary_fibonacci(
        spsi, O, VUMPS_Boundary(tol=1e-8, maxiter=150, verbosity=0))
    S_lab = anyonic_entropy(spsi)
    S_rec, probs = anyonic_entropy_state(spsi.state, 0)
    assert abs(S_lab - S_rec) < 1e-9
    lab = np.asarray(spsi.labels)
    assert len(probs[0]) == int(np.sum(lab == 0))
