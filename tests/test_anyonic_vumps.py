"""Generic anyonic infinite MPS with PER-BOND sector labels
(symmetry/anyonic.py + category.chain_bond_labels): the Ising σ chain's
fusion graph is bipartite — heights alternate {1, ψ} / {σ} on even/odd
bonds — so no uniform static sector split exists; per-bond masks make
the masked VUMPS backend cover it.

Oracle: the σ-anyon chain is exactly unitarily equivalent to the
critical TFIM (tests/test_category.py proves the finite map), so the
infinite chain's exact ground energy per anyon site is
-1/2 - 1/π (half of the critical TFIM's -1 - 2/π per spin)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpskit_tpu.symmetry import AnyonicInfiniteMPS, find_groundstate_anyonic
from mpskit_tpu.symmetry.category import (
    ising_category, fibonacci_category, chain_bond_labels, chain_masks,
)
from mpskit_tpu.models import ising_anyon_chain, golden_chain


def test_chain_bond_labels_bipartite():
    """σ-chain labels alternate {1,ψ} / {σ}; an odd unit cell with the
    bipartite seed has no consistent assignment; the default seed falls
    back to the stationary (full) support."""
    cat = ising_category()
    lab = chain_bond_labels(cat, 1, 12, 2, seed=(1,))
    assert set(lab[0]) == {0, 2} and set(lab[1]) == {1}
    with pytest.raises(ValueError):
        chain_bond_labels(cat, 1, 12, 3, seed=(1,))
    lab3 = chain_bond_labels(cat, 1, 12, 2)
    assert set(lab3[0]) == {0, 1, 2}

    # Fibonacci is aperiodic: every bond supports {1, τ}
    fib = fibonacci_category()
    labf = chain_bond_labels(fib, 1, 10, 3)
    assert all(set(row) == {0, 1} for row in labf)


def test_chain_masks_per_bond_consistency():
    """(L, D) labels: site i's mask couples bond i-1 to bond i through the
    fusion rule; a 1-D label array reproduces the old uniform broadcast."""
    cat = ising_category()
    lab = chain_bond_labels(cat, 1, 8, 2, seed=(1,))
    A, C = chain_masks(cat, 1, lab, 2)
    for i in range(2):
        left, right = lab[i - 1], lab[i]
        for l in range(8):
            for p in range(3):
                for r in range(8):
                    expect = (right[r] == p) and bool(
                        cat.N[left[l], 1, right[r]])
                    assert A[i, l, p, r] == expect
        assert np.array_equal(C[i], right[:, None] == right[None, :])

    fib = fibonacci_category()
    lab1 = np.array([0, 0, 1, 1, 1], int)
    A1, C1 = chain_masks(fib, 1, lab1, 3)
    A2, C2 = chain_masks(fib, 1, np.broadcast_to(lab1, (3, 5)), 3)
    assert np.array_equal(A1, A2) and np.array_equal(C1, C2)


@pytest.mark.slow
def test_sigma_chain_masked_vumps_exact_energy():
    """Masked VUMPS on the σ-anyon chain (period 2, alternating bond
    sectors) hits the exact critical energy -1/2 - 1/π per site with the
    fusion-path masks exactly preserved."""
    from mpskit_tpu.algorithms import VUMPS, expectation_value

    cat = ising_category()
    H = ising_anyon_chain(period=2)
    spsi = AnyonicInfiniteMPS.random(jax.random.PRNGKey(3), cat, 1,
                                     D=12, L=2, seed=(1,))
    spsi, envs, eps = find_groundstate_anyonic(
        spsi, H, VUMPS(tol=1e-8, maxiter=200, verbosity=0))
    assert eps < 1e-6
    e = float(np.mean(np.real(np.asarray(
        expectation_value(spsi.state, H, envs=envs)))))
    exact = -0.5 - 1.0 / np.pi
    assert abs(e - exact) < 5e-4, (e, exact)

    A_mask, _ = spsi.masks
    leak = float(jnp.linalg.norm(spsi.state.AL * (1 - jnp.asarray(A_mask))))
    assert leak == 0.0
    # quantum-trace entropies are finite on both bond types
    assert np.isfinite(spsi.entropy(0)) and np.isfinite(spsi.entropy(1))


def test_flat_schmidt_vectors_mix_height_sectors():
    """The measured fact behind the anyonic.py scope note: the exact
    golden-chain ground state's Schmidt vectors in the flat height-tensor
    basis are NOT height-pure (a right path segment pairs with left
    segments ending at different heights), so sector-masked bonds are a
    strictly smaller class than dense bonds for uniform-sector chains."""
    from functools import reduce

    cat = fibonacci_category()
    L = 10
    O3 = -1.0 * cat.chain_local_term(1, 0).reshape(8, 8)
    H = np.zeros((2 ** L, 2 ** L))
    for i in range(L - 2):
        H += reduce(np.kron, [np.eye(2 ** i), O3, np.eye(2 ** (L - 3 - i))])
    w, v = np.linalg.eigh(H)
    gs = v[:, 0]
    mid = L // 2
    U, s, _ = np.linalg.svd(gs.reshape(2 ** mid, 2 ** (L - mid)),
                            full_matrices=False)
    left_h = np.arange(2 ** mid) % 2      # height at the cut
    vac_weights = [float(np.sum(np.abs(U[left_h == 0, k]) ** 2))
                   for k in range(3)]
    # dominant Schmidt vectors carry BOTH sectors (pure would be 0 or 1)
    assert all(0.05 < wgt < 0.95 for wgt in vac_weights), vac_weights


@pytest.mark.slow
def test_golden_chain_masked_is_valid_but_restricted():
    """Uniform-sector case (golden chain): masked VUMPS converges to a
    genuine fixed point of the masked manifold with zero mask leak, and
    releasing the masks lets plain VUMPS continue from it down to the
    dense-optimal energy — confirming the masked class is a consistent
    (if strictly smaller) variational class; see the anyonic.py scope
    note for why dense is preferred here."""
    from mpskit_tpu.algorithms import VUMPS, expectation_value
    from mpskit_tpu.algorithms.vumps import find_groundstate_vumps
    from mpskit_tpu.states.infinitemps import InfiniteMPS

    cat = fibonacci_category()
    H = golden_chain(period=2)
    spsi = AnyonicInfiniteMPS.random(jax.random.PRNGKey(5), cat, 1,
                                     D=10, L=2)
    spsi, envs, eps = find_groundstate_anyonic(
        spsi, H, VUMPS(tol=1e-8, maxiter=200, verbosity=0))
    assert eps < 1e-6
    A_mask, _ = spsi.masks
    leak = float(jnp.linalg.norm(
        spsi.state.AL * (1 - jnp.asarray(A_mask))))
    assert leak == 0.0
    e_masked = float(np.mean(np.real(np.asarray(
        expectation_value(spsi.state, H, envs=envs)))))

    # dense reference at the same D
    psi = InfiniteMPS.random(jax.random.PRNGKey(6), 2, 2, 10,
                             dtype=jnp.float64)
    psi, envs2, _ = find_groundstate_vumps(
        psi, H, VUMPS(tol=1e-8, maxiter=200, verbosity=0))
    e_dense = float(np.mean(np.real(np.asarray(
        expectation_value(psi, H, envs=envs2)))))
    assert e_dense <= e_masked + 1e-10

    # releasing the masks recovers the dense optimum from the masked point
    psi3, envs3, _ = find_groundstate_vumps(
        spsi.state, H, VUMPS(tol=1e-9, maxiter=150, verbosity=0))
    e_released = float(np.mean(np.real(np.asarray(
        expectation_value(psi3, H, envs=envs3)))))
    assert abs(e_released - e_dense) < 1e-4, (e_released, e_dense)
