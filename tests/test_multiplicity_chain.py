"""Anyonic chains over multiplicity-bearing fusion categories
(`MultiplicityCategory.chain_*`): the N[a,b,c] > 1 generalization of the
Feiguin construction. Oracle: the height-basis spectra must reassemble
the concrete G-symmetric spin chain exactly (Schur decomposition of
x^{⊗L} into path-sector ⊗ irrep blocks) — the strongest possible
validation of the Rep(G) F-data, and one the reference (TensorKit
`Rep[G]` sectors) satisfies by construction."""

import numpy as np
import pytest

from mpskit_tpu.symmetry.multiplicity import (
    rep_a4, rep_s3, _intertwiners, MultiplicityCategory,
)
from mpskit_tpu.symmetry import fibonacci_category


def _spin_chain_eigs(cat, irreps, x, channel, L):
    """ED of H = -Σ_{i=1}^{L-2} Π^{(channel)}_{i,i+1} on (C^{d_x})^{⊗L}
    (pair (0,1) skipped — the `from_local` finite-window convention)."""
    dx = irreps[x].shape[1]
    CG = _intertwiners(irreps[x], irreps[x], irreps[channel],
                       int(cat.N[x, x, channel]))
    Pi = sum(C @ C.conj().T for C in CG)
    dim = dx ** L
    H = np.zeros((dim, dim), complex)
    for i in range(1, L - 1):
        H -= np.kron(np.kron(np.eye(dx ** i), Pi),
                     np.eye(dx ** (L - i - 2)))
    return np.sort(np.linalg.eigvalsh(H))


@pytest.mark.parametrize("builder,x,L", [(rep_s3, 2, 6), (rep_a4, 3, 5)])
def test_rep_chain_spectrum_reassembles_spin_chain(builder, x, L):
    """⊎_c eig(H_path(0→c)) × dim(c) == eig(H_spin) for every fusion
    channel of x⊗x — height-basis multiplicity paths carry exactly the
    Schur content of the concrete chain (Rep(A4): N[3,3,3] = 2, so the
    path basis genuinely has vertex-multiplicity labels)."""
    cat, irreps = builder(with_irreps=True)
    for channel in range(cat.n):
        if cat.N[x, x, channel] == 0:
            continue
        ev_spin = _spin_chain_eigs(cat, irreps, x, channel, L)
        evs = []
        for c in range(cat.n):
            Hp, paths = cat.chain_hamiltonian_dense(x, channel, L,
                                                    left=0, right=c)
            if len(paths):
                evs.extend(list(np.linalg.eigvalsh(Hp))
                           * int(cat.qdim[c]))
        ev_path = np.sort(np.array(evs))
        assert ev_spin.shape == ev_path.shape
        np.testing.assert_allclose(ev_spin, ev_path, atol=1e-8)


def test_multiplicity_free_reduction_matches_category_layer():
    """Lifting Fibonacci to the multiplicity layer reproduces the
    FusionCategory chain construction exactly (dense H and projector)."""
    fib = fibonacci_category()
    lifted = MultiplicityCategory.from_multiplicity_free(fib)
    P1 = fib.chain_projector(1, 0)
    P2 = lifted.chain_projector(1, 0)[:, :, :, 0, 0, :, 0, 0]
    np.testing.assert_allclose(P1, np.real(P2), atol=1e-12)
    H1, p1 = fib.chain_hamiltonian_dense(1, 0, 8)
    H2, p2 = lifted.chain_hamiltonian_dense(1, 0, 8)
    assert len(p1) == len(p2)
    np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(H1)),
                               np.sort(np.linalg.eigvalsh(H2)), atol=1e-10)


@pytest.mark.slow
def test_rep_a4_chain_mpo_dmrg():
    """The multiplicity chain MPO (physical dimension n·m = 8) feeds the
    standard algorithm stack: finite DMRG2 on the Rep(A4) x=3 chain
    reproduces the best path-sector ED ground energy (the admissible-path
    sectors are invariant subspaces; with coupling < 0 the ground state
    lies inside the lowest one)."""
    import jax
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms import find_groundstate_dmrg2, \
        expectation_value
    from mpskit_tpu.algorithms.dmrg2 import DMRG2

    cat = rep_a4()
    x, L, D = 3, 6, 24
    # the Rep(A4) Clebsch-Gordan gauge is genuinely complex (the ω/ω²
    # one-dimensionals), so the chain MPO is complex Hermitian
    H = cat.chain_mpo(x, 0, period=1, dtype=np.complex128)
    # ED reference: unconstrained best over boundary sectors (left free)
    Hp, paths = cat.chain_hamiltonian_dense(x, 0, L, left=None)
    e_ref = float(np.linalg.eigvalsh(Hp)[0])

    d = cat.n * cat.mmax
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D,
                           dtype=np.complex128)
    psi, envs, eps = find_groundstate_dmrg2(
        psi, H, DMRG2(tol=1e-10, maxiter=40, verbosity=0))
    E = float(expectation_value(psi, H, envs=envs))
    assert abs(E - e_ref) < 1e-6, (E, e_ref)


@pytest.mark.slow
def test_rep_a4_sector_resolved_dmrg2():
    """The sector-resolved two-site driver handles multiplicity
    categories: the Rep(A4) x=3 chain (vertex multiplicities on the
    physical index, q = (h, μ) with dimension n·m = 8) at full rank
    matches the multiplicity-path ED with boundary sectors fixed by the
    masks, every bond exactly height-pure."""
    import jax
    from mpskit_tpu.symmetry import (
        AnyonicFiniteMPS, find_groundstate_anyonic_dmrg2,
        anyon_bond_labels_finite,
    )
    from mpskit_tpu.algorithms import expectation_value
    from mpskit_tpu.algorithms.dmrg2 import DMRG2

    cat = rep_a4()
    x, L = 3, 5
    # full-rank D: the label allocator caps at min(paths_fwd, paths_bwd)
    probe = anyon_bond_labels_finite(cat, x, 256, L)
    D = max(int(np.sum(l >= 0)) for l in probe)
    labels = anyon_bond_labels_finite(cat, x, D, L)
    right = int(labels[-1][0])
    Hp, paths = cat.chain_hamiltonian_dense(x, 0, L, left=0, right=right)
    e_ref = float(np.linalg.eigvalsh(Hp)[0])

    H = cat.chain_mpo(x, 0, period=1, dtype=np.complex128)
    spsi = AnyonicFiniteMPS.random(jax.random.PRNGKey(0), cat, x, D, L,
                                   dtype=np.complex128)
    spsi, envs, eps = find_groundstate_anyonic_dmrg2(
        spsi, H, DMRG2(tol=1e-11, maxiter=40, verbosity=0))
    E = float(np.real(expectation_value(spsi.state, H, envs=envs)))
    assert abs(E - e_ref) < 1e-8, (E, e_ref)
    # every bond height-pure; multiplicity slots live on the physical leg
    for b in range(1, L):
        lab = spsi.labels[b]
        assert np.all(lab[lab >= 0] >= 0)
    assert np.isfinite(spsi.entropy(L // 2))
