"""General fusion-category layer (symmetry/category.py) — the abstraction
over the hand-written Fibonacci/SU(2) backends (reference: TensorKit
sector machinery; anyonic chains per Feiguin et al. PRL 98, 160409).

Oracles: pentagon/unitarity equations, Temperley-Lieb algebra of the
chain projectors, the exact unitary equivalence of the Ising-anyon chain
with the critical TFIM, and agreement of the generic machinery with the
hand-written Fibonacci backend."""

import dataclasses
from functools import reduce

import numpy as np
import pytest

from mpskit_tpu.symmetry.category import (
    FusionCategory, fibonacci_category, ising_category, zn_category,
    fibonacci_braided, ising_braided, zn_braided,
    su2k_category, su2k_braided,
    bond_labels, chain_masks, quantum_schmidt, quantum_entropy,
)

CATS = {
    "fibonacci": fibonacci_category,
    "ising": ising_category,
    "z3": lambda: zn_category(3),
    "z5": lambda: zn_category(5),
}


@pytest.mark.parametrize("name", sorted(CATS))
def test_category_axioms(name):
    cat = CATS[name]()
    cat.check_fusion()
    cat.check_unitarity()
    cat.check_pentagon()


def test_pentagon_validator_has_teeth():
    """A wrong associator sign must fail the pentagon equation."""
    cat = ising_category()
    F = cat.F.copy()
    F[2, 1, 2, 1, 1, 1] = +1.0          # flip [F^{psi sigma psi}_sigma]
    bad = dataclasses.replace(cat, F=F)
    with pytest.raises(AssertionError):
        bad.check_pentagon()


@pytest.mark.parametrize("name,x", [("fibonacci", 1), ("ising", 1)])
def test_chain_projector_structure(name, x):
    """P^(c) is a Hermitian idempotent for every fixed neighbor pair."""
    cat = CATS[name]()
    P = cat.chain_projector(x, 0)
    for a in range(cat.n):
        for d in range(cat.n):
            M = P[a, d]
            np.testing.assert_allclose(M, M.conj().T, atol=1e-14)
            np.testing.assert_allclose(M @ M, M, atol=1e-13)


def _site_projectors(cat, x, channel, L, left=0, right=None):
    """Dense per-site projector operators in the admissible path basis."""
    paths = cat.path_basis(x, L, left=left, right=right)
    idx = {tuple(p): i for i, p in enumerate(map(tuple, paths))}
    P = cat.chain_projector(x, channel)
    ops = []
    for site in range(1, L - 1):
        M = np.zeros((len(paths), len(paths)))
        for i, p in enumerate(map(list, paths)):
            a, h, d = p[site - 1], p[site], p[site + 1]
            for hp in range(cat.n):
                amp = P[a, d, hp, h]
                if amp:
                    q = list(p)
                    q[site] = hp
                    j = idx.get(tuple(q))
                    if j is not None:
                        M[j, i] += amp
        ops.append(M)
    return ops, paths


@pytest.mark.parametrize("name,x", [("fibonacci", 1), ("ising", 1)])
def test_temperley_lieb_algebra(name, x):
    """e_i = d_x P^(1)_i satisfy the TL relations e_i^2 = d e_i,
    e_i e_{i±1} e_i = e_i, [e_i, e_j] = 0 for |i-j| >= 2 — a nontrivial
    joint check of the F-data and the height-basis projector wiring."""
    cat = CATS[name]()
    d = cat.qdim[x]
    ops, _ = _site_projectors(cat, x, 0, 6)
    es = [d * M for M in ops]
    for i, ei in enumerate(es):
        np.testing.assert_allclose(ei @ ei, d * ei, atol=1e-12)
        for j, ej in enumerate(es):
            if abs(i - j) >= 2:
                np.testing.assert_allclose(ei @ ej, ej @ ei, atol=1e-12)
        if i + 1 < len(es):
            np.testing.assert_allclose(es[i] @ es[i + 1] @ es[i],
                                       es[i], atol=1e-12)
            np.testing.assert_allclose(es[i + 1] @ es[i] @ es[i + 1],
                                       es[i + 1], atol=1e-12)


@pytest.mark.parametrize("L", [6, 8, 10])
def test_ising_anyon_chain_is_critical_tfim(L):
    """The σ-anyon chain H = -Σ P^(1)_i with a vacuum left boundary is
    exactly unitarily equivalent to the critical open TFIM on L/2 spins:
    even heights are the spins, even-site projectors are (1+X)/2, odd-site
    projectors are (1+ZZ)/2 (standard anyonic-chain ↔ Ising mapping)."""
    cat = ising_category()
    H, paths = cat.chain_hamiltonian_dense(1, 0, L)
    X = np.array([[0, 1], [1, 0.]])
    Z = np.diag([1, -1.])
    I = np.eye(2)

    def kron(ops):
        return reduce(np.kron, ops)

    m = L // 2
    Hs = np.zeros((2 ** m, 2 ** m))
    for k in range(m - 1):
        Hs -= 0.5 * (kron([I] * k + [X] + [I] * (m - 1 - k))
                     + np.eye(2 ** m))
        Hs -= 0.5 * (kron([I] * k + [Z, Z] + [I] * (m - 2 - k))
                     + np.eye(2 ** m))
    np.testing.assert_allclose(np.linalg.eigvalsh(H),
                               np.linalg.eigvalsh(Hs), atol=1e-10)


def test_chain_mpo_matches_path_ed():
    """MPOHamiltonian over the unconstrained height tensor basis: the
    admissible-path sector is invariant and contains the ground state, so
    the tensor-basis ground energy equals the path-basis ED energy and the
    low path levels embed in the tensor spectrum (golden chain L=10)."""
    cat = fibonacci_category()
    L = 10
    Hp, _ = cat.chain_hamiltonian_dense(1, 0, L, left=None)
    H = cat.chain_mpo(1, 0).to_matrix(L)
    evp = np.linalg.eigvalsh(Hp)
    ev = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(ev[0], evp[0], atol=1e-10)
    for e in evp[:5]:
        assert np.min(np.abs(ev - e)) < 1e-9


def test_generic_machinery_reduces_to_fibonacci_backend():
    """bond_labels/chain_masks/quantum_entropy reproduce the hand-written
    Fibonacci backend exactly."""
    from mpskit_tpu.symmetry.fibonacci import (
        fibonacci_bond_labels, fibonacci_masks, QDIMS,
    )

    fib = fibonacci_category()
    np.testing.assert_allclose(fib.qdim, QDIMS)
    for D in (7, 10, 16):
        labf = fibonacci_bond_labels(D)
        labg = bond_labels(fib, D)
        assert np.array_equal(labf, labg)
        Af, Cf = fibonacci_masks(labf, 3)
        Ag, Cg = chain_masks(fib, 1, labg, 3)
        assert np.array_equal(Af, Ag)
        assert np.array_equal(Cf, Cg)

    # quantum-trace entropy on a random block-diagonal gauge
    rng = np.random.default_rng(0)
    lab = bond_labels(fib, 12)
    C = np.zeros((12, 12))
    for a in (0, 1):
        idx = np.where(lab == a)[0]
        C[np.ix_(idx, idx)] = rng.normal(size=(len(idx), len(idx)))
    probs = quantum_schmidt(fib, lab, C)
    total = sum(fib.qdim[a] * p.sum() for a, p in probs.items())
    np.testing.assert_allclose(total, 1.0, atol=1e-12)
    S = quantum_entropy(fib, lab, C)
    Sref = -sum(fib.qdim[a] * float(np.sum(p[p > 0] * np.log(p[p > 0])))
                for a, p in probs.items())
    np.testing.assert_allclose(S, Sref, atol=1e-12)


@pytest.mark.slow
@pytest.mark.parametrize("name,x,L,D", [("fibonacci", 1, 12, 24),
                                        ("ising", 1, 10, 24)])
def test_anyon_chain_dmrg_vs_path_ed(name, x, L, D):
    """Finite DMRG on the height-basis chain MPO reproduces the
    admissible-path ED ground energy — the category layer feeds the full
    algorithm stack unmodified (golden chain / Ising-anyon chain)."""
    import jax
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms import (
        DMRG, find_groundstate_dmrg, expectation_value,
    )

    from mpskit_tpu.models import golden_chain, ising_anyon_chain

    cat = CATS[name]()
    H = golden_chain() if name == "fibonacci" else ising_anyon_chain()
    Hp, _ = cat.chain_hamiltonian_dense(x, 0, L, left=None)
    e_ref = float(np.linalg.eigvalsh(Hp)[0])
    psi = FiniteMPS.random(jax.random.PRNGKey(2), L, cat.n, D)
    psi, envs, eps = find_groundstate_dmrg(
        psi, H, DMRG(tol=1e-9, maxiter=60))
    E = float(expectation_value(psi, H, envs=envs))
    assert abs(E - e_ref) < 1e-7, (E, e_ref)


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_su2k_axioms(k):
    """Quantum-6j F-symbols of su(2)_k satisfy pentagon + unitarity, with
    the truncated Clebsch-Gordan fusion ring and d_a = [a+1]_q."""
    cat = su2k_category(k)
    cat.check_fusion()
    cat.check_unitarity(atol=1e-10)
    cat.check_pentagon(atol=1e-10)
    t = np.pi / (k + 2)
    np.testing.assert_allclose(
        cat.qdim, [np.sin((a + 1) * t) / np.sin(t) for a in range(k + 1)],
        atol=1e-14)


BRAIDED = {
    "fibonacci": fibonacci_braided,
    "ising": ising_braided,
    "z5": lambda: zn_braided(5),
    "su2_2": lambda: su2k_braided(2),
    "su2_3": lambda: su2k_braided(3),
}


@pytest.mark.parametrize("name", sorted(BRAIDED))
def test_braiding_hexagon_and_ribbon(name):
    """R-symbols satisfy both hexagon equations and the monodromy-twist
    (ribbon) relation R^{ba}_c R^{ab}_c = θ_c/(θ_a θ_b)."""
    cat = BRAIDED[name]()
    cat.check_hexagon(atol=1e-10)
    cat.check_ribbon(atol=1e-10)


def test_hexagon_validator_has_teeth():
    """A wrong R-phase must fail the hexagon equation."""
    cat = fibonacci_braided()
    R = cat.R.copy()
    R[1, 1, 1] = np.exp(-3j * np.pi / 5)   # wrong chirality on one entry
    bad = dataclasses.replace(cat, R=R)
    with pytest.raises(AssertionError):
        bad.check_hexagon()


def test_topological_invariants():
    """Twists, S-matrices, chiral central charges and Frobenius-Schur
    indicators against the exact MTC data (Kitaev, Ann. Phys. 321 (2006),
    tables; reference counterpart: TensorKit sector twists/braids)."""
    phi = (1 + np.sqrt(5)) / 2

    fib = fibonacci_braided()
    np.testing.assert_allclose(
        np.angle(fib.twists()) / (2 * np.pi) % 1, [0.0, 2 / 5], atol=1e-12)
    np.testing.assert_allclose(
        fib.s_matrix(), np.array([[1, phi], [phi, -1]]) / np.sqrt(2 + phi),
        atol=1e-12)
    np.testing.assert_allclose(fib.central_charge(), 14 / 5, atol=1e-10)
    assert fib.is_modular()

    isg = ising_braided()
    np.testing.assert_allclose(
        np.angle(isg.twists()) / (2 * np.pi) % 1, [0.0, 1 / 16, 1 / 2],
        atol=1e-12)
    s = np.sqrt(2.0)
    np.testing.assert_allclose(
        isg.s_matrix(),
        np.array([[1, s, 1], [s, 0, -s], [1, -s, 1]]) / 2, atol=1e-12)
    np.testing.assert_allclose(isg.central_charge(), 1 / 2, atol=1e-10)
    assert isg.is_modular()

    # su(2)_k: h_j = j(j+1)/(k+2), c = 3k/(k+2)
    for k in (2, 3):
        cat = su2k_braided(k)
        hs = [a / 2 * (a / 2 + 1) / (k + 2) % 1 for a in range(k + 1)]
        np.testing.assert_allclose(
            np.angle(cat.twists()) / (2 * np.pi) % 1, hs, atol=1e-12)
        np.testing.assert_allclose(
            cat.central_charge(), 3 * k / (k + 2), atol=1e-10)
        assert cat.is_modular()

    # FS indicator distinguishes Ising sigma (+1) from su(2)_2 spin-1/2
    # (-1) although the fusion rings coincide
    assert isg.frobenius_schur(1) == +1
    assert su2k_braided(2).frobenius_schur(1) == -1


def test_su2k_chains_reduce_to_known_categories():
    """Vacuum-anchored su(2)_3 chains of j=1 anyons are the golden chain
    (heights stay on the integer subring ≅ Fibonacci); su(2)_2 chains of
    spin-1/2 anyons have the Ising-anyon chain spectrum — F-gauge
    differences (FS sign) drop out of the spectra."""
    for L in (6, 8):
        Hg, _ = su2k_category(3).chain_hamiltonian_dense(2, 0, L)
        Hf, _ = fibonacci_category().chain_hamiltonian_dense(1, 0, L)
        assert Hg.shape == Hf.shape
        np.testing.assert_allclose(np.linalg.eigvalsh(Hg),
                                   np.linalg.eigvalsh(Hf), atol=1e-12)
        H2, _ = su2k_category(2).chain_hamiltonian_dense(1, 0, L)
        Hi, _ = ising_category().chain_hamiltonian_dense(1, 0, L)
        np.testing.assert_allclose(np.linalg.eigvalsh(H2),
                                   np.linalg.eigvalsh(Hi), atol=1e-12)


def test_rsos_chain_family():
    """models.rsos_chain: k=2 has the Ising-anyon chain spectrum (the two
    categories share the fusion ring; the FS-indicator gauge difference in
    F drops out under conjugation); k=3 ground energy over the
    unconstrained tensor basis matches the admissible-path ED (4-height
    RSOS chain, L=5)."""
    from mpskit_tpu.models import rsos_chain, ising_anyon_chain

    L = 6
    H2 = rsos_chain(2).to_matrix(L)
    Hi = ising_anyon_chain().to_matrix(L)
    np.testing.assert_allclose(np.linalg.eigvalsh(H2),
                               np.linalg.eigvalsh(Hi), atol=1e-11)

    L = 5
    cat3 = su2k_category(3)
    Hp, _ = cat3.chain_hamiltonian_dense(1, 0, L, left=None)
    ev = np.linalg.eigvalsh(rsos_chain(3).to_matrix(L))
    evp = np.linalg.eigvalsh(Hp)
    np.testing.assert_allclose(ev[0], evp[0], atol=1e-10)


def test_zn_degenerate_case_matches_abelian_rules():
    """Z_n as a fusion category: the chain mask over x=1 enforces exactly
    the abelian charge-increment rule label_r = label_l + 1 mod n."""
    cat = zn_category(4)
    lab = np.array([0, 1, 2, 3, 0, 1], int)
    A, C = chain_masks(cat, 1, lab, 1)
    for l in range(6):
        for p in range(4):
            for r in range(6):
                expect = (lab[r] == p) and (lab[r] == (lab[l] + 1) % 4)
                assert A[0, l, p, r] == expect
