"""Arbitrary-multiplicity fusion categories (symmetry/multiplicity.py) —
the general case of TensorKit's sector machinery (FusionStyle =
GenericFusion; the reference consumes it through TensorMap fusion trees).

Oracles:
  * Rep(S3) — multiplicity-free anchor: the general machinery must
    reproduce a consistent (pentagon/unitary) category with N ∈ {0,1}.
  * Rep(A4) — the smallest genuinely multiplicity-bearing case
    (3⊗3 = 1 ⊕ 1' ⊕ 1'' ⊕ 2·3): pentagon/hexagon with multiplicity
    contractions, symmetric-braiding invariants (θ = 1, trivial
    monodromy), and the 7×7 mixed F-block at total charge 3.
  * Embedding: every multiplicity-free category lifted with m = 1 must
    pass the generalized validators with identical F data.
"""

import dataclasses

import numpy as np
import pytest

from mpskit_tpu.symmetry.category import (
    fibonacci_category, ising_category, fibonacci_braided, ising_braided,
    su2k_braided,
)
from mpskit_tpu.symmetry.multiplicity import (
    MultiplicityCategory, lift_braided, rep_s3, rep_a4,
)


@pytest.fixture(scope="module")
def a4():
    return rep_a4()


@pytest.fixture(scope="module")
def s3():
    return rep_s3()


def test_rep_s3_axioms(s3):
    assert s3.N.max() == 1 and s3.mmax == 1
    # 2 ⊗ 2 = 1 ⊕ 1' ⊕ 2
    assert s3.fuse(2, 2) == (0, 1, 2)
    np.testing.assert_array_equal(s3.qdim, [1.0, 1.0, 2.0])
    s3.check_fusion()
    s3.check_unitarity()
    s3.check_pentagon()


def test_rep_a4_fusion_ring(a4):
    # 3 ⊗ 3 = 1 ⊕ 1' ⊕ 1'' ⊕ 3 ⊕ 3 : genuine multiplicity
    assert a4.N[3, 3, 3] == 2 and a4.mmax == 2
    np.testing.assert_array_equal(a4.N[3, 3], [1, 1, 1, 2])
    # 1' ⊗ 1'' = 1 (the Z3 characters), 1' ⊗ 3 = 3
    assert a4.fuse(1, 2) == (0,)
    assert a4.fuse(1, 3) == (3,)
    np.testing.assert_array_equal(a4.qdim, [1.0, 1.0, 1.0, 3.0])
    # dims: quantum dimension identity Σ_c N[a,b,c] d_c = d_a d_b
    lhs = np.einsum("abc,c->ab", a4.N, a4.qdim)
    np.testing.assert_allclose(lhs, np.outer(a4.qdim, a4.qdim))
    a4.check_fusion()


def test_rep_a4_pentagon_and_unitarity(a4):
    a4.check_unitarity()
    a4.check_pentagon()
    # the all-3 F-block is 7×7 (e ∈ {1,1',1''}: 1 tree each; e = 3: 4)
    rows = a4.left_tree_basis(3, 3, 3, 3)
    assert len(rows) == 7
    M = a4.f_block(3, 3, 3, 3)
    np.testing.assert_allclose(M @ M.conj().T, np.eye(7), atol=1e-10)
    # the multiplicity truly mixes: the e=3 (4-dim) corner of the F-block
    # is not diagonal in the vertex indices
    sub = np.array([[a4.F[3, 3, 3, 3, 3, al, be, 3, mu, nu]
                     for mu in range(2) for nu in range(2)]
                    for al in range(2) for be in range(2)])
    off = sub - np.diag(np.diag(sub))
    assert np.max(np.abs(off)) > 0.05


def test_rep_a4_symmetric_braiding(a4):
    a4.check_hexagon()
    np.testing.assert_allclose(a4.twists(), np.ones(4), atol=1e-10)
    assert a4.monodromy_is_trivial()
    # R on the multiplicity-2 vertex is a genuine 2×2 unitary
    R33 = a4.R[3, 3, 3]
    np.testing.assert_allclose(R33 @ R33.conj().T, np.eye(2), atol=1e-10)


def test_pentagon_teeth_multiplicity(a4):
    """Corrupting one entry inside the multiplicity block must break the
    pentagon equation."""
    F = a4.F.copy()
    F[3, 3, 3, 3, 3, 0, 1, 3, 1, 0] += 0.1
    bad = dataclasses.replace(a4, F=F)
    with pytest.raises(AssertionError):
        bad.check_pentagon()


@pytest.mark.parametrize("make", [fibonacci_category, ising_category])
def test_multiplicity_free_embedding(make):
    cat = make()
    emb = MultiplicityCategory.from_multiplicity_free(cat)
    assert emb.mmax == 1
    np.testing.assert_array_equal(
        emb.F[..., 0, 0, :, 0, 0].squeeze(), cat.F)
    emb.check_fusion()
    emb.check_unitarity()
    emb.check_pentagon()


@pytest.mark.parametrize("make", [fibonacci_braided, ising_braided,
                                  lambda: su2k_braided(3)])
def test_braided_embedding_hexagon(make):
    """The generalized hexagon must reduce exactly to the verified
    multiplicity-free hexagon of category.py on lifted MTCs."""
    cat = make()
    emb = lift_braided(cat)
    emb.check_hexagon()
    np.testing.assert_allclose(emb.twists(), cat.twists(), atol=1e-10)


def test_rep_s3_chain_oracle(s3):
    """Physics sanity: the 2-dim S3 intertwiner data reproduces the
    standard result dim Hom(1, 2⊗2⊗2) = 1 (one invariant in three spins),
    counted through the category's fusion trees."""
    count = sum(s3.N[2, 2, e] * s3.N[e, 2, 0] for e in range(s3.n))
    assert count == 1
