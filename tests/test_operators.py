import numpy as np
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.operators import MPOHamiltonian
from mpskit_tpu.operators.mpo import DIAG_IDENTITY, DIAG_ZERO


def _ed_tfim(L, g):
    """Dense TFIM H = -sum_bonds [ZZ + g/2 (XI + IX)] built directly."""
    X = np.array([[0, 1], [1, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    I = np.eye(2)

    def kronN(ops):
        out = np.array([[1.0]])
        for o in ops:
            out = np.kron(out, o)
        return out

    H = np.zeros((2**L, 2**L), complex)
    for i in range(L - 1):
        ops = [I] * L
        ops[i], ops[i + 1] = Z, Z
        H -= kronN(ops)
        for j in (i, i + 1):
            ops = [I] * L
            ops[j] = X
            H -= (g / 2) * kronN(ops)
    return H


def test_tfim_mpo_matches_ed():
    L, g = 6, 1.3
    H = transverse_field_ising(g=g)
    M = H.to_matrix(L)
    np.testing.assert_allclose(M, _ed_tfim(L, g), atol=1e-12)


def test_fsm_structure():
    H = transverse_field_ising(g=0.7)
    w = H.odim
    assert H.diag_class[0] == DIAG_IDENTITY
    assert H.diag_class[w - 1] == DIAG_IDENTITY
    for a in range(1, w - 1):
        assert H.diag_class[a] == DIAG_ZERO
    # upper triangular
    nz = np.array(H.nonzero_mask)
    assert not np.any(np.tril(nz, -1))


def test_mpoham_algebra():
    L = 5
    H1 = transverse_field_ising(g=0.5)
    H2 = heisenberg_XXX(spin=0.5)
    M1, M2 = H1.to_matrix(L), H2.to_matrix(L)

    np.testing.assert_allclose((H1 + H2).to_matrix(L), M1 + M2, atol=1e-11)
    np.testing.assert_allclose((2.5 * H1).to_matrix(L), 2.5 * M1, atol=1e-11)
    np.testing.assert_allclose((H1 @ H1).to_matrix(L), M1 @ M1, atol=1e-10)
    # scalar shift adds c per site
    np.testing.assert_allclose((H1 + 0.7).to_matrix(L),
                               M1 + 0.7 * L * np.eye(2**L), atol=1e-11)


def test_heisenberg_mpo_dims():
    H = heisenberg_XXX(spin=1)
    assert H.physicaldim == 3
    assert H.odim == 5  # 2 + rank-3 interior (Sx, Sy, Sz channels)


@pytest.mark.slow
def test_lazysum_multiple_environments():
    """Per-summand environments (reference multipleenv.jl) reproduce the
    merged-FSM effective Hamiltonian termwise — the reference's
    consistency oracle d/dAC(sum H) == sum d/dAC(H)
    (test/operators.jl:173-280) — for finite and infinite states,
    including time-dependent coefficients."""
    import math
    import jax
    import jax.numpy as jnp
    from mpskit_tpu.environments.lazysum_env import (
        lazysum_environments, lazysum_ac_apply,
    )
    from mpskit_tpu.operators.lazysum import LazySum, TimedOperator
    from mpskit_tpu.states.finitemps import FiniteMPS
    from mpskit_tpu.environments.finite import finite_environments, stack_W
    from mpskit_tpu.environments.infinite_ham import (
        hamiltonian_environments,
    )
    from mpskit_tpu.algorithms.derivatives import ac_apply
    from mpskit_tpu.models.hamiltonians import pauli, _two_site
    from mpskit_tpu.operators.mpo import MPOHamiltonian
    from mpskit_tpu.states.infinitemps import InfiniteMPS

    X, _, Z, I = pauli(np.complex128)
    Hzz = MPOHamiltonian.from_local(-_two_site(Z, Z))
    Hx = MPOHamiltonian.from_local(
        -0.5 * (_two_site(X, I) + _two_site(I, X)))
    g = 1.3
    Hsum = LazySum([Hzz, TimedOperator(Hx, lambda t: g * math.cos(t))])

    t = 0.7
    # ---- finite ----
    L, D = 8, 10
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D,
                           dtype=jnp.complex128)
    menvs = lazysum_environments(psi, Hsum, t=t)
    H_merged = Hsum(t).sum_materialized()
    envs_m = finite_environments(psi, H_merged)
    i = psi.center
    x = psi.AC
    y_term = lazysum_ac_apply(menvs, Hsum, t, i, x)
    W = stack_W(H_merged, L)[i].astype(x.dtype)
    y_merged = ac_apply(envs_m.leftenv(i), W, envs_m.rightenv(i), x)
    np.testing.assert_allclose(np.asarray(y_term), np.asarray(y_merged),
                               atol=1e-10)

    # ---- infinite: energy parts must recombine (environments carry
    # regularized constants, so compare expectation values per summand) ----
    ipsi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, 8,
                              dtype=jnp.complex128)
    menvs_i = lazysum_environments(ipsi, Hsum, t=t)
    e_term = sum(c * float(np.real(e.e_density))
                 for c, e in zip(menvs_i.coeffs(Hsum, t), menvs_i.envs))
    envs_i = hamiltonian_environments(ipsi, H_merged)
    np.testing.assert_allclose(e_term, float(np.real(envs_i.e_density)),
                               atol=1e-9)

    # warm-started recalculate reuses the same structure
    menvs_i2 = lazysum_environments(ipsi, Hsum, t=t + 0.1, prev=menvs_i)
    assert len(menvs_i2.envs) == 2


def test_to_densempo_compression():
    """MPOHamiltonian -> DenseMPO conversion with SVD bond compression
    (reference convert(DenseMPO, SparseMPO), sparsempo.jl:282-308): the
    dense matrix is preserved exactly and the edge bonds shrink to the
    exact FSM ranks."""
    from mpskit_tpu.models import transverse_field_ising

    L = 6
    H = transverse_field_ising(g=1.3, dtype=np.float64)
    D = H.to_densempo(L)
    # exact operator parity via the dense matrix
    M_h = np.real(H.to_matrix(L))
    Ms = [np.asarray(o) for o in D.Os]
    # contract the MPO chain into a dense matrix
    acc = Ms[0]
    for o in Ms[1:]:
        a, b, s, t = acc.shape[0], acc.shape[1], acc.shape[2], acc.shape[3]
        acc = np.einsum("abst,bcuv->acsutv", acc, o).reshape(
            a, o.shape[1], s * o.shape[2], t * o.shape[3])
    assert acc.shape[0] == 1 and acc.shape[1] == 1
    np.testing.assert_allclose(acc[0, 0], M_h, atol=1e-10)
    # ragged edge ranks: 1 at the boundary, growing toward the bulk w
    rights = [o.shape[1] for o in Ms]
    assert rights[-1] == 1 and rights[0] < H.odim
    assert max(rights) <= H.odim


def test_densempo_compress_idempotent_and_products():
    """compress() preserves the operator for MPO products (an evolution-
    MPO-shaped case: bond dim w^2 -> compressed)."""
    from mpskit_tpu.models import transverse_field_ising

    L = 5
    H = transverse_field_ising(g=0.7, dtype=np.float64)
    D = H.to_densempo(L)
    P = D @ D   # H^2 as a dense MPO, bond dims squared
    Pc = P.compress(1e-12)
    # operator parity of H^2
    def todense(Ms):
        acc = np.asarray(Ms[0])
        for o in Ms[1:]:
            o = np.asarray(o)
            a, b, s, t = acc.shape
            acc = np.einsum("abst,bcuv->acsutv", acc, o).reshape(
                a, o.shape[1], s * o.shape[2], t * o.shape[3])
        return acc[0, 0]
    M2 = np.real(H.to_matrix(L)) @ np.real(H.to_matrix(L))
    np.testing.assert_allclose(todense(Pc.Os), M2, atol=1e-8)
    assert max(o.shape[1] for o in Pc.Os) < max(o.shape[1] for o in P.Os)
