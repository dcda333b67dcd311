"""Split-complex (real-pair) arithmetic vs the native complex path.

The split layer (tensors/splitc.py, algorithms/tdvp_split.py) exists
because the axon TPU runtime implements no complex dtype; these tests pin
it against the complex-native implementations on CPU (f64 pairs vs
complex128), where both paths run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpskit_tpu.tensors.splitc import (
    sc, from_complex, to_complex, ceinsum, reinsum, cconj, cmuli,
    qr_pos_split, lq_pos_split, leftorth_split, rightorth_split, cvdot,
)
from mpskit_tpu.algorithms.tdvp_split import (
    ac_apply_split, transfer_left_mpo_split, transfer_right_mpo_split,
    compute_right_envs_split, expm_multiply_split, _timestep_finite_split,
    expectation_value_split,
)


def _rand_c(key, shape):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape, jnp.float64)
            + 1j * jax.random.normal(k2, shape, jnp.float64))


def test_ceinsum_matches_complex():
    key = jax.random.PRNGKey(0)
    a = _rand_c(key, (4, 5, 6))
    b = _rand_c(jax.random.PRNGKey(1), (6, 3, 5))
    want = jnp.einsum("xyz,zwy->xw", a, b)
    got = to_complex(ceinsum("xyz,zwy->xw", from_complex(a), from_complex(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # real second operand
    w = jax.random.normal(jax.random.PRNGKey(2), (6, 3, 5), jnp.float64)
    want2 = jnp.einsum("xyz,zwy->xw", a, w.astype(a.dtype))
    got2 = to_complex(reinsum("xyz,zwy->xw", from_complex(a), w))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-12)
    # conj and i-rotation
    np.testing.assert_allclose(np.asarray(to_complex(cconj(from_complex(a)))),
                               np.asarray(jnp.conj(a)), atol=0)
    np.testing.assert_allclose(np.asarray(to_complex(cmuli(from_complex(a)))),
                               np.asarray(1j * a), atol=0)


@pytest.mark.parametrize("shape", [(12, 7), (7, 7), (16, 16)])
def test_qr_pos_split(shape):
    A = _rand_c(jax.random.PRNGKey(3), shape)
    Q, R = qr_pos_split(from_complex(A))
    Qc, Rc = to_complex(Q), to_complex(R)
    m, n = shape
    k = min(m, n)
    # reconstruction + orthonormality + triangularity + positive diagonal
    np.testing.assert_allclose(np.asarray(Qc @ Rc), np.asarray(A), atol=1e-12)
    gram = np.asarray(jnp.conj(Qc.T) @ Qc)
    np.testing.assert_allclose(gram[:k, :k], np.eye(k), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.tril(Rc, -1)), 0.0, atol=1e-12)
    d = np.real(np.diagonal(np.asarray(Rc)))
    assert (d > -1e-12).all()
    assert np.abs(np.imag(np.diagonal(np.asarray(Rc)))).max() < 1e-12


def test_qr_pos_split_rank_deficient():
    # Schmidt-like panel: exponentially decaying singular values incl. exact
    # zeros — the regime that kills Cholesky-based QR
    m, n = 16, 8
    u = np.linalg.qr(np.random.RandomState(0).randn(m, n)
                     + 1j * np.random.RandomState(1).randn(m, n))[0]
    v = np.linalg.qr(np.random.RandomState(2).randn(n, n)
                     + 1j * np.random.RandomState(3).randn(n, n))[0]
    s = np.array([1, 1e-2, 1e-4, 1e-8, 1e-12, 0, 0, 0])
    A = jnp.asarray(u @ np.diag(s) @ v)
    Q, R = qr_pos_split(from_complex(A))
    Qc, Rc = to_complex(Q), to_complex(R)
    np.testing.assert_allclose(np.asarray(Qc @ Rc), np.asarray(A), atol=1e-13)
    gram = np.asarray(jnp.conj(Qc.T) @ Qc)
    np.testing.assert_allclose(gram, np.eye(n), atol=1e-12)


def test_lq_and_orth_helpers():
    A = _rand_c(jax.random.PRNGKey(4), (6, 10))
    L, Q = lq_pos_split(from_complex(A))
    Lc, Qc = to_complex(L), to_complex(Q)
    np.testing.assert_allclose(np.asarray(Lc @ Qc), np.asarray(A), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Qc @ jnp.conj(Qc.T)), np.eye(6),
                               atol=1e-12)
    T = _rand_c(jax.random.PRNGKey(5), (4, 2, 4))
    AL, C = leftorth_split(from_complex(T))
    np.testing.assert_allclose(
        np.asarray(to_complex(ceinsum("lpm,mr->lpr", AL, C))),
        np.asarray(T), atol=1e-12)
    C2, AR = rightorth_split(from_complex(T))
    np.testing.assert_allclose(
        np.asarray(to_complex(ceinsum("lm,mpr->lpr", C2, AR))),
        np.asarray(T), atol=1e-12)


def test_expm_split_matches_complex():
    from mpskit_tpu.linalg.expm import expm_multiply

    n, m, dt = 40, 25, 0.37
    H = _rand_c(jax.random.PRNGKey(6), (n, n))
    H = (H + jnp.conj(H.T)) / 2
    v = _rand_c(jax.random.PRNGKey(7), (n,))
    want = expm_multiply(lambda x: H @ x, v, -1j * dt, m)
    Hs = from_complex(H)
    got, err, drift = expm_multiply_split(
        lambda x: ceinsum("ij,j->i", Hs, x), from_complex(v), dt, m)
    assert float(drift) < 1e-9  # pre-projection radial error at full m
    np.testing.assert_allclose(np.asarray(to_complex(got)), np.asarray(want),
                               atol=1e-10)
    # unitarity of the Krylov exponential at full m
    assert abs(float(jnp.linalg.norm(got)) - float(jnp.linalg.norm(v))) < 1e-9


def test_split_tdvp_step_matches_complex():
    """Full finite TDVP step: split-complex path vs complex128 path."""
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
    from mpskit_tpu.algorithms.tdvp import _timestep_finite
    from mpskit_tpu.algorithms.expval import expectation_value
    from mpskit_tpu.environments.finite import (
        stack_W, compute_right_envs, right_boundary,
    )

    L, D, m, dt = 6, 8, 20, 0.05
    H0 = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
    H1 = transverse_field_ising_lattice(g=0.7, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=jnp.float64)
    psi, _, _ = find_groundstate_dmrg(psi, H0, DMRG(tol=1e-10, maxiter=20))
    psi = psi.move_center(0)

    # complex-native trajectory
    cALs = psi.ALs.astype(jnp.complex128)
    cARs = psi.ARs.astype(jnp.complex128)
    cAC = psi.AC.astype(jnp.complex128)
    Ws = stack_W(H1, L).astype(jnp.complex128)
    GRs = compute_right_envs(cARs, Ws, right_boundary(Ws.shape[1], D,
                                                      jnp.complex128))
    es_c = []
    for _ in range(3):
        cALs, cARs, cAC, GRs, _ = _timestep_finite(cALs, cARs, cAC, Ws, GRs,
                                                   m, dt=dt)
        es_c.append(float(jnp.real(
            expectation_value(FiniteMPS(cALs, cARs, cAC, 0), H1))))

    # split trajectory from the same start
    sALs = jnp.stack([psi.ALs, jnp.zeros_like(psi.ALs)], axis=0)
    sARs = jnp.stack([psi.ARs, jnp.zeros_like(psi.ARs)], axis=0)
    sAC = sc(psi.AC)
    Wr = stack_W(H1, L).astype(jnp.float64)
    es_s = []
    from mpskit_tpu.environments.finite import right_boundary as rb
    for _ in range(3):
        sGRs = compute_right_envs_split(sARs, Wr, sc(rb(Wr.shape[1], D,
                                                        jnp.float64)))
        sALs, sARs, sAC, sGRs, _, sdrift = _timestep_finite_split(
            sALs, sARs, sAC, Wr, sGRs, m, dt=dt)
        assert float(sdrift) < 1e-9  # f64: pre-projection drift at the floor
        es_s.append(float(expectation_value_split(sAC, Wr, sGRs)))

    np.testing.assert_allclose(es_s, es_c, atol=1e-9)
    # the final states themselves agree (same gauge conventions both paths)
    np.testing.assert_allclose(np.asarray(to_complex(sAC)), np.asarray(cAC),
                               atol=1e-8)
    # norm conservation
    assert abs(float(jnp.linalg.norm(sAC)) - 1.0) < 1e-9
