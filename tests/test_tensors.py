import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpskit_tpu.tensors.ops import (
    qr_pos, lq_pos, leftorth, rightorth, leftnull, rightnull,
    svd_truncated, truncdim, truncerr, truncbelow, notrunc,
)


def _randc(key, shape):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape)).astype(jnp.complex128)


def test_qr_pos():
    M = _randc(jax.random.PRNGKey(0), (12, 5))
    Q, R = qr_pos(M)
    np.testing.assert_allclose(Q @ R, M, atol=1e-12)
    np.testing.assert_allclose(Q.conj().T @ Q, jnp.eye(5), atol=1e-12)
    d = jnp.diagonal(R)
    assert np.all(np.abs(d.imag) < 1e-12) and np.all(d.real > 0)


def test_lq_pos():
    M = _randc(jax.random.PRNGKey(1), (5, 12))
    L, Q = lq_pos(M)
    np.testing.assert_allclose(L @ Q, M, atol=1e-12)
    np.testing.assert_allclose(Q @ Q.conj().T, jnp.eye(5), atol=1e-12)
    d = jnp.diagonal(L)
    assert np.all(np.abs(d.imag) < 1e-12) and np.all(d.real > 0)


def test_leftorth_rightorth():
    A = _randc(jax.random.PRNGKey(2), (6, 2, 8))
    AL, C = leftorth(A)
    np.testing.assert_allclose(
        jnp.einsum("lpr,rs->lps", AL, C), A, atol=1e-12)
    # isometry on the rank-supported block
    gram = jnp.einsum("lpr,lps->rs", AL.conj(), AL)
    # rank is min(12, 8) = 8 => full isometry
    np.testing.assert_allclose(gram[: 8, : 8], jnp.eye(8), atol=1e-12)

    C2, AR = rightorth(A)
    np.testing.assert_allclose(
        jnp.einsum("ls,spr->lpr", C2, AR), A, atol=1e-12)
    gram = jnp.einsum("lpr,spr->ls", AR, AR.conj())
    np.testing.assert_allclose(gram, jnp.eye(6), atol=1e-12)


def test_leftorth_rank_deficient():
    # l*p < r: padded isometry, R zero beyond rank
    A = _randc(jax.random.PRNGKey(3), (2, 2, 8))
    AL, C = leftorth(A)
    np.testing.assert_allclose(jnp.einsum("lpr,rs->lps", AL, C), A, atol=1e-12)
    assert C.shape == (8, 8)
    np.testing.assert_allclose(C[4:, :], 0, atol=1e-12)


def test_nullspaces():
    A = _randc(jax.random.PRNGKey(4), (6, 2, 4))
    VL = leftnull(A)
    assert VL.shape == (6, 2, 8)
    ov = jnp.einsum("lpk,lpr->kr", VL.conj(), A)
    np.testing.assert_allclose(ov, 0, atol=1e-12)
    gram = jnp.einsum("lpk,lpm->km", VL.conj(), VL)
    np.testing.assert_allclose(gram, jnp.eye(8), atol=1e-12)

    B = _randc(jax.random.PRNGKey(5), (4, 2, 6))
    VR = rightnull(B)
    assert VR.shape == (8, 2, 6)
    ov = jnp.einsum("lpr,kpr->lk", B, VR.conj())
    np.testing.assert_allclose(ov, 0, atol=1e-12)


def test_svd_truncated_basic():
    M = _randc(jax.random.PRNGKey(6), (12, 10))
    U, S, Vh, err = svd_truncated(M, 10, notrunc())
    np.testing.assert_allclose(U @ jnp.diag(S.astype(M.dtype)) @ Vh, M, atol=1e-11)
    assert float(err) < 1e-12


def test_svd_truncated_dim():
    # construct a matrix with known singular values
    U0, _ = jnp.linalg.qr(_randc(jax.random.PRNGKey(7), (12, 12)))
    V0, _ = jnp.linalg.qr(_randc(jax.random.PRNGKey(8), (10, 10)))
    s = jnp.array([10.0, 5, 2, 1, 0.5, 0.1, 1e-3, 1e-5, 1e-8, 1e-12])
    M = U0[:, :10] @ jnp.diag(s.astype(jnp.complex128)) @ V0
    U, S, Vh, err = svd_truncated(M, 10, truncdim(4))
    np.testing.assert_allclose(S[:4], s[:4], rtol=1e-10)
    np.testing.assert_allclose(S[4:], 0, atol=1e-14)
    expected = jnp.sqrt(jnp.sum(s[4:] ** 2) / jnp.sum(s**2))
    np.testing.assert_allclose(err, expected, rtol=1e-6)

    # truncbelow
    U, S, Vh, err = svd_truncated(M, 10, truncbelow(1e-2))
    assert int(jnp.sum(S > 0)) == 6

    # static width smaller than rank
    U, S, Vh, err = svd_truncated(M, 6, notrunc())
    assert U.shape == (12, 6) and S.shape == (6,) and Vh.shape == (6, 10)
    np.testing.assert_allclose(S, s[:6], rtol=1e-10)


def test_svd_via_gram_matches_svd():
    """The Gram-route SVD used on the TPU backend (tensors/ops.py
    _svd_via_gram — works around TPU compiler SIGABRTs/NaNs on
    Lanczos+SVD scan bodies): singular values, reconstruction, and
    orthogonality match the LAPACK SVD, including rank-deficient inputs
    with exactly-zero columns (dead columns come out exactly zero)."""
    from mpskit_tpu.tensors.ops import _svd_via_gram

    rng = np.random.default_rng(3)
    for shape in ((40, 24), (24, 40), (32, 32)):
        M = jnp.asarray(rng.normal(size=shape))
        U, S, Vh = _svd_via_gram(M)
        S_ref = np.linalg.svd(np.asarray(M), compute_uv=False)
        k = min(shape)
        np.testing.assert_allclose(np.asarray(S)[:k], S_ref, atol=1e-10)
        rec = np.asarray(U) * np.asarray(S)[None, :] @ np.asarray(Vh)
        np.testing.assert_allclose(rec, np.asarray(M), atol=1e-9)
        Un = np.asarray(U)
        np.testing.assert_allclose(Un.conj().T @ Un,
                                   np.eye(Un.shape[1]), atol=1e-9)

    # rank deficiency: 40x24 of rank 8, padded with exact zero columns
    A = rng.normal(size=(40, 8))
    M = jnp.asarray(np.concatenate([A, np.zeros((40, 16))], axis=1))
    U, S, Vh = _svd_via_gram(M)
    S_ref = np.linalg.svd(np.asarray(M), compute_uv=False)
    np.testing.assert_allclose(np.asarray(S), S_ref, atol=1e-10)
    assert not np.any(np.isnan(np.asarray(U)))
    rec = np.asarray(U) * np.asarray(S)[None, :] @ np.asarray(Vh)
    np.testing.assert_allclose(rec, np.asarray(M), atol=1e-9)
