"""Dense tensor core: the TPU-native replacement for the reference's L0
(TensorKit.jl — see SURVEY.md §2.8).

Conventions used throughout the framework:

- MPS site tensor ``A[l, p, r]``: left virtual, physical, right virtual.
- Bond / center matrix ``C[l, r]``.
- MPO site tensor ``W[a, b, s, t]``: left FSM/virtual, right FSM/virtual,
  physical-out (bra side), physical-in (ket side).
- Left environment ``GL[a, l_bra, l_ket]``; right environment
  ``GR[b, r_bra, r_ket]``.

All decompositions are shape-static: truncation is expressed by *masking*
(zeroing) singular values rather than by changing array shapes, so the whole
framework stays jit/scan/pjit-compatible (SURVEY.md §7 "masked-rank design").

Replaces (cf. reference usage sites):
- ``leftorth/rightorth`` with QRpos/LQpos — reference src/states/ortho.jl:17,127-138
- ``tsvd`` with truncdim/truncerr/truncbelow — reference
  src/algorithms/groundstate/dmrg.jl:96 and TensorKit truncation schemes
- ``leftnull/rightnull`` — reference src/states/quasiparticle_state.jl:30-56
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# sign-fixed QR / LQ
# ----------------------------------------------------------------------------

def qr_pos(M):
    """Thin QR with the diagonal of R made real-positive (QRpos).

    M: (m, n) with m >= n (or not; thin QR of any shape).
    Returns Q (m, k), R (k, n) with k = min(m, n).
    """
    Q, R = jnp.linalg.qr(M, mode="reduced")
    d = jnp.diagonal(R)
    phase = jnp.where(jnp.abs(d) > 1e-30, d / jnp.abs(d).astype(d.dtype), 1.0).astype(M.dtype)
    Q = Q * phase[None, :]
    R = R * jnp.conj(phase)[:, None]
    return Q, R


def lq_pos(M):
    """Thin LQ with diagonal of L real-positive: M = L @ Q, Q rows orthonormal."""
    Qh, Rh = qr_pos(jnp.conj(M.T))
    return jnp.conj(Rh.T), jnp.conj(Qh.T)


def cholesky_qr2(M, jitter: float = None):
    """CholeskyQR2: matmul-shaped thin QR for (near-)full-rank matrices —
    MUCH faster than Householder on the MXU. R has a real positive diagonal
    by construction (same convention as qr_pos). The Gram matrix is
    Tikhonov-regularized at `jitter` * ||M||_F^2 (an upper bound on its
    largest eigenvalue) so the factorization stays positive definite at
    finite precision: singular directions below ~sqrt(jitter)*||M|| come
    out as noise — use only on full-rank panels (the hybrid sweeps keep
    Householder at rank-deficient chain edges)."""
    import jax

    n = M.shape[1]
    rdt = jnp.zeros((), M.dtype).real.dtype
    if jitter is None:
        # cholesky needs lambda_min/lambda_max >~ n * unit_roundoff
        jitter = 3e-5 if jnp.finfo(rdt).bits == 32 else 1e-12
    total_sq = jnp.real(jnp.sum(jnp.abs(M) ** 2))
    eps = (jitter * total_sq).astype(rdt)
    eye = jnp.eye(n, dtype=M.dtype)
    G = jnp.conj(M.T) @ M + eps * eye
    R1 = jnp.linalg.cholesky(G, upper=True)
    Q1 = jax.lax.linalg.triangular_solve(R1, M, left_side=False, lower=False)
    G2 = jnp.conj(Q1.T) @ Q1 + jitter * eye
    R2 = jnp.linalg.cholesky(G2, upper=True)
    Q = jax.lax.linalg.triangular_solve(R2, Q1, left_side=False, lower=False)
    return Q, R2 @ R1


def leftorth_hybrid(A, full_rank):
    """leftorth with a runtime choice: CholeskyQR2 when `full_rank` (bulk
    sites, MXU-friendly), Householder otherwise (exact at padded edges)."""
    import jax

    l, p, r = A.shape
    M = A.reshape(l * p, r)
    Q, R = jax.lax.cond(full_rank, cholesky_qr2, qr_pos, M)
    return Q.reshape(l, p, r), R


def rightorth_hybrid(A, full_rank):
    import jax

    l, p, r = A.shape
    M = jnp.conj(A.reshape(l, p * r).T)
    Q, R = jax.lax.cond(full_rank, cholesky_qr2, qr_pos, M)
    return jnp.conj(R.T), jnp.conj(Q.T).reshape(l, p, r)


def leftorth(A):
    """MPS tensor (l, p, r) -> (AL, C): A = AL @ C with AL left-isometric.

    AL has the same static shape as A; when l*p < r the isometry is
    rank-deficient and C carries the (masked) rank.
    """
    l, p, r = A.shape
    Q, R = qr_pos(A.reshape(l * p, r))
    k = Q.shape[1]
    if k < r:  # pad back to static shape
        Q = jnp.pad(Q, ((0, 0), (0, r - k)))
        R = jnp.pad(R, ((0, r - k), (0, 0)))
    return Q.reshape(l, p, r), R


def rightorth(A):
    """MPS tensor (l, p, r) -> (C, AR): A = C @ AR with AR right-isometric."""
    l, p, r = A.shape
    L, Q = lq_pos(A.reshape(l, p * r))
    k = Q.shape[0]
    if k < l:
        Q = jnp.pad(Q, ((0, l - k), (0, 0)))
        L = jnp.pad(L, ((0, 0), (0, l - k)))
    return L, Q.reshape(l, p, r)


def leftnull(A):
    """Orthonormal basis of the orthogonal complement of the columns of
    A reshaped (l*p, r): returns VL of shape (l, p, l*p - r) with
    VL^dagger A = 0 and VL^dagger VL = 1.

    Used for quasiparticle null spaces (reference
    src/states/quasiparticle_state.jl:30-56).
    """
    l, p, r = A.shape
    M = A.reshape(l * p, r)
    Q, _ = jnp.linalg.qr(M, mode="complete")  # (lp, lp)
    VL = Q[:, r:]
    return VL.reshape(l, p, l * p - r)


def rightnull(A):
    """Row-space complement: A (l, p, r) reshaped (l, p*r); returns VR of
    shape (p*r - l, p, r) with A VR^dagger = 0, VR VR^dagger = 1."""
    l, p, r = A.shape
    M = A.reshape(l, p * r)
    Q, _ = jnp.linalg.qr(jnp.conj(M.T), mode="complete")
    VR = jnp.conj(Q[:, l:].T)
    return VR.reshape(p * r - l, p, r)


# ----------------------------------------------------------------------------
# truncated SVD with masked ranks
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TruncationScheme:
    """Static truncation policy (mirrors TensorKit truncdim/truncerr/
    truncbelow/notrunc, cf. SURVEY.md §2.8).

    dim: keep at most `dim` singular values (static output width).
    err: additionally drop smallest values while the *discarded 2-norm
         fraction* stays below `err`.
    below: drop singular values below `below` (absolute).
    """

    dim: Optional[int] = None
    err: Optional[float] = None
    below: Optional[float] = None


def truncdim(d: int) -> TruncationScheme:
    return TruncationScheme(dim=d)


def truncerr(e: float, dim: Optional[int] = None) -> TruncationScheme:
    return TruncationScheme(err=e, dim=dim)


def truncbelow(e: float, dim: Optional[int] = None) -> TruncationScheme:
    return TruncationScheme(below=e, dim=dim)


def notrunc() -> TruncationScheme:
    return TruncationScheme()


def _svd_via_gram(M):
    """SVD through an eigendecomposition of the smaller Gram matrix, with
    QR re-orthonormalization of the reconstructed side.

    TPU-f32 WORKAROUND: XLA's TPU compiler SIGABRTs (TransposeFolding
    'Check failed: buffer != nullptr') when a float32 `jnp.linalg.svd`
    shares one lax.scan body with the Lanczos while_loop — the two-site
    sweep pattern of DMRG2/IDMRG2/TDVP2/FitDMRG2. The Gram route only
    uses eigh + matmuls + QR, which compile fine. Accuracy: singular
    values below ~sqrt(eps)·S0 lose relative precision (their weights
    are O(eps) anyway at f32 truncation quality); the reconstructed
    side's junk columns (S ~ eps·S0) are re-orthonormalized by QR so
    downstream isometry pushes stay exact."""
    m, n = M.shape
    if n > m:
        # M^H = Ut S Vht  =>  M = Vht^H S Ut^H
        Ut, S, Vht = _svd_via_gram(M.conj().T)
        return Vht.conj().T, S, Ut.conj().T

    # decomposition-critical path: run ALL matmuls (including those
    # inside eigh's Jacobi iteration and QR) at full f32 precision,
    # independent of the ambient matmul_precision context — with the
    # default one-pass-bf16 the eigenbasis is only ~1e-2 orthonormal
    # (measured), which is fatal for a decomposition
    with jax.default_matmul_precision("float32"):
        G = M.conj().T @ M                  # (n, n), n <= m
        # spectral shift: eigenvectors are exactly invariant under
        # G -> G + cI, but the TPU (emulated-)f64 eigh returns NaNs on
        # PSD matrices with a large near-zero eigenvalue cluster
        # (measured on real two-site DMRG splits; plain f64
        # jnp.linalg.svd NaNs on the same inputs). The shift moves the
        # cluster away from zero; subtracting it afterwards costs
        # ~eps·shift absolute accuracy on the small singular values —
        # below the Gram route's intrinsic sqrt(eps)·S0 floor.
        n_ = G.shape[0]
        shift = 1e-3 * jnp.trace(G).real.astype(
            jnp.zeros((), M.dtype).real.dtype) / n_
        w, V = jnp.linalg.eigh(G + shift * jnp.eye(n_, dtype=G.dtype))
        S = jnp.sqrt(jnp.maximum(w[::-1] - shift, 0.0))
        V = V[:, ::-1]
        floor = jnp.maximum(S[0], 1e-30) * 1e-6
        U0 = (M @ V) / jnp.maximum(S, floor)[None, :]
        # re-orthonormalize with regularized CholeskyQR2, NOT Householder:
        # rank-deficient M has exactly-zero U0 columns, and the TPU
        # Householder QR turns zero columns into NaNs (measured — that,
        # not the SVD itself, was the two-site f64 NaN). CholeskyQR2's
        # Tikhonov jitter keeps zero columns at exactly zero, which is
        # what downstream wants (zero singular weight, zero isometry
        # column).
        U, _ = cholesky_qr2(U0)
    return U, S, V.conj().T


def svd_truncated(M, Dmax: int, trunc: TruncationScheme = TruncationScheme()):
    """SVD of M (m, n) truncated/padded to static width Dmax.

    Returns (U (m, Dmax), S (Dmax,), Vh (Dmax, n), err) where the rank cut is
    expressed by zeros in S (and corresponding zero columns/rows in U/Vh so
    downstream contractions stay exact). `err` is the 2-norm truncation error
    sqrt(sum of discarded S^2) / norm.

    On the TPU backend this routes through `_svd_via_gram` (see its
    docstring): the direct `jnp.linalg.svd` SIGABRTs the TPU compiler in
    f32 when it shares a scan body with the Lanczos while_loop, and the
    same pattern silently MISCOMPILES to NaNs in (emulated) f64 —
    measured on the two-site sweeps; the Gram route is correct in both.
    """
    if jax.default_backend() == "tpu":
        U, S, Vh = _svd_via_gram(M)
    else:
        U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
    k = S.shape[0]

    # static width: slice or pad to Dmax
    if k >= Dmax:
        U_t, S_t, Vh_t = U[:, :Dmax], S[:Dmax], Vh[:Dmax, :]
        discarded_sq = jnp.sum(S[Dmax:] ** 2)
    else:
        U_t = jnp.pad(U, ((0, 0), (0, Dmax - k)))
        S_t = jnp.pad(S, (0, Dmax - k))
        Vh_t = jnp.pad(Vh, ((0, Dmax - k), (0, 0)))
        discarded_sq = jnp.zeros((), S.dtype)

    # dynamic masking according to the truncation scheme
    keep = jnp.ones((Dmax,), bool)
    if trunc.dim is not None and trunc.dim < Dmax:
        keep = keep & (jnp.arange(Dmax) < trunc.dim)
    if trunc.below is not None:
        keep = keep & (S_t > trunc.below)
    if trunc.err is not None:
        # discard the smallest values while the cumulative discarded weight
        # stays below err^2 * total
        total = jnp.sum(S_t**2) + discarded_sq
        # tail[i] = sum_{j >= i} S[j]^2  (computed on the sorted-descending S)
        tail = jnp.cumsum((S_t**2)[::-1])[::-1]
        keep = keep & ((tail + discarded_sq) > (trunc.err**2) * total)

    maskf = keep.astype(S_t.dtype)
    S_m = S_t * maskf
    U_m = U_t * maskf[None, :].astype(U_t.dtype)
    Vh_m = Vh_t * maskf[:, None].astype(Vh_t.dtype)

    total = jnp.sum(S_t**2) + discarded_sq
    disc = discarded_sq + jnp.sum((S_t * (1.0 - maskf)) ** 2)
    err = jnp.sqrt(jnp.maximum(disc, 0.0) / jnp.maximum(total, 1e-30))
    return U_m, S_m, Vh_m, err


# ----------------------------------------------------------------------------
# misc small helpers
# ----------------------------------------------------------------------------

def isometry(m: int, n: int, dtype=jnp.complex128):
    """(m, n) isometry embedding C^n into C^m (n <= m), cf. TensorKit
    `isomorphism`/`isometry` usage in reference
    src/operators/sparsempo/sparsempo.jl:237-243."""
    return jnp.eye(m, n, dtype=dtype)


def safe_xlogx(x):
    """x * log(x) with 0 log 0 = 0 (reference src/utility/utility.jl:139-142)."""
    return jnp.where(x > 0, x * jnp.log(jnp.where(x > 0, x, 1.0)), 0.0)
