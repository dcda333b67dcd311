"""Split-complex (real-pair) tensor arithmetic for TPU backends without
complex dtypes.

The axon TPU runtime implements NO complex dtype at all — even
``jnp.zeros((), complex64)`` fails with ``UNIMPLEMENTED`` (probed on v5e,
see scripts/tpu_complex_check.py, which records the probe in
TPU_COMPLEX_r04.json). On TPU backends that *do* support c64, XLA lowers
complex matmuls to exactly this real-pair form; here the lowering is
explicit so complex-native algorithms (TDVP time evolution, reference
src/algorithms/timestep/) run on chips whose runtime never heard of
complex numbers.

Representation: a complex tensor z is a real array ``s`` with a LEADING
axis of length 2: ``s[0] = Re z``, ``s[1] = Im z``. All helpers below act
on that layout. Norms and real-part inner products of the split array
coincide with the complex ones, which is what makes the real Krylov
machinery (linalg/lanczos.py, linalg/basis.py) directly reusable:

    For a Hermitian complex-linear operator A, every Lanczos Gram
    coefficient is real in exact arithmetic (alpha_j = <v_j, A v_j> real
    by Hermiticity, beta_j a norm), so running the REAL Lanczos recurrence
    on the split arrays — real inner products = Re<.,.>_C — reproduces the
    complex Lanczos basis and tridiagonal exactly. Only the matvec and the
    final complex-coefficient Ritz combination need complex awareness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# construction / conversion
# ----------------------------------------------------------------------------

def sc(re, im=None):
    """Stack (re, im) into split layout; im defaults to zeros."""
    re = jnp.asarray(re)
    if im is None:
        im = jnp.zeros_like(re)
    return jnp.stack([re, im], axis=0)


def from_complex(z):
    z = jnp.asarray(z)
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=0)


def to_complex(s):
    cdt = jnp.complex64 if s.dtype == jnp.float32 else jnp.complex128
    return s[0].astype(cdt) + 1j * s[1].astype(cdt)


def cconj(s):
    return jnp.stack([s[0], -s[1]], axis=0)


def cmuli(s):
    """Multiply by i: i (re + i im) = -im + i re."""
    return jnp.stack([-s[1], s[0]], axis=0)


def cscale(a_re, a_im, s):
    """(a_re + i a_im) * s with real scalars a_re, a_im."""
    return jnp.stack([a_re * s[0] - a_im * s[1],
                      a_re * s[1] + a_im * s[0]], axis=0)


def cvdot(x, y):
    """Complex <x, y> = sum conj(x) y; returns (re, im) real scalars."""
    xr, xi, yr, yi = x[0], x[1], y[0], y[1]
    re = jnp.vdot(xr, yr) + jnp.vdot(xi, yi)
    im = jnp.vdot(xr, yi) - jnp.vdot(xi, yr)
    return re, im


def cnorm(s):
    """|z| of the whole tensor — identical to the plain real norm."""
    return jnp.linalg.norm(s)


# ----------------------------------------------------------------------------
# contractions
# ----------------------------------------------------------------------------

def ceinsum(spec: str, a, b):
    """Two-operand complex einsum, both operands split. Four real einsums
    (the numerically safe non-Karatsuba form); XLA fuses the adds."""
    e = partial(jnp.einsum, spec)
    re = e(a[0], b[0]) - e(a[1], b[1])
    im = e(a[0], b[1]) + e(a[1], b[0])
    return jnp.stack([re, im], axis=0)


def reinsum(spec: str, a_split, b_real):
    """Complex-split x real einsum: the real operand acts on both parts.
    One batched einsum over the leading split axis."""
    lhs, rhs = spec.split("->")
    sa, sb = lhs.split(",")
    # a batch label not already used by the spec
    import string

    z = next(c for c in string.ascii_letters if c not in spec)
    return jnp.einsum(f"{z}{sa},{sb}->{z}{rhs}", a_split, b_real)


# ----------------------------------------------------------------------------
# complex QR / LQ in split arithmetic (Householder, backward stable)
# ----------------------------------------------------------------------------

def qr_pos_split(M):
    """Thin QR of a split complex matrix M (2, m, n), m >= n assumed for
    the gauge panels (n > m also works; trailing columns of Q are zero).

    Returns (Q (2, m, n), R (2, n, n)) with Q^dag Q = I on the numerical
    range, M = Q R, and diag(R) real non-negative (QRpos convention,
    tensors/ops.qr_pos). Implemented as sequential complex Householder
    reflections in split arithmetic — the TPU backend's LAPACK QR custom
    call is real-only, and CholeskyQR-style MXU routes fail on the
    rank-deficient Schmidt panels (cond(Gram) ~ 1/sigma_min^2, see
    ROADMAP round-3 QR notes), so backward stability has to come from an
    explicit reflection loop. O(n) sequential steps of full-width
    VPU/MXU work; used on the split-complex proof path, not in the real
    f32 hot sweeps.
    """
    _, m, n = M.shape
    dtype = M.dtype
    k = min(m, n)
    tiny = 1e-30 if jnp.finfo(dtype).bits >= 64 else 1e-20
    rows = jnp.arange(m)

    # the k sequential reflections accumulate projection rounding into the
    # orthogonality of Q; at the TPU's X3 (3-pass bf16) matmul default the
    # per-product error ~1e-6 random-walks to ~1e-2 norm drift over a TDVP
    # step's ~2L QRs (measured on v5e at L=32 D=256) — pin the projections
    # to HIGHEST (f32 X6). The rank-1 updates are elementwise (VPU) and
    # unaffected.
    PH = jax.lax.Precision.HIGHEST

    def _reflect(A, v):
        """A <- (I - 2 v v^dag) A with v normalized (or exactly zero for a
        skipped step — then the reflection is the identity). The factor-2
        normalized form is scale-invariant: no tau ~ 1/||x||^2 quantities,
        so noise-level columns never produce a non-unitary clamped
        reflection."""
        wr = jnp.einsum("m,mn->n", v[0], A[0], precision=PH) + \
            jnp.einsum("m,mn->n", v[1], A[1], precision=PH)   # Re(v^dag A)
        wi = jnp.einsum("m,mn->n", v[0], A[1], precision=PH) - \
            jnp.einsum("m,mn->n", v[1], A[0], precision=PH)   # Im(v^dag A)
        Ar = A[0] - 2.0 * (jnp.outer(v[0], wr) - jnp.outer(v[1], wi))
        Ai = A[1] - 2.0 * (jnp.outer(v[0], wi) + jnp.outer(v[1], wr))
        return jnp.stack([Ar, Ai])

    def reduce_body(j, carry):
        A, Vs = carry
        mask = (rows >= j).astype(dtype)                     # (m,)
        x = A[:, :, j] * mask[None, :]                       # (2, m)
        normx = jnp.linalg.norm(x)
        pr = jnp.take(A[0, :, j], j)
        pi = jnp.take(A[1, :, j], j)
        pabs = jnp.sqrt(pr * pr + pi * pi)
        # phase of the pivot (1 when the pivot vanishes)
        phr = jnp.where(pabs > tiny, pr / jnp.maximum(pabs, tiny), 1.0)
        phi = jnp.where(pabs > tiny, pi / jnp.maximum(pabs, tiny), 0.0)
        # v = x + phase * ||x|| e_j  (no cancellation by sign choice);
        # ||v|| = ||x|| sqrt(2 (1 + |pivot|/||x||)) computed scale-free
        ej = (rows == j).astype(dtype)
        v = jnp.stack([x[0] + phr * normx * ej,
                       x[1] + phi * normx * ej], axis=0)
        vn = normx * jnp.sqrt(2.0 * (1.0 + pabs / jnp.maximum(normx, tiny)))
        v = jnp.where(normx > tiny, v / jnp.maximum(vn, tiny),
                      jnp.zeros_like(v))
        A = _reflect(A, v)
        Vs = jax.lax.dynamic_update_index_in_dim(Vs, v, j, 0)
        return (A, Vs)

    Vs0 = jnp.zeros((k, 2, m), dtype)
    A, Vs = jax.lax.fori_loop(0, k, reduce_body, (M, Vs0))

    # backward accumulation: Q = H_0 H_1 ... H_{k-1} I_{m,n} (each H is
    # Hermitian unitary, so A = Q R with R the reduced matrix)
    def accum_body(i, Q):
        return _reflect(Q, Vs[k - 1 - i])

    Q0 = sc(jnp.eye(m, n, dtype=dtype))
    Q = jax.lax.fori_loop(0, k, accum_body, Q0)
    # R = leading n x n block of the reduced matrix, upper triangle
    upper = jnp.triu(jnp.ones((n, n), dtype))
    R = A[:, :n, :] * upper[None]
    # phase-fix: make diag(R) real non-negative
    dr, di = jnp.diagonal(R[0]), jnp.diagonal(R[1])
    dabs = jnp.sqrt(dr * dr + di * di)
    phr = jnp.where(dabs > tiny, dr / jnp.maximum(dabs, tiny), 1.0)
    phi = jnp.where(dabs > tiny, di / jnp.maximum(dabs, tiny), 0.0)
    # Q <- Q diag(ph); R <- diag(conj(ph)) R
    Q = jnp.stack([Q[0] * phr[None, :] - Q[1] * phi[None, :],
                   Q[0] * phi[None, :] + Q[1] * phr[None, :]], axis=0)
    R = jnp.stack([phr[:, None] * R[0] + phi[:, None] * R[1],
                   phr[:, None] * R[1] - phi[:, None] * R[0]], axis=0)
    return Q, R


def lq_pos_split(M):
    """M (2, m, n) = L Q with Q rows orthonormal, diag(L) real positive."""
    Qh, Rh = qr_pos_split(cconj(jnp.swapaxes(M, 1, 2)))
    return cconj(jnp.swapaxes(Rh, 1, 2)), cconj(jnp.swapaxes(Qh, 1, 2))


def leftorth_split(A):
    """Split MPS tensor (2, l, p, r) -> (AL (2, l, p, r), C (2, r, r))."""
    _, l, p, r = A.shape
    Q, R = qr_pos_split(A.reshape(2, l * p, r))
    return Q.reshape(2, l, p, r), R


def rightorth_split(A):
    """Split MPS tensor (2, l, p, r) -> (C (2, l, l), AR (2, l, p, r))."""
    _, l, p, r = A.shape
    L, Q = lq_pos_split(A.reshape(2, l, p * r))
    return L, Q.reshape(2, l, p, r)
