"""On-device Arnoldi for dominant (largest-magnitude) eigenpairs, replacing
KrylovKit's `schursolve/eigsolve(..., :LM, Arnoldi)` as used by transfer-
matrix fixed points (reference src/environments/permpoinfenv.jl:138-189,
src/states/ortho.jl:180-188, src/algorithms/statmech/vumps.jl:30-45).

jnp.linalg.eig is host-only, so the small Hessenberg eigenproblem is solved
on-device: the *dominant* Ritz pair via power iteration on the m-by-m
Hessenberg (cheap, robust for the positive-definite-dominant transfer
spectra this is used on), and full small spectra — needed only in offline
toolbox routines like `transfer_spectrum` — via a host callback to LAPACK.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.tree import tree_norm, tree_scale, tree_add
from .basis import basis_zeros, basis_get, basis_set, basis_inner_all, basis_combine

_BREAKDOWN = 1e-14


def arnoldi_factorize(matvec: Callable, v0, m: int, passes: int = 2):
    """m Arnoldi steps. Returns (V (m+1 slots), H (m+1, m), nvalid).

    passes: Gram-Schmidt passes against the stacked basis per step. 2
    (CGS2) is the robust default for eigensolves; 1 halves the dominant
    HBM traffic and suffices for GMRES cycles whose restarts correct from
    the true residual (gmres_restarted)."""
    n0 = tree_norm(v0)
    v = tree_scale(1.0 / jnp.maximum(n0, _BREAKDOWN), v0)
    V = basis_set(basis_zeros(v, m + 1), 0, v)

    cdt = basis_inner_all(V, v).dtype
    H = jnp.zeros((m + 1, m), cdt)

    def body(j, carry):
        V, H = carry
        w = matvec(basis_get(V, j))
        c1 = basis_inner_all(V, w)
        w = tree_add(w, basis_combine(V, c1), alpha=-1.0)
        if passes > 1:
            c2 = basis_inner_all(V, w)
            w = tree_add(w, basis_combine(V, c2), alpha=-1.0)
            c1 = c1 + c2
        b = tree_norm(w)
        H = H.at[:, j].set(c1[: m + 1])
        H = H.at[j + 1, j].set(b.astype(cdt))
        wn = tree_scale(
            jnp.where(b > _BREAKDOWN, 1.0 / jnp.maximum(b, _BREAKDOWN), 0.0), w
        )
        V = basis_set(V, j + 1, wn)
        return V, H

    V, H = jax.lax.fori_loop(0, m, body, (V, H))
    sub = jnp.abs(jnp.diagonal(H, offset=-1))
    broke = sub <= _BREAKDOWN
    nvalid = jnp.where(jnp.any(broke), jnp.argmax(broke) + 1, m).astype(jnp.int32)
    return V, H, nvalid


def small_eig_dominant(Hm, nvalid, iters: int = 300):
    """Dominant eigenpair of a small (m, m) matrix via power iteration with
    Rayleigh-quotient eigenvalue. Restricted to the leading nvalid block by
    masking. Deterministic start vector biased to be generic."""
    m = Hm.shape[0]
    mask = (jnp.arange(m) < nvalid)
    Hm = jnp.where(mask[:, None] & mask[None, :], Hm, 0.0)
    z0 = jnp.where(mask, 1.0 + 0.1 * jnp.arange(m), 0.0).astype(Hm.dtype)
    z0 = z0 / jnp.linalg.norm(z0)

    def body(_, z):
        z = Hm @ z
        return z / jnp.maximum(jnp.linalg.norm(z), _BREAKDOWN)

    z = jax.lax.fori_loop(0, iters, body, z0)
    theta = jnp.vdot(z, Hm @ z)
    return theta, z


class EigsResult(NamedTuple):
    eigenvalue: jnp.ndarray
    eigenvector: object
    residual: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


@partial(jax.jit, static_argnums=(0, 2, 3))
def dominant_eigs(matvec: Callable, v0, m: int = 30, maxrestarts: int = 100,
                  tol=1e-12) -> EigsResult:
    """Largest-magnitude eigenpair of a general operator (restarted Arnoldi)."""

    def restart(state):
        v, _, _, it = state
        V, H, nvalid = arnoldi_factorize(matvec, v, m)
        theta, z = small_eig_dominant(H[:m, :m], nvalid)
        x = basis_combine(V, jnp.pad(z, (0, 1)))
        xn = tree_norm(x)
        x = tree_scale(1.0 / jnp.maximum(xn, _BREAKDOWN), x)
        last = jnp.clip(nvalid - 1, 0, m - 1)
        resid = jnp.where(
            nvalid < m,
            jnp.zeros((), jnp.abs(theta).dtype),
            jnp.abs(H[last + 1, last] * z[last]) / jnp.maximum(jnp.abs(theta), _BREAKDOWN),
        )
        return x, theta, resid, it + 1

    def cond(state):
        _, _, resid, it = state
        return jnp.logical_and(it < maxrestarts,
                               jnp.logical_or(it < 1, resid > tol))

    cdt = basis_inner_all(basis_zeros(v0, 1), v0).dtype
    rdt = jnp.zeros((), cdt).real.dtype
    init = (v0, jnp.zeros((), cdt), jnp.array(jnp.inf, rdt),
            jnp.zeros((), jnp.int32))
    x, theta, resid, it = jax.lax.while_loop(cond, restart, init)
    return EigsResult(theta, x, resid, it, resid <= tol)


# ----------------------------------------------------------------------------
# full small spectra (offline toolbox only) — host LAPACK callback
# ----------------------------------------------------------------------------

def _host_eig(Hm):
    w = np.linalg.eigvals(Hm)
    order = np.argsort(-np.abs(w))
    return np.ascontiguousarray(w[order])


def hessenberg_spectrum(Hm):
    """All eigenvalues of a small matrix, sorted by descending magnitude.
    Runs on the host (LAPACK) via pure_callback; used by transfer_spectrum /
    marek_gap (reference src/algorithms/toolbox.jl:43-127), never in hot loops."""
    m = Hm.shape[0]
    out_shape = jax.ShapeDtypeStruct((m,), jnp.complex128)
    return jax.pure_callback(_host_eig, out_shape, Hm.astype(jnp.complex128))


def spectrum_arnoldi(matvec: Callable, v0, m: int = 30, nev: int = 5):
    """Approximate top-nev eigenvalues (by magnitude) of a general operator:
    one (unrestarted) m-step Arnoldi factorization + host eig of the
    Hessenberg block. Returns (eigenvalues (nev,), nvalid)."""
    V, H, nvalid = arnoldi_factorize(matvec, v0, m)
    mask = jnp.arange(m) < nvalid
    Hm = jnp.where(mask[:, None] & mask[None, :], H[:m, :m], 0.0)
    w = hessenberg_spectrum(Hm)
    # eigenvalues beyond the valid block are exactly 0 and sort last
    return w[:nev], nvalid


# ----------------------------------------------------------------------------
# dominant REAL eigenpair — for transfer operators whose largest-magnitude
# modes form complex conjugate pairs that do not correspond to the physical
# fixed point (e.g. the omega-rotation modes of the critical hard-hexagon
# boundary, see symmetry/fibonacci.py: the effective AC/C operators carry a
# spurious e^{+-2pi i/3} pair slightly ABOVE the real physical eigenvalue;
# :LM Arnoldi in real arithmetic wanders inside that pair and never
# converges). Selection needs actual spectral data of the small Hessenberg
# block, so the m-by-m Rayleigh-Ritz runs on the host (LAPACK) — the same
# pattern as hessenberg_spectrum, acceptable because the masked statmech
# path is the only consumer.
# ----------------------------------------------------------------------------

def _host_eig_real_select(Hm, nvalid):
    m = Hm.shape[0]
    n = max(int(nvalid), 1)
    H = np.asarray(Hm)[:n, :n]
    w, V = np.linalg.eig(H)
    realish = np.abs(w.imag) <= 1e-3 * np.maximum(np.abs(w), 1e-300)
    if realish.any():
        # among (near-)real Ritz values, weight magnitude by overlap with
        # the restart vector (= Krylov basis vector 0): near convergence
        # this tracks the physical fixed point even when other real modes
        # transiently carry a larger magnitude
        overlap = np.abs(V[0, :])
        cand = np.where(realish, np.abs(w) * (0.1 + overlap), -1.0)
        idx = int(np.argmax(cand))
    else:  # fallback: plain :LM
        idx = int(np.argmax(np.abs(w)))
    z = V[:, idx]
    # phase-fix so the vector is real for a real eigenvalue of a real block
    k = int(np.argmax(np.abs(z)))
    z = z * (np.abs(z[k]) / z[k] if z[k] != 0 else 1.0)
    out = np.zeros(m, np.complex128)
    out[:n] = z
    return np.complex128(w[idx]), out


def _host_eig_smallest_real(Hm, nvalid):
    """Ritz pair with the smallest real part of the leading nvalid block."""
    m = Hm.shape[0]
    n = max(int(nvalid), 1)
    H = np.asarray(Hm)[:n, :n]
    w, V = np.linalg.eig(H)
    idx = int(np.argmin(w.real))
    z = V[:, idx]
    k = int(np.argmax(np.abs(z)))
    z = z * (np.abs(z[k]) / z[k] if z[k] != 0 else 1.0)
    out = np.zeros(m, np.complex128)
    out[:n] = z
    return np.complex128(w[idx]), out


def smallest_eigs_arnoldi(matvec: Callable, v0, m: int = 30,
                          maxrestarts: int = 100, tol=1e-12) -> EigsResult:
    """Smallest-REAL-PART eigenpair of a general (non-Hermitian) operator.

    Restarted Arnoldi with host Rayleigh-Ritz selection (pure_callback to
    LAPACK for the small dense eigenproblem, same pattern as
    dominant_eigs_real). The Hermiticity-robust alternative to Lanczos for
    quasiparticle effective Hamiltonians whose symmetry is broken at the
    working precision — e.g. f32 environment-GMRES tails, or analytically
    for complex momenta (KrylovKit's eigsolve auto-selects Arnoldi for
    non-Hermitian maps; reference
    src/algorithms/excitation/quasiparticleexcitation.jl eigsolve call)."""

    cdt = basis_inner_all(basis_zeros(v0, 1), v0).dtype

    def small_select(Hm, nvalid):
        shapes = (jax.ShapeDtypeStruct((), jnp.complex128),
                  jax.ShapeDtypeStruct((m,), jnp.complex128))
        theta, z = jax.pure_callback(
            _host_eig_smallest_real, shapes, Hm.astype(jnp.complex128),
            nvalid, vmap_method="sequential")
        return theta, z.astype(cdt)

    def restart(state):
        v, _, _, it = state
        V, H, nvalid = arnoldi_factorize(matvec, v, m)
        theta, z = small_select(H[:m, :m], nvalid)
        x = basis_combine(V, jnp.pad(z, (0, 1)))
        xn = tree_norm(x)
        x = tree_scale(1.0 / jnp.maximum(xn, _BREAKDOWN), x)
        last = jnp.clip(nvalid - 1, 0, m - 1)
        resid = jnp.where(
            nvalid < m,
            jnp.zeros((), jnp.abs(theta).dtype),
            jnp.abs(H[last + 1, last] * z[last])
            / jnp.maximum(jnp.abs(theta), _BREAKDOWN),
        )
        theta = theta.astype(cdt) if jnp.issubdtype(cdt, jnp.complexfloating) \
            else jnp.real(theta).astype(cdt)
        return x, theta, resid.astype(jnp.zeros((), cdt).real.dtype), it + 1

    def cond(state):
        _, _, resid, it = state
        return jnp.logical_and(it < maxrestarts,
                               jnp.logical_or(it < 1, resid > tol))

    rdt = jnp.zeros((), cdt).real.dtype
    init = (v0, jnp.zeros((), cdt), jnp.array(jnp.inf, rdt),
            jnp.zeros((), jnp.int32))
    x, theta, resid, it = jax.lax.while_loop(cond, restart, init)
    return EigsResult(theta, x, resid, it, resid <= tol)


def dominant_eigs_real(matvec: Callable, v0, m: int = 30,
                       maxrestarts: int = 100, tol=1e-12) -> EigsResult:
    """Largest-magnitude (near-)REAL eigenpair of a general operator.
    Restarted Arnoldi with host Rayleigh-Ritz selection; falls back to the
    plain dominant pair when no real Ritz value exists."""

    cdt = basis_inner_all(basis_zeros(v0, 1), v0).dtype

    def small_select(Hm, nvalid):
        shapes = (jax.ShapeDtypeStruct((), jnp.complex128),
                  jax.ShapeDtypeStruct((m,), jnp.complex128))
        theta, z = jax.pure_callback(
            _host_eig_real_select, shapes, Hm.astype(jnp.complex128), nvalid,
            vmap_method="sequential")
        return theta, z.astype(cdt)

    def restart(state):
        v, _, _, it = state
        V, H, nvalid = arnoldi_factorize(matvec, v, m)
        theta, z = small_select(H[:m, :m], nvalid)
        x = basis_combine(V, jnp.pad(z, (0, 1)))
        xn = tree_norm(x)
        x = tree_scale(1.0 / jnp.maximum(xn, _BREAKDOWN), x)
        last = jnp.clip(nvalid - 1, 0, m - 1)
        resid = jnp.where(
            nvalid < m,
            jnp.zeros((), jnp.abs(theta).dtype),
            jnp.abs(H[last + 1, last] * z[last])
            / jnp.maximum(jnp.abs(theta), _BREAKDOWN),
        )
        theta = theta.astype(cdt) if jnp.issubdtype(cdt, jnp.complexfloating) \
            else jnp.real(theta).astype(cdt)
        return x, theta, resid.astype(jnp.zeros((), cdt).real.dtype), it + 1

    def cond(state):
        _, _, resid, it = state
        return jnp.logical_and(it < maxrestarts,
                               jnp.logical_or(it < 1, resid > tol))

    rdt = jnp.zeros((), cdt).real.dtype
    init = (v0, jnp.zeros((), cdt), jnp.array(jnp.inf, rdt),
            jnp.zeros((), jnp.int32))
    x, theta, resid, it = jax.lax.while_loop(cond, restart, init)
    return EigsResult(theta, x, resid, it, resid <= tol)
