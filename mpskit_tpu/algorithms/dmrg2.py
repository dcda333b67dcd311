"""Two-site DMRG (reference src/algorithms/groundstate/dmrg.jl:80-137).

The two-site tensor is solved with on-device Lanczos and re-split with a
truncated SVD; truncation is *masked* (static shapes), so the whole sweep
stays one jitted scan. The per-bond error is the discarded Schmidt weight,
matching the reference's fidelity-based local error measure.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_ITER
from ..linalg.lanczos import eigsh_smallest
from ..states.finitemps import FiniteMPS, physical_bond_dims
from ..tensors.ops import svd_truncated, TruncationScheme, notrunc
from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
from ..environments.finite import (
    left_boundary, right_boundary, compute_right_envs, compute_left_envs,
    stack_W, FiniteEnv,
)
from ..utils.logging import IterLog
from ..utils.dynamictols import updatetol
from .derivatives import ac2_apply
from .unionalg import Chainable


@dataclasses.dataclass(frozen=True)
class DMRG2(Chainable):
    tol: float = 1e-10
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 10
    trscheme: TruncationScheme = dataclasses.field(default_factory=notrunc)
    verbosity: int = Defaults.verbosity
    finalize: Optional[Callable] = None


def bond_support_vectors(L: int, d: int, D: int) -> np.ndarray:
    """(L+1, D) boolean vectors: entry k of bond i is within the maximal
    physical rank min(d^i, d^(L-i), D). The two-site support mask factors
    as an outer product of these (theta at bond (i, i+1) is supported on
    rows sup[i] and columns sup[i+2]), so the vectors replace the full
    (L, D, d, D) `support_mask` in the two-site sweeps at O(L·D) memory."""
    dims = physical_bond_dims(L, d, D)
    return np.arange(D)[None, :] < dims[:, None]


def _dmrg2_sweep_impl(ALs, ARs, AC, Ws, GRs, inner_tol, m: int,
                      restarts: int, trscheme: TruncationScheme,
                      GL0=None, GRL=None, sup=None):
    """One full two-site sweep (bonds 0..L-2 left-to-right, then back),
    starting and ending with center = 0. GL0/GRL override the open-chain
    boundary environments (WindowMPS / segment-parallel callers); `sup`
    is the (L+1, D) bond-support mask from `bond_support_vectors` — the
    padded finite MPS re-applies it after every eigensolve + SVD split
    (in f32 the solver and the Gram-route SVD otherwise leak amplitude
    into the unsupported block, see states/finitemps.support_mask)."""
    L, D = ALs.shape[0], ALs.shape[1]
    d = ALs.shape[2]
    w = Ws.shape[1]
    dtype = AC.dtype
    if GL0 is None:
        GL0 = left_boundary(w, D, dtype)
    if GRL is None:
        GRL = right_boundary(w, D, dtype)
    if sup is None:
        supf = jnp.ones((L + 1, 1), dtype)
    else:
        supf = sup.astype(dtype)

    def split2(theta, rowm, midm, colm):
        theta = theta * rowm[:, None, None, None] * colm[None, None, None, :]
        theta = theta / jnp.maximum(jnp.linalg.norm(theta), 1e-30)
        U, S, Vh, err = svd_truncated(theta.reshape(D * d, d * D), D, trscheme)
        S = S * midm
        S = S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
        AL = U.reshape(D, d, D) * rowm[:, None, None] * midm[None, None, :]
        AR = Vh.reshape(D, d, D) * midm[:, None, None] * colm[None, None, :]
        return AL, S, AR, err

    # ---- left-to-right over bonds (i, i+1), i = 0..L-2 ----
    def stepL(carry, xs):
        AC, GL = carry
        W1, W2, AR_next, GR_next, rowm, midm, colm = xs
        theta = jnp.einsum("lpm,mqr->lpqr", AC, AR_next)
        res = eigsh_smallest(
            lambda x: ac2_apply(GL, W1, W2, GR_next, x), theta,
            m, restarts, inner_tol)
        AL, S, AR, err = split2(res.eigenvector, rowm, midm, colm)
        GL_next = transfer_left_mpo(GL, W1, AL, AL)
        AC_next = S[:, None, None] * AR
        return (AC_next, GL_next), (AL, GL, res.eigenvalue, err,
                                    res.converged, res.residual)

    xsL = (Ws[: L - 1], Ws[1:], ARs[1:], GRs[2:],
           supf[: L - 1], supf[1:L], supf[2:])
    (AC, GL_last), (ALs_new, GLs_scan, lamsL, errL, convL, residL) = \
        jax.lax.scan(stepL, (AC, GL0), xsL)
    ALs = ALs.at[: L - 1].set(ALs_new)
    GLs = jnp.concatenate([GLs_scan, GL_last[None]], axis=0)

    # ---- right-to-left over bonds (i, i+1), i = L-2..0 ----
    def stepR(carry, xs):
        AC, GR = carry
        W1, W2, AL_prev, GL_i, rowm, midm, colm = xs
        theta = jnp.einsum("lpm,mqr->lpqr", AL_prev, AC)
        res = eigsh_smallest(
            lambda x: ac2_apply(GL_i, W1, W2, GR, x), theta,
            m, restarts, inner_tol)
        AL, S, AR, err = split2(res.eigenvector, rowm, midm, colm)
        GR_prev = transfer_right_mpo(GR, W2, AR, AR)
        AC_prev = AL * S[None, None, :]
        return (AC_prev, GR_prev), (AR, GR, res.eigenvalue, err,
                                    res.converged, res.residual)

    # bond i uses (Ws[i], Ws[i+1], ALs[i], GLs[i]); i runs L-2..0
    xsR = (Ws[: L - 1], Ws[1:], ALs[: L - 1], GLs[: L - 1],
           supf[: L - 1], supf[1:L], supf[2:])
    (AC, GR_last), (ARs_new, GRs_scan, lamsR, errR, convR, residR) = \
        jax.lax.scan(stepR, (AC, GRL), xsR, reverse=True)
    ARs = ARs.at[1:].set(ARs_new)
    # GRs_new[j] pairing: scan output j = GR before bond j = GRs[j+2]
    GRs = jnp.concatenate([GR_last[None], GR_last[None], GRs_scan], axis=0)

    lam = lamsR[0]
    err = jnp.maximum(jnp.max(errL), jnp.max(errR))
    n_unconv = (jnp.sum(~convL) + jnp.sum(~convR)).astype(jnp.int32)
    diag = (n_unconv, jnp.maximum(jnp.max(residL), jnp.max(residR)))
    return ALs, ARs, AC, GRs, lam, err, diag


_dmrg2_sweep = partial(jax.jit, static_argnums=(6, 7, 8),
                       donate_argnums=(0, 1, 2, 4))(_dmrg2_sweep_impl)


def find_groundstate_dmrg2(psi: FiniteMPS, H, alg: DMRG2 = DMRG2()):
    L, D = psi.length, psi.D
    psi = psi.move_center(0)
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, psi.dtype))
    sup = jnp.asarray(bond_support_vectors(L, psi.physicaldim, D))

    log = IterLog("DMRG2", alg.verbosity)
    # copies: the sweep donates its tensor args on TPU (see _dmrg_sweep)
    ALs, ARs, AC = (jnp.array(x, copy=True)
                    for x in (psi.ALs, psi.ARs, psi.AC))
    eps = 1.0
    lam_prev = None
    lam = jnp.zeros(())
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        ALs, ARs, AC, GRs, lam, err, diag = _dmrg2_sweep(
            ALs, ARs, AC, Ws, GRs, inner_tol,
            alg.krylovdim, alg.eig_maxrestarts, alg.trscheme, sup=sup)
        psi = FiniteMPS(ALs, ARs, AC, 0)
        if alg.finalize is not None:
            psi = alg.finalize(it, psi, H) or psi
            ALs, ARs, AC = (jnp.array(x, copy=True)
                            for x in (psi.ALs, psi.ARs, psi.AC))
        log.solver_warn(it, diag, float(inner_tol))
        lam_f = float(jnp.real(lam))
        # convergence: energy stationarity + truncation error floor
        eps = abs(lam_f - lam_prev) if lam_prev is not None else 1.0
        lam_prev = lam_f
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, lam_f, eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, float(jnp.real(lam)), eps)

    GLs = compute_left_envs(ALs, Ws, left_boundary(w, D, psi.dtype))
    return psi, FiniteEnv(GLs, GRs), eps
