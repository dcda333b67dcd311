"""Infinite DMRG (reference src/algorithms/groundstate/idmrg.jl).

IDMRG1: alternating left/right sweeps through the unit cell with in-place
environment pushes (the functional counterpart of the reference's IDMRGEnv,
src/environments/idmrgenv.jl) — environments grow by one unit cell per
iteration instead of being re-solved. The identity FSM level is
re-regularized on every push so the accumulated energy shift never enters
the effective Hamiltonians.

IDMRG2: two-site variant with truncated-SVD re-splitting and the
unit-cell-edge update (reference idmrg.jl:93-204).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_ITER
from ..linalg.lanczos import eigsh_smallest
from ..states.infinitemps import InfiniteMPS
from ..tensors.ops import leftorth, rightorth, svd_truncated, TruncationScheme, notrunc
from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
from ..environments.infinite_ham import hamiltonian_environments, pairing
from ..utils.logging import IterLog
from ..utils.dynamictols import updatetol
from .derivatives import ac_apply, ac2_apply
from .unionalg import Chainable


@dataclasses.dataclass(frozen=True)
class IDMRG1(Chainable):
    tol: float = 1e-9
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 4
    verbosity: int = Defaults.verbosity


@dataclasses.dataclass(frozen=True)
class IDMRG2(Chainable):
    tol: float = 1e-9
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 4
    trscheme: TruncationScheme = dataclasses.field(default_factory=notrunc)
    verbosity: int = Defaults.verbosity


def _reg_left(GL, C):
    """Subtract the identity component of the top FSM level (energy drift)."""
    w = GL.shape[0]
    D = GL.shape[1]
    cap = jnp.einsum("mk,nk->mn", C.conj(), C)
    coeff = pairing(GL[w - 1], cap)
    return GL.at[w - 1].add(-coeff * jnp.eye(D, dtype=GL.dtype))


def _reg_right(GR, C):
    D = GR.shape[1]
    cap = jnp.einsum("km,kn->mn", C.conj(), C)
    coeff = pairing(GR[0], cap)
    return GR.at[0].add(-coeff * jnp.eye(D, dtype=GR.dtype))


@partial(jax.jit, static_argnums=(6, 7))
def _idmrg1_iteration(ALs, ARs, AC0, Cs, GLs, GRs, m: int, restarts: int,
                      Ws=None, inner_tol=1e-6):
    L = ALs.shape[0]

    # ---- left-to-right through the unit cell ----
    def stepL(carry, xs):
        AC, GL = carry
        W, GR, AR_next = xs
        res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC,
                             m, restarts, inner_tol)
        AL, C = leftorth(res.eigenvector)
        GL_next = _reg_left(transfer_left_mpo(GL, W, AL, AL), C)
        AC_next = jnp.einsum("lm,mpr->lpr", C, AR_next)
        return (AC_next, GL_next), (AL, C, GL_next, res.converged,
                                    res.residual)

    xsL = (Ws, GRs, jnp.roll(ARs, -1, axis=0))
    (AC, _), (ALs_n, CsL, GL_out, convL, residL) = jax.lax.scan(
        stepL, (AC0, GLs[0]), xsL)
    # GL_out[i] = env for site i+1; new GLs[(i+1)%L] = GL_out[i]
    GLs = jnp.roll(GL_out, 1, axis=0)

    # ---- right-to-left ----
    def stepR(carry, xs):
        AC, GR = carry
        W, GL, AL_prev = xs
        res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC,
                             m, restarts, inner_tol)
        C, AR = rightorth(res.eigenvector)
        GR_prev = _reg_right(transfer_right_mpo(GR, W, AR, AR), C)
        AC_prev = jnp.einsum("lpm,mr->lpr", AL_prev, C)
        return (AC_prev, GR_prev), (AR, C, GR_prev, res.eigenvalue,
                                    res.converged, res.residual)

    xsR = (Ws, GLs, jnp.roll(ALs_n, 1, axis=0))
    (AC, _), (ARs_n, CsR_prev, GR_out, lams, convR, residR) = jax.lax.scan(
        stepR, (AC, GRs[L - 1]), xsR, reverse=True)
    # GR_out[i] = env for site i-1; new GRs[(i-1)%L] = GR_out[i]
    GRs = jnp.roll(GR_out, -1, axis=0)
    # CsR_prev[i] = C at bond left of site i = C[i-1]
    Cs_new = jnp.roll(CsR_prev, -1, axis=0)

    err = jnp.linalg.norm(Cs_new[L - 1] - Cs[L - 1])
    # solver diagnostics: (# unconverged site eigensolves, worst residual)
    # — driver warns on the host (reference fixedpoint.jl:12-14)
    diag = ((jnp.sum(~convL) + jnp.sum(~convR)).astype(jnp.int32),
            jnp.maximum(jnp.max(residL), jnp.max(residR)))
    return ALs_n, ARs_n, AC, Cs_new, GLs, GRs, lams[0], err, diag


def find_groundstate_idmrg1(psi: InfiniteMPS, H, alg: IDMRG1 = IDMRG1()):
    L = psi.period
    envs = hamiltonian_environments(psi, H)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    ALs, ARs, Cs = psi.AL, psi.AR, psi.C
    AC0 = psi.AC[0]
    GLs, GRs = envs.GLs, envs.GRs

    log = IterLog("IDMRG1", alg.verbosity)
    err = 1.0
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(err, it)
        ALs, ARs, AC0, Cs, GLs, GRs, lam, err, diag = _idmrg1_iteration(
            ALs, ARs, AC0, Cs, GLs, GRs, alg.krylovdim, alg.eig_maxrestarts,
            Ws=Ws, inner_tol=inner_tol)
        err = float(err)
        log.solver_warn(it, diag, float(inner_tol))
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, float(jnp.real(lam)), err)
        if err < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, 0.0, err)

    # re-gauge into a clean uniform MPS (reference idmrg.jl:64-68)
    psi = InfiniteMPS.from_A(ARs)
    envs = hamiltonian_environments(psi, H)
    return psi, envs, err


@partial(jax.jit, static_argnums=(6, 7, 8))
def _idmrg2_iteration(ALs, ARs, AC0, Ss_prev, GLs, GRs, m: int, restarts: int,
                      trscheme: TruncationScheme, Ws=None, inner_tol=1e-6):
    """One IDMRG2 iteration: L2R then R2L over all L bonds of the unit cell
    (periodic wrap included; the reference's inv(C) edge patch is avoided by
    carrying AC through the scans). Requires L >= 2."""
    L, D, d = ALs.shape[0], ALs.shape[1], ALs.shape[2]

    def split2(theta):
        U, S, Vh, err = svd_truncated(theta.reshape(D * d, d * D), D, trscheme)
        S = S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
        return U.reshape(D, d, D), S, Vh.reshape(D, d, D), err

    def _regC(S, dtype):
        return jnp.diag(S.astype(dtype))

    # ---- left-to-right over bonds i = 0..L-1 (bond i = sites (i, i+1)) ----
    def stepL(carry, xs):
        AC, GL = carry  # AC at site i, GL left of site i
        W1, W2, GR_next, AR_next = xs
        theta = jnp.einsum("lpm,mqr->lpqr", AC, AR_next)
        res = eigsh_smallest(
            lambda x: ac2_apply(GL, W1, W2, GR_next, x), theta,
            m, restarts, inner_tol)
        AL, S, AR, err = split2(res.eigenvector)
        GL_next = _reg_left(transfer_left_mpo(GL, W1, AL, AL),
                            _regC(S, AL.dtype))
        AC_next = jnp.einsum("m,mqr->mqr", S, AR)
        return (AC_next, GL_next), (AL, S, GL_next, err, res.converged,
                                    res.residual)

    xsL = (Ws, jnp.roll(Ws, -1, axis=0), jnp.roll(GRs, -1, axis=0),
           jnp.roll(ARs, -1, axis=0))
    (AC, _), (ALs_n, SsL, GL_out, errL, convL, residL) = jax.lax.scan(
        stepL, (AC0, GLs[0]), xsL)
    # GL_out[i] = env left of site i+1 -> new GLs[(i+1) % L]
    GLs = jnp.roll(GL_out, 1, axis=0)

    # ---- right-to-left over bonds i = L-1..0 ----
    def stepR(carry, xs):
        AC, GR = carry  # AC at site i+1, GR right of site i+1
        W1, W2, GL, AL_prev = xs
        theta = jnp.einsum("lpm,mqr->lpqr", AL_prev, AC)
        res = eigsh_smallest(
            lambda x: ac2_apply(GL, W1, W2, GR, x), theta,
            m, restarts, inner_tol)
        AL, S, AR, err = split2(res.eigenvector)
        GR_prev = _reg_right(transfer_right_mpo(GR, W2, AR, AR),
                             _regC(S, AR.dtype))
        AC_prev = jnp.einsum("lpm,m->lpm", AL, S)
        return (AC_prev, GR_prev), (AR, S, GR_prev, err, res.eigenvalue,
                                    res.converged, res.residual)

    xsR = (Ws, jnp.roll(Ws, -1, axis=0), GLs, ALs_n)
    # first processed bond is L-1: AC at site 0 is the L2R carry; GR right of
    # site 0 is the pre-pass GRs[0]
    (AC, _), (ARs_shift, SsR, GR_out, errR, lams, convR, residR) = \
        jax.lax.scan(stepR, (AC, GRs[0]), xsR, reverse=True)
    # ys[i] belongs to bond i: AR for site (i+1) % L, GR right of site i
    ARs_n = jnp.roll(ARs_shift, 1, axis=0)
    GRs = GR_out
    Ss_new = SsR  # Ss_new[i] = Schmidt values at bond i

    err_trunc = jnp.maximum(jnp.max(errL), jnp.max(errR))
    dC = jnp.linalg.norm(Ss_new[L - 1] - Ss_prev[L - 1])
    diag = ((jnp.sum(~convL) + jnp.sum(~convR)).astype(jnp.int32),
            jnp.maximum(jnp.max(residL), jnp.max(residR)))
    return ALs_n, ARs_n, AC, Ss_new, GLs, GRs, lams[0], dC, err_trunc, diag


def find_groundstate_idmrg2(psi: InfiniteMPS, H, alg: IDMRG2 = IDMRG2()):
    L = psi.period
    assert L >= 2, "IDMRG2 needs a unit cell of at least 2 sites"
    envs = hamiltonian_environments(psi, H)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    ALs, ARs = psi.AL, psi.AR
    AC0 = psi.AC[0]
    Ss = jnp.stack([jnp.linalg.svd(psi.C[i], compute_uv=False)
                    for i in range(L)])
    GLs, GRs = envs.GLs, envs.GRs

    log = IterLog("IDMRG2", alg.verbosity)
    err = 1.0
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(err, it)
        (ALs, ARs, AC0, Ss, GLs, GRs, lam, err, err_trunc,
         diag) = _idmrg2_iteration(
            ALs, ARs, AC0, Ss, GLs, GRs, alg.krylovdim, alg.eig_maxrestarts,
            alg.trscheme, Ws=Ws, inner_tol=inner_tol)
        err = float(err)
        log.solver_warn(it, diag, float(inner_tol))
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, float(jnp.real(lam)), err)
        if err < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, 0.0, err)

    psi = InfiniteMPS.from_A(ARs)
    envs = hamiltonian_environments(psi, H)
    return psi, envs, err
