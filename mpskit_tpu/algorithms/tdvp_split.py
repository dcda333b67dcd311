"""Finite TDVP in split-complex (real-pair) arithmetic — TPU-native time
evolution for backends with NO complex dtype support (the axon v5e runtime
rejects even complex64 array creation with UNIMPLEMENTED; see
tensors/splitc.py and scripts/tpu_complex_check.py).

Mirrors the complex-native `_timestep_finite` (algorithms/tdvp.py,
reference src/algorithms/timestep/tdvp.jl:61-91): a symmetric second-order
left-right / right-left sweep with backward bond evolution. State tensors
are split arrays (2, ...) (leading axis = re/im); the MPO W stays real
(real Hamiltonians; a complex W would use reinsum -> ceinsum).

The Krylov exponentials run the REAL Lanczos recurrence directly on the
split arrays: for a Hermitian complex-linear H_eff every Lanczos Gram
coefficient is real in exact arithmetic, so real inner products
(= Re<.,.>_C) reproduce the complex Krylov basis and tridiagonal exactly;
only the final Ritz combination exp(-i dt T) e1 carries complex
coefficients (applied via the split basis and its i-rotation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..linalg.lanczos import lanczos_factorize, _tridiag
from ..linalg.basis import basis_combine
from ..utils.tree import tree_norm, tree_scale
from ..tensors.splitc import (
    sc, ceinsum, reinsum, cconj, cmuli, cvdot, leftorth_split,
    rightorth_split,
)
from ..environments.finite import left_boundary, right_boundary


# ----------------------------------------------------------------------------
# derivative kernels (split state, real W)
# ----------------------------------------------------------------------------

def ac_apply_split(GL, W, GR, x):
    """H_eff^{AC} on a split center tensor; GL/GR split (2,w,D,D), W real."""
    t = ceinsum("axy,ytn->axtn", GL, x)
    t = reinsum("axtn,abst->bxsn", t, W)
    return ceinsum("bxsn,brn->xsr", t, GR)


def c_apply_split(GL, GR, x):
    t = ceinsum("axy,yn->axn", GL, x)
    return ceinsum("axn,arn->xr", t, GR)


def transfer_left_mpo_split(GL, W, A):
    """Push a split left environment through a split site tensor."""
    t = ceinsum("axy,ytn->axtn", GL, A)
    t = reinsum("axtn,abst->bxsn", t, W)
    return ceinsum("xsm,bxsn->bmn", cconj(A), t)


def transfer_right_mpo_split(GR, W, A):
    t = ceinsum("ytn,bmn->bytm", A, GR)
    t = reinsum("bytm,abst->aysm", t, W)
    return ceinsum("xsm,aysm->axy", cconj(A), t)


def compute_right_envs_split(ARs, Ws, GR_boundary):
    """GRs[i] = environment right of bond i (pairs site i-1); GRs[L] is the
    boundary. ARs (2, L, D, d, D) -> stacked (L+1, 2, w, D, D)."""
    L = ARs.shape[1]

    def body(GR, xs):
        W, AR = xs
        GR2 = transfer_right_mpo_split(GR, W, AR)
        return GR2, GR2

    ARs_t = jnp.swapaxes(ARs, 0, 1)            # (L, 2, D, d, D)
    _, ys = jax.lax.scan(body, GR_boundary, (Ws, ARs_t), reverse=True)
    return jnp.concatenate([ys, GR_boundary[None]], axis=0)


# ----------------------------------------------------------------------------
# split Krylov exponential: y = exp(-i dt H) v, H Hermitian complex-linear
# ----------------------------------------------------------------------------

def expm_multiply_split(matvec, v, dt, m: int):
    """exp(-i dt A) v for Hermitian complex-linear A given in split form.
    Returns (y, err, drift): err is the Saad truncation estimate
    (linalg/expm.py); drift is the PRE-projection radial error |ny/n0 - 1|
    — the honest norm-loss diagnostic (the returned y is projected back to
    norm n0, so measuring ||y|| downstream is true by construction and
    would hide mask/gauge norm-loss bugs)."""
    n0 = tree_norm(v)
    V, alpha, beta, nvalid = lanczos_factorize(matvec, v, m)
    T = _tridiag(alpha, beta, nvalid, 0.0)
    evals, evecs = jnp.linalg.eigh(T)
    w0 = evecs[0, :]                           # Q^T e1
    ph = dt * evals
    cr = evecs @ (jnp.cos(ph) * w0)            # Re exp(-i dt T) e1
    ci = evecs @ (-jnp.sin(ph) * w0)           # Im exp(-i dt T) e1
    yA = basis_combine(V, jnp.pad(cr, (0, 1)))  # sum Re(c_j) v_j
    yB = basis_combine(V, jnp.pad(ci, (0, 1)))  # sum Im(c_j) v_j
    y = yA + cmuli(yB)                          # sum c_j v_j
    last = jnp.clip(nvalid - 1, 0, m - 1)
    err = jnp.abs(beta[last]) * jnp.sqrt(cr[last] ** 2 + ci[last] ** 2)
    # exp(-i dt A) is an exact isometry for Hermitian A, so ||y|| = 1 in
    # exact arithmetic; at the TPU's X3 matmul precision the CGS basis
    # loses orthonormality by ~1e-6 per product and the radial component
    # of that error random-walks to ~1e-3 norm drift per step (measured
    # L=16 D=64: 1e-3/step on v5e vs 4e-6 on CPU f32). Projecting back
    # onto the sphere removes exactly the noise component; the energy is
    # insensitive (it is a Rayleigh quotient).
    # y is assembled from the UNIT-normalized start vector, so in exact
    # arithmetic ||y|| = 1; the radial rounding error is |ny - 1|
    ny = tree_norm(y)
    drift = jnp.abs(ny - 1.0)
    return tree_scale(n0 / jnp.maximum(ny, 1e-30), y), err, drift


# ----------------------------------------------------------------------------
# the symmetric second-order finite sweep (split mirror of _timestep_finite)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(5,))
def _timestep_finite_split(ALs, ARs, AC, Ws, GRs, m: int, dt=0.01,
                           masks=None):
    """ALs/ARs (2, L, D, d, D), AC (2, D, d, D), GRs (L+1, 2, w, D, D).
    Starts and ends with center = 0.

    masks: optional (L, D, d, D) support masks of the padded finite chain,
    re-applied after every gauge decomposition — at f32 the QR junk
    columns at rank-deficient edge sites otherwise leak out of the
    supported block (CLAUDE.md; measured 1e-2 norm drift over 3 steps at
    L=32 D=256 f32 on v5e without the masks, f32-floor with them)."""
    L, D = ALs.shape[1], ALs.shape[2]
    w = Ws.shape[1]
    dtype = AC.dtype
    GL0 = sc(left_boundary(w, D, dtype))
    GRL = sc(right_boundary(w, D, dtype))
    h = dt / 2
    if masks is None:
        maskf = jnp.ones((L, 1, 1, 1), dtype)
    else:
        maskf = masks.astype(dtype)

    def stepL(carry, xs):
        AC, GL = carry
        W, AR_next, GR_next, is_last, mk = xs
        AC, errA, drA = expm_multiply_split(
            lambda x: ac_apply_split(GL, W, GR_next, x), AC, h, m)
        AC = AC * mk[None]
        AL, C = leftorth_split(AC)
        AL = AL * mk[None]
        GL_next = transfer_left_mpo_split(GL, W, AL)
        C, errC, drC = jax.lax.cond(
            is_last,
            lambda C: (C, jnp.zeros((), errA.dtype),
                       jnp.zeros((), drA.dtype)),
            lambda C: expm_multiply_split(
                lambda x: c_apply_split(GL_next, GR_next, x), C, -h, m),
            C,
        )
        AC_next = ceinsum("lm,mpr->lpr", C, AR_next)
        AC_last = ceinsum("lpm,mr->lpr", AL, C)
        AC_next = jnp.where(is_last, AC_last, AC_next)
        return (AC_next, GL_next), (AL, GL, jnp.maximum(errA, errC),
                                    jnp.maximum(drA, drC))

    is_last = jnp.arange(L) == L - 1
    ARs_t = jnp.swapaxes(ARs, 0, 1)
    xsL = (Ws, jnp.roll(ARs_t, -1, axis=0), GRs[1:], is_last, maskf)
    (AC, _), (ALs_n, GLs_scan, errsL, driftsL) = jax.lax.scan(
        stepL, (AC, GL0), xsL)
    ALs = jnp.swapaxes(ALs_n, 0, 1)
    GLs = GLs_scan                              # (L, 2, w, D, D)

    def stepR(carry, xs):
        AC, GR = carry
        W, AL_prev, GL_i, is_first, mk = xs
        AC, errA, drA = expm_multiply_split(
            lambda x: ac_apply_split(GL_i, W, GR, x), AC, h, m)
        AC = AC * mk[None]
        C, AR = rightorth_split(AC)
        AR = AR * mk[None]
        GR_prev = transfer_right_mpo_split(GR, W, AR)
        C, errC, drC = jax.lax.cond(
            is_first,
            lambda C: (C, jnp.zeros((), errA.dtype),
                       jnp.zeros((), drA.dtype)),
            lambda C: expm_multiply_split(
                lambda x: c_apply_split(GL_i, GR_prev, x), C, -h, m),
            C,
        )
        AC_prev = ceinsum("lpm,mr->lpr", AL_prev, C)
        AC_first = ceinsum("lm,mpr->lpr", C, AR)
        AC_prev = jnp.where(is_first, AC_first, AC_prev)
        return (AC_prev, GR_prev), (AR, GR, jnp.maximum(errA, errC),
                                    jnp.maximum(drA, drC))

    is_first = jnp.arange(L) == 0
    ALs_t = jnp.swapaxes(ALs, 0, 1)
    xsR = (Ws, jnp.roll(ALs_t, 1, axis=0), GLs, is_first, maskf)
    (AC, _), (ARs_n, GRs_scan, errsR, driftsR) = jax.lax.scan(
        stepR, (AC, GRL), xsR, reverse=True)
    ARs_new = jnp.swapaxes(ARs, 0, 1).at[1:].set(ARs_n[1:])
    ARs = jnp.swapaxes(ARs_new, 0, 1)
    GRs_new = jnp.concatenate([GRs_scan[0][None], GRs_scan], axis=0)
    exp_err = jnp.maximum(jnp.max(errsL), jnp.max(errsR))
    # pre-projection radial drift, the honest norm-loss diagnostic
    # (ADVICE r4: the projected state's norm is 1 by construction)
    norm_drift = jnp.maximum(jnp.max(driftsL), jnp.max(driftsR))
    # TDVP is a flow on the unit sphere (every local map is an isometry in
    # exact arithmetic), so renormalizing the center once per step is the
    # standard constraint-manifold projection — it removes ONLY rounding
    # noise (the 2L-1 X3-precision QR panels contribute ~5e-4/step radial
    # drift at L=32 D=256 on v5e; the tangent error is untouched and the
    # energy, a Rayleigh quotient, is insensitive).
    nAC = jnp.sqrt(jnp.sum(AC * AC))
    norm_drift = jnp.maximum(norm_drift, jnp.abs(nAC - 1.0))
    AC = AC / jnp.maximum(nAC, 1e-30)
    return ALs, ARs, AC, GRs_new, exp_err, norm_drift


@partial(jax.jit, static_argnames=("m",))
def expectation_value_split(AC, Ws, GRs, m=None):
    """<psi| H |psi> / <psi|psi> with center = 0 (real part)."""
    D = AC.shape[1]
    w = Ws.shape[1]
    GL0 = sc(left_boundary(w, D, AC.dtype))
    y = ac_apply_split(GL0, Ws[0], GRs[1], AC)
    er, _ = cvdot(AC, y)
    nr = jnp.sum(AC * AC)
    return er / nr


def timestep_split(psi_split, H, dt, m: int = 30, masks=None):
    """One split-complex TDVP step on a finite state given as
    (ALs, ARs, AC) split arrays with center 0. Returns the updated triple
    plus (GRs, exp_err, norm_drift) — norm_drift is the max PRE-projection
    radial error of the step's Krylov exponentials (see
    `_timestep_finite_split`). masks: optional (L, D, d, D) support
    masks."""
    from ..environments.finite import stack_W

    ALs, ARs, AC = psi_split
    L = ALs.shape[1]
    D = ALs.shape[2]
    Ws = stack_W(H, L).astype(AC.dtype)
    w = Ws.shape[1]
    if masks is not None:
        # Mask the gauges BEFORE building environments (state-neutral: the
        # dead-block QR junk never enters the physical contraction). Envs
        # from unmasked ARs carry large live-row x dead-col junk blocks, so
        # H_eff moves GENUINE weight off-support and the in-sweep masking
        # then deletes it — measured 7.4e-3 norm loss over 3 steps at L=32
        # D=256 on v5e before this fix (TPU_COMPLEX artifact history).
        mk = masks.astype(AC.dtype)
        ALs = ALs * mk[None]                    # (2, L, D, d, D)
        ARs = ARs * mk[None]
        AC = AC * mk[0][None]                   # center 0: (2, D, d, D)
    GRs = compute_right_envs_split(ARs, Ws, sc(right_boundary(w, D, AC.dtype)))
    ALs, ARs, AC, GRs, err, drift = _timestep_finite_split(
        ALs, ARs, AC, Ws, GRs, m, dt=dt, masks=masks)
    return (ALs, ARs, AC), GRs, err, drift
