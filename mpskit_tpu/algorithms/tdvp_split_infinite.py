"""Infinite (uniform) TDVP in split-complex arithmetic — real-time
evolution of infinite MPS on TPU backends with no complex dtype.

Mirrors the complex-native `_timestep_infinite` (algorithms/tdvp.py,
reference src/algorithms/timestep/tdvp.jl:21-59): Hamiltonian environments
with regularized geometric-series solves, vmapped Krylov exponentials of
the AC/C effective Hamiltonians, local QR/LQ regauge. The state is complex
(split (2, ...) re/im layout, tensors/splitc.py); the MPO W stays real.
The geometric tails run the dtype-agnostic restarted GMRES on the
realified transfer operator; the exponentials run the real-Lanczos
split Krylov of `tdvp_split.expm_multiply_split`.

CPU parity: tests/test_tdvp_split_infinite.py pins one step against the
complex-native `_timestep_infinite` (c128) to f64 tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..operators.mpo import (
    MPOHamiltonian, DIAG_ZERO, DIAG_IDENTITY,
)
from ..linalg.gmres import linsolve_info
from ..tensors.splitc import (
    sc, from_complex, to_complex, ceinsum, reinsum, cconj, qr_pos_split,
    lq_pos_split,
)
from .tdvp_split import expm_multiply_split

_ENV_RESTART = 12
_ENV_MAXITER = 100


# ----------------------------------------------------------------------------
# split transfer kernels (complex state, real W)
# ----------------------------------------------------------------------------

def pairing_split(v, cap):
    """Bilinear pairing einsum('xy,xy->') on split operands -> (2,)."""
    return ceinsum("xy,xy->", v, cap)


def transfer_left_block_split(v, Wab, A):
    t = ceinsum("xy,ytn->xtn", v, A)
    t = reinsum("xtn,st->xsn", t, Wab)
    return ceinsum("xsm,xsn->mn", cconj(A), t)


def transfer_right_block_split(v, Wab, A):
    t = ceinsum("ytn,mn->ytm", A, v)
    t = reinsum("ytm,st->ysm", t, Wab)
    return ceinsum("xsm,ysm->xy", cconj(A), t)


def source_col_left_split(GL_i, Wcol, A):
    t = reinsum("axy,ast->xyst", GL_i, Wcol)
    t = ceinsum("xyst,xsm->ytm", t, cconj(A))
    return ceinsum("ytm,ytn->mn", t, A)


def source_row_right_split(GR_i, Wrow, A):
    t = reinsum("bmn,bst->mnst", GR_i, Wrow)
    t = ceinsum("mnst,xsm->ntx", t, cconj(A))
    return ceinsum("ntx,ytn->xy", t, A)


def rho_rights_split(C):
    """(2, L, D, D): cap[m,n] = sum_k conj(C[m,k]) C[n,k]."""
    return ceinsum("imk,ink->imn", cconj(C), C)


def rho_lefts_split(C):
    return ceinsum("ikm,ikn->imn", cconj(C), C)


# ----------------------------------------------------------------------------
# split Hamiltonian environments (mirror of infinite_ham.calc_lw/calc_rw)
# ----------------------------------------------------------------------------

def calc_lw_split(AL, C, H: MPOHamiltonian, tol=1e-10, GL_init=None):
    """AL (2, L, D, d, D), C (2, L, D, D) split. Returns
    (GLs (2, L, w, D, D), e_cell (2,), resid)."""
    L, D = AL.shape[1], AL.shape[2]
    w = H.odim
    dtype = AL.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)

    eye = jnp.eye(D, dtype=dtype)
    GLs = jnp.zeros((2, L, w, D, D), dtype)
    GLs = GLs.at[0, :, 0].set(eye)
    caps_all = rho_rights_split(C)                    # (2, L, D, D)
    cap = caps_all[:, L - 1]
    e_cell = jnp.zeros((2,), dtype)
    resid = jnp.zeros((), dtype)
    AL_t = jnp.swapaxes(AL, 0, 1)                     # (L, 2, D, d, D)

    for b in range(1, w):
        Wdiag = Ws[:, b, b]
        Wcol = Ws[:, :, b].at[:, b].set(0.0)

        def cycle(x, with_diag=True, _Wdiag=Wdiag, _Wcol=Wcol):
            def body(x, xs):
                GL_i, Wd, Wc, A = xs
                xn = source_col_left_split(GL_i, Wc, A)
                if with_diag:
                    xn = xn + transfer_left_block_split(x, Wd, A)
                return xn, xn

            return jax.lax.scan(
                body, x, (jnp.swapaxes(GLs, 0, 1), _Wdiag, _Wcol, AL_t))

        def diag_cycle(x, _Wdiag=Wdiag):
            def body(x, xs):
                Wd, A = xs
                return transfer_left_block_split(x, Wd, A), None

            x_end, _ = jax.lax.scan(body, x, (_Wdiag, AL_t))
            return x_end

        zero = jnp.zeros((2, D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[b]
        guess = None if GL_init is None else GL_init[:, 0, b]
        if kind == DIAG_ZERO:
            x0 = F
        elif kind == DIAG_IDENTITY:
            if b == w - 1:
                e_cell = pairing_split(F, cap)

            def reg(x):
                c = pairing_split(x, cap)           # (2,)
                return x - c[:, None, None] * eye[None]

            def matvec_reg(x):
                return reg(diag_cycle(x))

            if guess is not None:
                guess = reg(guess)
            x0, r = linsolve_info(matvec_reg, reg(F), x0=guess, a0=1.0,
                                  a1=-1.0, tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))
        else:
            x0, r = linsolve_info(diag_cycle, F, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))

        _, xs_all = cycle(x0)                       # (L, 2, D, D)
        GL_b = jnp.concatenate([x0[None], xs_all[:-1]], axis=0)
        if kind == DIAG_IDENTITY:
            bond_caps = jnp.roll(caps_all, 1, axis=1)   # (2, L, D, D)
            coeff = ceinsum("ixy,ixy->i", jnp.swapaxes(GL_b, 0, 1),
                            bond_caps)                  # (2, L)
            GL_b = GL_b - jnp.swapaxes(
                coeff[:, :, None, None] * eye[None, None], 0, 1)
        GLs = GLs.at[:, :, b].set(jnp.swapaxes(GL_b, 0, 1))

    return GLs, e_cell, resid


def calc_rw_split(AR, C, H: MPOHamiltonian, tol=1e-10, GR_init=None):
    L, D = AR.shape[1], AR.shape[2]
    w = H.odim
    dtype = AR.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)

    eye = jnp.eye(D, dtype=dtype)
    GRs = jnp.zeros((2, L, w, D, D), dtype)
    GRs = GRs.at[0, :, w - 1].set(eye)
    caps_all = rho_lefts_split(C)
    cap = caps_all[:, L - 1]
    resid = jnp.zeros((), dtype)
    AR_t = jnp.swapaxes(AR, 0, 1)

    for a in range(w - 2, -1, -1):
        Wdiag = Ws[:, a, a]
        Wrow = Ws[:, a, :].at[:, a].set(0.0)

        def cycle(x, with_diag=True, _Wdiag=Wdiag, _Wrow=Wrow):
            def body(x, xs):
                GR_i, Wd, Wr, A = xs
                xn = source_row_right_split(GR_i, Wr, A)
                if with_diag:
                    xn = xn + transfer_right_block_split(x, Wd, A)
                return xn, xn

            return jax.lax.scan(
                body, x, (jnp.swapaxes(GRs, 0, 1), _Wdiag, _Wrow, AR_t),
                reverse=True)

        def diag_cycle(x, _Wdiag=Wdiag):
            def body(x, xs):
                Wd, A = xs
                return transfer_right_block_split(x, Wd, A), None

            x_end, _ = jax.lax.scan(body, x, (_Wdiag, AR_t), reverse=True)
            return x_end

        zero = jnp.zeros((2, D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[a]
        guess = None if GR_init is None else GR_init[:, L - 1, a]
        if kind == DIAG_ZERO:
            x0 = F
        elif kind == DIAG_IDENTITY:
            def reg(x):
                c = pairing_split(x, cap)
                return x - c[:, None, None] * eye[None]

            def matvec_reg(x):
                return reg(diag_cycle(x))

            if guess is not None:
                guess = reg(guess)
            x0, r = linsolve_info(matvec_reg, reg(F), x0=guess, a0=1.0,
                                  a1=-1.0, tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))
        else:
            x0, r = linsolve_info(diag_cycle, F, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))

        _, xs_all = cycle(x0)
        GR_a = jnp.concatenate([xs_all[1:], x0[None]], axis=0)
        if kind == DIAG_IDENTITY:
            coeff = ceinsum("ixy,ixy->i", jnp.swapaxes(GR_a, 0, 1),
                            caps_all)
            GR_a = GR_a - jnp.swapaxes(
                coeff[:, :, None, None] * eye[None, None], 0, 1)
        GRs = GRs.at[:, :, a].set(jnp.swapaxes(GR_a, 0, 1))

    return GRs, resid


def hamiltonian_environments_split(psi_split, H, tol=1e-10, env_init=None):
    """psi_split = (AL, AR, AC, C) split arrays. Returns
    (GLs, GRs, e_density (2,), resid)."""
    AL, AR, AC, C = psi_split
    GL0 = None if env_init is None else env_init[0]
    GR0 = None if env_init is None else env_init[1]
    GLs, e_cell, r1 = calc_lw_split(AL, C, H, tol, GL_init=GL0)
    GRs, r2 = calc_rw_split(AR, C, H, tol, GR_init=GR0)
    L = AL.shape[1]
    return GLs, GRs, e_cell / L, jnp.maximum(r1, r2)


# ----------------------------------------------------------------------------
# split derivative applications + regauge
# ----------------------------------------------------------------------------

def ac_apply_split_env(GL, W, GR, x):
    """All-split H_eff^{AC} (GL/GR complex split here, unlike
    tdvp_split.ac_apply_split's real-env variant... both complex)."""
    t = ceinsum("axy,ytn->axtn", GL, x)
    t = reinsum("axtn,abst->bxsn", t, W)
    return ceinsum("bxsn,brn->xsr", t, GR)


def c_apply_split_env(GL, GR, x):
    t = ceinsum("axy,yn->axn", GL, x)
    return ceinsum("axn,arn->xr", t, GR)


def regauge_ACC_split(AC, C):
    """min_AL ||AC - AL C||: AL = Q_AC Q_C^dag (states/gauging.py)."""
    _, D, d, _ = AC.shape
    Q_AC, _ = qr_pos_split(AC.reshape(2, D * d, D))
    Q_C, _ = qr_pos_split(C)
    AL = ceinsum("lk,rk->lr", Q_AC, cconj(Q_C))
    return AL.reshape(2, D, d, D)


def regauge_CAC_split(C_prev, AC):
    _, D, d, _ = AC.shape
    _, Q_AC = lq_pos_split(AC.reshape(2, D, d * D))
    _, Q_C = lq_pos_split(C_prev)
    AR = ceinsum("kl,kr->lr", cconj(Q_C), Q_AC.reshape(2, D, d * D))
    return AR.reshape(2, D, d, D)


# ----------------------------------------------------------------------------
# the infinite split timestep
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2, 4))
def _timestep_infinite_split(psi_split, H, m: int, dt, env_tol_static,
                             env_guess=None):
    """One infinite TDVP step of size dt in split arithmetic.
    psi_split = (AL, AR, AC, C) split arrays with a leading (2,) re/im
    axis then the unit-cell axis. Returns (psi_split', envs, exp_err,
    norm_drift) — norm_drift is the max pre-projection radial error of
    the Krylov exponentials (the honest norm-loss diagnostic)."""
    AL, AR, AC, C = psi_split
    L = AL.shape[1]
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(AL.dtype)
    GLs, GRs, e, resid = hamiltonian_environments_split(
        psi_split, H, tol=env_tol_static, env_init=env_guess)

    def evolve_ac(GL, W, GR, ACi):
        return expm_multiply_split(
            lambda x: ac_apply_split_env(GL, W, GR, x), ACi, dt, m)

    def evolve_c(GL_next, GR, Ci):
        return expm_multiply_split(
            lambda x: c_apply_split_env(GL_next, GR, x), Ci, dt, m)

    GL_next = jnp.roll(GLs, -1, axis=1)
    ACs, errA, drA = jax.vmap(evolve_ac, in_axes=(1, 0, 1, 1),
                              out_axes=(1, 0, 0))(GLs, Ws, GRs, AC)
    Cs, errC, drC = jax.vmap(evolve_c, in_axes=(1, 1, 1),
                             out_axes=(1, 0, 0))(GL_next, GRs, C)
    exp_err = jnp.maximum(jnp.max(errA), jnp.max(errC))
    # pre-projection radial drift of the Krylov exponentials (ADVICE r4:
    # the projected outputs are norm-preserving by construction)
    norm_drift = jnp.maximum(jnp.max(drA), jnp.max(drC))

    ALs = jax.vmap(regauge_ACC_split, in_axes=(1, 1), out_axes=1)(ACs, Cs)
    C_prev = jnp.roll(Cs, 1, axis=1)
    ARs = jax.vmap(regauge_CAC_split, in_axes=(1, 1), out_axes=1)(C_prev,
                                                                  ACs)
    return (ALs, ARs, ACs, Cs), (GLs, GRs, e, resid), exp_err, norm_drift


def split_state_from_infinite(psi):
    """(AL, AR, AC, C) split arrays from a real or complex InfiniteMPS."""
    if jnp.issubdtype(psi.dtype, jnp.complexfloating):
        return tuple(from_complex(x) for x in (psi.AL, psi.AR, psi.AC,
                                               psi.C))
    return tuple(sc(x) for x in (psi.AL, psi.AR, psi.AC, psi.C))


def split_state_to_complex(psi_split):
    from ..states.infinitemps import InfiniteMPS

    AL, AR, AC, C = (to_complex(x) for x in psi_split)
    return InfiniteMPS(AL, AR, AC, C)
