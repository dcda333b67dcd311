"""Quasiparticle B-environments (reference src/environments/qpenv.jl +
src/algorithms/excitation/exci_transfer_system.jl).

lB_i = the mixed (ket = right-gs AR, bra = left-gs AL) environment at the
bond left of site i containing exactly one B insertion, momentum-phased
e^{-ip} per site; rB_i mirrors it to the right with e^{+ip}. The infinite
geometric tails are per-FSM-level cyclic solves: GMRES on diagonal levels,
with rank-1 regularization by the analytic mixed-gauge caps
(l_RL = C, r_RL = conj(C); l_LR = C^dag, r_LR = C^T) on identity diagonals
of trivial (non-topological) excitations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..operators.mpo import (
    MPOHamiltonian, DIAG_ZERO, DIAG_IDENTITY,
)
from ..linalg.gmres import linsolve
from .infinite_ham import pairing, transfer_left_block, transfer_right_block


def _phase(p, dtype):
    """e^{ip} as a dtype scalar; real dtypes only support p = 0 mod pi."""
    import numpy as np

    if jnp.issubdtype(dtype, jnp.complexfloating):
        return jnp.asarray(np.exp(1j * p), dtype)
    assert abs(np.sin(p)) < 1e-12, \
        "momentum != 0 mod pi requires a complex dtype"
    return jnp.asarray(np.cos(p), dtype)


def _src_col_left(env, Wcol, A_ket, A_bra):
    """Push env (w, D, D) into one level via column Wcol (w, d, d):
    out[m, m'] = sum_a conj(A_bra)[x,s,m] env[a,x,y] Wcol[a,s,t] A_ket[y,t,m']."""
    t = jnp.einsum("axy,ytn->axtn", env, A_ket)
    t = jnp.einsum("axtn,ast->xsn", t, Wcol)
    return jnp.einsum("xsm,xsn->mn", A_bra.conj(), t)


def _src_row_right(env, Wrow, A_ket, A_bra):
    t = jnp.einsum("ytn,bmn->bytm", A_ket, env)
    t = jnp.einsum("bytm,bst->ysm", t, Wrow)
    return jnp.einsum("xsm,ysm->xy", A_bra.conj(), t)


def qp_left_envs(qp, GLs, H: MPOHamiltonian, tol=1e-10, phase=None):
    """lBs (L, w, D, D). GLs are the left ground-state (left_gs) envs.
    `phase` (e^{-ip}, traced) overrides the QP's static momentum — used by
    the momentum-batched excitation solver."""
    L = qp.period
    D = qp.left_gs.D
    w = H.odim
    dtype = qp.left_gs.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)
    AL = qp.left_gs.AL
    AR = qp.right_gs.AR
    Bs = qp.bs()
    if phase is None:
        phase = _phase(-qp.momentum, dtype)

    # caps at bond left of site i: built from C[i-1]
    C_prev = jnp.roll(qp.left_gs.C, 1, axis=0)
    l_caps = C_prev                       # l_RL[i]
    r_caps = jnp.conj(C_prev)             # r_RL[i]

    lBs = jnp.zeros((L, w, D, D), dtype)

    for b in range(w):
        Wdiag = Ws[:, b, b]
        Wcol_off = Ws[:, :, b].at[:, b].set(0.0)
        Wcol_full = Ws[:, :, b]
        reg = qp.trivial and H.diag_class[b] == DIAG_IDENTITY

        def site_step(x, i_args, with_lower=True):
            """x at bond i -> value at bond i+1."""
            lB_i, GL_i, Wd, Wco, Wcf, ALi, ARi, Bi, l_cap_n, r_cap_n = i_args
            val = transfer_left_block(x, Wd, ARi, ALi)
            if with_lower:
                val = val + _src_col_left(lB_i, Wco, ARi, ALi)
                val = val + _src_col_left(GL_i, Wcf, Bi, ALi)
            val = phase * val
            if reg:
                val = val - pairing(val, r_cap_n) * l_cap_n
            return val

        xs = (lBs, GLs, Wdiag, Wcol_off, Wcol_full, AL, AR, Bs,
              jnp.roll(l_caps, -1, axis=0), jnp.roll(r_caps, -1, axis=0))

        def cycle(x, with_lower=True):
            def body(x, i_args):
                xn = site_step(x, i_args, with_lower)
                return xn, xn

            return jax.lax.scan(body, x, xs)

        zero = jnp.zeros((D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[b]
        if kind == DIAG_ZERO:
            x0 = F
        else:
            def matvec(x):
                y, _ = cycle(x, with_lower=False)
                return y

            x0 = linsolve(matvec, F, a0=1.0, a1=-1.0, tol=tol)

        _, vals = cycle(x0)
        lB_b = jnp.concatenate([x0[None], vals[:-1]], axis=0)
        lBs = lBs.at[:, b].set(lB_b)

    return lBs


def qp_right_envs(qp, GRs, H: MPOHamiltonian, tol=1e-10, phase=None):
    """rBs (L, w, D, D). GRs are the right ground-state (right_gs) envs."""
    L = qp.period
    D = qp.left_gs.D
    w = H.odim
    dtype = qp.left_gs.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)
    AL = qp.left_gs.AL
    AR = qp.right_gs.AR
    Bs = qp.bs()
    if phase is None:
        phase = _phase(qp.momentum, dtype)

    # caps at bond right of site i: built from C[i]
    l_caps = jnp.conj(jnp.swapaxes(qp.left_gs.C, 1, 2))   # l_LR[i] = C^dag
    r_caps = jnp.swapaxes(qp.left_gs.C, 1, 2)             # r_LR[i] = C^T

    rBs = jnp.zeros((L, w, D, D), dtype)

    for a in range(w - 1, -1, -1):
        Wdiag = Ws[:, a, a]
        Wrow_off = Ws[:, a, :].at[:, a].set(0.0)
        Wrow_full = Ws[:, a, :]
        reg = qp.trivial and H.diag_class[a] == DIAG_IDENTITY

        def site_step(x, i_args, with_upper=True):
            """x at bond i (right of site i) -> value at bond i-1."""
            rB_i, GR_i, Wd, Wro, Wrf, ALi, ARi, Bi, l_cap_p, r_cap_p = i_args
            val = transfer_right_block(x, Wd, ALi, ARi)
            if with_upper:
                val = val + _src_row_right(rB_i, Wro, ALi, ARi)
                val = val + _src_row_right(GR_i, Wrf, Bi, ARi)
            val = phase * val
            if reg:
                val = val - pairing(val, l_cap_p) * r_cap_p
            return val

        xs = (rBs, GRs, Wdiag, Wrow_off, Wrow_full, AL, AR, Bs,
              jnp.roll(l_caps, 1, axis=0), jnp.roll(r_caps, 1, axis=0))

        def cycle(x, with_upper=True):
            def body(x, i_args):
                xn = site_step(x, i_args, with_upper)
                return xn, xn

            return jax.lax.scan(body, x, xs, reverse=True)

        zero = jnp.zeros((D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[a]
        if kind == DIAG_ZERO:
            x0 = F
        else:
            def matvec(x):
                y, _ = cycle(x, with_upper=False)
                return y

            x0 = linsolve(matvec, F, a0=1.0, a1=-1.0, tol=tol)

        _, vals = cycle(x0)
        # reverse scan: ys[i] = value at bond i-1 -> rB_a[i] = ys[i+1],
        # rB_a[L-1] = x0
        rB_a = jnp.concatenate([vals[1:], x0[None]], axis=0)
        rBs = rBs.at[:, a].set(rB_a)

    return rBs


# ----------------------------------------------------------------------------
# finite QP environments (reference qpenv.jl:146-169) — plain partial sums
# ----------------------------------------------------------------------------

def qp_left_envs_finite(qp, GLs, Ws):
    """lBs[i] = B-env at bond left of site i; lBs[0] = 0."""
    return qp_left_envs_finite_B(qp.bs(), qp.ALs, qp.ARs, GLs, Ws)


def qp_left_envs_finite_B(Bs, ALs, ARs, GLs, Ws):
    """Same, from explicit B tensors (used by the B-space charged-sector
    quasiparticle solver, algorithms/excitations.py)."""
    L = ALs.shape[0]
    D = ALs.shape[1]
    w = Ws.shape[1]
    dtype = ALs.dtype

    def body(x, xs):
        GL_i, W_i, ALi, ARi, Bi = xs
        xn = jnp.einsum("axy,ytn->axtn", x, ARi)
        xn = jnp.einsum("axtn,abst->bxsn", xn, W_i)
        xn = jnp.einsum("xsm,bxsn->bmn", ALi.conj(), xn)
        src = jnp.einsum("axy,ytn->axtn", GL_i, Bi)
        src = jnp.einsum("axtn,abst->bxsn", src, W_i)
        src = jnp.einsum("xsm,bxsn->bmn", ALi.conj(), src)
        xn = xn + src
        return xn, x

    x0 = jnp.zeros((w, D, D), dtype)
    _, lBs = jax.lax.scan(body, x0, (GLs[:L], Ws, ALs, ARs, Bs))
    return lBs


def qp_right_envs_finite(qp, GRs, Ws):
    """rBs[i] = B-env at bond right of site i; rBs[L-1] = 0."""
    return qp_right_envs_finite_B(qp.bs(), qp.ALs, qp.ARs, GRs, Ws)


def qp_right_envs_finite_B(Bs, ALs, ARs, GRs, Ws):
    """Same, from explicit B tensors."""
    L = ALs.shape[0]
    D = ALs.shape[1]
    w = Ws.shape[1]
    dtype = ALs.dtype

    def body(x, xs):
        GR_i, W_i, ALi, ARi, Bi = xs
        xn = jnp.einsum("ytn,bmn->bytm", ALi, x)
        xn = jnp.einsum("bytm,abst->aysm", xn, W_i)
        xn = jnp.einsum("xsm,aysm->axy", ARi.conj(), xn)
        src = jnp.einsum("ytn,bmn->bytm", Bi, GR_i)
        src = jnp.einsum("bytm,abst->aysm", src, W_i)
        src = jnp.einsum("xsm,aysm->axy", ARi.conj(), src)
        xn = xn + src
        return xn, x

    x0 = jnp.zeros((w, D, D), dtype)
    _, rBs = jax.lax.scan(body, x0, (GRs[1: L + 1], Ws, ALs, ARs, Bs),
                          reverse=True)
    return rBs
