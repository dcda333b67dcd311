"""Infinite Hamiltonian environments.

Counterpart of the reference's `MPOHamInfEnv` (reference
src/environments/mpohaminfenv.jl): left/right FSM-level fixed points of the
unit-cell transfer operator. The FSM is walked level by level (a static
host loop over the MPO's static structure metadata); identity diagonals are
solved as regularized geometric series via GMRES, scalar/general diagonals
via plain GMRES, zero diagonals by one accumulation pass around the cell
(mpohaminfenv.jl:93-118 / 177-195).

Conventions: GLs[i] = env left of site i, GRs[i] = env right of site i;
pairing(v, cap) = einsum('xy,xy->'); caps from InfiniteMPS.rho_right/left.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..operators.mpo import (
    MPOHamiltonian, DIAG_ZERO, DIAG_IDENTITY, DIAG_SCALAR, DIAG_GENERAL,
)
from ..states.infinitemps import InfiniteMPS
from ..linalg.gmres import linsolve_info

# geometric-series solve Krylov shape: SHORT restart cycles win on TPU —
# the per-cycle true-residual stagnation test fires at a finer granularity
# and the (m+1, D, D) basis stays small (measured on v5e, D=256 f32 VUMPS
# steady state: m=12 gives 33 ms/iteration vs 47 ms at m=30 at identical
# converged eps; the solves are linearly convergent for gapped transfer
# operators, so short restarts lose no superlinear momentum)
_ENV_RESTART = 12
_ENV_MAXITER = 100


def pairing(v, cap):
    return jnp.einsum("xy,xy->", v, cap)


def transfer_left_block(v, Wab, A_ket, A_bra):
    """Single FSM-block left transfer: v (D, D), Wab (d, d)."""
    t = jnp.einsum("xy,ytn->xtn", v, A_ket)
    t = jnp.einsum("xtn,st->xsn", t, Wab)
    return jnp.einsum("xsm,xsn->mn", A_bra.conj(), t)


def transfer_right_block(v, Wab, A_ket, A_bra):
    t = jnp.einsum("ytn,mn->ytm", A_ket, v)
    t = jnp.einsum("ytm,st->ysm", t, Wab)
    return jnp.einsum("xsm,ysm->xy", A_bra.conj(), t)


def _source_col_left(GL_i, Wcol, A):
    """Contributions into one FSM level from all lower levels:
    GL_i (w, D, D), Wcol (w, d, d) with the diagonal entry zeroed.

    Order fixed by the native planner (tests/test_contraction_golden.py):
    folding the small W column into GL first costs d^2 D^3 + d D^3
    instead of 2 w d D^3 — 2x cheaper at w=5."""
    t = jnp.einsum("axy,ast->xyst", GL_i, Wcol)      # w d^2 D^2
    t = jnp.einsum("xyst,xsm->ytm", t, A.conj())     # d^2 D^3
    return jnp.einsum("ytm,ytn->mn", t, A)           # d D^3


def _source_row_right(GR_i, Wrow, A):
    """Right-moving: contributions into one level from all higher levels:
    GR_i (w, D, D), Wrow (w, d, d) (the b-index row W[i][a, :], diag zeroed).
    Planner-optimal order (see _source_col_left)."""
    t = jnp.einsum("bmn,bst->mnst", GR_i, Wrow)      # w d^2 D^2
    t = jnp.einsum("mnst,xsm->ntx", t, A.conj())     # d^2 D^3
    return jnp.einsum("ntx,ytn->xy", t, A)           # d D^3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class InfiniteHamEnv:
    GLs: jnp.ndarray       # (L, w, D, D)
    GRs: jnp.ndarray       # (L, w, D, D)
    e_density: jnp.ndarray  # scalar, energy per site
    # worst relative residual over all geometric-series GMRES solves (the
    # reference warns per unconverged solve, mpohaminfenv.jl:97-98; here the
    # jitted driver reads it back once per iteration and warns on the host)
    resid: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros(()))

    def tree_flatten(self):
        return (self.GLs, self.GRs, self.e_density, self.resid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def leftenv(self, i):
        return self.GLs[i]

    def rightenv(self, i):
        return self.GRs[i]


def calc_lw(psi: InfiniteMPS, H: MPOHamiltonian, tol=1e-12, GL_init=None):
    """Left environments in the AL gauge. Returns (GLs (L, w, D, D), e_cell)."""
    L, D, d = psi.period, psi.D, psi.physicaldim
    w = H.odim
    AL = psi.AL
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    dtype = psi.dtype

    eye = jnp.eye(D, dtype=dtype)
    GLs = jnp.zeros((L, w, D, D), dtype)
    GLs = GLs.at[:, 0].set(eye)
    cap = psi.rho_right(L - 1).astype(dtype)  # right cap at the cell boundary
    e_cell = jnp.zeros((), dtype)
    resid = jnp.zeros((), jnp.zeros((), dtype).real.dtype)

    for b in range(1, w):
        Wdiag = Ws[:, b, b]                       # (L, d, d)
        Wcol = Ws[:, :, b].at[:, b].set(0.0)      # (L, w, d, d), diag zeroed

        def cycle(x, with_diag=True, _Wdiag=Wdiag, _Wcol=Wcol, _b=b):
            """One pass around the cell: x at bond 0 -> value at bond 0."""

            def body(x, xs):
                GL_i, Wd, Wc, A = xs
                xn = _source_col_left(GL_i, Wc, A)
                if with_diag:
                    xn = xn + transfer_left_block(x, Wd, A, A)
                return xn, xn

            x_end, xs_all = jax.lax.scan(body, x, (GLs, _Wdiag, _Wcol, AL))
            return x_end, xs_all

        def diag_cycle(x, _Wdiag=Wdiag):
            def body(x, xs):
                Wd, A = xs
                return transfer_left_block(x, Wd, A, A), None

            x_end, _ = jax.lax.scan(body, x, (_Wdiag, AL))
            return x_end

        zero = jnp.zeros((D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[b]
        # warm start from a previous iteration's environment (same linear
        # system up to the slowly-moving state; GMRES converges in fewer
        # restart cycles near the fixed point)
        guess = None if GL_init is None else GL_init[0, b].astype(dtype)
        if kind == DIAG_ZERO:
            x0 = F
        elif kind == DIAG_IDENTITY:
            # track the energy accumulated per cell before regularizing
            if b == w - 1:
                e_cell = pairing(F, cap)
            F_reg = F - pairing(F, cap) * eye

            def matvec_reg(x):
                Tx = diag_cycle(x)
                return Tx - pairing(Tx, cap) * eye

            if guess is not None:
                guess = guess - pairing(guess, cap) * eye
            x0, r = linsolve_info(matvec_reg, F_reg, x0=guess, a0=1.0,
                                  a1=-1.0, tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER)
            resid = jnp.maximum(resid, jnp.real(r))
        else:  # DIAG_SCALAR / DIAG_GENERAL: spectral radius assumed < 1
            x0, r = linsolve_info(diag_cycle, F, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER)
            resid = jnp.maximum(resid, jnp.real(r))

        # propagate around the cell to fill every bond
        _, xs_all = cycle(x0)
        # xs_all[i] = value at bond i+1; bond 0 value is x0 itself
        GL_b = jnp.concatenate([x0[None], xs_all[:-1]], axis=0)
        if kind == DIAG_IDENTITY:
            # subtract the diverging identity component at *every* bond so
            # per-site energy closings are well-defined (cf. reference
            # regularize! applied along the cyclethrough)
            caps = jnp.roll(psi.rho_rights().astype(dtype), 1, axis=0)
            coeff = jnp.einsum("ixy,ixy->i", GL_b, caps)
            GL_b = GL_b - coeff[:, None, None] * eye[None]
        GLs = GLs.at[:, b].set(GL_b)

    return GLs, e_cell, resid


def calc_rw(psi: InfiniteMPS, H: MPOHamiltonian, tol=1e-12, GR_init=None):
    """Right environments in the AR gauge. Returns (GRs (L, w, D, D), e_cell)."""
    L, D, d = psi.period, psi.D, psi.physicaldim
    w = H.odim
    AR = psi.AR
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    dtype = psi.dtype

    eye = jnp.eye(D, dtype=dtype)
    GRs = jnp.zeros((L, w, D, D), dtype)
    GRs = GRs.at[:, w - 1].set(eye)
    cap = psi.rho_left(L - 1).astype(dtype)  # left cap at the cell boundary
    e_cell = jnp.zeros((), dtype)
    resid = jnp.zeros((), jnp.zeros((), dtype).real.dtype)

    for a in range(w - 2, -1, -1):
        Wdiag = Ws[:, a, a]
        Wrow = Ws[:, a, :].at[:, a].set(0.0)   # (L, w, d, d)

        def cycle(x, with_diag=True, _Wdiag=Wdiag, _Wrow=Wrow):
            """Reverse pass: x = GR at bond right of site L-1; go around."""

            def body(x, xs):
                GR_i, Wd, Wr, A = xs
                xn = _source_row_right(GR_i, Wr, A)
                if with_diag:
                    xn = xn + transfer_right_block(x, Wd, A, A)
                return xn, xn

            x_end, xs_all = jax.lax.scan(body, x, (GRs, _Wdiag, _Wrow, AR),
                                         reverse=True)
            return x_end, xs_all

        def diag_cycle(x, _Wdiag=Wdiag):
            def body(x, xs):
                Wd, A = xs
                return transfer_right_block(x, Wd, A, A), None

            x_end, _ = jax.lax.scan(body, x, (_Wdiag, AR), reverse=True)
            return x_end

        zero = jnp.zeros((D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[a]
        guess = None if GR_init is None else GR_init[L - 1, a].astype(dtype)
        if kind == DIAG_ZERO:
            x0 = F
        elif kind == DIAG_IDENTITY:
            if a == 0:
                e_cell = pairing(F, cap)
            F_reg = F - pairing(F, cap) * eye

            def matvec_reg(x):
                Tx = diag_cycle(x)
                return Tx - pairing(Tx, cap) * eye

            if guess is not None:
                guess = guess - pairing(guess, cap) * eye
            x0, r = linsolve_info(matvec_reg, F_reg, x0=guess, a0=1.0,
                                  a1=-1.0, tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER)
            resid = jnp.maximum(resid, jnp.real(r))
        else:
            x0, r = linsolve_info(diag_cycle, F, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER)
            resid = jnp.maximum(resid, jnp.real(r))

        _, xs_all = cycle(x0)
        # reverse scan: processing site i used GR at bond i (right of site i)
        # and produced the value at bond i-1; ys[i] = value at bond i-1.
        # GR_a[i] = value at bond right of site i = ys[i+1], GR_a[L-1] = x0.
        GR_a = jnp.concatenate([xs_all[1:], x0[None]], axis=0)
        if kind == DIAG_IDENTITY:
            caps = psi.rho_lefts().astype(dtype)
            coeff = jnp.einsum("ixy,ixy->i", GR_a, caps)
            GR_a = GR_a - coeff[:, None, None] * eye[None]
        GRs = GRs.at[:, a].set(GR_a)

    return GRs, e_cell, resid


def hamiltonian_environments(psi: InfiniteMPS, H: MPOHamiltonian,
                             tol=1e-12, env_init=None) -> InfiniteHamEnv:
    """Compute both environment families. The `GRs[i]`/`GLs[i]` convention:
    the effective Hamiltonian at site i uses (GLs[i], GRs[i]); the zero-site
    (bond i) derivative uses (GLs[i+1], GRs[i]).

    `env_init` (a previous InfiniteHamEnv) warm-starts the geometric-series
    GMRES solves (reference MPSKit.jl recalculates environments in place for
    the same reason, mpohaminfenv.jl recalculate!)."""
    GL0 = None if env_init is None else env_init.GLs
    GR0 = None if env_init is None else env_init.GRs
    # dtype-aware tolerance floor: a float32 GMRES cannot reach 1e-8
    # relative residuals, and an unreachable tolerance makes every
    # geometric-series solve burn its full restart budget (measured: the
    # two env solves were ~90% of a D=256 f32 VUMPS iteration on v5e)
    rdt = jnp.zeros((), psi.dtype).real.dtype
    tol = jnp.maximum(jnp.asarray(tol, rdt), 10 * jnp.finfo(rdt).eps)
    GLs, eL, rL = calc_lw(psi, H, tol, GL_init=GL0)
    GRs, eR, rR = calc_rw(psi, H, tol, GR_init=GR0)
    e = jnp.real(eL) / psi.period
    return InfiniteHamEnv(GLs, GRs, e, jnp.maximum(rL, rR))
