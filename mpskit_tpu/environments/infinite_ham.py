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
import numpy as np

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
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))
        else:  # DIAG_SCALAR / DIAG_GENERAL: spectral radius assumed < 1
            x0, r = linsolve_info(diag_cycle, F, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
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
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))
        else:
            x0, r = linsolve_info(diag_cycle, F, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
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


def calc_envs_paired(psi: InfiniteMPS, H: MPOHamiltonian, tol=1e-12,
                     GL_init=None, GR_init=None):
    """Both environment families in one direction-batched walk.

    TPU-native closure of the reference's left/right environment
    concurrency (P4: reference mpohaminfenv.jl:65-68 spawns calclw!/calcrw!
    on two host threads). The identity

        transfer_right(v, W, A) == transfer_left(v, W, A~),
        _source_row_right(G, W, A) == _source_col_left(G, W, A~),

    with A~ = A with its virtual legs swapped (same v, same G), turns the
    right walk into a left walk over the reversed, leg-swapped unit cell.
    Level b=k of the left walk and level a=w-1-k of the right walk are then
    solved TOGETHER as one block-diagonal geometric-series GMRES on
    (2, D, D) operands. The two diagonal transfer operators are similar
    matrices (AL and AR are related by the gauge C), so the combined
    Krylov solve converges at the single-solve rate: the sequential solve
    depth per FSM level halves (measured via bench.py on v5e, D=256 f32
    TFIM VUMPS steady state: 20.0 -> 17.5 ms per iteration).
    """
    L, D = psi.period, psi.D
    w = H.odim
    dtype = psi.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)
    AL = psi.AL
    # right walk in left form: reversed site order, virtual legs swapped
    AR_t = jnp.flip(psi.AR, axis=0).transpose(0, 3, 2, 1)
    A_eff = jnp.stack([AL, AR_t], axis=1)              # (L, 2, D, d, D)

    eye = jnp.eye(D, dtype=dtype)
    GLs = jnp.zeros((L, w, D, D), dtype).at[:, 0].set(eye)
    GRs = jnp.zeros((L, w, D, D), dtype).at[:, w - 1].set(eye)
    caps = jnp.stack([psi.rho_right(L - 1), psi.rho_left(L - 1)]).astype(dtype)
    e_cell = jnp.zeros((), dtype)
    rdt = jnp.zeros((), dtype).real.dtype
    resid = jnp.zeros((), rdt)

    t_block = jax.vmap(lambda v, Wab, A: transfer_left_block(v, Wab, A, A))
    src_block = jax.vmap(_source_col_left)

    for k in range(1, w):
        b, a = k, w - 1 - k                 # left level, right level
        Wd_eff = jnp.stack([Ws[:, b, b], jnp.flip(Ws[:, a, a], axis=0)],
                           axis=1)                       # (L, 2, d, d)
        Wc_eff = jnp.stack(
            [Ws[:, :, b].at[:, b].set(0.0),
             jnp.flip(Ws[:, a, :].at[:, a].set(0.0), axis=0)],
            axis=1)                                      # (L, 2, w, d, d)
        G_eff = jnp.stack([GLs, jnp.flip(GRs, axis=0)], axis=1)

        def cycle(x, _G=G_eff, _Wd=Wd_eff, _Wc=Wc_eff):
            def body(x, xs):
                G_i, Wd, Wc, A = xs
                xn = src_block(G_i, Wc, A) + t_block(x, Wd, A)
                return xn, xn

            return jax.lax.scan(body, x, (_G, _Wd, _Wc, A_eff))

        def diag_cycle(x, _Wd=Wd_eff):
            def body(x, xs):
                Wd, A = xs
                return t_block(x, Wd, A), None

            x_end, _ = jax.lax.scan(body, x, (_Wd, A_eff))
            return x_end

        F, _ = cycle(jnp.zeros((2, D, D), dtype))
        kindL, kindR = H.diag_class[b], H.diag_class[a]
        if kindL == DIAG_IDENTITY and b == w - 1:
            e_cell = pairing(F[0], caps[0])

        if kindL == DIAG_ZERO and kindR == DIAG_ZERO:
            x0 = F
        else:
            # per-element regularization mask: only identity diagonals have
            # the diverging rank-1 component projected out
            mask = jnp.asarray([kindL == DIAG_IDENTITY,
                                kindR == DIAG_IDENTITY]).astype(dtype)

            def reg(x, _mask=mask):
                c = jnp.einsum("bxy,bxy->b", x, caps)
                return x - (_mask * c)[:, None, None] * eye[None]

            def matvec_reg(x, _dc=diag_cycle, _reg=reg):
                return _reg(_dc(x))

            guess = None
            if GL_init is not None and GR_init is not None:
                guess = reg(jnp.stack([GL_init[0, b],
                                       GR_init[L - 1, a]]).astype(dtype))
            x0, r = linsolve_info(matvec_reg, reg(F), x0=guess, a0=1.0,
                                  a1=-1.0, tol=tol, restart=_ENV_RESTART,
                                  maxiter=_ENV_MAXITER, stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))

        # propagate around the cell to fill every bond
        _, xs_all = cycle(x0)
        GL_b = jnp.concatenate([x0[0][None], xs_all[:-1, 0]], axis=0)
        xs_r = jnp.flip(xs_all[:, 1], axis=0)   # xs_r[i] = value at bond i-1
        GR_a = jnp.concatenate([xs_r[1:], x0[1][None]], axis=0)
        if kindL == DIAG_IDENTITY:
            bond_caps = jnp.roll(psi.rho_rights().astype(dtype), 1, axis=0)
            coeff = jnp.einsum("ixy,ixy->i", GL_b, bond_caps)
            GL_b = GL_b - coeff[:, None, None] * eye[None]
        if kindR == DIAG_IDENTITY:
            bond_caps = psi.rho_lefts().astype(dtype)
            coeff = jnp.einsum("ixy,ixy->i", GR_a, bond_caps)
            GR_a = GR_a - coeff[:, None, None] * eye[None]
        GLs = GLs.at[:, b].set(GL_b)
        GRs = GRs.at[:, a].set(GR_a)

    return GLs, GRs, e_cell, resid


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
    # two env solves were ~90% of a D=256 f32 VUMPS iteration on v5e).
    # The floor follows the rounding-growth model ~sqrt(N) eps per
    # contraction (measured true-residual floor 2.5e-4 relative at D=256
    # f32 = 10 sqrt(2 D^2) eps to within 15%): with the floor at the real
    # attainable level the solves exit ON TOLERANCE instead of spending
    # two extra stall-detection cycles per FSM level finding it.
    rdt = jnp.zeros((), psi.dtype).real.dtype
    n_solve = 2 * psi.D * psi.D
    tol = jnp.maximum(jnp.asarray(tol, rdt),
                      10 * np.sqrt(n_solve) * jnp.finfo(rdt).eps)
    GLs, GRs, eL, r = calc_envs_paired(psi, H, tol, GL_init=GL0,
                                       GR_init=GR0)
    e = jnp.real(eL) / psi.period
    return InfiniteHamEnv(GLs, GRs, e, r)
