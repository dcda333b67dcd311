"""TDVP time evolution (reference src/algorithms/timestep/tdvp.jl).

Infinite: per-site Krylov exponentiation of AC and C (the reference's
@spawn-per-site becomes one vmap over the unit cell), then regauge.
Finite: second-order symmetric left-right / right-left sweep with backward
C evolution, as one jitted scan pair per half step.

The integrator is Krylov `exp(-i dt H_eff)` at the midpoint time
(reference src/algorithms/timestep/integrators.jl:20-25).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import Defaults
from ..linalg.expm import expm_multiply, expm_multiply_err
from ..utils.logging import logger
from ..states.finitemps import FiniteMPS
from ..states.infinitemps import InfiniteMPS
from ..states.gauging import regauge_ACC
from ..tensors.ops import leftorth, rightorth
from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
from ..environments.finite import (
    left_boundary, right_boundary, compute_right_envs, compute_left_envs,
    stack_W, FiniteEnv,
)
from ..environments.infinite_ham import hamiltonian_environments
from .derivatives import ac_apply, c_apply, ac2_apply


@dataclasses.dataclass(frozen=True)
class TDVP:
    expalg_m: int = 30
    gauge_tol: float = Defaults.tolgauge
    env_tol: float = 1e-12
    verbosity: int = Defaults.verbosity
    finalize: Optional[Callable] = None
    # warn when the worst per-site Krylov-exponential truncation estimate
    # exceeds this (relative; Saad a-posteriori bound from expm_multiply_err)
    exp_tol: float = 1e-6


@dataclasses.dataclass(frozen=True)
class TDVP2:
    expalg_m: int = 30
    trscheme: object = None
    verbosity: int = Defaults.verbosity
    finalize: Optional[Callable] = None
    exp_tol: float = 1e-6


def _warn_exp(alg, exp_err, env_resid=None, name="TDVP"):
    """Host-side solver-quality warnings (reference: KrylovKit convergence
    info surfaced by exponentiate/linsolve callers, e.g.
    environments/permpoinfenv.jl:179-185)."""
    if getattr(alg, "verbosity", 0) < 1:
        return
    e = float(exp_err)
    if e > getattr(alg, "exp_tol", 1e-6):
        logger.warning(
            f"{name}: Krylov exponential truncation estimate {e:.4e} exceeds "
            f"exp_tol {alg.exp_tol:.0e} — increase expalg_m or reduce dt")
    if env_resid is not None and float(env_resid) > 1e-6:
        logger.warning(
            f"{name}: environment geometric-series GMRES residual "
            f"{float(env_resid):.4e} (not converged)")


# ----------------------------------------------------------------------------
# infinite TDVP (reference tdvp.jl:21-59)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(3, 4, 5))
def _timestep_infinite(psi: InfiniteMPS, H, dt, m: int, gauge_tol: float,
                       env_tol: float, env_guess=None, A_mask=None,
                       C_mask=None):
    """A_mask/C_mask: optional abelian charge-conservation masks (see
    symmetry/charges.py) applied after the exponentials and the regauge,
    exactly like `_vumps_iteration`'s sector-constrained updates — the
    exponential of a charge-conserving H_eff commutes with the masks, so
    post-masking only removes rounding leakage."""
    L = psi.period
    envs = hamiltonian_environments(psi, H, tol=env_tol,
                                    env_init=env_guess)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    tau = -1j * dt

    def evolve_ac(GL, W, GR, AC):
        return expm_multiply_err(lambda x: ac_apply(GL, W, GR, x), AC, tau, m)

    def evolve_c(GL_next, GR, C):
        return expm_multiply_err(lambda x: c_apply(GL_next, GR, x), C, tau, m)

    GL_next = jnp.roll(envs.GLs, -1, axis=0)
    ACs, errA = jax.vmap(evolve_ac)(envs.GLs, Ws, envs.GRs, psi.AC)
    Cs, errC = jax.vmap(evolve_c)(GL_next, envs.GRs, psi.C)
    exp_err = jnp.maximum(jnp.max(errA), jnp.max(errC))
    if A_mask is not None:
        ACs = ACs * A_mask.astype(ACs.dtype)
        Cs = Cs * C_mask.astype(Cs.dtype)
    ACs = ACs / jnp.linalg.norm(ACs.reshape(L, -1), axis=1)[:, None, None, None]
    Cs = Cs / jnp.linalg.norm(Cs.reshape(L, -1), axis=1)[:, None, None]

    ALs = jax.vmap(regauge_ACC)(ACs, Cs)
    if A_mask is not None:
        # local regauge keeps the sector structure without the uniform
        # re-gauging loops of from_AL (whose QR completions would refill
        # the masked blocks); mirror the masked VUMPS iteration
        from ..states.gauging import regauge_CAC

        ALs = ALs * A_mask.astype(ALs.dtype)
        C_prev = jnp.roll(Cs, 1, axis=0)
        ARs = jax.vmap(regauge_CAC)(C_prev, ACs) * A_mask.astype(ACs.dtype)
        return InfiniteMPS(ALs, ARs, ACs, Cs), envs, exp_err
    return (InfiniteMPS.from_AL(ALs, psi.C[L - 1], tol=gauge_tol), envs,
            exp_err)


# ----------------------------------------------------------------------------
# finite TDVP (reference tdvp.jl:61-91)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(5,))
def _timestep_finite(ALs, ARs, AC, Ws, GRs, m: int, dt=0.01,
                     GL0=None, GRL=None, masks=None):
    """Symmetric second-order sweep: every site evolved forward by dt/2 in
    each direction with backward bond evolution in between. Starts and ends
    with center = 0. GL0/GRL override the boundaries (WindowMPS).

    masks: optional (L, D, d, D) masks (rank support and/or abelian charge
    conservation) re-applied after every decomposition — at f32 the QR
    completions at rank-deficient padded sites otherwise leak out of the
    supported block (CLAUDE.md; measured ~1e-2 norm drift over 3 steps at
    L=32 D=256 f32 without them). PRECONDITION: the input ALs/ARs and GRs
    must already be masked/built from masked gauges — environments walked
    through unmasked ARs carry live-row x dead-col junk blocks that make
    H_eff move genuine weight off-support, which in-sweep masking then
    deletes (measured 8.7e-4 norm loss PER STEP at L=5 D=8 f64)."""
    L, D = ALs.shape[0], ALs.shape[1]
    w = Ws.shape[1]
    dtype = AC.dtype
    if GL0 is None:
        GL0 = left_boundary(w, D, dtype)
    if GRL is None:
        GRL = right_boundary(w, D, dtype)
    tau = -1j * (dt / 2)
    if masks is None:
        maskf = jnp.ones((L, 1, 1, 1), dtype)
    else:
        maskf = masks.astype(dtype)

    def stepL(carry, xs):
        AC, GL = carry
        W, AR_next, GR_next, is_last, mk = xs
        AC, errA = expm_multiply_err(
            lambda x: ac_apply(GL, W, GR_next, x), AC, tau, m)
        AC = AC * mk
        AL, C = leftorth(AC)
        AL = AL * mk
        GL_next = transfer_left_mpo(GL, W, AL, AL)
        # backward-evolve the bond (skipped on the last site)
        C, errC = jax.lax.cond(
            is_last,
            lambda C: (C, jnp.zeros((), errA.dtype)),
            lambda C: expm_multiply_err(
                lambda x: c_apply(GL_next, GR_next, x), C, -tau, m),
            C,
        )
        AC_next = jnp.einsum("lm,mpr->lpr", C, AR_next)
        # on the last site keep AC = AL C as the carry (it is the final AC)
        AC_last = jnp.einsum("lpm,mr->lpr", AL, C)
        AC_next = jnp.where(is_last, AC_last, AC_next)
        return (AC_next, GL_next), (AL, GL, jnp.maximum(errA, errC))

    is_last = jnp.arange(L) == L - 1
    # GR for site i is GRs[i+1] (GRs[L] is the boundary)
    xsL = (Ws, jnp.roll(ARs, -1, axis=0), GRs[1:], is_last, maskf)
    (AC, _), (ALs_n, GLs_scan, errsL) = jax.lax.scan(stepL, (AC, GL0), xsL)
    ALs = ALs_n
    GLs = GLs_scan  # GLs[i] = env left of site i

    def stepR(carry, xs):
        AC, GR = carry
        W, AL_prev, GL_i, is_first, mk = xs
        AC, errA = expm_multiply_err(
            lambda x: ac_apply(GL_i, W, GR, x), AC, tau, m)
        AC = AC * mk
        C, AR = rightorth(AC)
        AR = AR * mk
        GR_prev = transfer_right_mpo(GR, W, AR, AR)
        C, errC = jax.lax.cond(
            is_first,
            lambda C: (C, jnp.zeros((), errA.dtype)),
            lambda C: expm_multiply_err(
                lambda x: c_apply(GL_i, GR_prev, x), C, -tau, m),
            C,
        )
        AC_prev = jnp.einsum("lpm,mr->lpr", AL_prev, C)
        AC_first = jnp.einsum("lm,mpr->lpr", C, AR)
        AC_prev = jnp.where(is_first, AC_first, AC_prev)
        return (AC_prev, GR_prev), (AR, GR, jnp.maximum(errA, errC))

    is_first = jnp.arange(L) == 0
    xsR = (Ws, jnp.roll(ALs, 1, axis=0), GLs, is_first, maskf)
    (AC, _), (ARs_n, GRs_scan, errsR) = jax.lax.scan(stepR, (AC, GRL), xsR,
                                                     reverse=True)
    ARs = ARs.at[1:].set(ARs_n[1:])
    # fresh right envs: ys[i] = GR right of site i; GRs_new[i] pairs site i-1
    GRs_new = jnp.concatenate([GRs_scan[0][None], GRs_scan], axis=0)
    exp_err = jnp.maximum(jnp.max(errsL), jnp.max(errsR))
    return ALs, ARs, AC, GRs_new, exp_err


def timestep(psi, H, t, dt, alg=None, envs=None):
    """Evolve psi by one time step dt (Hamiltonian evaluated at midpoint for
    time-dependent operators). Returns (psi, envs)."""
    from ..operators.lazysum import LazySum, MultipliedOperator
    from ..operators.window import Window

    if isinstance(H, Window):
        H = H.map(lambda O: _materialize(O, t + dt / 2))
    elif isinstance(H, (LazySum, MultipliedOperator)):
        H = _materialize(H, t + dt / 2)

    if alg is None:
        alg = TDVP()

    from ..symmetry.charges import SymmetricFiniteMPS, SymmetricInfiniteMPS
    from ..symmetry.su2_finite import (
        SU2FiniteMPS, SU2TDVP, timestep_su2_finite_tdvp)

    if isinstance(psi, SU2FiniteMPS):
        # SU(2)-reduced finite TDVP (reference evolves symmetric states
        # through the same timestep, test/algorithms.jl:96-158)
        import dataclasses as _dc
        a = (_dc.replace(alg, dt=dt) if isinstance(alg, SU2TDVP)
             else SU2TDVP(dt=dt, krylovdim=min(alg.expalg_m, 24)))
        psi, exp_err = timestep_su2_finite_tdvp(psi, H, a)
        if not isinstance(alg, SU2TDVP):
            _warn_exp(alg, exp_err, name="TDVP(SU2-reduced finite)")
        return psi, None

    if isinstance(psi, SymmetricInfiniteMPS):
        # U(1)/Z_n-conserving TDVP (reference genericity: symmetric states
        # run through the same timestep, test/algorithms.jl:96-158)
        import dataclasses as _dc

        A_mask, C_mask = psi.masks
        inner, envs, exp_err = _timestep_infinite(
            psi.state, H, dt, alg.expalg_m, alg.gauge_tol, alg.env_tol,
            env_guess=envs, A_mask=jnp.asarray(A_mask),
            C_mask=jnp.asarray(C_mask))
        _warn_exp(alg, exp_err, env_resid=envs.resid,
                  name="TDVP(symmetric infinite)")
        return _dc.replace(psi, state=inner), envs

    if isinstance(psi, SymmetricFiniteMPS):
        import dataclasses as _dc
        from ..states.finitemps import support_mask

        inner = psi.state.move_center(0)
        L, D = inner.length, inner.D
        cmask = jnp.asarray(psi.masks) & jnp.asarray(
            support_mask(L, inner.physicaldim, D))
        Ws = stack_W(H, L).astype(inner.dtype)
        # mask the gauges BEFORE building environments (state-neutral) so
        # H_eff is exactly block-preserving — see _timestep_finite docstring
        mk = cmask.astype(inner.dtype)
        ALs0, ARs0, AC0 = inner.ALs * mk, inner.ARs * mk, inner.AC * mk[0]
        GRs = compute_right_envs(ARs0, Ws,
                                 right_boundary(Ws.shape[1], D, inner.dtype))
        ALs, ARs, AC, GRs, exp_err = _timestep_finite(
            ALs0, ARs0, AC0, Ws, GRs, alg.expalg_m, dt=dt, masks=cmask)
        _warn_exp(alg, exp_err, name="TDVP(symmetric finite)")
        return _dc.replace(psi, state=FiniteMPS(ALs, ARs, AC, 0)), None

    if isinstance(psi, InfiniteMPS):
        # envs from the previous step warm-start the environment solves
        psi, envs, exp_err = _timestep_infinite(psi, H, dt, alg.expalg_m,
                                                alg.gauge_tol, alg.env_tol,
                                                env_guess=envs)
        _warn_exp(alg, exp_err, env_resid=envs.resid, name="TDVP(infinite)")
        return psi, envs

    if isinstance(psi, FiniteMPS):
        if isinstance(alg, TDVP2):
            return _timestep_finite2_entry(psi, H, dt, alg)
        from ..states.finitemps import support_mask

        psi = psi.move_center(0)
        L, D = psi.length, psi.D
        Ws = stack_W(H, L).astype(psi.dtype)
        wdim = Ws.shape[1]
        smask = jnp.asarray(support_mask(L, psi.physicaldim, D))
        mk = smask.astype(psi.dtype)
        ALs0, ARs0, AC0 = psi.ALs * mk, psi.ARs * mk, psi.AC * mk[0]
        GRs = compute_right_envs(ARs0, Ws, right_boundary(wdim, D, psi.dtype))
        ALs, ARs, AC, GRs, exp_err = _timestep_finite(
            ALs0, ARs0, AC0, Ws, GRs, alg.expalg_m, dt=dt, masks=smask)
        _warn_exp(alg, exp_err, name="TDVP(finite)")
        return FiniteMPS(ALs, ARs, AC, 0), None

    from ..states.windowmps import WindowMPS

    if isinstance(psi, WindowMPS):
        if isinstance(H, Window):
            # co-evolving boundaries: the infinite background states make
            # a TDVP step under their own Hamiltonians, then the window
            # evolves against the UPDATED boundary fixed points. envs
            # threads ((lenvs, renvs)) across steps to warm-start the four
            # geometric-series solves.
            lenvs, renvs = envs if envs is not None else (None, None)
            left_gs, lenvs, errL = _timestep_infinite(
                psi.left_gs, H.left, dt, alg.expalg_m, alg.gauge_tol,
                alg.env_tol, env_guess=lenvs)
            right_gs, renvs, errR = _timestep_infinite(
                psi.right_gs, H.right, dt, alg.expalg_m, alg.gauge_tol,
                alg.env_tol, env_guess=renvs)
            _warn_exp(alg, jnp.maximum(errL, errR),
                      env_resid=jnp.maximum(lenvs.resid, renvs.resid),
                      name="TDVP(window boundaries)")
            psi = WindowMPS(left_gs, psi.window, right_gs)
            win = psi.window.move_center(0)
            L = win.length
            Ws = stack_W(H.middle, L).astype(win.dtype)
            GL0, GRL, lenvs, renvs = psi.boundary_envs(
                H.left, H_right=H.right, env_init=(lenvs, renvs),
                return_envs=True)
            GRs = compute_right_envs(win.ARs, Ws, GRL)
            ALs, ARs, AC, GRs, exp_err = _timestep_finite(
                win.ALs, win.ARs, win.AC, Ws, GRs, alg.expalg_m, dt=dt,
                GL0=GL0, GRL=GRL)
            _warn_exp(alg, exp_err, name="TDVP(window)")
            return WindowMPS(left_gs, FiniteMPS(ALs, ARs, AC, 0),
                             right_gs), (lenvs, renvs)

        # frozen boundaries (reference tdvp.jl window variant: the window
        # is a plain finite chain with infinite-side fixed-point
        # environments)
        win = psi.window.move_center(0)
        L, D = win.length, win.D
        Ws = stack_W(H, L).astype(win.dtype)
        GL0, GRL = psi.boundary_envs(H)
        GRs = compute_right_envs(win.ARs, Ws, GRL)
        ALs, ARs, AC, GRs, exp_err = _timestep_finite(
            win.ALs, win.ARs, win.AC, Ws, GRs, alg.expalg_m, dt=dt,
            GL0=GL0, GRL=GRL)
        _warn_exp(alg, exp_err, name="TDVP(window, frozen)")
        return WindowMPS(psi.left_gs, FiniteMPS(ALs, ARs, AC, 0),
                         psi.right_gs), None

    raise TypeError(type(psi))


def _materialize(H, t):
    from ..operators.lazysum import LazySum, MultipliedOperator

    if isinstance(H, MultipliedOperator):
        return H.eval_at(t)
    if isinstance(H, LazySum):
        return H(t).sum_materialized()
    return H


# ----------------------------------------------------------------------------
# finite TDVP2 (reference tdvp.jl:107-151)
# ----------------------------------------------------------------------------

def _timestep_finite2_entry(psi: FiniteMPS, H, dt, alg: TDVP2):
    from ..tensors.ops import svd_truncated, notrunc

    trscheme = alg.trscheme or notrunc()
    psi = psi.move_center(0)
    L, D = psi.length, psi.D
    d = psi.physicaldim
    Ws = stack_W(H, L).astype(psi.dtype)
    wdim = Ws.shape[1]
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(wdim, D, psi.dtype))
    ALs, ARs, AC, GRs, exp_err = _timestep_finite2(
        psi.ALs, psi.ARs, psi.AC, Ws, GRs, alg.expalg_m, trscheme, dt=dt)
    _warn_exp(alg, exp_err, name="TDVP2")
    return FiniteMPS(ALs, ARs, AC, 0), None


@partial(jax.jit, static_argnums=(5, 6))
def _timestep_finite2(ALs, ARs, AC, Ws, GRs, m: int, trscheme, dt=0.01):
    """Two-site TDVP: forward-evolve two-site blocks by dt/2, SVD-split with
    truncation, backward-evolve the one-site remainder."""
    from ..tensors.ops import svd_truncated

    L, D, d = ALs.shape[0], ALs.shape[1], ALs.shape[2]
    w = Ws.shape[1]
    dtype = AC.dtype
    GL0 = left_boundary(w, D, dtype)
    GRL = right_boundary(w, D, dtype)
    tau = -1j * (dt / 2)

    def split2(theta):
        U, S, Vh, _ = svd_truncated(theta.reshape(D * d, d * D), D, trscheme)
        S = S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
        return U.reshape(D, d, D), S, Vh.reshape(D, d, D)

    def stepL(carry, xs):
        AC, GL = carry  # AC at site i
        W1, W2, AR_next, GR_next2, is_last = xs
        theta = jnp.einsum("lpm,mqr->lpqr", AC, AR_next)
        theta, errT = expm_multiply_err(
            lambda x: ac2_apply(GL, W1, W2, GR_next2, x), theta, tau, m)
        AL, S, AR = split2(theta)
        GL_next = transfer_left_mpo(GL, W1, AL, AL)
        AC_next = jnp.einsum("m,mqr->mqr", S, AR)
        # backward one-site evolution of the new center (skip on last bond)
        AC_next, errB = jax.lax.cond(
            is_last,
            lambda x: (x, jnp.zeros((), errT.dtype)),
            lambda x: expm_multiply_err(
                lambda y: ac_apply(GL_next, W2, GR_next2, y), x, -tau, m),
            AC_next,
        )
        return (AC_next, GL_next), (AL, GL, jnp.maximum(errT, errB))

    # bond i = (i, i+1), i = 0..L-2; GR of site i+1 is GRs[i+2]
    GR2 = jnp.concatenate([GRs[2:], GRL[None]], axis=0)  # (L-1 needed)
    is_last = jnp.arange(L - 1) == L - 2
    xsL = (Ws[:-1], Ws[1:], ARs[1:], GR2[: L - 1], is_last)
    (AC, _), (ALs_n, GLs_scan, errsL) = jax.lax.scan(stepL, (AC, GL0), xsL)
    ALs = ALs.at[: L - 1].set(ALs_n)
    GLs = jnp.concatenate([GLs_scan, GLs_scan[-1][None]], axis=0)[:L]

    def stepR(carry, xs):
        AC, GR = carry  # AC at site i+1
        W1, W2, AL_prev, GL_i, is_first = xs
        theta = jnp.einsum("lpm,mqr->lpqr", AL_prev, AC)
        theta, errT = expm_multiply_err(
            lambda x: ac2_apply(GL_i, W1, W2, GR, x), theta, tau, m)
        AL, S, AR = split2(theta)
        GR_prev = transfer_right_mpo(GR, W2, AR, AR)
        AC_prev = jnp.einsum("lpm,m->lpm", AL, S)
        AC_prev, errB = jax.lax.cond(
            is_first,
            lambda x: (x, jnp.zeros((), errT.dtype)),
            lambda x: expm_multiply_err(
                lambda y: ac_apply(GL_i, W1, GR_prev, y), x, -tau, m),
            AC_prev,
        )
        return (AC_prev, GR_prev), (AR, GR, jnp.maximum(errT, errB))

    is_first = jnp.arange(L - 1) == 0
    xsR = (Ws[:-1], Ws[1:], ALs[: L - 1], GLs[: L - 1], is_first)
    (AC, _), (ARs_n, GRs_scan, errsR) = jax.lax.scan(stepR, (AC, GRL), xsR,
                                                     reverse=True)
    ARs = ARs.at[1:].set(ARs_n)
    GRs_new = jnp.concatenate(
        [GRs_scan[0][None], GRs_scan[0][None], GRs_scan], axis=0)[: L + 1]
    exp_err = jnp.maximum(jnp.max(errsL), jnp.max(errsR))
    return ALs, ARs, AC, GRs_new, exp_err
