"""Linear solves (GMRES) on pytrees — replaces KrylovKit `linsolve`
(reference src/environments/mpohaminfenv.jl:95, geometric-series environment
solves; src/algorithms/excitation/exci_transfer_system.jl)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tree import tree_norm, tree_add, tree_scale
from .basis import basis_combine

_TINY = 1e-30


def _givens(a, b_real):
    """Complex Givens rotation zeroing a REAL non-negative subdiagonal b
    under a (possibly complex) diagonal a: returns (c, s, r) with
    [c s; -conj(s) c] @ [a; b] = [r; 0], c real."""
    aa = jnp.abs(a)
    t = jnp.sqrt(aa * aa + b_real * b_real)
    safe_t = jnp.maximum(t, _TINY)
    c = aa / safe_t
    phase = jnp.where(aa > _TINY, a / jnp.maximum(aa, _TINY),
                      jnp.ones((), a.dtype))
    s = phase * (b_real / safe_t).astype(a.dtype)
    r = phase * t.astype(a.dtype)
    # a == 0, b > 0: swap rows
    swap = aa <= _TINY
    c = jnp.where(swap, 0.0, c)
    s = jnp.where(swap, jnp.ones((), a.dtype), s)
    r = jnp.where(swap, b_real.astype(a.dtype), r)
    return c.astype(a.dtype), s, r


def _gmres_cycle_adaptive(op: Callable, r, beta, m: int, exit_tol,
                          passes: int = 1, stall_exit: bool = False,
                          stall_arm=0.0):
    """One ADAPTIVE GMRES cycle: Arnoldi from r/beta with an incrementally
    Givens-rotated Hessenberg so the least-squares residual is available at
    EVERY step; stops at `exit_tol` (absolute, on the LS estimate), at
    breakdown, or after m steps. Returns (dx, est, steps): the correction to
    add to x, the final LS-residual estimate, and the step count.

    stall_exit additionally stops on a 4-step stall (< 5% improvement per
    step). ONLY safe for operators with LINEAR GMRES convergence — gapped
    geometric-series transfer solves, where a plateau IS the dtype floor.
    Indefinite spectra (e.g. shifted Hamiltonians in DynamicalDMRG) show
    plateau-then-breakthrough behavior that a stall exit would abort
    (measured: the dense indefinite linsolve test stalls at 3e-1), so the
    default keeps the full cycle.

    stall_arm (absolute): stall steps are only COUNTED once the LS estimate
    sits below this level — a plateau far above the dtype floor is slow
    convergence (a warm start invalidated by a state update, a transient
    Krylov plateau), not a floor, and must not abort the solve. Measured
    failure without the guard: the infinite GradientGrassmann CG stalls at
    gnorm ~0.2 because its retracted-state c128 environment solves were
    cut off mid-plateau (round-3 regression, fixed here).

    Replaces the fixed-trip-count cycle of the previous design: a
    warm-started geometric-series solve that needs 3 steps no longer burns
    the full m matvecs + CGS passes (the round-3 VUMPS trace: the env GMRES
    ran 9 fixed 12-step cycles, ~80% of the iteration time)."""
    from .basis import basis_zeros, basis_get, basis_set, basis_inner_all

    v0 = tree_scale(1.0 / jnp.maximum(beta, _TINY), r)
    V = basis_set(basis_zeros(v0, m + 1), 0, v0)
    cdt = basis_inner_all(V, v0).dtype
    R = jnp.zeros((m + 1, m), cdt)       # rotated (triangular) columns
    Q = jnp.eye(m + 1, dtype=cdt)        # accumulated rotations
    rdt = jnp.zeros((), cdt).real.dtype

    def body(state):
        V, R, Q, j, est, prev_est, stalls = state
        w = op(basis_get(V, j))
        c1 = basis_inner_all(V, w)
        w = tree_add(w, basis_combine(V, c1), alpha=-1.0)
        if passes > 1:
            c2 = basis_inner_all(V, w)
            w = tree_add(w, basis_combine(V, c2), alpha=-1.0)
            c1 = c1 + c2
        hb = tree_norm(w)
        wn = tree_scale(
            jnp.where(hb > _TINY, 1.0 / jnp.maximum(hb, _TINY), 0.0), w)
        V = basis_set(V, j + 1, wn)
        # rotate the new column by all previous rotations at once (Q is the
        # accumulated product), then generate this step's rotation
        hcol = Q @ c1.astype(cdt)
        a = hcol[j]
        gc, gs, gr = _givens(a, hb.astype(rdt))
        hcol = hcol.at[j].set(gr)
        # entries below j are zero already (c1[k]=0 for k>j, Q lower rows)
        R = R.at[:, j].set(hcol)
        rowj = Q[j]
        rowj1 = Q[j + 1]
        Q = Q.at[j].set(gc * rowj + gs * rowj1)
        Q = Q.at[j + 1].set(-jnp.conj(gs) * rowj + gc * rowj1)
        # LS residual estimate: |beta * Q[j+1, 0]|
        est_new = beta * jnp.abs(Q[j + 1, 0])
        improving = est_new < 0.95 * est
        armed = est_new < stall_arm
        stalls = jnp.where(improving, 0,
                           jnp.where(armed, stalls + 1, stalls))
        return V, R, Q, j + 1, est_new.astype(rdt), est, stalls

    max_stalls = 4 if stall_exit else m + 1

    def cond(state):
        _, _, _, j, est, _, stalls = state
        return jnp.logical_and(
            j < m,
            jnp.logical_and(est > exit_tol, stalls < max_stalls))

    init = (V, R, Q, jnp.zeros((), jnp.int32), beta.astype(rdt),
            jnp.array(jnp.inf, rdt), jnp.zeros((), jnp.int32))
    V, R, Q, j, est, _, _ = jax.lax.while_loop(cond, body, init)

    # solve the leading j-by-j triangular block: mask unfilled columns to
    # the identity so the padded solve is well-posed, then zero the slack y.
    # A tiny diagonal floor guards breakdown-step columns. Solved by an
    # UNROLLED column-sweep back-substitution (m sequential vector steps)
    # rather than jnp.linalg.solve: the TPU's LuDecomposition custom call
    # is f32/c64-only (f64[12,12] fails AOT compilation — round-5 chip
    # artifact), back-substitution is dtype-agnostic, and for triangular
    # Rm it is exact.
    colmask = jnp.arange(m) < j
    Rm = R[:m] * colmask[None, :].astype(cdt) + \
        jnp.diag((~colmask).astype(cdt))
    dmag = jnp.abs(jnp.diagonal(Rm))
    floor = 100 * jnp.finfo(rdt).eps * jnp.maximum(jnp.max(dmag), _TINY)
    Rm = Rm + jnp.diag(jnp.where(dmag < floor, floor, 0.0).astype(cdt))
    g = (beta.astype(cdt) * Q[:m, 0]) * colmask.astype(cdt)
    idx = jnp.arange(m)
    y = g
    for i in range(m - 1, -1, -1):
        yi = y[i] / Rm[i, i]
        y = jnp.where(idx == i, yi, y - Rm[:, i] * yi * (idx < i))
    y = y * colmask.astype(cdt)
    dx = basis_combine(V, jnp.pad(y, (0, 1)))
    return dx, est, j


def gmres_restarted(op: Callable, b, x0, tol, restart: int = 30,
                    maxiter: int = 40, stall_exit: bool = False):
    """Restarted ADAPTIVE GMRES with per-step and per-cycle exits.

    Each cycle is an adaptive (Givens-monitored) Arnoldi factorization of
    `op` started from the current TRUE residual — it stops mid-cycle at the
    target or at the dtype noise floor (see _gmres_cycle_adaptive). The
    outer loop stops at `tol` (relative to ||b||), at `maxiter` cycles, or
    after TWO consecutive cycles that fail to reduce the TRUE residual by
    30% — the least-squares estimate keeps "improving" below the dtype
    floor (measured 3e-5 estimated vs 3e-4 true at D=256 f32), so the
    cycle-end true residual (one extra matvec) drives the stagnation test
    and seeds the next cycle.

    Returns (x, relres, cycles)."""
    bnorm = tree_norm(b)
    m = restart
    abs_tol = tol * jnp.maximum(bnorm, _TINY)
    # stall exits are armed only near the dtype floor (relative level
    # ~50 sqrt(N) eps): plateaus far above it are slow convergence, not a
    # floor, and aborting there corrupts downstream gradients/energies
    # (see _gmres_cycle_adaptive docstring)
    leaves = jax.tree_util.tree_leaves(b)
    n_tot = sum(int(np.prod(l.shape)) for l in leaves) or 1
    rdt = jnp.zeros((), leaves[0].dtype).real.dtype
    arm_rel = 50.0 * np.sqrt(n_tot) * float(jnp.finfo(rdt).eps)
    arm_abs = arm_rel * jnp.maximum(bnorm, _TINY)

    def cycle(state):
        x, r, prev, it, stalls = state
        beta = tree_norm(r)
        dx, est, steps = _gmres_cycle_adaptive(op, r, beta, m,
                                               0.5 * abs_tol, passes=1,
                                               stall_exit=stall_exit,
                                               stall_arm=arm_abs)
        x = tree_add(x, dx)
        r = tree_add(b, op(x), alpha=-1.0)
        relres = tree_norm(r) / jnp.maximum(bnorm, _TINY)
        armed = relres < arm_rel
        stalls = jnp.where(relres < 0.7 * prev, 0,
                           jnp.where(armed, stalls + 1, stalls))
        return x, r, relres, it + 1, stalls

    def cond(state):
        _, _, relres, it, stalls = state
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_and(relres > tol, stalls < 2))

    r0 = tree_add(b, op(x0), alpha=-1.0)
    init = (x0, r0, tree_norm(r0) / jnp.maximum(bnorm, _TINY),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    x, _, relres, it, _ = jax.lax.while_loop(cond, cycle, init)
    return x, relres, it


def linsolve(matvec: Callable, b, x0=None, a0=1.0, a1=1.0, tol=1e-12,
             restart: int = 30, maxiter: int = 40):
    """Solve (a0 + a1 * A) x = b for pytree b.

    Mirrors KrylovKit's linsolve(f, b, x0, a0, a1) signature used throughout
    the reference's environment code: a0=1, a1=-1 gives (1 - T) x = b.
    """
    if x0 is None:
        x0 = b

    def op(x):
        return tree_add(tree_scale(a0, x), matvec(x), alpha=a1)

    x, _, _ = gmres_restarted(op, b, x0, tol, restart, maxiter)
    return x


def linsolve_info(matvec: Callable, b, x0=None, a0=1.0, a1=1.0, tol=1e-12,
                  restart: int = 30, maxiter: int = 40,
                  stall_exit: bool = False):
    """`linsolve` that also returns the measured relative residual
    ||(a0 + a1 A) x - b|| / ||b|| (one extra matvec — the in-loop estimate
    is the Hessenberg least-squares residual, which drifts from the true
    residual at the noise floor), so callers can surface non-convergence
    the way the reference warns on every unconverged solve (reference
    src/environments/mpohaminfenv.jl:97-98,
    src/algorithms/fixedpoint.jl:12-14)."""
    if x0 is None:
        x0 = b

    def op(x):
        return tree_add(tree_scale(a0, x), matvec(x), alpha=a1)

    x, _, _ = gmres_restarted(op, b, x0, tol, restart, maxiter,
                              stall_exit=stall_exit)
    relres = tree_norm(tree_add(op(x), b, alpha=-1.0)) / jnp.maximum(
        tree_norm(b), _TINY)
    return x, relres


def linsolve_cg(matvec, b, x0=None, tol=1e-10, maxiter: int = 200):
    """Hand-rolled conjugate gradient for Hermitian positive(-semi)definite
    pytree operators. Unlike jax.scipy's cg/gmres this builds no
    custom_linear_solve primitive, so it can be nested inside other solvers
    (needed by fidelity_susceptibility, whose operator itself contains GMRES
    environment solves)."""
    import jax
    import jax.numpy as jnp
    from ..utils.tree import tree_inner

    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)

    r0 = tree_add(b, matvec(x0), alpha=-1.0)
    bnorm = tree_norm(b)

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(k < maxiter,
                               tree_norm(r) > tol * jnp.maximum(bnorm, 1e-30))

    def body(state):
        x, r, p, rs, k = state
        Ap = matvec(p)
        alpha = rs / tree_inner(p, Ap)
        x = tree_add(x, p, alpha=alpha)
        r = tree_add(r, Ap, alpha=-alpha)
        rs_new = tree_inner(r, r)
        beta = rs_new / rs
        p = tree_add(r, p, alpha=beta)
        return x, r, p, rs_new, k + 1

    state = (x0, r0, r0, tree_inner(r0, r0), jnp.zeros((), jnp.int32))
    x, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x
