"""One-site DMRG (reference src/algorithms/groundstate/dmrg.jl:22-55).

TPU-native design: a full left-right/right-left sweep is ONE jit-compiled
function whose site loop is a `lax.scan` with uniform (D, d, D) shapes; the
per-site eigensolve is the on-device restarted Lanczos; environments are
carried through the scan (never stale, no cache invalidation — cf. the
reference's orthoview/FinEnv mutation protocol it replaces).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_CONV, VERBOSE_ITER
from ..linalg.lanczos import eigsh_smallest
from ..states.finitemps import FiniteMPS
from ..tensors.ops import leftorth, rightorth
from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
from ..environments.finite import (
    left_boundary, right_boundary, compute_right_envs, stack_W, FiniteEnv,
    compute_left_envs,
)
from ..utils.logging import IterLog
from ..utils.dynamictols import updatetol
from .derivatives import ac_apply, ac_apply_fast
from .unionalg import Chainable


@dataclasses.dataclass(frozen=True)
class DMRG(Chainable):
    """One-site DMRG parameters (reference dmrg.jl:14-20).

    fast_qr: use CholeskyQR2 for the gauge moves at full-rank bulk sites.
    EXPERIMENTAL and off by default: on v5e at float32 the measured sweep
    time matched Householder once the Gram regularization was made
    numerically safe, and the jitter costs ~1e-3 relative energy accuracy.
    Kept as an opt-in for future tuning (larger D may favor it)."""

    tol: float = 1e-10
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 10
    verbosity: int = Defaults.verbosity
    finalize: Optional[Callable] = None
    fast_qr: Optional[bool] = None
    # Lanczos reorthogonalization: "local1" (single-pass 3-term recurrence,
    # the fastest restarted-site-solve path; f64 energies match the full
    # path to ~1e-13 on the ED fixtures), "local" (adds a corrective pass)
    # or "full" (two-pass CGS against the whole basis each step).
    reorth: str = "local1"
    # Use the Lanczos Ritz-residual bound as the per-site convergence
    # residual instead of recomputing the exact Galerkin projection — a
    # conservative upper bound that saves one full matvec per site (~6% of
    # a sweep). Convergence decisions stay sound (bound >= true residual);
    # the reported eps is then a bound, not the exact tangent residual.
    cheap_galerkin: bool = False


def bulk_rank_flags(L: int, d: int, D: int):
    """(bulkL, bulkR) boolean flags: site i's left/right orthogonalization
    panel is full rank D (safe for CholeskyQR2)."""
    import numpy as np
    from ..states.finitemps import physical_bond_dims

    dims = physical_bond_dims(L, d, D)
    bulkL = np.array([(dims[i] * d >= D) and (dims[i + 1] == D)
                      for i in range(L)])
    bulkR = np.array([(dims[i] == D) and (dims[i + 1] * d >= D)
                      for i in range(L)])
    return jnp.asarray(bulkL), jnp.asarray(bulkR)


def _galerkin_left(AL, y):
    """||(1 - AL AL^dag) y|| after a left-orthogonal split."""
    z = jnp.einsum("lpm,lpr->mr", AL.conj(), y)
    y_perp = y - jnp.einsum("lpm,mr->lpr", AL, z)
    return jnp.linalg.norm(y_perp)


def _galerkin_right(AR, y):
    z = jnp.einsum("mpr,lpr->lm", AR.conj(), y)
    y_perp = y - jnp.einsum("lm,mpr->lpr", z, AR)
    return jnp.linalg.norm(y_perp)


def _dmrg_sweep_impl(ALs, ARs, AC, Ws, GRs, inner_tol, m: int, restarts: int,
                     GL0=None, GRL=None, masks=None, bulk_flags=None,
                     reorth: str = "local1", use_fast: bool = True,
                     cheap_galerkin: bool = False):
    """One full DMRG sweep (L2R over sites 0..L-2, R2L over L-1..1),
    starting and ending with center = 0. Returns updated tensors, fresh
    right environments, the last eigenvalue and the max Galerkin residual.
    GL0/GRL override the open-chain boundary environments (used by
    WindowMPS, whose boundaries are infinite-side fixed points).

    use_fast=False disables the guarded mixed-precision Lanczos probe —
    required when this body runs under `jax.vmap` (rsdmrg segment sweeps),
    where the probe's `lax.cond` would execute BOTH branches per lane and
    double the matvec cost instead of saving it.

    ALs/ARs/AC/GRs are DONATED on TPU (callers must rebind to the outputs,
    as every driver does): the tensor + environment stacks dominate HBM at
    large D, and donation halves the peak — measured to unlock D=2048
    (L=32, w=3, f32) on one 16 GB v5e chip, which OOMs otherwise."""
    L, D = ALs.shape[0], ALs.shape[1]
    w = Ws.shape[1]
    dtype = AC.dtype
    if GL0 is None:
        GL0 = left_boundary(w, D, dtype)
    if GRL is None:
        GRL = right_boundary(w, D, dtype)

    if masks is None:
        masks = jnp.ones((L, 1, 1, 1), dtype=jnp.bool_)
    maskf = masks.astype(dtype)
    if bulk_flags is None:
        bulkL = bulkR = jnp.zeros((L,), jnp.bool_)
    else:
        bulkL, bulkR = bulk_flags
    from ..tensors.ops import leftorth_hybrid, rightorth_hybrid

    # ---- left-to-right: solve sites 0..L-2 ----
    def stepL(carry, xs):
        AC, GL = carry
        W, AR_next, GR_next, mk, bk = xs
        res = eigsh_smallest(
            lambda x: ac_apply(GL, W, GR_next, x), AC, m, restarts, inner_tol,
            reorth=reorth,
            matvec_fast=(lambda x: ac_apply_fast(GL, W, GR_next, x))
            if use_fast else None)
        ACp = res.eigenvector * mk
        ACp = ACp / jnp.maximum(jnp.linalg.norm(ACp), 1e-30)
        AL, C = leftorth_hybrid(ACp, bk)
        AL = AL * mk
        if cheap_galerkin:
            # the Lanczos Ritz-residual bound |beta_m s_m| >= the Galerkin
            # residual (it bounds ||H AC - lam AC||, of which the Galerkin
            # projection keeps only the tangent part): a conservative eps
            # that saves one full matvec per site (~6% of the sweep)
            eps = res.residual
        else:
            eps = _galerkin_left(AL, ac_apply(GL, W, GR_next, ACp))
        GL_next = transfer_left_mpo(GL, W, AL, AL)
        AC_next = jnp.einsum("lm,mpr->lpr", C, AR_next)
        return (AC_next, GL_next), (AL, GL, res.eigenvalue, eps,
                                    res.converged, res.residual)

    xsL = (Ws[: L - 1], ARs[1:], GRs[1:L], maskf[: L - 1], bulkL[: L - 1])
    (AC, GL_last), (ALs_new, GLs_scan, lamsL, epsL, convL, residL) = \
        jax.lax.scan(stepL, (AC, GL0), xsL)
    ALs = ALs.at[: L - 1].set(ALs_new)
    # GLs[i] for i = 0..L-2 are in GLs_scan; GLs[L-1] is GL_last
    GLs = jnp.concatenate([GLs_scan, GL_last[None]], axis=0)  # (L, w, D, D)

    # ---- right-to-left: solve sites L-1..1 ----
    def stepR(carry, xs):
        AC, GR = carry
        W, AL_prev, GL_i, mk, bk = xs
        res = eigsh_smallest(
            lambda x: ac_apply(GL_i, W, GR, x), AC, m, restarts, inner_tol,
            reorth=reorth,
            matvec_fast=(lambda x: ac_apply_fast(GL_i, W, GR, x))
            if use_fast else None)
        ACp = res.eigenvector * mk
        ACp = ACp / jnp.maximum(jnp.linalg.norm(ACp), 1e-30)
        C, AR = rightorth_hybrid(ACp, bk)
        AR = AR * mk
        if cheap_galerkin:
            eps = res.residual
        else:
            eps = _galerkin_right(AR, ac_apply(GL_i, W, GR, ACp))
        GR_prev = transfer_right_mpo(GR, W, AR, AR)
        AC_prev = jnp.einsum("lpm,mr->lpr", AL_prev, C)
        return (AC_prev, GR_prev), (AR, GR, res.eigenvalue, eps,
                                    res.converged, res.residual)

    xsR = (Ws[1:], ALs[: L - 1], GLs[1:], maskf[1:], bulkR[1:])
    (AC, GR_last), (ARs_new, GRs_scan, lamsR, epsR, convR, residR) = \
        jax.lax.scan(stepR, (AC, GRL), xsR, reverse=True)
    ARs = ARs.at[1:].set(ARs_new)
    # fresh right envs for the next sweep: GRs_new[1] = final carry,
    # GRs_new[j+2] = scan output j (j = 0..L-2); GRs_new[0] unused
    GRs = jnp.concatenate([GR_last[None], GR_last[None], GRs_scan], axis=0)

    lam = lamsR[0]  # eigenvalue at site 1 (last solved)
    eps = jnp.maximum(jnp.max(epsL), jnp.max(epsR))
    # solver diagnostics: (# of site eigensolves that missed inner_tol,
    # worst residual) — the driver warns on the host (reference warns on
    # every unconverged solve, src/algorithms/fixedpoint.jl:12-14)
    n_unconv = (jnp.sum(~convL) + jnp.sum(~convR)).astype(jnp.int32)
    diag = (n_unconv, jnp.maximum(jnp.max(residL), jnp.max(residR)))
    return ALs, ARs, AC, GRs, lam, eps, diag


_dmrg_sweep = partial(jax.jit, static_argnums=(6, 7),
                      static_argnames=("reorth", "use_fast",
                                       "cheap_galerkin"),
                      donate_argnums=(0, 1, 2, 4))(_dmrg_sweep_impl)


def find_groundstate_dmrg_window(psi, H, alg: DMRG = DMRG()):
    """One-site DMRG on the window of a WindowMPS, with the infinite-side
    fixed points as boundary environments."""
    from ..states.windowmps import WindowMPS

    assert isinstance(psi, WindowMPS)
    win = psi.window.move_center(0)
    L, D = win.length, win.D
    Ws = stack_W(H, L).astype(win.dtype)
    GL0, GRL = psi.boundary_envs(H)
    GRs = compute_right_envs(win.ARs, Ws, GRL)
    # copies: the sweep donates its tensor args on TPU; the caller's
    # WindowMPS must stay valid
    ALs, ARs, AC = (jnp.array(x, copy=True)
                    for x in (win.ALs, win.ARs, win.AC))
    log = IterLog("DMRG(window)", alg.verbosity)
    eps = 1.0
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        ALs, ARs, AC, GRs, lam, eps, diag = _dmrg_sweep(
            ALs, ARs, AC, Ws, GRs, inner_tol,
            alg.krylovdim, alg.eig_maxrestarts, GL0=GL0, GRL=GRL,
            reorth=alg.reorth, cheap_galerkin=alg.cheap_galerkin)
        eps = float(eps)
        log.solver_warn(it, diag, float(inner_tol))
        if eps < alg.tol:
            break
    out = WindowMPS(psi.left_gs, FiniteMPS(ALs, ARs, AC, 0), psi.right_gs)
    return out, None, eps


def find_groundstate_dmrg(psi: FiniteMPS, H, alg: DMRG = DMRG()):
    """Run one-site DMRG. Returns (psi, envs, epsilon)."""
    from ..states.windowmps import WindowMPS

    if isinstance(psi, WindowMPS):
        return find_groundstate_dmrg_window(psi, H, alg)
    from ..states.finitemps import support_mask

    L, D = psi.length, psi.D
    psi = psi.move_center(0)
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, psi.dtype))
    masks = jnp.asarray(support_mask(L, psi.physicaldim, D))
    fast = bool(alg.fast_qr)
    bulk_flags = bulk_rank_flags(L, psi.physicaldim, D) if fast else None

    log = IterLog("DMRG", alg.verbosity)
    log.init()
    # copies: the sweep donates its tensor args on TPU; the caller's psi
    # (and any state a finalize hook returns) must stay valid
    ALs, ARs, AC = (jnp.array(x, copy=True)
                    for x in (psi.ALs, psi.ARs, psi.AC))
    eps = 1.0
    lam = jnp.zeros((), jnp.zeros((), psi.dtype).real.dtype)
    it = 0
    from ..config import matmul_precision

    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        with matmul_precision(psi.dtype):
            ALs, ARs, AC, GRs, lam, eps, diag = _dmrg_sweep(
                ALs, ARs, AC, Ws, GRs, inner_tol,
                alg.krylovdim, alg.eig_maxrestarts, masks=masks,
                bulk_flags=bulk_flags, reorth=alg.reorth,
                cheap_galerkin=alg.cheap_galerkin)
        psi = FiniteMPS(ALs, ARs, AC, 0)
        if alg.finalize is not None:
            psi = alg.finalize(it, psi, H) or psi
            ALs, ARs, AC = (jnp.array(x, copy=True)
                            for x in (psi.ALs, psi.ARs, psi.AC))
        eps = float(eps)
        log.solver_warn(it, diag, float(inner_tol))
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, float(jnp.real(lam)), eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(it, float(jnp.real(lam)), eps)

    GLs = compute_left_envs(ALs, Ws, left_boundary(w, D, psi.dtype))
    envs = FiniteEnv(GLs, GRs)
    return psi, envs, eps
