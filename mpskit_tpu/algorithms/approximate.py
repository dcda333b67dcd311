"""Variational approximation psi ~= O . phi (reference
src/algorithms/approximate/): DMRG-style fitting sweeps for finite states
(fvomps.jl:11-87) and VOMPS-style power updates for infinite states
(vomps.jl:19-80). Also plain state compression (O = None).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Defaults
from ..states.finitemps import FiniteMPS
from ..states.infinitemps import InfiniteMPS
from ..states.gauging import regauge_ACC
from ..operators.mpo import DenseMPO, MPOHamiltonian
from ..tensors.ops import leftorth, rightorth
from ..transfermatrix.transfer import (
    transfer_left_mpo, transfer_right_mpo, transfer_left, transfer_right,
)
from .derivatives import ac_apply, c_apply


@dataclasses.dataclass(frozen=True)
class FitDMRG:
    """One-site fitting sweeps (the reference's approximate-DMRG)."""

    tol: float = 1e-10
    maxiter: int = 60
    verbosity: int = Defaults.verbosity


@dataclasses.dataclass(frozen=True)
class FitDMRG2:
    """Two-site fitting sweeps with truncated re-splitting (the
    reference's approximate-DMRG2, approximate/fvomps.jl two-site path):
    adapts the Schmidt content of psi while fitting O . phi."""

    tol: float = 1e-10
    maxiter: int = 60
    trscheme: object = None
    verbosity: int = Defaults.verbosity


@dataclasses.dataclass(frozen=True)
class FitIDMRG:
    """IDMRG1-style fitting for infinite states (reference
    src/algorithms/approximate/idmrg.jl:1-58): environments are *pushed*
    around the unit cell (with normalization) instead of re-solved each
    iteration; every site update is a single projection application."""

    tol: float = 1e-10
    maxiter: int = 100
    verbosity: int = Defaults.verbosity


@dataclasses.dataclass(frozen=True)
class FitIDMRG2:
    """IDMRG2-style two-site fitting for infinite states (reference
    approximate/idmrg.jl:61-145): two-site projections re-split by
    truncated SVD, adapting the Schmidt content while fitting. Requires a
    unit cell of >= 2 sites."""

    tol: float = 1e-10
    maxiter: int = 100
    verbosity: int = Defaults.verbosity


def _as_stack(O, L, dtype):
    if isinstance(O, DenseMPO):
        # handles ragged (size-1 edge) virtual legs by zero-padding
        full = DenseMPO(tuple(O.site(i) for i in range(L)))
        return full.stacked_uniform(dtype)
    return jnp.stack([O.site(i) for i in range(L)]).astype(dtype)


@jax.jit
def _fit_sweep(ALs, ARs, AC, Os, phiA, GRs, GL0, GRL):
    """One L2R+R2L fitting sweep: AC_i <- GL_mix W GR_mix AC^phi_i.
    phiA = gauged tensors of the target state (AC at matching center is
    not needed: projections use the target's own mixed gauge tensors)."""
    L, D = ALs.shape[0], ALs.shape[1]
    w = Os.shape[1]
    dtype = AC.dtype
    phiAL, phiAR, phiAC = phiA

    def stepL(carry, xs):
        GL = carry
        W, phiAC_i, phiAL_i, GR_next = xs
        ACn = ac_apply(GL, W, GR_next, phiAC_i)
        nrm = jnp.linalg.norm(ACn)
        ACn = ACn / jnp.maximum(nrm, 1e-30)
        AL, C = leftorth(ACn)
        GL_next = transfer_left_mpo(GL, W, phiAL_i, AL)
        return GL_next, (AL, GL, ACn)

    xsL = (Os, phiAC, phiAL, GRs[1:])
    GL_last, (ALs_n, GLs_scan, ACs_n) = jax.lax.scan(stepL, GL0, xsL)
    ALs = ALs_n
    GLs = jnp.concatenate([GLs_scan, GL_last[None]], axis=0)

    def stepR(carry, xs):
        GR = carry
        W, phiAC_i, phiAR_i, GL_i = xs
        ACn = ac_apply(GL_i, W, GR, phiAC_i)
        nrm = jnp.linalg.norm(ACn)
        ACn = ACn / jnp.maximum(nrm, 1e-30)
        C, AR = rightorth(ACn)
        GR_prev = transfer_right_mpo(GR, W, phiAR_i, AR)
        return GR_prev, (AR, GR, ACn)

    xsR = (Os, phiAC, phiAR, GLs[:L])
    GR_first, (ARs_n, GRs_scan, ACsR) = jax.lax.scan(stepR, GRL, xsR,
                                                     reverse=True)
    ARs = ARs_n
    GRs = jnp.concatenate([GR_first[None], GRs_scan], axis=0)
    AC = ACsR[0]
    return ALs, ARs, AC, GRs


@jax.jit
def _fit2_sweep(ALs, ARs, AC, Os, phiA, GRs, GL0, GRL, trmask_dim):
    """Two-site fitting sweep: theta_i <- GLmix W_i W_{i+1} GRmix theta^phi,
    SVD re-split (masked truncation via trmask_dim as a static width is
    handled by svd_truncated's Dmax = D)."""
    from ..tensors.ops import svd_truncated, notrunc
    from .derivatives import ac2_apply

    L, D = ALs.shape[0], ALs.shape[1]
    d = ALs.shape[2]
    dtype = AC.dtype
    phiAL, phiAR, phiAC = phiA

    def split2(theta):
        U, S, Vh, _ = svd_truncated(theta.reshape(D * d, d * D), D, notrunc())
        S = S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
        return U.reshape(D, d, D), S, Vh.reshape(D, d, D)

    def stepL(carry, xs):
        GL = carry
        W1, W2, phiAC_i, phiAR_n, phiAL_i, GR_next2 = xs
        theta_phi = jnp.einsum("lpm,mqr->lpqr", phiAC_i, phiAR_n)
        theta = ac2_apply(GL, W1, W2, GR_next2, theta_phi)
        theta = theta / jnp.maximum(jnp.linalg.norm(theta), 1e-30)
        AL, S, AR = split2(theta)
        GL_next = transfer_left_mpo(GL, W1, phiAL_i, AL)
        return GL_next, (AL, GL)

    xsL = (Os[: L - 1], Os[1:], phiAC[: L - 1], phiAR[1:], phiAL[: L - 1],
           GRs[2:])
    GL_last, (ALs_n, GLs_scan) = jax.lax.scan(stepL, GL0, xsL)
    ALs = ALs.at[: L - 1].set(ALs_n)
    GLs = jnp.concatenate([GLs_scan, GL_last[None]], axis=0)

    def stepR(carry, xs):
        GR = carry
        W1, W2, phiAC_n, phiAL_i, phiAR_n, GL_i = xs
        theta_phi = jnp.einsum("lpm,mqr->lpqr", phiAL_i, phiAC_n)
        theta = ac2_apply(GL_i, W1, W2, GR, theta_phi)
        theta = theta / jnp.maximum(jnp.linalg.norm(theta), 1e-30)
        AL, S, AR = split2(theta)
        GR_prev = transfer_right_mpo(GR, W2, phiAR_n, AR)
        ACs = jnp.einsum("lpm,m->lpm", AL, S)
        return GR_prev, (AR, ACs)

    xsR = (Os[: L - 1], Os[1:], phiAC[1:], phiAL[: L - 1], phiAR[1:],
           GLs[: L - 1])
    GR_first, (ARs_n, ACs_mid) = jax.lax.scan(stepR, GRL, xsR, reverse=True)
    ARs = ARs.at[1:].set(ARs_n)
    AC = ACs_mid[0]
    return ALs, ARs, AC


def _mixed_right_envs_fit(phiAR, ARs, Os, GRL):
    """Right mixed environments (ket = target phi, bra = current psi)."""

    def body(GR, xs):
        Ak, Ab, W = xs
        return transfer_right_mpo(GR, W, Ak, Ab), GR

    GR_first, GRs = jax.lax.scan(body, GRL, (phiAR, ARs, Os), reverse=True)
    return jnp.concatenate([GR_first[None], GRs], axis=0)


def _identity_mpo(d, L, dtype):
    W = jnp.eye(d, dtype=dtype)[None, None]
    return DenseMPO(tuple([W] * L))


def approximate(psi, target, alg=None, envs=None):
    """approximate(psi, (O, phi)[, alg]) or approximate(psi, phi[, alg]):
    variationally fit psi (at its own bond dimension) to O . phi.
    Returns (psi, envs, epsilon)."""
    if alg is None:
        alg = FitDMRG()
    if isinstance(target, tuple):
        O, phi = target
    else:
        O, phi = None, target

    if isinstance(psi, FiniteMPS):
        return _approximate_finite(psi, O, phi, alg)
    from ..states.multiline import MPSMultiline

    if isinstance(psi, MPSMultiline) or isinstance(phi, MPSMultiline):
        return _approximate_multiline(psi, O, phi, alg)
    if isinstance(psi, InfiniteMPS):
        if isinstance(alg, (FitIDMRG, FitIDMRG2)):
            return _approximate_idmrg(psi, O, phi, alg)
        return _approximate_infinite(psi, O, phi, alg)
    raise TypeError(type(psi))


def _approximate_multiline(psi, O, phi, alg):
    """Multiline approximate (reference approximate/idmrg.jl:1-145 and
    vomps.jl): the MPO row r maps `phi` row r onto `psi` row r+1
    (idmrg.jl:17-21, `ψ.AC[row + 1, col] = h * above.AC[row, col]`), so
    each output row is an independent single-row fit of O_r · phi_r —
    rows couple only through that shift. Returns
    (MPSMultiline, per-row envs, max per-row eps)."""
    from ..states.multiline import MPSMultiline
    from ..operators.multiline import MPOMultiline

    if isinstance(psi, InfiniteMPS):
        psi = MPSMultiline.from_mps(psi, phi.nrows
                                    if isinstance(phi, MPSMultiline) else 1)
    if isinstance(phi, InfiniteMPS):
        phi = MPSMultiline.from_mps(phi, psi.nrows)
    R = psi.nrows
    assert phi.nrows == R
    if O is None or isinstance(O, DenseMPO):
        O = MPOMultiline.from_mpo(
            O if O is not None
            else _identity_mpo(phi.rows[0].physicaldim, phi.period,
                               phi.rows[0].dtype), R)
    assert O.nrows in (1, R)

    fit = (_approximate_idmrg if isinstance(alg, (FitIDMRG, FitIDMRG2))
           else _approximate_infinite)
    new_rows = list(psi.rows)
    envs_rows = [None] * R
    eps = 0.0
    for r in range(R):
        out, envs, err = fit(psi.rows[(r + 1) % R], O.row(r), phi.rows[r],
                             alg)
        new_rows[(r + 1) % R] = out
        envs_rows[(r + 1) % R] = envs
        eps = max(eps, float(err))
    return MPSMultiline(tuple(new_rows)), envs_rows, eps


def _gauged_stacks_finite(phi: FiniteMPS):
    from ..states.quasiparticle import full_gauges

    ALs, ARs = full_gauges(phi)
    ACs = []
    for i in range(phi.length):
        ACs.append(phi.move_center(i).AC)
    return ALs, ARs, jnp.stack(ACs)


def _approximate_finite(psi: FiniteMPS, O, phi: FiniteMPS, alg):
    L, D, d = psi.length, psi.D, psi.physicaldim
    dtype = psi.dtype
    if O is None:
        Os = _as_stack(_identity_mpo(d, L, dtype), L, dtype)
    elif isinstance(O, MPOHamiltonian):
        from ..environments.finite import stack_W

        Os = stack_W(O, L).astype(dtype)
    else:
        Os = _as_stack(O, L, dtype)
    w = Os.shape[1]

    phiA = _gauged_stacks_finite(phi)
    psi0 = psi.move_center(0)
    ALs, ARs, AC = psi0.ALs, psi0.ARs, psi0.AC

    # initial right mixed envs
    # boundary: for Hamiltonian FSMs the right boundary level is w-1; for
    # evolution/identity MPOs level 0. Detect via the MPO type.
    right_level = w - 1 if isinstance(O, MPOHamiltonian) else 0
    GRL = jnp.zeros((w, D, D), dtype).at[right_level, 0, 0].set(1.0)
    GL0 = jnp.zeros((w, D, D), dtype).at[0, 0, 0].set(1.0)

    GRs = _mixed_right_envs_fit(phiA[1], ARs, Os, GRL)
    prev = None
    eps = 1.0
    two_site = isinstance(alg, FitDMRG2)
    for it in range(alg.maxiter):
        if two_site:
            ALs, ARs, AC = _fit2_sweep(ALs, ARs, AC, Os, phiA, GRs, GL0,
                                       GRL, 0)
            GRs = _mixed_right_envs_fit(phiA[1], ARs, Os, GRL)
        else:
            ALs, ARs, AC, GRs = _fit_sweep(ALs, ARs, AC, Os, phiA, GRs,
                                           GL0, GRL)
        if prev is not None:
            eps = float(jnp.linalg.norm(AC - prev))
        prev = AC
        if eps < alg.tol:
            break
    return FiniteMPS(ALs, ARs, AC, 0), None, eps


@jax.jit
def _fit_idmrg1_iteration(ALs, ARs, Cs, GLs, GRs, Os, phiAL, phiAR, phiAC):
    """One IDMRG1-fit iteration (reference approximate/idmrg.jl:12-45):
    L2R then R2L single-site projection sweeps around the unit cell with
    normalized environment pushes (no fixed-point solves)."""
    L = ALs.shape[0]

    # L2R: update AL[i], push GL around the cell (wraps into GLs[0])
    def bodyL(GL, xs):
        W, pAC, pAL, GR_i = xs
        AC = ac_apply(GL, W, GR_i, pAC)
        AC = AC / jnp.maximum(jnp.linalg.norm(AC), 1e-30)
        AL, C = leftorth(AC)
        GLn = transfer_left_mpo(GL, W, pAL, AL)
        GLn = GLn / jnp.maximum(jnp.linalg.norm(GLn), 1e-30)
        return GLn, (AL, C, GLn)

    _, (ALs_n, CsL, GL_push) = jax.lax.scan(
        bodyL, GLs[0], (Os, phiAC, phiAL, GRs))
    GLs = jnp.roll(GL_push, 1, axis=0)  # env pushed past site i -> GLs[i+1]

    # R2L: update AR[i], push GR (wraps into GRs[L-1])
    def bodyR(GR, xs):
        W, pAC, pAR, GL_i = xs
        AC = ac_apply(GL_i, W, GR, pAC)
        AC = AC / jnp.maximum(jnp.linalg.norm(AC), 1e-30)
        C, AR = rightorth(AC)
        GRn = transfer_right_mpo(GR, W, pAR, AR)
        GRn = GRn / jnp.maximum(jnp.linalg.norm(GRn), 1e-30)
        return GRn, (AR, C, GRn)

    _, (ARs_n, CsR, GR_push) = jax.lax.scan(
        bodyR, GRs[L - 1], (Os, phiAC, phiAR, GLs), reverse=True)
    GRs = jnp.roll(GR_push, -1, axis=0)  # pushed past site i -> GRs[i-1]

    # convergence: C change at the cell boundary, phase-aligned
    # (CsR[i] lives at the bond LEFT of site i; boundary bond = bond 0)
    C_new = CsR[0]
    ph = jnp.vdot(Cs[L - 1], C_new)
    ph = ph / jnp.maximum(jnp.abs(ph), 1e-30)
    err = jnp.linalg.norm(C_new - ph * Cs[L - 1])
    Cs = jnp.roll(CsR, -1, axis=0)      # Cs[i] = bond right of site i
    return ALs_n, ARs_n, Cs, GLs, GRs, err


@jax.jit
def _fit_idmrg2_iteration(Cs, GLs, GRs, Os, phiAL, phiAR, phiAC):
    """One IDMRG2-fit iteration (reference approximate/idmrg.jl:61-145):
    two-site projections theta <- GL W W GR theta_phi, truncated-SVD
    re-split at static D, wraparound at the cell edges."""
    from ..tensors.ops import svd_truncated, notrunc
    from .derivatives import ac2_apply

    L, D, d = phiAC.shape[0], phiAC.shape[1], phiAC.shape[2]

    def split2(theta):
        U, S, Vh, _ = svd_truncated(theta.reshape(D * d, d * D), D, notrunc())
        S = S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
        return U.reshape(D, d, D), S, Vh.reshape(D, d, D)

    ALs = jnp.zeros_like(phiAC)
    ARs = jnp.zeros_like(phiAC)
    Cs_new = jnp.zeros_like(Cs)

    # L2R: bonds (i, i+1 mod L) for i = 0..L-1
    Os_next = jnp.roll(Os, -1, axis=0)
    phiAR_next = jnp.roll(phiAR, -1, axis=0)
    GR_next = jnp.roll(GRs, -1, axis=0)

    def bodyL(carry, xs):
        ALs, ARs, Cs_new, GLs, GRs, i = carry
        W1, W2, pAC, pARn = xs
        theta_phi = jnp.einsum("lpm,mqr->lpqr", pAC, pARn)
        GL_i = GLs[i]
        GR_n = GRs[(i + 1) % L]
        theta = ac2_apply(GL_i, W1, W2, GR_n, theta_phi)
        theta = theta / jnp.maximum(jnp.linalg.norm(theta), 1e-30)
        AL, S, AR = split2(theta)
        ALs = ALs.at[i].set(AL)
        ARs = ARs.at[(i + 1) % L].set(AR)
        Cs_new = Cs_new.at[i].set(jnp.diag(S.astype(theta.dtype)))
        GLn = transfer_left_mpo(GL_i, W1, phiAL[i], AL)
        GLn = GLn / jnp.maximum(jnp.linalg.norm(GLn), 1e-30)
        GLs = GLs.at[(i + 1) % L].set(GLn)
        GRn = transfer_right_mpo(GR_n, W2, phiAR[(i + 1) % L], AR)
        GRn = GRn / jnp.maximum(jnp.linalg.norm(GRn), 1e-30)
        GRs = GRs.at[i].set(GRn)
        return (ALs, ARs, Cs_new, GLs, GRs, i + 1), None

    (ALs, ARs, Cs_new, GLs, GRs, _), _ = jax.lax.scan(
        bodyL, (ALs, ARs, Cs_new, GLs, GRs, 0), (Os, Os_next, phiAC,
                                                 phiAR_next), length=L)

    # R2L: bonds (i, i+1 mod L) for i = L-2 .. -1 (wrapping)
    def bodyR(carry, xs):
        ALs, ARs, Cs_new, GLs, GRs, i = carry
        ii = i % L
        jj = (i + 1) % L
        theta_phi = jnp.einsum("lpm,mqr->lpqr", phiAL[ii], phiAC[jj])
        theta = ac2_apply(GLs[ii], Os[ii], Os[jj], GRs[jj], theta_phi)
        theta = theta / jnp.maximum(jnp.linalg.norm(theta), 1e-30)
        AL, S, AR = split2(theta)
        ALs = ALs.at[ii].set(AL)
        ARs = ARs.at[jj].set(AR)
        Cs_new = Cs_new.at[ii].set(jnp.diag(S.astype(theta.dtype)))
        GLn = transfer_left_mpo(GLs[ii], Os[ii], phiAL[ii], AL)
        GLn = GLn / jnp.maximum(jnp.linalg.norm(GLn), 1e-30)
        GLs = GLs.at[jj].set(GLn)
        GRn = transfer_right_mpo(GRs[jj], Os[jj], phiAR[jj], AR)
        GRn = GRn / jnp.maximum(jnp.linalg.norm(GRn), 1e-30)
        GRs = GRs.at[ii].set(GRn)
        return (ALs, ARs, Cs_new, GLs, GRs, i - 1), None

    (ALs, ARs, Cs_new, GLs, GRs, _), _ = jax.lax.scan(
        bodyR, (ALs, ARs, Cs_new, GLs, GRs, L - 2), None, length=L)

    # convergence: change in the boundary-bond singular spectrum
    # (both Cs hold diagonal singular matrices here; compare spectra)
    s_new = jnp.sort(jnp.abs(jnp.diagonal(Cs_new[L - 1])))[::-1]
    s_old = jnp.sort(jnp.abs(jnp.diagonal(Cs[L - 1])))[::-1]
    err = jnp.linalg.norm(s_new - s_old)
    return ALs, ARs, Cs_new, GLs, GRs, err


def _approximate_idmrg(psi: InfiniteMPS, O, phi: InfiniteMPS, alg):
    """IDMRG-style approximate for infinite states: initial mixed
    fixed-point environments once, then cheap pushed-environment sweeps."""
    from ..environments.infinite_mpo import mpo_environments
    from ..utils.logging import IterLog

    L, dtype = psi.period, psi.dtype
    if O is None:
        O = _identity_mpo(psi.physicaldim, L, dtype)
    Os = _as_stack(O, L, dtype)
    two_site = isinstance(alg, FitIDMRG2)
    if two_site and L < 2:
        raise ValueError("FitIDMRG2 needs a unit cell of >= 2 sites")

    envs = mpo_environments(phi, O, psi_bra=psi)
    if getattr(alg, "verbosity", 0) >= 1 and float(envs.resid) > 1e-6:
        from ..utils.logging import logger

        logger.warning(
            f"{'FitIDMRG2' if two_site else 'FitIDMRG'}: mixed environment "
            f"fixed-point residual {float(envs.resid):.4e} (Arnoldi not "
            "converged)")
    GLs = envs.GLs / jnp.linalg.norm(
        envs.GLs.reshape(L, -1), axis=1)[:, None, None, None]
    GRs = envs.GRs / jnp.linalg.norm(
        envs.GRs.reshape(L, -1), axis=1)[:, None, None, None]
    ALs, ARs, Cs = psi.AL, psi.AR, psi.C

    log = IterLog("FitIDMRG2" if two_site else "FitIDMRG", alg.verbosity)
    err = 1.0
    for it in range(1, alg.maxiter + 1):
        if two_site:
            ALs, ARs, Cs, GLs, GRs, err = _fit_idmrg2_iteration(
                Cs, GLs, GRs, Os, phi.AL, phi.AR, phi.AC)
        else:
            ALs, ARs, Cs, GLs, GRs, err = _fit_idmrg1_iteration(
                ALs, ARs, Cs, GLs, GRs, Os, phi.AL, phi.AR, phi.AC)
        err = float(err)
        if err < alg.tol:
            break
    else:
        log.cancel(it, 0.0, err)

    # final re-gauge from the AR family (reference: MPSMultiline(ψ.AR))
    out = InfiniteMPS.from_AL(ALs, Cs[L - 1])
    final_envs = mpo_environments(phi, O, psi_bra=out)
    return out, final_envs, err


def _approximate_infinite(psi: InfiniteMPS, O, phi: InfiniteMPS, alg):
    """VOMPS-style: one mixed-env power update per iteration
    (reference approximate/vomps.jl:19-80)."""
    from ..environments.infinite_mpo import mpo_environments

    L = psi.period
    dtype = psi.dtype
    if O is None:
        O = _identity_mpo(psi.physicaldim, L, dtype)
    Os = _as_stack(O, L, dtype)

    eps = 1.0
    envs = None
    for it in range(alg.maxiter):
        envs = mpo_environments(phi, O, psi_bra=psi)
        if getattr(alg, "verbosity", 0) >= 1 and float(envs.resid) > 1e-6:
            from ..utils.logging import logger

            logger.warning(
                f"approximate(VOMPS): iteration {it + 1}: mixed environment "
                f"fixed-point residual {float(envs.resid):.4e} (Arnoldi not "
                "converged)")
        GL_next = jnp.roll(envs.GLs, -1, axis=0)
        ACs = jax.vmap(ac_apply)(envs.GLs, Os, envs.GRs, phi.AC)
        Cs = jax.vmap(c_apply)(GL_next, envs.GRs, phi.C)
        ACs = ACs / jnp.linalg.norm(
            ACs.reshape(L, -1), axis=1)[:, None, None, None]
        Cs = Cs / jnp.linalg.norm(Cs.reshape(L, -1), axis=1)[:, None, None]
        ALs = jax.vmap(regauge_ACC)(ACs, Cs)
        ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
        phase = jnp.einsum("ilpr,ilpr->i", ALC.conj(), ACs)
        phase = phase / jnp.maximum(jnp.abs(phase), 1e-30)
        eps = float(jnp.max(jnp.linalg.norm(
            (ACs - phase[:, None, None, None] * ALC).reshape(L, -1), axis=1)))
        psi = InfiniteMPS.from_AL(ALs, psi.C[L - 1])
        if eps < alg.tol:
            break
    return psi, envs, eps
