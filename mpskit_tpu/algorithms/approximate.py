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
    if isinstance(psi, InfiniteMPS):
        return _approximate_infinite(psi, O, phi, alg)
    raise TypeError(type(psi))


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
