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

    from ..environments.finite import compute_right_envs

    GRs = compute_right_envs(ARs, Os, GRL)
    prev = None
    eps = 1.0
    for it in range(alg.maxiter):
        ALs, ARs, AC, GRs = _fit_sweep(ALs, ARs, AC, Os, phiA, GRs, GL0, GRL)
        ov = jnp.abs(jnp.vdot(AC, AC))
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
