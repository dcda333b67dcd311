"""Dynamical DMRG propagators (reference
src/algorithms/propagator/corvector.jl).

propagator(psi0, z, H, alg) variationally computes
<psi0| (z - H)^{-1} |psi0> by sweeping GMRES solves of the local system
(H_AC - z) AC = -P(psi0): `NaiveInvert` solves the linear form directly;
`Jeckelmann` solves the quadratic normal equations (H-z)^dag (H-z) AC =
-(H - conj(z)) P(psi0) built from the squared MPO environments.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Defaults
from ..linalg.gmres import linsolve
from ..states.finitemps import FiniteMPS
from ..states.quasiparticle import full_gauges
from ..tensors.ops import leftorth, rightorth
from ..transfermatrix.transfer import (
    transfer_left, transfer_right, transfer_left_mpo, transfer_right_mpo,
)
from ..environments.finite import (
    stack_W, left_boundary, right_boundary, compute_right_envs,
)
from .derivatives import ac_apply


@dataclasses.dataclass(frozen=True)
class NaiveInvert:
    pass


@dataclasses.dataclass(frozen=True)
class Jeckelmann:
    pass


@dataclasses.dataclass(frozen=True)
class DynamicalDMRG:
    flavour: object = dataclasses.field(default_factory=NaiveInvert)
    tol: float = 1e-10
    maxiter: int = Defaults.maxiter
    linsolve_tol: float = 1e-10
    verbosity: int = Defaults.verbosity


def _overlap_right(ARs_t, ARs):
    def body(v, xs):
        At, A = xs
        return transfer_right(v, At, A), v

    D = ARs.shape[1]
    v0 = jnp.zeros((D, D), ARs.dtype).at[0, 0].set(1.0)
    vR, vs = jax.lax.scan(body, v0, (ARs_t, ARs), reverse=True)
    return jnp.concatenate([vR[None], vs], axis=0)  # (L+1,)


def _mixed_right_envs(ARs_t, ARs, Ws, GRL):
    """Mixed H-environments: bra = current state, ket = target."""

    def body(GR, xs):
        At, A, W = xs
        return transfer_right_mpo(GR, W, At, A), GR

    GR_first, GRs = jax.lax.scan(body, GRL, (ARs_t, ARs, Ws), reverse=True)
    return jnp.concatenate([GR_first[None], GRs], axis=0)


@partial(jax.jit, static_argnums=(8,))
def _ddmrg_sweep(ALs, ARs, AC, Ws, GRs, tgt, z, lin_tol, quadratic: bool,
                 Ws2=None, GR2s=None):
    """One NaiveInvert/Jeckelmann sweep. tgt = (ALs_t, ARs_t, ACs_t) of the
    target |psi0>."""
    L, D = ALs.shape[0], ALs.shape[1]
    w = Ws.shape[1]
    dtype = AC.dtype
    ALs_t, ARs_t, ACs_t = tgt
    GL0 = left_boundary(w, D, dtype)
    GRL = right_boundary(w, D, dtype)
    vRs = _overlap_right(ARs_t, ARs)
    vb0 = jnp.zeros((D, D), dtype).at[0, 0].set(1.0)
    # mixed H-envs (bra = current, ket = target) used for the Jeckelmann
    # right-hand side P(H |psi0>)
    GRms = _mixed_right_envs(ARs_t, ARs, Ws, GRL)
    if quadratic:
        w2 = Ws2.shape[1]
        GL20 = left_boundary(w2, D, dtype)
        GR2L = right_boundary(w2, D, dtype)
    else:
        GL20 = GR2L = jnp.zeros((1, D, D), dtype)

    def local_solve(GL, W, GR, GL2, W2, GR2, tos, Htos, AC):
        if quadratic:
            zz = jnp.abs(z) ** 2

            def mv(x):
                return (ac_apply(GL2, W2, GR2, x)
                        - (z + jnp.conj(z)) * ac_apply(GL, W, GR, x)
                        + zz * x)

            rhs = -(Htos - jnp.conj(z) * tos)
            return linsolve(mv, rhs, x0=AC, a0=0.0, a1=1.0, tol=lin_tol)

        def mv(x):
            return ac_apply(GL, W, GR, x) - z * x

        return linsolve(mv, -tos, x0=AC, a0=0.0, a1=1.0, tol=lin_tol)

    def stepL(carry, xs):
        AC, GL, GL2, GLm, vL = carry
        (W, W2, AR_next, GR_next, GR2_next, GRm_next, vR_next,
         AC_t, AL_t) = xs
        tos = jnp.einsum("xy,ypr->xpr", vL, AC_t)
        tos = jnp.einsum("xpn,rn->xpr", tos, vR_next)
        Htos = ac_apply(GLm, W, GRm_next, AC_t) if quadratic else tos
        ACp = local_solve(GL, W, GR_next, GL2, W2, GR2_next, tos, Htos, AC)
        eps = jnp.linalg.norm(ACp - AC)
        AL, C = leftorth(ACp)
        GL_n = transfer_left_mpo(GL, W, AL, AL)
        GL2_n = transfer_left_mpo(GL2, W2, AL, AL) if quadratic else GL2
        GLm_n = transfer_left_mpo(GLm, W, AL_t, AL)
        vL_n = transfer_left(vL, AL_t, AL)
        AC_next = jnp.einsum("lm,mpr->lpr", C, AR_next)
        return (AC_next, GL_n, GL2_n, GLm_n, vL_n), \
            (AL, GL, GL2, GLm, vL, eps)

    W2s_use = Ws2 if quadratic else jnp.zeros((L, 1, 1, Ws.shape[3], Ws.shape[3]), dtype)
    GR2s_use = GR2s if quadratic else jnp.zeros((L + 1, 1, D, D), dtype)

    xsL = (Ws[: L - 1], W2s_use[: L - 1], ARs[1:], GRs[1:L], GR2s_use[1:L],
           GRms[1:L], vRs[1:L], ACs_t[: L - 1], ALs_t[: L - 1])
    (AC, GL_last, GL2_last, GLm_last, vL_last), \
        (ALs_n, GLs_s, GL2s_s, GLms_s, vLs_s, epsL) = \
        jax.lax.scan(stepL, (AC, GL0, GL20, GL0, vb0), xsL)
    ALs = ALs.at[: L - 1].set(ALs_n)
    GLs = jnp.concatenate([GLs_s, GL_last[None]], axis=0)
    GL2s = jnp.concatenate([GL2s_s, GL2_last[None]], axis=0)
    GLms = jnp.concatenate([GLms_s, GLm_last[None]], axis=0)
    vLs = jnp.concatenate([vLs_s, vL_last[None]], axis=0)

    def stepR(carry, xs):
        AC, GR, GR2, GRm, vR = carry
        (W, W2, AL_prev, GL_i, GL2_i, GLm_i, vL_i, AC_t, AR_t) = xs
        tos = jnp.einsum("xy,ypr->xpr", vL_i, AC_t)
        tos = jnp.einsum("xpn,rn->xpr", tos, vR)
        Htos = ac_apply(GLm_i, W, GRm, AC_t) if quadratic else tos
        ACp = local_solve(GL_i, W, GR, GL2_i, W2, GR2, tos, Htos, AC)
        eps = jnp.linalg.norm(ACp - AC)
        C, AR = rightorth(ACp)
        GR_n = transfer_right_mpo(GR, W, AR, AR)
        GR2_n = transfer_right_mpo(GR2, W2, AR, AR) if quadratic else GR2
        GRm_n = transfer_right_mpo(GRm, W, AR_t, AR)
        vR_n = transfer_right(vR, AR_t, AR)
        AC_prev = jnp.einsum("lpm,mr->lpr", AL_prev, C)
        return (AC_prev, GR_n, GR2_n, GRm_n, vR_n), (AR, GR, GR2, eps)

    xsR = (Ws[1:], W2s_use[1:], ALs[: L - 1], GLs[1:], GL2s[1:], GLms[1:],
           vLs[1:], ACs_t[1:], ARs_t[1:])
    (AC, GR_last, GR2_last, _, _), (ARs_n, GRs_s, GR2s_s, epsR) = jax.lax.scan(
        stepR, (AC, GRL, GR2L, GRL, vb0), xsR, reverse=True)
    ARs = ARs.at[1:].set(ARs_n)
    GRs_new = jnp.concatenate([GR_last[None], GR_last[None], GRs_s], axis=0)
    GR2s_new = jnp.concatenate([GR2_last[None], GR2_last[None], GR2s_s],
                               axis=0)
    eps = jnp.maximum(jnp.max(epsL), jnp.max(epsR))
    return ALs, ARs, AC, GRs_new, GR2s_new, eps


def propagator(psi0: FiniteMPS, z, H, alg: DynamicalDMRG = DynamicalDMRG(),
               init: Optional[FiniteMPS] = None):
    """Returns (G, psi) with G = <psi0 | psi>, (H - z) psi = -psi0."""
    L, D = psi0.length, psi0.D
    dtype = jnp.result_type(psi0.dtype, jnp.asarray(z).dtype)
    quadratic = isinstance(alg.flavour, Jeckelmann)

    def _cast(p):
        return FiniteMPS(p.ALs.astype(dtype), p.ARs.astype(dtype),
                         p.AC.astype(dtype), p.center)

    psi0 = _cast(psi0)
    psi = _cast(init) if init is not None else psi0
    psi = psi.move_center(0)

    Ws = stack_W(H, L).astype(dtype)
    w = Ws.shape[1]
    ALs_t, ARs_t = full_gauges(psi0)
    ACs_t = jnp.stack([psi0.move_center(i).AC for i in range(L)])
    tgt = (ALs_t, ARs_t, ACs_t)

    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dtype))
    if quadratic:
        H2 = H @ H
        Ws2 = stack_W(H2, L).astype(dtype)
        GR2s = compute_right_envs(psi.ARs, Ws2,
                                  right_boundary(Ws2.shape[1], D, dtype))
    else:
        Ws2 = jnp.zeros((L, 1, 1, Ws.shape[3], Ws.shape[3]), dtype)
        GR2s = jnp.zeros((L + 1, 1, D, D), dtype)

    ALs, ARs, AC = psi.ALs, psi.ARs, psi.AC
    z = jnp.asarray(z, dtype)
    eps = 1.0
    for it in range(alg.maxiter):
        ALs, ARs, AC, GRs, GR2s, eps = _ddmrg_sweep(
            ALs, ARs, AC, Ws, GRs, tgt, z,
            jnp.asarray(alg.linsolve_tol), quadratic, Ws2=Ws2, GR2s=GR2s)
        eps = float(eps)
        if eps < alg.tol:
            break

    psi = FiniteMPS(ALs, ARs, AC, 0)
    G = psi0.dot(psi)
    return G, psi
