"""Penalty-method excited states: `FiniteExcited`
(reference src/algorithms/excitation/dmrgexcitation.jl).

Finds excited states by ground-state DMRG on H + weight * sum_i |psi_i><psi_i|,
where the projector penalty enters every local eigensolve through overlap
environments of the previously found states.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import Defaults
from ..linalg.lanczos import eigsh_smallest
from ..states.finitemps import FiniteMPS
from ..states.quasiparticle import full_gauges
from ..tensors.ops import leftorth, rightorth
from ..transfermatrix.transfer import (
    transfer_left, transfer_right, transfer_left_mpo, transfer_right_mpo,
)
from ..environments.finite import (
    stack_W, left_boundary, right_boundary, compute_right_envs,
)
from ..utils.dynamictols import updatetol
from .derivatives import ac_apply
from .dmrg import DMRG, find_groundstate_dmrg


@dataclasses.dataclass(frozen=True)
class FiniteExcited:
    weight: float = 10.0
    tol: float = 1e-8
    maxiter: int = 60
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 6
    verbosity: int = Defaults.verbosity


def _overlap_left_envs(ALs_pen, ALs):
    """vL[k][i] = overlap env left of site i between penalty state k (ket)
    and the current state (bra)."""

    def per_state(ALs_k):
        def body(v, xs):
            A_pen, A = xs
            return transfer_left(v, A_pen, A), v

        D = ALs.shape[1]
        v0 = jnp.zeros((D, D), ALs.dtype).at[0, 0].set(1.0)
        vL, vs = jax.lax.scan(body, v0, (ALs_k, ALs))
        return jnp.concatenate([vs, vL[None]], axis=0)

    return jax.vmap(per_state)(ALs_pen)


def _overlap_right_envs(ARs_pen, ARs):
    def per_state(ARs_k):
        def body(v, xs):
            A_pen, A = xs
            return transfer_right(v, A_pen, A), v

        D = ARs.shape[1]
        v0 = jnp.zeros((D, D), ARs.dtype).at[0, 0].set(1.0)
        vR, vs = jax.lax.scan(body, v0, (ARs_k, ARs), reverse=True)
        return jnp.concatenate([vR[None], vs], axis=0)

    return jax.vmap(per_state)(ARs_pen)


@partial(jax.jit, static_argnums=(9, 10))
def _penalized_sweep(ALs, ARs, AC, Ws, GRs, ALs_pen, ARs_pen, ACs_pen,
                     inner_tol, m: int, restarts: int, weight=10.0):
    """One DMRG sweep of H + weight * sum_k |psi_k><psi_k|."""
    L, D = ALs.shape[0], ALs.shape[1]
    w = Ws.shape[1]
    dtype = AC.dtype
    GL0 = left_boundary(w, D, dtype)
    GRL = right_boundary(w, D, dtype)
    n_pen = ALs_pen.shape[0]
    vb0 = jnp.zeros((n_pen, D, D), dtype).at[:, 0, 0].set(1.0)

    # right overlap envs of the penalty states against the current ARs
    vRs = _overlap_right_envs(ARs_pen, ARs)  # (n_pen, L+1, D, D)

    def penalty_vec(vL, vR, AC_pen):
        """v[l,p,r] = vL[l,l'] AC_pen[l',p,r'] vR[r,r'] — the local image of
        |psi_k> in the current mixed basis."""
        t = jnp.einsum("xy,ypr->xpr", vL, AC_pen)
        return jnp.einsum("xpn,rn->xpr", t, vR)

    def stepL(carry, xs):
        AC, GL, vLs = carry
        W, AR_next, GR_next, vR_next, AC_pen, AL_pen = xs

        vs = jax.vmap(penalty_vec)(vLs, vR_next, AC_pen)

        def mv(x):
            y = ac_apply(GL, W, GR_next, x)
            ov = jnp.einsum("kxpr,xpr->k", vs.conj(), x)
            return y + weight * jnp.einsum("k,kxpr->xpr", ov, vs)

        res = eigsh_smallest(mv, AC, m, restarts, inner_tol)
        AL, C = leftorth(res.eigenvector)
        GL_next = transfer_left_mpo(GL, W, AL, AL)
        vLs_next = jax.vmap(lambda vk, Ak: transfer_left(vk, Ak, AL))(
            vLs, AL_pen)
        AC_next = jnp.einsum("lm,mpr->lpr", C, AR_next)
        return (AC_next, GL_next, vLs_next), (AL, GL, vLs, res.eigenvalue)

    xsL = (Ws[: L - 1], ARs[1:], GRs[1:L],
           jnp.swapaxes(vRs[:, 1:L], 0, 1),
           jnp.swapaxes(ACs_pen[:, : L - 1], 0, 1),
           jnp.swapaxes(ALs_pen[:, : L - 1], 0, 1))
    (AC, GL_last, vL_last), (ALs_new, GLs_scan, vLs_scan, lamsL) = \
        jax.lax.scan(stepL, (AC, GL0, vb0), xsL)
    ALs = ALs.at[: L - 1].set(ALs_new)
    GLs = jnp.concatenate([GLs_scan, GL_last[None]], axis=0)
    vLs_all = jnp.concatenate([vLs_scan, vL_last[None]], axis=0)  # (L, n, D, D)

    def stepR(carry, xs):
        AC, GR, vRs_c = carry
        W, AL_prev, GL_i, vL_i, AC_pen, AR_pen = xs

        vs = jax.vmap(penalty_vec)(vL_i, vRs_c, AC_pen)

        def mv(x):
            y = ac_apply(GL_i, W, GR, x)
            ov = jnp.einsum("kxpr,xpr->k", vs.conj(), x)
            return y + weight * jnp.einsum("k,kxpr->xpr", ov, vs)

        res = eigsh_smallest(mv, AC, m, restarts, inner_tol)
        C, AR = rightorth(res.eigenvector)
        GR_prev = transfer_right_mpo(GR, W, AR, AR)
        vRs_prev = jax.vmap(lambda vk, Ak: transfer_right(vk, Ak, AR))(
            vRs_c, AR_pen)
        AC_prev = jnp.einsum("lpm,mr->lpr", AL_prev, C)
        return (AC_prev, GR_prev, vRs_prev), (AR, GR, res.eigenvalue)

    vbR = jnp.zeros((n_pen, D, D), dtype).at[:, 0, 0].set(1.0)
    xsR = (Ws[1:], ALs[: L - 1], GLs[1:],
           vLs_all[1:],
           jnp.swapaxes(ACs_pen[:, 1:], 0, 1),
           jnp.swapaxes(ARs_pen[:, 1:], 0, 1))
    (AC, GR_last, _), (ARs_new, GRs_scan, lamsR) = jax.lax.scan(
        stepR, (AC, GRL, vbR), xsR, reverse=True)
    ARs = ARs.at[1:].set(ARs_new)
    GRs = jnp.concatenate([GR_last[None], GR_last[None], GRs_scan], axis=0)

    return ALs, ARs, AC, GRs, lamsR[0]


def excitations_dmrg(H, alg: FiniteExcited, psi_gs: FiniteMPS, envs=None,
                     num: int = 1, key=None):
    """Find `num` excited states above psi_gs by penalized DMRG.
    Returns (energies (num,), states)."""
    from .expval import expectation_value

    if key is None:
        key = jax.random.PRNGKey(7)
    L, D = psi_gs.length, psi_gs.D
    Ws = stack_W(H, L).astype(psi_gs.dtype)
    w = Ws.shape[1]

    found = [psi_gs]
    energies = []
    for k in range(num):
        # stacked gauges of all penalty states
        gauges = [full_gauges(p) for p in found]
        ALs_pen = jnp.stack([g[0] for g in gauges])
        ARs_pen = jnp.stack([g[1] for g in gauges])
        # AC of each penalty state at every site (host loop, setup only)
        ACs_site = []
        for p in found:
            ACs_site.append(jnp.stack(
                [p.move_center(i).AC for i in range(L)]))
        ACs_pen = jnp.stack(ACs_site)  # (n_pen, L, D, d, D)

        psi = FiniteMPS.random(key, L, psi_gs.physicaldim, D,
                               dtype=psi_gs.dtype)
        key = jax.random.fold_in(key, k)
        psi = psi.move_center(0)
        GRs = compute_right_envs(psi.ARs, Ws,
                                 right_boundary(w, D, psi.dtype))
        ALs, ARs, AC = psi.ALs, psi.ARs, psi.AC
        lam_prev, eps = None, 1.0
        for it in range(1, alg.maxiter + 1):
            inner_tol = updatetol(eps, it)
            ALs, ARs, AC, GRs, lam = _penalized_sweep(
                ALs, ARs, AC, Ws, GRs, ALs_pen, ARs_pen, ACs_pen,
                inner_tol, alg.krylovdim, alg.eig_maxrestarts,
                weight=alg.weight)
            lam_f = float(jnp.real(lam))
            eps = abs(lam_f - lam_prev) if lam_prev is not None else 1.0
            lam_prev = lam_f
            if eps < alg.tol:
                break
        psi = FiniteMPS(ALs, ARs, AC, 0)
        E = float(expectation_value(psi, H))
        energies.append(E)
        found.append(psi)

    return jnp.asarray(energies), found[1:]
