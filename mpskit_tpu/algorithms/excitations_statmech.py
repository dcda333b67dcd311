"""Quasiparticle excitations over transfer MPOs (2D statmech boundaries)
— counterpart of the reference's Multiline QP machinery
(reference src/algorithms/excitation/quasiparticleexcitation.jl:258-293 and
src/environments/qpenv.jl:171-303, single-row case).

Normalization: the MPO is rescaled by its leading eigenvalue per site,
O -> O / lambda^(1/L), so the channel transfer has unit dominant
eigenvalue; all geometric series and the effective eigenproblem are then
uniform, and the reported excitation eigenvalues are relative to the
ground channel (dispersion epsilon(p) = -log|lambda_qp(p)|).

The eigenproblem is non-Hermitian (dominant Arnoldi); the B-environment
geometric series are regularized by the numerically computed dominant
eigenpairs of the mixed AR/AL channels.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..states.infinitemps import InfiniteMPS
from ..states.quasiparticle import LeftGaugedQP
from ..operators.mpo import DenseMPO
from ..environments.infinite_mpo import mpo_environments

from ..linalg.gmres import linsolve
from ..linalg.arnoldi import dominant_eigs
from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
from .derivatives import ac_apply


def pairing(v, cap):
    """Full contraction of (w, D, D) channel vectors."""
    return jnp.einsum("axy,axy->", v, cap)


def _channel_caps(Os, A_ket, A_bra, dtype, tol=1e-10):
    """Dominant (left, right) eigenpair of a mixed MPO channel, normalized
    so pairing(l, r) = 1. Returns (lam, l, r)."""
    w, D = Os.shape[1], A_ket.shape[1]

    def mvl(v):
        def body(v, xs):
            Oi, Ak, Ab = xs
            return transfer_left_mpo(v, Oi, Ak, Ab), None

        v, _ = jax.lax.scan(body, v, (Os, A_ket, A_bra))
        return v

    def mvr(v):
        def body(v, xs):
            Oi, Ak, Ab = xs
            return transfer_right_mpo(v, Oi, Ak, Ab), None

        v, _ = jax.lax.scan(body, v, (Os, A_ket, A_bra), reverse=True)
        return v

    v0 = jnp.ones((w, D, D), dtype)
    a = dominant_eigs(mvl, v0, 30, 60, tol)
    b = dominant_eigs(mvr, v0, 30, 60, tol)
    l, r = a.eigenvector, b.eigenvector
    r = r / jnp.einsum("axy,axy->", l, r)
    return a.eigenvalue, l, r


def excitations_boundary(O: DenseMPO, momenta, psi: InfiniteMPS, envs=None,
                         key=None, krylovdim: int = 30, tol: float = 1e-7):
    """Dominant excitation eigenvalue of the (per-site normalized) transfer
    operator at each momentum. Returns (lambdas (n,), qps)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if np.isscalar(momenta):
        momenta = [momenta]
    L, D = psi.period, psi.D
    dtype = psi.dtype
    Os_raw = jnp.stack([O.site(i) for i in range(L)]).astype(dtype)
    w = Os_raw.shape[1]
    if envs is None:
        envs = mpo_environments(psi, O)
    lam_cell = envs.lambda_cell
    # per-site normalization: unit leading eigenvalue
    Os = Os_raw / lam_cell ** (1.0 / L)
    GLs, GRs = envs.GLs, envs.GRs
    # envs were computed with the raw Os; rescale the per-bond propagated
    # values is unnecessary: GLs are dominant eigenvectors (eigenvalue
    # absorbed), and the per-bond normalization <C|GL.GR|C> = 1 holds.
    lamL, capLl, capLr = _channel_caps(Os, psi.AR, psi.AL, dtype)
    lamR, capRl, capRr = _channel_caps(Os, psi.AL, psi.AR, dtype)

    out_l, out_qp = [], []
    for p in momenta:
        phase_cell = jnp.asarray(np.exp(-1j * p * L), dtype)
        phase_site = jnp.asarray(np.exp(-1j * p), dtype)
        qp0 = LeftGaugedQP.random(key, psi, momentum=float(p))

        def lB_envs(Bs):
            """lB at every bond: cyclic solve at bond 0, then propagate."""

            def step(x, i, with_B=True):
                xn = transfer_left_mpo(x, Os[i], psi.AR[i], psi.AL[i])
                if with_B:
                    xn = xn + transfer_left_mpo(GLs[i], Os[i], Bs[i],
                                                psi.AL[i])
                return xn * phase_site

            def cycle(x, with_B):
                for i in range(L):
                    x = step(x, i, with_B)
                return x

            F = cycle(jnp.zeros((w, D, D), dtype), True)
            F = F - pairing(F, capLr) * capLl

            def mv(x):
                y = cycle(x, False)
                return y - pairing(y, capLr) * capLl

            x0 = linsolve(mv, F, a0=1.0, a1=-1.0, tol=1e-9)
            lBs = [x0]
            for i in range(L - 1):
                nxt = step(lBs[-1], i, True)
                nxt = nxt - pairing(nxt, capLr) * capLl
                lBs.append(nxt)
            return jnp.stack(lBs)

        def rB_envs(Bs):
            phase_site_r = jnp.conj(phase_site)

            def step(x, i, with_B=True):
                xn = transfer_right_mpo(x, Os[i], psi.AL[i], psi.AR[i])
                if with_B:
                    xn = xn + transfer_right_mpo(GRs[i], Os[i], Bs[i],
                                                 psi.AR[i])
                return xn * phase_site_r

            def cycle(x, with_B):
                for i in range(L - 1, -1, -1):
                    x = step(x, i, with_B)
                return x

            F = cycle(jnp.zeros((w, D, D), dtype), True)
            F = F - pairing(F, capRl) * capRr

            def mv(x):
                y = cycle(x, False)
                return y - pairing(y, capRl) * capRr

            xL = linsolve(mv, F, a0=1.0, a1=-1.0, tol=1e-9)
            rBs = [xL]
            for i in range(L - 1, 0, -1):
                nxt = step(rBs[0], i, True)
                nxt = nxt - pairing(nxt, capRl) * capRr
                rBs.insert(0, nxt)
            return jnp.stack(rBs)

        def matvec(Xs):
            qp = dataclasses.replace(qp0, Xs=Xs)
            Bs = qp.bs()
            lBs = lB_envs(Bs)
            rBs = rB_envs(Bs)

            def site(GL, Oi, GR, B, lB, rB, ALi, ARi, VL):
                y = ac_apply(GL, Oi, GR, B)
                y = y + ac_apply(lB, Oi, GR, ARi)
                y = y + ac_apply(GL, Oi, rB, ALi)
                return jnp.einsum("lpk,lpr->kr", VL.conj(), y)

            return jax.vmap(site)(GLs, Os, GRs, Bs, lBs, rBs, psi.AL,
                                  psi.AR, qp0.VLs)

        res = dominant_eigs(matvec, qp0.Xs, krylovdim, 60, tol)
        out_l.append(res.eigenvalue)
        out_qp.append(dataclasses.replace(qp0, Xs=res.eigenvector))
    return jnp.stack(out_l), out_qp
