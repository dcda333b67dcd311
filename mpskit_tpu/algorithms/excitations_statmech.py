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


def excitations_boundary_multiline(O, momenta, psi, envs=None, key=None,
                                   krylovdim: int = 30, tol: float = 1e-7):
    """Multiline (nrows > 1) quasiparticle excitations over an MPOMultiline
    (reference src/algorithms/excitation/quasiparticleexcitation.jl:258-293
    and src/environments/qpenv.jl:171-303): the row-r transfer maps the
    row-r B tensors into row r+1's tangent space (same cyclic coupling as
    the multiline boundary VUMPS), so the eigenproblem runs over the
    stacked per-row X blocks with a row roll after each application.

    For R identical rows the dominant |lambda| equals the single-row value
    (the coupled operator is a cyclic permutation of identical blocks).
    Returns (lambdas (n,), qps list of per-row X stacks)."""
    from ..states.multiline import MPSMultiline
    from ..operators.multiline import MPOMultiline

    if key is None:
        key = jax.random.PRNGKey(0)
    if np.isscalar(momenta):
        momenta = [momenta]
    assert isinstance(psi, MPSMultiline) and isinstance(O, MPOMultiline)
    R, L = psi.nrows, psi.period
    assert O.nrows == R
    dtype = psi.rows[0].dtype
    D = psi.rows[0].D

    # per-row mixed environments and normalized row MPOs (ket row r,
    # bra row r+1)
    Os, GLs_r, GRs_r, capsL, capsR = [], [], [], [], []
    for r in range(R):
        ket, bra = psi.rows[r], psi.rows[(r + 1) % R]
        env = mpo_environments(ket, O.row(r), psi_bra=bra)
        Os_raw = jnp.stack([O.row(r).site(i) for i in range(L)]).astype(dtype)
        O_n = Os_raw / env.lambda_cell ** (1.0 / L)
        Os.append(O_n)
        GLs_r.append(env.GLs)
        GRs_r.append(env.GRs)
        capsL.append(_channel_caps_mixed(O_n, ket.AR, bra.AL, dtype))
        capsR.append(_channel_caps_mixed(O_n, ket.AL, bra.AR, dtype))
    w = Os[0].shape[1]

    out_l, out_qp = [], []
    for p in momenta:
        phase_site = jnp.asarray(np.exp(-1j * p), dtype)
        qp0 = [LeftGaugedQP.random(jax.random.fold_in(key, r), psi.rows[r],
                                   momentum=float(p)) for r in range(R)]

        def lB_envs_row(r, Bs):
            ket, bra = psi.rows[r], psi.rows[(r + 1) % R]
            capl, capr = capsL[r][1], capsL[r][2]

            def step(x, i, with_B=True):
                xn = transfer_left_mpo(x, Os[r][i], ket.AR[i], bra.AL[i])
                if with_B:
                    xn = xn + transfer_left_mpo(GLs_r[r][i], Os[r][i],
                                                Bs[i], bra.AL[i])
                return xn * phase_site

            def cycle(x, with_B):
                for i in range(L):
                    x = step(x, i, with_B)
                return x

            F = cycle(jnp.zeros((w, D, D), dtype), True)
            F = F - pairing(F, capr) * capl

            def mv(x):
                y = cycle(x, False)
                return y - pairing(y, capr) * capl

            x0 = linsolve(mv, F, a0=1.0, a1=-1.0, tol=1e-9)
            lBs = [x0]
            for i in range(L - 1):
                nxt = step(lBs[-1], i, True)
                nxt = nxt - pairing(nxt, capr) * capl
                lBs.append(nxt)
            return jnp.stack(lBs)

        def rB_envs_row(r, Bs):
            ket, bra = psi.rows[r], psi.rows[(r + 1) % R]
            capl, capr = capsR[r][1], capsR[r][2]
            phase_site_r = jnp.conj(phase_site)

            def step(x, i, with_B=True):
                xn = transfer_right_mpo(x, Os[r][i], ket.AL[i], bra.AR[i])
                if with_B:
                    xn = xn + transfer_right_mpo(GRs_r[r][i], Os[r][i],
                                                 Bs[i], bra.AR[i])
                return xn * phase_site_r

            def cycle(x, with_B):
                for i in range(L - 1, -1, -1):
                    x = step(x, i, with_B)
                return x

            F = cycle(jnp.zeros((w, D, D), dtype), True)
            F = F - pairing(F, capl) * capr

            def mv(x):
                y = cycle(x, False)
                return y - pairing(y, capl) * capr

            xL = linsolve(mv, F, a0=1.0, a1=-1.0, tol=1e-9)
            rBs = [xL]
            for i in range(L - 1, 0, -1):
                nxt = step(rBs[0], i, True)
                nxt = nxt - pairing(nxt, capl) * capr
                rBs.insert(0, nxt)
            return jnp.stack(rBs)

        def matvec(Xs_stack):
            """Xs_stack (R, L, D(d-1), D) -> row-shifted application."""
            outs = []
            for r in range(R):
                ket = psi.rows[r]
                bra_r = (r + 1) % R
                qp_r = dataclasses.replace(qp0[r], Xs=Xs_stack[r])
                Bs = qp_r.bs()
                lBs = lB_envs_row(r, Bs)
                rBs = rB_envs_row(r, Bs)

                def site(GL, Oi, GR, B, lB, rB, ALi, ARi, VLn):
                    y = ac_apply(GL, Oi, GR, B)
                    y = y + ac_apply(lB, Oi, GR, ARi)
                    y = y + ac_apply(GL, Oi, rB, ALi)
                    return jnp.einsum("lpk,lpr->kr", VLn.conj(), y)

                X_out = jax.vmap(site)(GLs_r[r], Os[r], GRs_r[r], Bs, lBs,
                                       rBs, ket.AL, ket.AR,
                                       qp0[bra_r].VLs)
                outs.append(X_out)
            # output of row r lives in row r+1's tangent space
            return jnp.stack([outs[(r - 1) % R] for r in range(R)])

        Xs0 = jnp.stack([q.Xs for q in qp0])
        res = dominant_eigs(matvec, Xs0, krylovdim, 60, tol)
        out_l.append(res.eigenvalue)
        out_qp.append([dataclasses.replace(qp0[r], Xs=res.eigenvector[r])
                       for r in range(R)])
    return jnp.stack(out_l), out_qp


def _channel_caps_mixed(Os, A_ket, A_bra, dtype, tol=1e-10):
    """Alias of _channel_caps for mixed bra/ket rows (kept separate for
    call-site clarity in the multiline path)."""
    return _channel_caps(Os, A_ket, A_bra, dtype, tol)
