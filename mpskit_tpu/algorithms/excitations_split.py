"""Quasiparticle dispersion at ARBITRARY momentum in split-complex
arithmetic — on-chip excitations for TPU backends with no complex dtype.

The complex-native infinite QP solve (`excitations.py` +
`environments/qp.py`, reference src/algorithms/excitation/
quasiparticle.jl + exci_transfer_system.jl:1-86) needs the momentum
phases ``e^{±ip}`` inside the geometric B-environment solves, which the
real-dtype path asserts away (`environments/qp.py:_phase`: p = 0 mod π
only). Here the GROUND STATE is real (real Hamiltonians on the TPU) and
only the excitation blocks X and the phases are complex, so every
contraction is REAL-LINEAR in its single complex operand: the split
(2, ...) re/im layout (tensors/splitc.py) runs each kernel `jax.vmap`-ed
over the split axis, phases enter through explicit 2x2 rotations
(`cscale`), and the geometric tails are solved by the dtype-agnostic
restarted GMRES on the realified operator. The eigensolve is the real
Lanczos on split arrays: for the Hermitian complex-linear H_eff the
realified operator has the same (doubly degenerate) spectrum, and real
inner products = Re<.,.>_C keep the recurrence exact.

Validated on CPU against the complex-native `excitations_infinite` at
p ∉ {0, π} (tests/test_excitations_split.py); executed on the TPU by
scripts/tpu_complex_check.py (TPU_COMPLEX_r05.json).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..operators.mpo import MPOHamiltonian, DIAG_ZERO, DIAG_IDENTITY
from ..environments.infinite_ham import (
    pairing, transfer_left_block, transfer_right_block,
)
from ..environments.qp import _src_col_left, _src_row_right
from ..linalg.gmres import linsolve
from ..linalg.lanczos import eigsh_smallest
from ..tensors.splitc import cscale
from .derivatives import ac_apply
from .excitations import QuasiparticleAnsatz, _renorm_energies_infinite


def _vs(f):
    """vmap a real-linear kernel over the leading split (re/im) axis."""
    return jax.vmap(f)


def qp_left_envs_split(Xs, VLs, psi, GLs, H: MPOHamiltonian, p: float,
                       tol=1e-10):
    """Split lBs (2, L, w, D, D) for a REAL uniform ground state `psi`
    and split excitation blocks Xs (2, L, Dn, D). Mirrors
    environments/qp.py:qp_left_envs for the trivial (left_gs == right_gs)
    topological sector with momentum phase e^{-ip} per site."""
    L, D = psi.period, psi.D
    w = H.odim
    dtype = psi.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)
    AL, AR = psi.AL, psi.AR
    Bs = _vs(lambda X: jnp.einsum("ilpk,ikr->ilpr", VLs, X))(Xs)
    phr = jnp.asarray(np.cos(-p), dtype)
    phi = jnp.asarray(np.sin(-p), dtype)

    C_prev = jnp.roll(psi.C, 1, axis=0)
    l_caps = C_prev
    r_caps = C_prev  # real state: conj is identity

    lBs = jnp.zeros((2, L, w, D, D), dtype)

    for b in range(w):
        Wdiag = Ws[:, b, b]
        Wcol_off = Ws[:, :, b].at[:, b].set(0.0)
        Wcol_full = Ws[:, :, b]
        reg = H.diag_class[b] == DIAG_IDENTITY

        def site_step(x, i_args, with_lower=True):
            lB_i, GL_i, Wd, Wco, Wcf, ALi, ARi, Bi, l_cap_n, r_cap_n = i_args
            val = _vs(lambda xc: transfer_left_block(xc, Wd, ARi, ALi))(x)
            if with_lower:
                val = val + _vs(
                    lambda lc: _src_col_left(lc, Wco, ARi, ALi))(lB_i)
                val = val + _vs(
                    lambda bc: _src_col_left(GL_i, Wcf, bc, ALi))(Bi)
            val = cscale(phr, phi, val)
            if reg:
                c = _vs(lambda vc: pairing(vc, r_cap_n))(val)   # (2,)
                val = val - c[:, None, None] * l_cap_n[None]
            return val

        xs = (jnp.swapaxes(lBs, 0, 1), GLs, Wdiag, Wcol_off, Wcol_full,
              AL, AR, jnp.swapaxes(Bs, 0, 1),
              jnp.roll(l_caps, -1, axis=0), jnp.roll(r_caps, -1, axis=0))

        def cycle(x, with_lower=True):
            def body(x, i_args):
                xn = site_step(x, i_args, with_lower)
                return xn, xn

            return jax.lax.scan(body, x, xs)

        zero = jnp.zeros((2, D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[b]
        if kind == DIAG_ZERO:
            x0 = F
        else:
            def matvec(x):
                y, _ = cycle(x, with_lower=False)
                return y

            x0 = linsolve(matvec, F, a0=1.0, a1=-1.0, tol=tol)

        _, vals = cycle(x0)
        lB_b = jnp.concatenate([x0[None], vals[:-1]], axis=0)  # (L, 2, D, D)
        lBs = lBs.at[:, :, b].set(jnp.swapaxes(lB_b, 0, 1))

    return lBs


def qp_right_envs_split(Xs, VLs, psi, GRs, H: MPOHamiltonian, p: float,
                        tol=1e-10):
    """Split rBs (2, L, w, D, D); phase e^{+ip} per site."""
    L, D = psi.period, psi.D
    w = H.odim
    dtype = psi.dtype
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(dtype)
    AL, AR = psi.AL, psi.AR
    Bs = _vs(lambda X: jnp.einsum("ilpk,ikr->ilpr", VLs, X))(Xs)
    phr = jnp.asarray(np.cos(p), dtype)
    phi = jnp.asarray(np.sin(p), dtype)

    Ct = jnp.swapaxes(psi.C, 1, 2)
    l_caps = Ct   # real state: C^dag = C^T
    r_caps = Ct

    rBs = jnp.zeros((2, L, w, D, D), dtype)

    for a in range(w - 1, -1, -1):
        Wdiag = Ws[:, a, a]
        Wrow_off = Ws[:, a, :].at[:, a].set(0.0)
        Wrow_full = Ws[:, a, :]
        reg = H.diag_class[a] == DIAG_IDENTITY

        def site_step(x, i_args, with_upper=True):
            rB_i, GR_i, Wd, Wro, Wrf, ALi, ARi, Bi, l_cap_p, r_cap_p = i_args
            val = _vs(lambda xc: transfer_right_block(xc, Wd, ALi, ARi))(x)
            if with_upper:
                val = val + _vs(
                    lambda rc: _src_row_right(rc, Wro, ALi, ARi))(rB_i)
                val = val + _vs(
                    lambda bc: _src_row_right(GR_i, Wrf, bc, ARi))(Bi)
            val = cscale(phr, phi, val)
            if reg:
                c = _vs(lambda vc: pairing(vc, l_cap_p))(val)
                val = val - c[:, None, None] * r_cap_p[None]
            return val

        xs = (jnp.swapaxes(rBs, 0, 1), GRs, Wdiag, Wrow_off, Wrow_full,
              AL, AR, jnp.swapaxes(Bs, 0, 1),
              jnp.roll(l_caps, 1, axis=0), jnp.roll(r_caps, 1, axis=0))

        def cycle(x, with_upper=True):
            def body(x, i_args):
                xn = site_step(x, i_args, with_upper)
                return xn, xn

            return jax.lax.scan(body, x, xs, reverse=True)

        zero = jnp.zeros((2, D, D), dtype)
        F, _ = cycle(zero)
        kind = H.diag_class[a]
        if kind == DIAG_ZERO:
            x0 = F
        else:
            def matvec(x):
                y, _ = cycle(x, with_upper=False)
                return y

            x0 = linsolve(matvec, F, a0=1.0, a1=-1.0, tol=tol)

        _, vals = cycle(x0)
        rB_a = jnp.concatenate([vals[1:], x0[None]], axis=0)
        rBs = rBs.at[:, :, a].set(jnp.swapaxes(rB_a, 0, 1))

    return rBs


def _qp_matvec_infinite_split(Xs, VLs, psi, H, GLs, GRs, Es, p, env_tol):
    """(H_eff - E) on split X blocks (2, L, Dn, D)."""
    L = psi.period
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    Bs = _vs(lambda X: jnp.einsum("ilpk,ikr->ilpr", VLs, X))(Xs)
    lBs = qp_left_envs_split(Xs, VLs, psi, GLs, H, p, tol=env_tol)
    rBs = qp_right_envs_split(Xs, VLs, psi, GRs, H, p, tol=env_tol)
    AL, AR = psi.AL, psi.AR

    def site(GL, W, GR, B, lB, rB, ALi, ARi, E, VL):
        y = ac_apply(GL, W, GR, B)
        y = y + ac_apply(lB, W, GR, ARi)
        y = y + ac_apply(GL, W, rB, ALi)
        y = y - E * B
        return jnp.einsum("lpk,lpr->kr", VL, y)   # real VL: no conj

    def one_component(Bc, lBc, rBc):
        return jax.vmap(site)(GLs, Ws, GRs, Bc, lBc, rBc, AL, AR, Es, VLs)

    return _vs(one_component)(Bs, lBs, rBs)


def dispersion_split(H, psi, envs, p: float,
                     alg: QuasiparticleAnsatz = None, key=None,
                     env_tol=1e-10):
    """Lowest excitation energy at momentum p (any real p) for a REAL
    uniform ground state, entirely in split arithmetic. Returns
    (energy, X_split, residual)."""
    from ..states.quasiparticle import null_spaces

    alg = alg or QuasiparticleAnsatz()
    key = key if key is not None else jax.random.PRNGKey(0)
    L, D = psi.period, psi.D
    VLs = null_spaces(psi.AL)
    Dn = VLs.shape[3]
    Es = _renorm_energies_infinite(psi, H, envs)
    X0 = jax.random.normal(key, (2, L, Dn, D), psi.dtype)
    X0 = X0 / jnp.linalg.norm(X0)

    @partial(jax.jit, static_argnums=(4, 5))
    def solve(VLs, GLs, GRs, Es, m, maxrestarts, X0, tol):
        mv = lambda X: _qp_matvec_infinite_split(
            X, VLs, psi, H, GLs, GRs, Es, p, env_tol)
        res = eigsh_smallest(mv, X0, m, maxrestarts, tol, reorth="full")
        return res.eigenvalue, res.eigenvector, res.residual

    e, X, resid = solve(VLs, envs.GLs, envs.GRs, Es, alg.krylovdim,
                        alg.maxrestarts, X0, jnp.asarray(alg.tol))
    return e, X, resid
