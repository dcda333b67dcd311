"""Left <-> right gauge conversion for quasiparticle states (reference
src/states/quasiparticle_state.jl, the Base.convert methods between
LeftGaugedQP and RightGaugedQP).

A quasiparticle state |Phi(B)> = sum_n e^{ipn} |AL..AL B_n AR..AR> is
invariant under the gauge shift

    B_n -> B_n + e^{ip} AL_n Y_{n+1} - Y_n AR_n

(telescoping sum; Y lives on the bonds, periodic over the unit cell for
infinite states, pinned to zero at the boundaries for finite chains).
Imposing the right gauge condition  sum_{p,r} B'_n[l,p,r] conj(AR_n[m,p,r])
= 0  and using that AR is right-isometric yields the bond recursion

    Y_n = t_n + e^{ip} M_n(Y_{n+1}),
    t_n     = B_n AR_n^dag                (contracted over phys+right)
    M_n(Y)  = AL_n Y AR_n^dag             (mixed (AL, AR) channel)

which is a backward substitution on finite chains and a cyclic linear
problem (solved with GMRES) on infinite ones.  For the trivial sector at
p = 0 the mixed channel has the eigenvalue-1 direction M_n(C_n) = C_{n-1},
but the source t is exactly orthogonal to it for left-gauge-fixed B
(VL^dag AC = 0), so the Krylov iteration stays in the solvable complement.
The reverse (right -> left) conversion is the mirror recursion running
forward.

TPU notes: everything is stacked einsums over the (L, D, d, D) cell axis;
the infinite solves reuse :func:`mpskit_tpu.linalg.gmres.linsolve`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..linalg.gmres import linsolve
from ..environments.qp import _phase
from .quasiparticle import (LeftGaugedQP, RightGaugedQP, FiniteQP,
                            FiniteQPRight, null_spaces, right_null_spaces,
                            finite_null_spaces, finite_right_null_spaces)


# ----------------------------------------------------------------------------
# infinite
# ----------------------------------------------------------------------------

def left_to_right_gauge(qp: LeftGaugedQP, tol: float = 1e-12) -> RightGaugedQP:
    """Convert an infinite LeftGaugedQP to the physically identical
    RightGaugedQP (reference quasiparticle_state.jl convert(RightGaugedQP,
    ...))."""
    AL, AR = qp.left_gs.AL, qp.right_gs.AR
    B = qp.bs()
    ph = _phase(qp.momentum, B.dtype)

    t = jnp.einsum("nlpr,nmpr->nlm", B, jnp.conj(AR))

    def M(Y):
        Ynext = jnp.roll(Y, -1, axis=0)  # Ynext[n] = Y[n+1 mod L]
        return ph * jnp.einsum("nlpa,nab,nmpb->nlm", AL, Ynext, jnp.conj(AR))

    # (1 - e^{ip} M_roll) Y = t
    Y = linsolve(M, t, a0=1.0, a1=-1.0, tol=tol)
    Ynext = jnp.roll(Y, -1, axis=0)
    Bp = (B + ph * jnp.einsum("nlpa,nar->nlpr", AL, Ynext)
          - jnp.einsum("nla,napr->nlpr", Y, AR))

    VRs = right_null_spaces(AR)
    Xs = jnp.einsum("nlpr,nkpr->nlk", Bp, jnp.conj(VRs))
    return RightGaugedQP(Xs, VRs, qp.left_gs, qp.right_gs, qp.momentum,
                         qp.trivial)


def right_to_left_gauge(qp: RightGaugedQP, tol: float = 1e-12) -> LeftGaugedQP:
    """Convert an infinite RightGaugedQP back to a LeftGaugedQP."""
    AL, AR = qp.left_gs.AL, qp.right_gs.AR
    B = qp.bs()
    ph = _phase(qp.momentum, B.dtype)

    # left gauge condition: s_n + e^{ip} Y_{n+1} - N_n(Y_n) = 0 with
    # s_n = AL_n^dag B_n, N_n(Y) = AL_n^dag Y AR_n (contracted left+phys)
    s = jnp.einsum("nlpm,nlpr->nmr", jnp.conj(AL), B)

    def G(Y):
        per = jnp.einsum("nlpm,nla,napr->nmr", jnp.conj(AL), Y, AR)
        return jnp.roll(per, 1, axis=0)  # G(Y)[m] = N_{m-1}(Y_{m-1})

    # e^{ip} Y - G(Y) = -roll(s, +1)
    Y = linsolve(G, -jnp.roll(s, 1, axis=0), a0=ph, a1=-1.0, tol=tol)
    Ynext = jnp.roll(Y, -1, axis=0)
    Bp = (B + ph * jnp.einsum("nlpa,nar->nlpr", AL, Ynext)
          - jnp.einsum("nla,napr->nlpr", Y, AR))

    VLs = null_spaces(AL)
    Xs = jnp.einsum("nlpk,nlpr->nkr", jnp.conj(VLs), Bp)
    return LeftGaugedQP(Xs, VLs, qp.left_gs, qp.right_gs, qp.momentum,
                        qp.trivial)


# ----------------------------------------------------------------------------
# finite
# ----------------------------------------------------------------------------

def _bond_masks(L, d, D, dtype):
    """(L+1, D, D) masks of the supported bond blocks of a padded finite
    MPS. The padded gauge tensors carry orthonormal junk in their
    unsupported rows/columns (static-shape isometry), so the bond
    recursions must be re-masked at every step."""
    from .finitemps import physical_bond_dims

    dims = physical_bond_dims(L, d, D)
    m = jnp.zeros((L + 1, D, D), dtype)
    for n in range(L + 1):
        b = int(dims[n])
        m = m.at[n, :b, :b].set(1)
    return m


def finite_left_to_right_gauge(qp: FiniteQP) -> FiniteQPRight:
    """Finite-chain LeftGaugedQP -> RightGaugedQP: backward substitution
    Y_n = t_n + M_n(Y_{n+1}) with Y_L = 0; Y_0 comes out zero because
    left-gauge-fixed B is orthogonal to the ground state."""
    AL, AR = qp.ALs, qp.ARs
    B = qp.bs()
    L, D, d = AL.shape[0], AL.shape[1], AL.shape[2]
    bm = _bond_masks(L, d, D, B.real.dtype).astype(B.dtype)

    t = jnp.einsum("nlpr,nmpr->nlm", B, jnp.conj(AR))

    def step(Ynext, inp):
        tn, ALn, ARn, mn = inp
        Yn = tn + jnp.einsum("lpa,ab,mpb->lm", ALn, Ynext, jnp.conj(ARn))
        Yn = Yn * mn
        return Yn, Yn

    Y0 = jnp.zeros((D, D), B.dtype)
    _, Ys = jax.lax.scan(step, Y0, (t, AL, AR, bm[:L]), reverse=True)
    Ynext = jnp.concatenate([Ys[1:], Y0[None]], axis=0)

    Bp = (B + jnp.einsum("nlpa,nar->nlpr", AL, Ynext)
          - jnp.einsum("nla,napr->nlpr", Ys, AR))

    VRs, mask = finite_right_null_spaces(AR, D, d)
    Xs = jnp.einsum("nlpr,nkpr->nlk", Bp, jnp.conj(VRs))
    Xs = Xs * mask.astype(Xs.dtype)
    return FiniteQPRight(Xs, VRs, AL, AR, mask)


def finite_right_to_left_gauge(qp: FiniteQPRight) -> FiniteQP:
    """Finite-chain RightGaugedQP -> LeftGaugedQP: forward substitution
    Y_{n+1} = N_n(Y_n) - s_n with Y_0 = 0."""
    AL, AR = qp.ALs, qp.ARs
    B = qp.bs()
    L, D, d = AL.shape[0], AL.shape[1], AL.shape[2]
    bm = _bond_masks(L, d, D, B.real.dtype).astype(B.dtype)

    s = jnp.einsum("nlpm,nlpr->nmr", jnp.conj(AL), B)

    def step(Yn, inp):
        sn, ALn, ARn, mn = inp
        Ynext = jnp.einsum("lpm,la,apr->mr", jnp.conj(ALn), Yn, ARn) - sn
        Ynext = Ynext * mn
        return Ynext, (Yn, Ynext)

    Y0 = jnp.zeros((D, D), B.dtype)
    _, (Ys, Ynext) = jax.lax.scan(step, Y0, (s, AL, AR, bm[1:]))

    Bp = (B + jnp.einsum("nlpa,nar->nlpr", AL, Ynext)
          - jnp.einsum("nla,napr->nlpr", Ys, AR))

    VLs, mask = finite_null_spaces(AL, D, d)
    Xs = jnp.einsum("nlpk,nlpr->nkr", jnp.conj(VLs), Bp)
    Xs = Xs * mask.astype(Xs.dtype)
    return FiniteQP(Xs, VLs, AL, AR, mask)
