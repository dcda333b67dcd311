"""MPO-times-MPS application (reference src/operators/densempo.jl:31-71).

Finite: exact fused-bond application (D -> w*D) followed by an SVD
compression back to the target bond dimension. Infinite: fused application
+ re-gauging (used as the initial guess for `approximate`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .mpo import DenseMPO
from ..states.finitemps import FiniteMPS
from ..states.infinitemps import InfiniteMPS
from ..tensors.ops import TruncationScheme, truncdim


def apply_densempo_finite(O: DenseMPO, psi: FiniteMPS,
                          Dmax: int = None,
                          trscheme: TruncationScheme = None,
                          left_vec=None, right_vec=None) -> FiniteMPS:
    """O |psi> as a FiniteMPS with bond dimension Dmax (default: psi.D).

    For evolution MPOs built from FSM Hamiltonians the boundary vectors
    default to level 0 on both ends; ragged statmech MPOs (size-1 edge
    virtual legs) are contracted with trivial boundary vectors."""
    from ..algorithms.changebonds import _svdcut_finite, SvdCut

    L, D, d = psi.length, psi.D, psi.physicaldim
    psi0 = psi.move_center(0)
    As = [psi0.AC] + [psi0.ARs[i] for i in range(1, L)]

    fused = []
    for i in range(L):
        Oi = O.site(i)
        wl, wr = Oi.shape[0], Oi.shape[1]
        A = As[i]
        T = jnp.einsum("abst,ltr->alsbr", Oi, A)
        if i == 0:
            lv = left_vec
            if lv is None:
                lv = jnp.zeros((wl,), Oi.dtype).at[0].set(1.0)
            T = jnp.einsum("a,alsbr->lsbr", lv, T)[None] \
                .reshape(1 * D, d, wr * D)
        else:
            T = T.reshape(wl * D, d, wr * D)
        if i == L - 1:
            rv = right_vec
            if rv is None:
                rv = jnp.zeros((wr,), Oi.dtype).at[0].set(1.0)
            T = T.reshape(T.shape[0], d, wr, D)
            T = jnp.einsum("lsbr,b->lsr", T, rv)
        fused.append(T)

    D_new = max(max(t.shape[0] for t in fused),
                max(t.shape[-1] for t in fused))
    stacked = jnp.zeros((L, D_new, d, D_new),
                        jnp.result_type(psi.dtype, O.site(0).dtype))
    for i, T in enumerate(fused):
        stacked = stacked.at[i, : T.shape[0], :, : T.shape[-1]].set(T)
    big = FiniteMPS.from_tensors(stacked, normalize=True)

    Dt = Dmax or D
    tr = trscheme or truncdim(Dt)
    big = _svdcut_finite(big, SvdCut(tr))
    # re-pad down to the target static D
    psi_out = _restrict_bond(big, Dt)
    return psi_out


def _restrict_bond(psi: FiniteMPS, D_new: int) -> FiniteMPS:
    """Slice a (truncated, masked) FiniteMPS down to a smaller static D.
    Only valid when the Schmidt ranks have been cut to <= D_new."""
    if D_new == psi.D:
        return psi
    psi0 = psi.move_center(0)
    return FiniteMPS(psi0.ALs[:, :D_new, :, :D_new],
                     psi0.ARs[:, :D_new, :, :D_new],
                     psi0.AC[:D_new, :, :D_new], 0)


def apply_densempo_infinite(O: DenseMPO, psi: InfiniteMPS) -> InfiniteMPS:
    """Fused-bond application for uniform states
    (reference densempo.jl:31-45): bond grows to w*D and is re-gauged;
    compress afterwards with `approximate` or changebonds."""
    L, D, d = psi.period, psi.D, psi.physicaldim
    A_new = []
    for i in range(L):
        Oi = O.site(i)
        w = Oi.shape[0]
        T = jnp.einsum("abst,ltr->alsbr", Oi, psi.AL[i]).reshape(
            w * D, d, w * D)
        A_new.append(T)
    return InfiniteMPS.from_A(jnp.stack(A_new))
