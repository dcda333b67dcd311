"""Transfer-matrix contraction kernels — the hot-path layer L5
(reference src/transfermatrix/transfer.jl, transfermatrix.jl).

Where the reference loops over sparse FSM entries with threads
(reference src/transfermatrix/transfer.jl:166-259), here each push is a
single batched einsum over the full stacked FSM tensor: the (w, D, D)
environment contracts against (D, d, D) site tensors and the (w, w, d, d)
MPO tensor in three MXU-shaped pairwise contractions. Contraction order is
written out explicitly so XLA sees w*d*D^3-cost matmuls, never a w^2*D^3
path.

Index conventions (see tensors/ops.py): A[l, p, r]; W[a, b, s, t] with s =
phys-out (bra side), t = phys-in (ket side); GL[a, l_bra, l_ket];
GR[b, r_bra, r_ket].
"""

from __future__ import annotations

import jax.numpy as jnp


# ----------------------------------------------------------------------------
# plain MPS transfer (no middle operator)
# ----------------------------------------------------------------------------

def transfer_left(v, A_ket, A_bra):
    """v[l_bra, l_ket] -> v'[m_bra, m_ket] through one site."""
    t = jnp.einsum("xy,ytn->xtn", v, A_ket)
    return jnp.einsum("xtm,xtn->mn", A_bra.conj(), t)


def transfer_right(v, A_ket, A_bra):
    """v[r_bra, r_ket] -> v'[l_bra, l_ket] through one site."""
    t = jnp.einsum("ytn,mn->ytm", A_ket, v)
    return jnp.einsum("xtm,ytm->xy", A_bra.conj(), t)


# ----------------------------------------------------------------------------
# MPO-middle transfer (environment pushes)
# ----------------------------------------------------------------------------

def transfer_left_mpo(GL, W, A_ket, A_bra):
    """GL (w, D, D) -> (w', D, D) through site tensors and W (w, w', d, d)."""
    # (a,x,y),(y,t,n) -> (a,x,t,n)   cost w d D^3
    t = jnp.einsum("axy,ytn->axtn", GL, A_ket)
    # (a,x,t,n),(a,b,s,t) -> (b,x,s,n)   cost w^2 d^2 D^2
    t = jnp.einsum("axtn,abst->bxsn", t, W)
    # (x,s,m),(b,x,s,n) -> (b,m,n)   cost w d D^3
    return jnp.einsum("xsm,bxsn->bmn", A_bra.conj(), t)


def transfer_right_mpo(GR, W, A_ket, A_bra):
    """GR (w', D, D) -> (w, D, D) through site tensors and W (w, w', d, d)."""
    t = jnp.einsum("ytn,bmn->bytm", A_ket, GR)
    t = jnp.einsum("bytm,abst->aysm", t, W)
    return jnp.einsum("xsm,aysm->axy", A_bra.conj(), t)


# ----------------------------------------------------------------------------
# lazy multi-site transfer application (for fixed points / spectra)
# ----------------------------------------------------------------------------

def mps_transfer_matvec_left(As_ket, As_bra):
    """Matvec closure: v -> v . T for the product transfer matrix of a unit
    cell (left action, scanning left-to-right over stacked site tensors)."""
    import jax

    def mv(v):
        def body(v, xs):
            Ak, Ab = xs
            return transfer_left(v, Ak, Ab), None

        v, _ = jax.lax.scan(body, v, (As_ket, As_bra))
        return v

    return mv


def mps_transfer_matvec_right(As_ket, As_bra):
    import jax

    def mv(v):
        def body(v, xs):
            Ak, Ab = xs
            return transfer_right(v, Ak, Ab), None

        v, _ = jax.lax.scan(body, v, (As_ket, As_bra), reverse=True)
        return v

    return mv
