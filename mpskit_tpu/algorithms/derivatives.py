"""Effective-Hamiltonian (derivative) applications — the single hottest
code path (reference src/algorithms/derivatives.jl).

The reference dispatches over sparse-FSM slices with threaded reductions
(derivatives.jl:77-154); here each application is three/four explicit
pairwise einsums over the stacked dense FSM tensor, shaped so XLA lowers
them to MXU matmuls of cost O(w d D^3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ac_apply(GL, W, GR, x):
    """H_eff^{AC}(x)[l, s, r] = GL[a,l,y] W[a,b,s,t] x[y,t,n] GR[b,r,n]."""
    t = jnp.einsum("axy,ytn->axtn", GL, x)          # w d D^3
    t = jnp.einsum("axtn,abst->bxsn", t, W)          # w^2 d^2 D^2
    return jnp.einsum("bxsn,brn->xsr", t, GR)        # w d D^3


def ac_apply_fast(GL, W, GR, x):
    """One-pass-bf16 ac_apply for INEXACT Krylov stages: on TPU,
    precision=DEFAULT lowers f32 matmuls to a single bf16 MXU pass (~3x the
    X3 throughput, ~2e-3 relative error). Used for all but the final
    restart of the hot site solves (linalg/lanczos.eigsh_smallest
    matvec_fast) — the polishing restart recomputes the Ritz pair with the
    accurate matvec, so converged energies keep X3 quality. On CPU / f64
    DEFAULT and HIGHEST coincide and this is identical to ac_apply."""
    P = jax.lax.Precision.DEFAULT
    t = jnp.einsum("axy,ytn->axtn", GL, x, precision=P)
    t = jnp.einsum("axtn,abst->bxsn", t, W, precision=P)
    return jnp.einsum("bxsn,brn->xsr", t, GR, precision=P)


def c_apply(GL, GR, x):
    """H_eff^{C}(x)[l, r] = GL[a,l,y] x[y,n] GR[a,r,n]."""
    t = jnp.einsum("axy,yn->axn", GL, x)
    return jnp.einsum("axn,arn->xr", t, GR)


def c_apply_fast(GL, GR, x):
    """One-pass-bf16 c_apply (see ac_apply_fast)."""
    P = jax.lax.Precision.DEFAULT
    t = jnp.einsum("axy,yn->axn", GL, x, precision=P)
    return jnp.einsum("axn,arn->xr", t, GR, precision=P)


def ac2_apply(GL, W1, W2, GR, x):
    """Two-site derivative: x[l, s1, s2, r] ->
    GL[a,l,y] W1[a,b,s1,t1] W2[b,c,s2,t2] x[y,t1,t2,n] GR[c,r,n]."""
    t = jnp.einsum("axy,yuvn->axuvn", GL, x)
    t = jnp.einsum("axuvn,absu->bxsvn", t, W1)
    t = jnp.einsum("bxsvn,bcqv->cxsqn", t, W2)
    return jnp.einsum("cxsqn,crn->xsqr", t, GR)


def ac_expectation(GL, W, GR, AC):
    """<AC| H_eff |AC> (not normalized)."""
    return jnp.vdot(AC, ac_apply(GL, W, GR, AC))


# projection variants for `approximate` (reference derivatives.jl:200-232):
# project the target state's center tensors through mixed environments.

def ac_proj(GL_mixed, W, GR_mixed, AC_target):
    return ac_apply(GL_mixed, W, GR_mixed, AC_target)


def c_proj(GL_mixed, GR_mixed, C_target):
    return c_apply(GL_mixed, GR_mixed, C_target)
