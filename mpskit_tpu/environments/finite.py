"""Finite-chain environments.

Functional counterpart of the reference's `FinEnv` cache
(reference src/environments/FinEnv.jl): instead of mutable left/right
vectors with ===-identity dependency tracking and lazy stale-suffix
recomputation (FinEnv.jl:114-145), environments are recomputed as
`lax.scan`s over the gauged site tensors — inside a sweep the scan carries
the current environment, so nothing is ever stale.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo


def left_boundary(w: int, D: int, dtype) -> jnp.ndarray:
    """(w, D, D) boundary left environment: FSM level 0, rank-1 in the
    (padded) size-1 boundary bond (reference FinEnv.jl:41-70 builds the
    util-leg boundary the same way)."""
    GL = jnp.zeros((w, D, D), dtype)
    return GL.at[0, 0, 0].set(1.0)


def right_boundary(w: int, D: int, dtype) -> jnp.ndarray:
    GR = jnp.zeros((w, D, D), dtype)
    return GR.at[w - 1, 0, 0].set(1.0)


def compute_left_envs(As, Ws, GL0):
    """GLs[i] = environment left of site i; GLs has L+1 entries.
    As (L, D, d, D) gauged tensors, Ws (L, w, w, d, d)."""

    def body(GL, xs):
        A, W = xs
        GL_next = transfer_left_mpo(GL, W, A, A)
        return GL_next, GL

    GL_last, GLs = jax.lax.scan(body, GL0, (As, Ws))
    return jnp.concatenate([GLs, GL_last[None]], axis=0)


def compute_right_envs(As, Ws, GRL):
    """GRs[i] = environment right of site i-1 (i.e. GRs[i] pairs with site
    i-1's right bond); GRs[L] = boundary, GRs[i] built from sites i..L-1."""

    def body(GR, xs):
        A, W = xs
        GR_next = transfer_right_mpo(GR, W, A, A)
        return GR_next, GR

    # with reverse=True, ys[j] is the carry *before* processing site j in
    # the reverse order, i.e. GRs[j+1]; the final carry is GRs[0]
    GR_first, GRs = jax.lax.scan(body, GRL, (As, Ws), reverse=True)
    return jnp.concatenate([GR_first[None], GRs], axis=0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FiniteEnv:
    """GLs[i] = left env of site i (L+1 entries, GLs[0] = boundary);
    GRs[i] = right env of site i (L+1 entries, GRs[L] = boundary); the
    effective Hamiltonian of site i uses (GLs[i], GRs[i+1])."""

    GLs: jnp.ndarray  # (L+1, w, D, D)
    GRs: jnp.ndarray  # (L+1, w, D, D)

    def tree_flatten(self):
        return (self.GLs, self.GRs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def leftenv(self, i):
        return self.GLs[i]

    def rightenv(self, i):
        return self.GRs[i + 1]


def stack_W(H, L: int) -> jnp.ndarray:
    """Tile the (period, w, w, d, d) FSM array of an MPOHamiltonian to a
    length-L stacked (L, w, w, d, d) array."""
    W = H.W
    p = W.shape[0]
    reps = -(-L // p)
    return jnp.tile(W, (reps, 1, 1, 1, 1))[:L]


def finite_environments(psi, H) -> FiniteEnv:
    """Environments of <psi| H |psi> for a FiniteMPS in mixed gauge."""
    L, D = psi.length, psi.D
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]
    c = psi.center
    # gauged tensor stack: AL for < c, AC at c, AR for > c. For the env
    # scans the center tensor participates on both sides of its bond, so use
    # ALs up to c (exclusive) for left envs and ARs after c for right envs;
    # envs touching the center come out consistent because AC is not needed:
    # GLs[i] for i <= c only involves sites < c; GRs[i] for i > c likewise.
    As_left = psi.ALs
    As_right = psi.ARs
    GLs = compute_left_envs(As_left, Ws, left_boundary(w, D, psi.dtype))
    GRs = compute_right_envs(As_right, Ws, right_boundary(w, D, psi.dtype))
    return FiniteEnv(GLs, GRs)
