"""Dense (statmech) MPO environments for infinite states.

Counterpart of the reference's `PerMPOInfEnv`
(reference src/environments/permpoinfenv.jl): the left/right environments
are the *dominant eigenvectors* of the MPO-channel transfer operator,
computed with on-device Arnoldi, then normalized so that
<C | GL . GR | C> = 1 per bond.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..states.infinitemps import InfiniteMPS
from ..operators.mpo import DenseMPO
from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
from ..linalg.arnoldi import dominant_eigs, dominant_eigs_real


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class InfiniteMPOEnv:
    """GLs[i] = env left of site i, GRs[i] = env right of site i, both
    (L, w, D, D); lambda_cell = dominant transfer eigenvalue per unit cell."""

    GLs: jnp.ndarray
    GRs: jnp.ndarray
    lambda_cell: jnp.ndarray
    # worst relative residual of the two dominant-eigenpair Arnoldi solves
    # (the reference warns per unconverged fixed-point solve,
    # permpoinfenv.jl:179-185; drivers surface this via IterLog.solver_warn)
    resid: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros(()))

    def tree_flatten(self):
        return (self.GLs, self.GRs, self.lambda_cell, self.resid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def leftenv(self, i):
        return self.GLs[i]

    def rightenv(self, i):
        return self.GRs[i]


def _stack_O(O: DenseMPO, L: int, dtype):
    return jnp.stack([O.site(i) for i in range(L)]).astype(dtype)


def mpo_environments(psi_ket: InfiniteMPS, O: DenseMPO,
                     psi_bra: InfiniteMPS = None,
                     GL0=None, GR0=None, tol=1e-12,
                     krylovdim: int = 30, env_mask=None,
                     select_real: bool = False) -> InfiniteMPOEnv:
    """Mixed dominant fixed points of the channel transfer operator
    (reference permpoinfenv.jl:138-189). psi_bra defaults to psi_ket.

    env_mask ((w, D, D) boolean, optional): static sector structure of the
    environments (mpo-bond, bra, ket) — e.g. the Fibonacci height-pair
    alignment of symmetry/fibonacci.py. The Arnoldi iteration is confined
    to the masked subspace so a near-degenerate sector rotation cannot
    replace the aligned fixed point.

    select_real: target the dominant (near-)real transfer eigenpair instead
    of the raw largest-magnitude one — required when spurious complex
    rotation modes sit above the physical fixed point (see
    linalg/arnoldi.dominant_eigs_real)."""
    if psi_bra is None:
        psi_bra = psi_ket
    L, D = psi_ket.period, psi_ket.D
    dtype = psi_ket.dtype
    Os = _stack_O(O, L, dtype)
    w = Os.shape[1]
    M = None if env_mask is None else env_mask.astype(dtype)

    def mv_left(v):
        if M is not None:
            v = v * M

        def body(v, xs):
            Oi, Ak, Ab = xs
            return transfer_left_mpo(v, Oi, Ak, Ab), None

        v, _ = jax.lax.scan(body, v, (Os, psi_ket.AL, psi_bra.AL))
        return v if M is None else v * M

    def mv_right(v):
        if M is not None:
            v = v * M

        def body(v, xs):
            Oi, Ak, Ab = xs
            return transfer_right_mpo(v, Oi, Ak, Ab), None

        v, _ = jax.lax.scan(body, v, (Os, psi_ket.AR, psi_bra.AR),
                            reverse=True)
        return v if M is None else v * M

    if GL0 is None:
        GL0 = jnp.ones((w, D, D), dtype) + \
            jnp.eye(D, dtype=dtype)[None]
    if GR0 is None:
        GR0 = jnp.ones((w, D, D), dtype) + \
            jnp.eye(D, dtype=dtype)[None]
    if M is not None:
        GL0 = GL0 * M
        GR0 = GR0 * M

    solver = dominant_eigs_real if select_real else dominant_eigs
    resL = solver(mv_left, GL0, krylovdim, 100, tol)
    resR = solver(mv_right, GR0, krylovdim, 100, tol)
    lam = resL.eigenvalue

    # fill per-site envs by stepping through the cell, dividing out the
    # per-cell eigenvalue once around
    def stepL(v, xs):
        Oi, Ak, Ab = xs
        return transfer_left_mpo(v, Oi, Ak, Ab), v

    GL_cycle, GLs = jax.lax.scan(stepL, resL.eigenvector,
                                 (Os, psi_ket.AL, psi_bra.AL))
    # GLs[i] = env left of site i (unnormalized growth along the cell)

    def stepR(v, xs):
        Oi, Ak, Ab = xs
        return transfer_right_mpo(v, Oi, Ak, Ab), v

    GR_cycle, GRs_shift = jax.lax.scan(stepR, resR.eigenvector,
                                       (Os, psi_ket.AR, psi_bra.AR),
                                       reverse=True)
    # ys[i] = env right of site i... ys[i] is the carry *before* processing
    # site i in reverse = env right of site i; reassemble directly
    GRs = GRs_shift

    # normalize: <C_i | GL_{i+1} GR_i | C_i> = 1 at every bond
    GL_next = jnp.roll(GLs, -1, axis=0)
    vals = []
    for i in range(L):
        Ci = psi_ket.C[i]
        v = jnp.einsum("axy,yn->axn", GL_next[i], Ci)
        v = jnp.einsum("axn,arn->xr", v, GRs[i])
        vals.append(jnp.einsum("xr,xr->", psi_bra.C[i].conj(), v))
    vals = jnp.stack(vals)
    GRs = GRs / vals[:, None, None, None]

    env_resid = jnp.maximum(jnp.real(resL.residual), jnp.real(resR.residual))
    return InfiniteMPOEnv(GLs, GRs, lam, env_resid)


def mpo_transfer_leading(psi: InfiniteMPS, O: DenseMPO):
    """Dominant eigenvalue (per unit cell) of the <psi|O|psi> channel."""
    env = mpo_environments(psi, O)
    return env.lambda_cell
