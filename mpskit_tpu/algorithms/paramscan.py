"""Batched parameter scans: one compiled ground-state search, many
Hamiltonians.

The reference workflow for a phase diagram is a host loop of independent
`find_groundstate` calls (e.g. reference docs/src/examples/quantum1d/*
sweep a coupling sequentially). On TPU the natural form is a `jax.vmap`
over the parameter axis: every scan point shares one compiled VUMPS
iteration, the per-site Lanczos solves batch into larger MXU matmuls, and
the environment GMRES runs as one block-diagonal Krylov space over the
whole batch. For small D (where a single ground-state search leaves the
MXU mostly idle) the throughput gain is roughly the batch size.

Requirements: every Hamiltonian in the batch must share the same FSM
*structure* (`nonzero_mask` / `diag_class` / `diag_scalar`) — i.e. be the
same model at different couplings. Structure is static compile-time
metadata here, so this is checked host-side at stacking time.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..operators.mpo import MPOHamiltonian
from ..states.infinitemps import InfiniteMPS
from ..utils.logging import IterLog
from ..utils.dynamictols import updatetol
from ..config import Defaults, VERBOSE_ITER
from .vumps import VUMPS, _vumps_iteration


def stack_hamiltonians(Hs: Sequence[MPOHamiltonian]) -> MPOHamiltonian:
    """Stack same-structure Hamiltonians along a new leading batch axis.

    The result's `W` has shape (B, L, w, w, d, d) and is only meaningful
    under `jax.vmap`; the static structure metadata (shared by
    construction) is taken from the first member.
    """
    H0 = Hs[0]
    for H in Hs[1:]:
        if (H.nonzero_mask != H0.nonzero_mask
                or H.diag_class != H0.diag_class
                or H.diag_scalar != H0.diag_scalar):
            raise ValueError(
                "parameter scan requires identical FSM structure across the "
                "batch (same model family; only tensor entries may differ)")
        if H.W.shape != H0.W.shape:
            raise ValueError("parameter scan requires identical FSM shapes")
    W = jnp.stack([H.W for H in Hs])
    return MPOHamiltonian(W, H0.nonzero_mask, H0.diag_class, H0.diag_scalar,
                          H0.aux_charges)


def stack_states(psis: Sequence[InfiniteMPS]) -> InfiniteMPS:
    """Stack same-shape states along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *psis)


def unstack_states(psis: InfiniteMPS) -> list:
    """Split a batched state back into its members."""
    B = psis.AL.shape[0]
    return [jax.tree_util.tree_map(lambda x: x[i], psis) for i in range(B)]


@dataclasses.dataclass(frozen=True)
class ScanResult:
    psis: InfiniteMPS          # batched (leading axis = scan point)
    energies: jnp.ndarray      # (B,) energy density per scan point
    eps: jnp.ndarray           # (B,) final gauge residual per scan point
    iterations: int


def scan_groundstate_vumps(psis: InfiniteMPS | Sequence[InfiniteMPS],
                           Hs: MPOHamiltonian | Sequence[MPOHamiltonian],
                           alg: VUMPS = VUMPS()) -> ScanResult:
    """VUMPS over a whole parameter batch in one vmapped compiled iteration.

    `psis`/`Hs` may be sequences (stacked here) or already-batched pytrees
    with a common leading axis. Convergence is driven by the *worst* scan
    point: all members iterate until `max_b eps_b < alg.tol` (iterating a
    converged member is a fixed-point no-op up to solver noise, so this
    wastes no accuracy — only the tail iterations of early converging
    members, which is the price of lockstep batching).

    Counterpart of running the reference's `find_groundstate` in a loop
    over couplings; there is no reference equivalent of the batched form
    (it is TPU-native: the vmap turns B small eigensolves into one batched
    Lanczos whose matvecs tile the MXU).
    """
    if not isinstance(psis, InfiniteMPS):
        psis = stack_states(list(psis))
    if not isinstance(Hs, MPOHamiltonian):
        Hs = stack_hamiltonians(list(Hs))
    B = psis.AL.shape[0]
    if Hs.W.shape[0] != B:
        raise ValueError(f"batch mismatch: {B} states vs {Hs.W.shape[0]} "
                         "Hamiltonians")

    log = IterLog("VUMPS-scan", alg.verbosity)

    def one_iter(psi, H, inner_tol, env_guess):
        return _vumps_iteration(psi, H, alg.krylovdim, alg.eig_maxrestarts,
                                alg.gauge_tol, 1e-12, inner_tol,
                                env_guess=env_guess)

    batched_iter = jax.vmap(one_iter, in_axes=(0, 0, None, 0))
    # first iteration has no env guess to map over
    batched_iter_cold = jax.vmap(one_iter, in_axes=(0, 0, None, None))

    eps_max = 1.0
    env_guess = None
    it = 0
    eps_b = jnp.ones((B,))
    for it in range(1, alg.maxiter + 1):
        inner_tol = float(updatetol(eps_max, it))
        if env_guess is None:
            psis, eps_b, env_guess, diag = batched_iter_cold(
                psis, Hs, inner_tol, None)
        else:
            psis, eps_b, env_guess, diag = batched_iter(
                psis, Hs, inner_tol, env_guess)
        eps_max = float(jnp.max(eps_b))
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, 0.0, eps_max)
        if eps_max < alg.tol:
            break
    else:
        log.cancel(it, 0.0, eps_max)

    # per-member exact re-canonicalization (cf. find_groundstate_vumps's
    # closing from_AL) — vmapped, same static tol
    L = psis.AL.shape[1]

    def recanon(AL, C_last):
        return InfiniteMPS.from_AL(AL, C_last, tol=alg.gauge_tol)

    psis = jax.vmap(recanon)(psis.AL, psis.C[:, L - 1])
    # final energies from environments of the re-canonicalized states
    # (mirrors find_groundstate_vumps's closing env recomputation)
    from ..environments.infinite_ham import hamiltonian_environments
    envs = jax.vmap(
        lambda p, H, g: hamiltonian_environments(p, H, env_init=g)
    )(psis, Hs, env_guess)
    return ScanResult(psis, envs.e_density, eps_b, it)
