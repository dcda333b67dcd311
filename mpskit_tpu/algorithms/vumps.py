"""VUMPS ground-state search for infinite MPS
(reference src/algorithms/groundstate/vumps.jl).

TPU-native design: the per-site AC/C eigensolves — which the reference runs
as one `Threads.@spawn` task per site (vumps.jl:39-49) — are a single
`jax.vmap` over the stacked unit cell (identical static shapes), so every
site's Lanczos iteration runs batched on the MXU. One VUMPS iteration
(local solves + regauge + gauge fixing + environment recomputation) is one
jit-compiled function.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_ITER
from ..linalg.lanczos import eigsh_smallest
from ..states.infinitemps import InfiniteMPS
from ..states.gauging import regauge_ACC, regauge_CAC
from ..environments.infinite_ham import hamiltonian_environments, InfiniteHamEnv
from ..utils.logging import IterLog
from ..utils.dynamictols import updatetol
from .derivatives import ac_apply, c_apply
from .unionalg import Chainable


@dataclasses.dataclass(frozen=True)
class VUMPS(Chainable):
    """device_batch: run this many iterations per jit dispatch (a
    `lax.scan` over the iteration body, environments carried through).
    Convergence is checked on the host once per batch, so up to
    device_batch - 1 extra iterations may run past tolerance; >1 is the
    production setting on remote-dispatch backends (the axon TPU tunnel
    costs ~0.5-5 ms of host latency per call — round-5 measurements in
    ROADMAP.md — which a batch of 16-32 removes entirely)."""

    tol: float = 1e-10
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 4
    gauge_tol: float = Defaults.tolgauge
    verbosity: int = Defaults.verbosity
    finalize: Optional[Callable] = None
    device_batch: int = 1


def _vumps_iteration_impl(psi: InfiniteMPS, H, m: int, restarts: int,
                          gauge_tol: float, env_tol_static: float,
                          inner_tol=1e-6, A_mask=None, C_mask=None,
                          env_guess=None):
    """One VUMPS iteration: returns (psi', eps, envs). Optional A/C masks
    enforce charge-sector (and support) structure after every
    decomposition; `env_guess` (the previous iteration's environments)
    warm-starts the geometric-series GMRES solves."""
    L = psi.period
    envs = hamiltonian_environments(psi, H, tol=env_tol_static,
                                    env_init=env_guess)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)

    # batched local eigensolves over the unit cell (site-parallel, P1).
    # Sector masks are applied AFTER the solves (project-then-regauge):
    # solving in the masked subspace (P H P matvec) was tried and
    # REJECTED — it decouples the AC and C solutions enough that the
    # masked regauge oscillates (σ-chain energy bounced ±0.1 with the
    # gauge residual pinned at ~1e-12), while post-masking converges to
    # the exact σ-chain energy. Post-masking is exact whenever the local
    # ground vector is sector-pure (abelian charges, k-partite anyonic
    # chains); see symmetry/anyonic.py's scope note for the
    # uniform-sector caveat.
    def solve_ac(GL, W, GR, AC):
        # no matvec_fast: at D=256 the matvecs are cheap and the forced
        # second restart offsets the bf16 savings (measured 59.8 vs 58.5 ms)
        # reorth="local1": the single-pass 3-term recurrence (DMRG's
        # default since round 3) measured 6.34 vs 6.66 ms/iter against
        # "local" at the D=256 bench workload (round-5 exp_r5_vumps);
        # restarted warm solves keep f64 energies at the full-reorth
        # values (CPU suite oracles)
        res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC,
                             m, restarts, inner_tol, reorth="local1")
        return res.eigenvector, res.converged

    def solve_c(GL_next, GR, C):
        res = eigsh_smallest(lambda x: c_apply(GL_next, GR, x), C,
                             m, restarts, inner_tol, reorth="local1")
        return res.eigenvector, res.converged

    GL_next = jnp.roll(envs.GLs, -1, axis=0)  # GLs[i+1] for bond i
    ACs, conv_ac = jax.vmap(solve_ac)(envs.GLs, Ws, envs.GRs, psi.AC)
    Cs, conv_c = jax.vmap(solve_c)(GL_next, envs.GRs, psi.C)
    # diagnostics: (# unconverged local eigensolves, worst env-GMRES
    # relative residual) — read back and surfaced by the host driver
    n_unconv = (jnp.sum(~conv_ac) + jnp.sum(~conv_c)).astype(jnp.int32)
    diag = (n_unconv, envs.resid)
    if A_mask is not None:
        ACs = ACs * A_mask.astype(ACs.dtype)
        ACs = ACs / jnp.linalg.norm(
            ACs.reshape(L, -1), axis=1)[:, None, None, None]
        Cs = Cs * C_mask.astype(Cs.dtype)
        Cs = Cs / jnp.linalg.norm(Cs.reshape(L, -1), axis=1)[:, None, None]

    # regauge AC, C -> AL (reference vumps.jl:77-92 + ortho.jl:127-131)
    ALs = jax.vmap(regauge_ACC)(ACs, Cs)
    if A_mask is not None:
        ALs = ALs * A_mask.astype(ALs.dtype)

    # convergence measure: |AC - AL C| per site
    ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
    eps = jnp.max(jnp.linalg.norm((ACs - ALC).reshape(L, -1), axis=1))

    # local regauge (reference vumps.jl regauges with QRpos/LQpos only):
    # AR_i = argmin |AC_i - C_{i-1} AR|; no uniform-gauging fixed-point
    # loops — those dominated the iteration on TPU (46 of 68 ms at D=256,
    # round-2 trace) and VUMPS does not need an exactly re-canonicalized
    # state between iterations (AL/AR stay exact isometries by QR/LQ).
    C_prev = jnp.roll(Cs, 1, axis=0)
    ARs = jax.vmap(regauge_CAC)(C_prev, ACs)
    if A_mask is not None:
        Am = A_mask.astype(ACs.dtype)
        Cm = C_mask.astype(Cs.dtype)
        psi_new = InfiniteMPS(ALs * Am, ARs * Am, ACs * Am, Cs * Cm)
    else:
        psi_new = InfiniteMPS(ALs, ARs, ACs, Cs)
    return psi_new, eps, envs, diag


_vumps_iteration = partial(jax.jit, static_argnums=(2, 3, 4, 5))(
    _vumps_iteration_impl)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _vumps_iterations_scan(psi: InfiniteMPS, H, m: int, restarts: int,
                           gauge_tol: float, env_tol_static: float,
                           nbatch: int, inner_tol=1e-6, envs=None):
    """`nbatch` VUMPS iterations in ONE jit (lax.scan over the iteration
    body, state + warm-started environments carried through) — no host
    dispatch between iterations. `envs` must be a concrete InfiniteHamEnv
    (run one `_vumps_iteration` first to create it). Returns
    (psi', eps_last, envs', (n_unconv_total, worst_env_resid))."""

    def body(carry, _):
        psi_c, envs_c = carry
        psi_n, eps, envs_n, diag = _vumps_iteration_impl(
            psi_c, H, m, restarts, gauge_tol, env_tol_static, inner_tol,
            env_guess=envs_c)
        return (psi_n, envs_n), (eps, diag[0], diag[1])

    (psi, envs), (epss, nunc, resids) = jax.lax.scan(
        body, (psi, envs), None, length=nbatch)
    diag = (jnp.sum(nunc), jnp.max(resids))
    return psi, epss[-1], envs, diag


def find_groundstate_vumps(psi: InfiniteMPS, H, alg: VUMPS = VUMPS()):
    """Run VUMPS. Returns (psi, envs, eps)."""
    log = IterLog("VUMPS", alg.verbosity)
    eps = 1.0
    it = 0
    env_guess = None
    nb = max(1, int(alg.device_batch))
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        if nb > 1 and env_guess is not None and alg.finalize is None:
            # device-side batch: nb iterations per dispatch (see VUMPS
            # docstring); first iteration (env_guess None) runs single to
            # materialize the environment carry
            psi, eps, env_guess, diag = _vumps_iterations_scan(
                psi, H, alg.krylovdim, alg.eig_maxrestarts, alg.gauge_tol,
                1e-12, nb, inner_tol, envs=env_guess)
        else:
            psi, eps, env_guess, diag = _vumps_iteration(
                psi, H, alg.krylovdim, alg.eig_maxrestarts, alg.gauge_tol,
                1e-12, inner_tol, env_guess=env_guess)
        if alg.finalize is not None:
            psi = alg.finalize(it, psi, H) or psi
        eps = float(eps)
        log.solver_warn(it, diag[:1] + (diag[1],), float(inner_tol))
        if float(diag[1]) > 1e-6 and alg.verbosity >= 1:
            from ..utils.logging import logger
            logger.warning(
                f"VUMPS: iteration {it}: environment GMRES residual "
                f"{float(diag[1]):.4e} (geometric-series solve not "
                "converged)")
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, 0.0, eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(it, 0.0, eps)

    # iterations regauge locally (fast, but AL C = C AR only holds to eps);
    # re-canonicalize ONCE so the returned state is an exactly consistent
    # mixed-gauge triple for downstream consumers (QP gauge conversions,
    # transfer fixed points)
    psi = InfiniteMPS.from_AL(psi.AL, psi.C[psi.period - 1],
                              tol=alg.gauge_tol)
    envs = hamiltonian_environments(psi, H, env_init=env_guess)
    return psi, envs, eps
