"""Quasiparticle excitations (reference
src/algorithms/excitation/quasiparticleexcitation.jl) and the penalty-based
`FiniteExcited` method (reference dmrgexcitation.jl).

The QP effective Hamiltonian per site is three ac_apply-shaped
contractions — B in the center against (GL, GR), B to the left against
(lB, GR) with the ground AR as ket, and B to the right against (GL, rB)
with the ground AL as ket — projected back onto the null-space basis.
Each Krylov matvec rebuilds the momentum-phased B-environments (the
deepest solver nesting in the framework: outer Lanczos -> per-matvec
GMRES tails -> transfer scans).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Defaults
from ..linalg.lanczos import eigsh_smallest
from ..states.infinitemps import InfiniteMPS
from ..states.finitemps import FiniteMPS
from ..states.quasiparticle import LeftGaugedQP, FiniteQP, full_gauges
from ..operators.mpo import MPOHamiltonian
from ..environments.infinite_ham import hamiltonian_environments
from ..environments.finite import (
    finite_environments, stack_W, left_boundary, right_boundary,
    compute_left_envs, compute_right_envs,
)
from ..environments.qp import (
    qp_left_envs, qp_right_envs, qp_left_envs_finite, qp_right_envs_finite,
)
from .derivatives import ac_apply


@dataclasses.dataclass(frozen=True)
class QuasiparticleAnsatz:
    tol: float = 1e-8
    krylovdim: int = Defaults.krylovdim
    maxrestarts: int = 40
    env_tol: float = 1e-10
    verbosity: int = Defaults.verbosity
    # "lanczos" assumes an (effectively) Hermitian H_eff; "arnoldi" uses the
    # smallest-real-part restarted Arnoldi (linalg.arnoldi), robust when
    # Hermiticity is broken at working precision (f32 env-GMRES tails) —
    # mirrors KrylovKit eigsolve's automatic Lanczos/Arnoldi selection in
    # the reference's quasiparticleexcitation.jl.
    solver: str = "lanczos"


def _qp_eigsolve(mv, x0, alg: QuasiparticleAnsatz):
    """Dispatch the QP eigensolve per alg.solver."""
    if alg.solver == "arnoldi":
        from ..linalg.arnoldi import smallest_eigs_arnoldi

        return smallest_eigs_arnoldi(mv, x0, alg.krylovdim,
                                     alg.maxrestarts, alg.tol)
    return eigsh_smallest(mv, x0, alg.krylovdim, alg.maxrestarts, alg.tol)


# ----------------------------------------------------------------------------
# infinite QP
# ----------------------------------------------------------------------------

def _qp_matvec_infinite(Xs, qp_template: LeftGaugedQP, H, GLs, GRs, Es,
                        env_tol, phase=None):
    """H_eff - E applied to the stacked X blocks. `phase` = traced e^{-ip}
    (optional, enables vmap over momenta)."""
    qp = dataclasses.replace(qp_template, Xs=Xs)
    L = qp.period
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(qp.left_gs.dtype)
    Bs = qp.bs()
    lBs = qp_left_envs(qp, GLs, H, tol=env_tol, phase=phase)
    rBs = qp_right_envs(qp, GRs, H, tol=env_tol,
                        phase=None if phase is None else jnp.conj(phase))

    AL = qp.left_gs.AL
    AR = qp.right_gs.AR

    def site(GL, W, GR, B, lB, rB, ALi, ARi, E, VL):
        y = ac_apply(GL, W, GR, B)
        y = y + ac_apply(lB, W, GR, ARi)
        y = y + ac_apply(GL, W, rB, ALi)
        y = y - E * B
        return jnp.einsum("lpk,lpr->kr", VL.conj(), y)

    return jax.vmap(site)(GLs, Ws, GRs, Bs, lBs, rBs, AL, AR, Es, qp.VLs)


def _renorm_energies_infinite(psi: InfiniteMPS, H, envs):
    L = psi.period
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)

    def site(GL, W, GR, AC):
        return jnp.real(jnp.vdot(AC, ac_apply(GL, W, GR, AC))) / \
            jnp.real(jnp.vdot(AC, AC))

    return jax.vmap(site)(envs.GLs, Ws, envs.GRs, psi.AC)


def excitations_infinite(H, alg: QuasiparticleAnsatz, momenta, psi,
                         envs=None, num: int = 1, key=None,
                         right_gs=None, right_envs=None):
    """QP excitation energies for one or several momenta.
    Returns (energies (n_momenta, num), qps list)."""
    if envs is None:
        envs = hamiltonian_environments(psi, H)
    if right_gs is not None and right_envs is None:
        right_envs = hamiltonian_environments(right_gs, H)
    if key is None:
        key = jax.random.PRNGKey(0)
    if np.isscalar(momenta):
        momenta = [momenta]

    GLs = envs.GLs
    GRs = (right_envs or envs).GRs
    E_left = _renorm_energies_infinite(psi, H, envs)
    if right_gs is not None:
        E_right = _renorm_energies_infinite(right_gs, H, right_envs)
        Es = (E_left + E_right) / 2
    else:
        Es = E_left

    energies, qps = [], []
    for p in momenta:
        qp0 = LeftGaugedQP.random(key, psi, momentum=float(p),
                                  right_gs=right_gs)
        es, xs = _solve_qp(qp0, H, GLs, GRs, Es, alg, num)
        energies.append(es)
        qps.append([dataclasses.replace(qp0, Xs=x) for x in xs])
    return jnp.stack(energies), qps


def _solve_qp(qp0, H, GLs, GRs, Es, alg, num):
    """Sequential deflation: find `num` smallest eigenpairs of H_eff."""
    es, xs = [], []
    shift = 100.0

    def base_mv(X):
        return _qp_matvec_infinite(X, qp0, H, GLs, GRs, Es, alg.env_tol)

    for k in range(num):
        found = list(xs)

        def mv(X, _found=tuple(found)):
            y = base_mv(X)
            for xf in _found:
                ov = jnp.vdot(xf, X)
                y = y + shift * ov * xf
            return y

        res = _qp_eigsolve(mv, qp0.Xs, alg)
        es.append(res.eigenvalue)
        xs.append(res.eigenvector)
    return jnp.stack(es), xs


def excitations_infinite_batched(H, alg: QuasiparticleAnsatz, momenta, psi,
                                 envs=None, key=None):
    """Momentum-batched dispersion: ONE vmapped Lanczos solve over all
    momenta (the TPU equivalent of the reference's Threads.@spawn momentum
    fan-out, quasiparticleexcitation.jl:94-124). Requires a complex dtype.
    Returns energies (n_momenta,)."""
    import numpy as np

    if envs is None:
        envs = hamiltonian_environments(psi, H)
    if key is None:
        key = jax.random.PRNGKey(0)
    assert jnp.issubdtype(psi.dtype, jnp.complexfloating), \
        "momentum batching requires a complex dtype"
    momenta = jnp.asarray(momenta, jnp.float64)
    phases = jnp.exp(-1j * momenta).astype(psi.dtype)
    qp0 = LeftGaugedQP.random(key, psi, momentum=0.0)
    Es = _renorm_energies_infinite(psi, H, envs)

    def solve_one(phase):
        def mv(X):
            return _qp_matvec_infinite(X, qp0, H, envs.GLs, envs.GRs, Es,
                                       alg.env_tol, phase=phase)

        res = _qp_eigsolve(mv, qp0.Xs, alg)
        return res.eigenvalue

    return jax.vmap(solve_one)(phases)


# ----------------------------------------------------------------------------
# finite QP
# ----------------------------------------------------------------------------

def _qp_matvec_finite(Xs, qp_template: FiniteQP, Ws, GLs, GRs, E0):
    qp = dataclasses.replace(qp_template, Xs=Xs)
    L = qp.length
    Bs = qp.bs()
    lBs = qp_left_envs_finite(qp, GLs, Ws)
    rBs = qp_right_envs_finite(qp, GRs, Ws)

    def site(GL, W, GR, B, lB, rB, ALi, ARi, VL, mk):
        y = ac_apply(GL, W, GR, B)
        y = y + ac_apply(lB, W, GR, ARi)
        y = y + ac_apply(GL, W, rB, ALi)
        y = y - E0 * B
        return jnp.einsum("lpk,lpr->kr", VL.conj(), y) * mk.astype(y.dtype)

    return jax.vmap(site)(GLs[:L], Ws, GRs[1:], Bs, lBs, rBs,
                          qp.ALs, qp.ARs, qp.VLs, qp.mask)


def excitations_finite(H, alg: QuasiparticleAnsatz, psi: FiniteMPS,
                       envs=None, num: int = 1, key=None):
    """Finite-chain QP excitations. Returns (energies (num,), qps)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    L, D = psi.length, psi.D
    qp0 = FiniteQP.random(key, psi)
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]
    # environments in the full gauges
    GLs = compute_left_envs(qp0.ALs, Ws, left_boundary(w, D, psi.dtype))
    GRs = compute_right_envs(qp0.ARs, Ws, right_boundary(w, D, psi.dtype))
    # ground energy from the full left env
    Efull = GLs[L][w - 1, 0, 0]
    E0 = jnp.real(Efull)

    es, xs = [], []
    shift = 100.0 * max(1.0, float(jnp.abs(E0)))

    def base_mv(X):
        return _qp_matvec_finite(X, qp0, Ws, GLs, GRs, E0)

    for k in range(num):
        found = tuple(xs)

        def mv(X, _found=found):
            y = base_mv(X)
            for xf in _found:
                y = y + shift * jnp.vdot(xf, X) * xf
            return y

        res = _qp_eigsolve(mv, qp0.Xs, alg)
        es.append(res.eigenvalue)
        xs.append(res.eigenvector)
    qps = [dataclasses.replace(qp0, Xs=x) for x in xs]
    return jnp.stack(es), qps


# ----------------------------------------------------------------------------
# dispatch
# ----------------------------------------------------------------------------

def excitations(H, alg, *args, **kwargs):
    """excitations(H, QuasiparticleAnsatz(), momenta, psi_inf, ...) or
    excitations(H, QuasiparticleAnsatz(), psi_finite, ...) or
    excitations(H, FiniteExcited(), psi_finite, ...) or
    excitations(O_dense, QuasiparticleAnsatz(), momenta, psi_boundary, ...)
    for statmech transfer MPOs."""
    from .dmrgexcitation import FiniteExcited, excitations_dmrg
    from ..operators.mpo import DenseMPO

    if isinstance(alg, QuasiparticleAnsatz):
        if isinstance(H, DenseMPO):
            from .excitations_statmech import excitations_boundary

            return excitations_boundary(
                H, args[0], args[1],
                **{k: v for k, v in kwargs.items()
                   if k in ("envs", "key", "krylovdim", "tol")})
        if isinstance(args[0], FiniteMPS):
            return excitations_finite(H, alg, *args, **kwargs)
        return excitations_infinite(H, alg, *args, **kwargs)
    if isinstance(alg, FiniteExcited):
        return excitations_dmrg(H, alg, *args, **kwargs)
    raise TypeError(type(alg))
