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


def _flux_projector(VLs, fmask):
    """Orthogonal projector on X-space onto charge-flux-`sector` B tensors.

    Masked-dense realization of the reference's charged quasiparticle
    utility leg (src/states/quasiparticle_state.jl:30-56): the excitation
    tensor B = VL X is projected onto the flux mask
    (c_left + q_phys == c_right + sector) and pulled back through the
    null-space isometry. Because the ground tensors are exactly flux-0
    (masked), the flux decomposition commutes with the null-space
    projector VL VL^dag, so this is the exact orthogonal projector onto
    the sector subspace of the tangent space. Requires a FULL-RANK AL
    (true for converged symmetric InfiniteMPS with all-live bond labels);
    for rank-deficient finite gauges use the B-space projector below."""
    fm = jnp.asarray(fmask)

    def proj_site(X, VL, mk):
        B = jnp.einsum("lpk,kr->lpr", VL, X) * mk.astype(X.dtype)
        return jnp.einsum("lpk,lpr->kr", VL.conj(), B)

    return lambda Xs: jax.vmap(proj_site)(Xs, VLs, fm)


def _b_flux_projector(ALs, fmask):
    """Orthogonal projector on B-space: flux mask composed with the left
    tangent gauge (1 - AL AL^dag) B = 0-gauge condition.

    Works directly on the (L, D, d, D) excitation tensors, which avoids
    the dense null-space basis entirely — for symmetric states whose AL
    has exact zero columns (dead bond slots / unused sectors), the dense
    `finite_null_spaces` complete-QR fills those columns with arbitrary
    junk and its complement MISSES tangent directions; the projector form
    is exact regardless of rank. The two factors commute exactly at
    finite precision because AL is exactly masked (flux-0 zeros), so one
    application of each yields the orthogonal projector."""
    fm = jnp.asarray(fmask)

    def proj_site(B, AL, mk):
        B = B * mk.astype(B.dtype)
        z = jnp.einsum("lpm,lpr->mr", AL.conj(), B)
        return B - jnp.einsum("lpm,mr->lpr", AL, z)

    return lambda Bs: jax.vmap(proj_site)(Bs, ALs, fm)


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
                         right_gs=None, right_envs=None, sector=None):
    """QP excitation energies for one or several momenta.
    Returns (energies (n_momenta, num), qps list).

    sector: charge of the excitation (reference `sector` kwarg,
    docs/src/man/algorithms.md:196-211). Requires `psi` to be a
    SymmetricInfiniteMPS (abelian bond charge labels); the QP search is
    then restricted to flux-`sector` B tensors via `_flux_projector`."""
    from ..symmetry.charges import SymmetricInfiniteMPS

    fmask = None
    if isinstance(psi, SymmetricInfiniteMPS):
        if sector is not None:
            fmask = psi.flux_masks(sector)
        psi = psi.state
    elif sector is not None:
        raise TypeError(
            "sector-resolved excitations need a SymmetricInfiniteMPS "
            "(abelian bond charge labels)")
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
        if fmask is not None:
            P = _flux_projector(qp0.VLs, fmask)
            X0 = P(qp0.Xs)
            n0 = jnp.linalg.norm(X0)
            assert float(n0) > 1e-12, \
                f"sector {sector} unreachable from the given bond labels"
            qp0 = dataclasses.replace(qp0, Xs=X0 / n0)
        es, xs = _solve_qp(qp0, H, GLs, GRs, Es, alg, num, proj=(
            _flux_projector(qp0.VLs, fmask) if fmask is not None else None))
        energies.append(es)
        qps.append([dataclasses.replace(qp0, Xs=x) for x in xs])
    return jnp.stack(energies), qps


def _solve_qp(qp0, H, GLs, GRs, Es, alg, num, proj=None):
    """Sequential deflation: find `num` smallest eigenpairs of H_eff.
    proj: optional X-space projector (charge sector restriction) applied
    around every matvec."""
    es, xs = [], []
    shift = 100.0

    def base_mv(X):
        y = _qp_matvec_infinite(X if proj is None else proj(X),
                                qp0, H, GLs, GRs, Es, alg.env_tol)
        return y if proj is None else proj(y)

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
                       envs=None, num: int = 1, key=None, sector=None):
    """Finite-chain QP excitations. Returns (energies (num,), qps).

    sector: charge of the excitation relative to the ground state
    (reference docs/src/man/algorithms.md:196-211 — the Z2-charged TFIM
    gap demo). Requires `psi` to be a SymmetricFiniteMPS."""
    from ..symmetry.charges import SymmetricFiniteMPS

    fmask = cmask = None
    if isinstance(psi, SymmetricFiniteMPS):
        if sector is not None:
            fmask = psi.flux_masks(sector)
            cmask = jnp.asarray(psi.masks)
        psi = psi.state
    elif sector is not None:
        raise TypeError(
            "sector-resolved excitations need a SymmetricFiniteMPS "
            "(abelian bond charge labels)")
    if key is None:
        key = jax.random.PRNGKey(0)
    L, D = psi.length, psi.D
    qp0 = FiniteQP.random(key, psi)
    if cmask is not None:
        # FiniteQP.random re-gauges with unmasked QRs whose completions put
        # junk in the dead (charge-forbidden) columns; re-mask the gauges —
        # the represented state is unchanged (the dead rows of the center
        # matrices are zero) and the flux projector/environments then see
        # exactly charge-pure tensors
        qp0 = dataclasses.replace(qp0,
                                  ALs=qp0.ALs * cmask.astype(qp0.ALs.dtype),
                                  ARs=qp0.ARs * cmask.astype(qp0.ARs.dtype))
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

    if fmask is not None:
        # B-space solve (see _b_flux_projector): the VL null basis of a
        # rank-deficient symmetric gauge misses tangent directions, so the
        # sector search runs on the raw B tensors with the combined
        # flux + tangent-gauge projector, the complement shifted far above
        # the physical window so Lanczos never drifts into it.
        return _excitations_finite_B(H, alg, qp0, Ws, GLs, GRs, E0, fmask,
                                     num, key, shift)

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


def _excitations_finite_B(H, alg, qp0, Ws, GLs, GRs, E0, fmask, num, key,
                          shift):
    """Charged-sector finite QP solve in B-space (see excitations_finite).
    Returns (energies (num,), qps as FiniteQP with Xs = VL^dag B pullbacks
    PLUS exact Bs attached for flux checks)."""
    from ..environments.qp import (
        qp_left_envs_finite_B, qp_right_envs_finite_B,
    )

    L, D, d = qp0.ALs.shape[0], qp0.ALs.shape[1], qp0.ALs.shape[2]
    Pi = _b_flux_projector(qp0.ALs, fmask)
    comp_shift = 1e3 * (1.0 + abs(float(E0)))

    def base_mv(Bs):
        Bp = Pi(Bs)
        lBs = qp_left_envs_finite_B(Bp, qp0.ALs, qp0.ARs, GLs, Ws)
        rBs = qp_right_envs_finite_B(Bp, qp0.ALs, qp0.ARs, GRs, Ws)

        def site(GL, W, GR, B, lB, rB, ALi, ARi):
            y = ac_apply(GL, W, GR, B)
            y = y + ac_apply(lB, W, GR, ARi)
            y = y + ac_apply(GL, W, rB, ALi)
            return y - E0 * B

        y = jax.vmap(site)(GLs[:L], Ws, GRs[1:], Bp, lBs, rBs,
                           qp0.ALs, qp0.ARs)
        # the sector-orthogonal complement is lifted far above the window
        # (its raw eigenvalue under Pi H Pi would be 0 < any gap)
        return Pi(y) + comp_shift * (Bs - Bp)

    if key is None:
        key = jax.random.PRNGKey(0)
    B0 = Pi(jax.random.normal(key, (L, D, d, D), qp0.ALs.dtype)
            if not jnp.issubdtype(qp0.ALs.dtype, jnp.complexfloating)
            else (jax.random.normal(key, (L, D, d, D),
                                    jnp.zeros((), qp0.ALs.dtype).real.dtype)
                  + 1j * jax.random.normal(jax.random.split(key)[1],
                                           (L, D, d, D),
                                           jnp.zeros((),
                                                     qp0.ALs.dtype).real.dtype)
                  ).astype(qp0.ALs.dtype))
    n0 = jnp.linalg.norm(B0)
    assert float(n0) > 1e-12, "sector unreachable from the given bond labels"
    B0 = B0 / n0

    es, bs = [], []
    for k in range(num):
        found = tuple(bs)

        def mv(B, _found=found):
            y = base_mv(B)
            for bf in _found:
                y = y + shift * jnp.vdot(bf, B) * bf
            return y

        res = _qp_eigsolve(mv, B0, alg)
        es.append(res.eigenvalue)
        bs.append(Pi(res.eigenvector)
                  / jnp.linalg.norm(Pi(res.eigenvector)))
    qps = [_BQP(b, qp0.ALs, qp0.ARs) for b in bs]
    return jnp.stack(es), qps


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class _BQP:
    """Charged finite quasiparticle carrying explicit B tensors (the
    B-space counterpart of FiniteQP; bs() returns them verbatim)."""

    Bs: jnp.ndarray
    ALs: jnp.ndarray
    ARs: jnp.ndarray

    def tree_flatten(self):
        return (self.Bs, self.ALs, self.ARs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def length(self):
        return self.Bs.shape[0]

    def bs(self):
        return self.Bs


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

    from ..symmetry.charges import SymmetricFiniteMPS

    from ..symmetry.su2_reduced import ReducedMPO

    if isinstance(H, ReducedMPO):
        # SU(2) reduced path: sector is the excitation spin as 2j
        # (reference passes an SU2Irrep sector through the QP utility leg,
        # quasiparticle_state.jl:30-56)
        from ..symmetry.su2_reduced_qp import excitations_su2_reduced

        if not isinstance(alg, QuasiparticleAnsatz):
            raise TypeError(
                "ReducedMPO excitations support only QuasiparticleAnsatz, "
                f"got {type(alg).__name__}")
        momenta, psi = args[0], args[1]
        tke = kwargs.pop("sector", 2)
        unknown = set(kwargs) - {"num", "key"}
        if unknown:
            raise TypeError(
                f"excitations(ReducedMPO, ...): unsupported keyword(s) "
                f"{sorted(unknown)}; the reduced path accepts num/key/sector")
        return excitations_su2_reduced(
            H, psi, momenta, tke=tke, tol=alg.tol,
            krylovdim=alg.krylovdim, maxrestarts=alg.maxrestarts,
            env_tol=alg.env_tol, **kwargs)
    if isinstance(alg, QuasiparticleAnsatz):
        if isinstance(H, DenseMPO):
            from .excitations_statmech import excitations_boundary

            return excitations_boundary(
                H, args[0], args[1],
                **{k: v for k, v in kwargs.items()
                   if k in ("envs", "key", "krylovdim", "tol")})
        if isinstance(args[0], (FiniteMPS, SymmetricFiniteMPS)):
            return excitations_finite(H, alg, *args, **kwargs)
        return excitations_infinite(H, alg, *args, **kwargs)
    if isinstance(alg, FiniteExcited):
        return excitations_dmrg(H, alg, *args, **kwargs)
    raise TypeError(type(alg))
