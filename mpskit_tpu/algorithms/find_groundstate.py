"""`find_groundstate` dispatcher with keyword-driven default algorithm
selection (reference src/algorithms/groundstate/find_groundstate.jl:19-41):
infinite states default to VUMPS (chained with GradientGrassmann for tight
tolerances), finite states to DMRG (DMRG2 first when a truncation scheme is
given)."""

from __future__ import annotations

from typing import Optional

from ..states.finitemps import FiniteMPS
from ..states.infinitemps import InfiniteMPS
from .dmrg import DMRG, find_groundstate_dmrg
from .dmrg2 import DMRG2, find_groundstate_dmrg2
from .vumps import VUMPS, find_groundstate_vumps
from .idmrg import IDMRG1, IDMRG2, find_groundstate_idmrg1, find_groundstate_idmrg2
from .grassmann import GradientGrassmann, find_groundstate_grassmann


def find_groundstate(psi, H, alg=None, envs=None, tol: float = 1e-10,
                     maxiter: int = 100, trscheme=None, verbosity=None):
    """find_groundstate(psi, H[, alg]) -> (psi, envs, epsilon)."""
    from ..operators.lazysum import LazySum, MultipliedOperator

    if isinstance(H, (LazySum, MultipliedOperator)):
        # time-independent sums are materialized eagerly: with the stacked
        # dense FSM representation the summed MPO is the fastest path on
        # the MXU (the reference keeps MultipleEnvironments instead)
        H = H.sum_materialized() if isinstance(H, LazySum) else H.eval_at(0.0)
    kw = {} if verbosity is None else {"verbosity": verbosity}

    from ..symmetry.su2_reduced import (
        SU2ReducedState, ReducedMPO, find_groundstate_su2_reduced)

    if isinstance(psi, SU2ReducedState):
        # Uniform SU(2) reduced-coordinate states run the reduced VUMPS
        # (the reference reaches the same physics through TensorKit
        # Rep[SU2] genericity). Returns (state, e_density, eps) — the
        # middle slot carries the energy density instead of an env
        # container. Finite SU(2) chains use SU2FiniteMPS below, which
        # carries the full DMRG/DMRG2/TDVP/changebonds surface.
        if not isinstance(H, ReducedMPO):
            raise TypeError(
                f"SU2ReducedState needs a ReducedMPO, got {type(H)}")
        if alg is not None and not isinstance(alg, VUMPS):
            raise TypeError(
                f"uniform SU2ReducedState supports VUMPS, got {type(alg)};"
                " finite-chain algorithms run on SU2FiniteMPS")
        a = alg or VUMPS(tol=max(tol, 1e-9), maxiter=maxiter)
        return find_groundstate_su2_reduced(
            psi, H, tol=a.tol, maxiter=a.maxiter, krylovdim=a.krylovdim,
            verbosity=getattr(a, "verbosity", 0))

    from ..symmetry.su2_finite import (
        SU2FiniteMPS, SU2DMRG, SU2DMRG2,
        find_groundstate_su2_finite_dmrg, find_groundstate_su2_finite_dmrg2)

    if isinstance(psi, SU2FiniteMPS):
        # reduced finite chains: DMRG / DMRG2 with dynamic multiplet
        # allocation (reference runs the same solvers on Rep[SU2] spaces,
        # test/algorithms.jl:14-93). Generic DMRG/DMRG2 algs translate to
        # their reduced counterparts.
        if not isinstance(H, ReducedMPO):
            raise TypeError(
                f"SU2FiniteMPS needs a ReducedMPO, got {type(H)}")
        if alg is None:
            a2 = SU2DMRG2(tol=max(tol, 1e-10), maxiter=maxiter)
            psi, e, eps = find_groundstate_su2_finite_dmrg2(psi, H, a2)
            if eps > tol:
                psi, e, eps = find_groundstate_su2_finite_dmrg(
                    psi, H, SU2DMRG(tol=tol, maxiter=maxiter))
            return psi, e, eps
        if isinstance(alg, SU2DMRG):
            return find_groundstate_su2_finite_dmrg(psi, H, alg)
        if isinstance(alg, SU2DMRG2):
            return find_groundstate_su2_finite_dmrg2(psi, H, alg)
        if isinstance(alg, DMRG):
            return find_groundstate_su2_finite_dmrg(
                psi, H, SU2DMRG(tol=alg.tol, maxiter=alg.maxiter,
                                krylovdim=alg.krylovdim,
                                verbosity=alg.verbosity))
        if isinstance(alg, DMRG2):
            return find_groundstate_su2_finite_dmrg2(
                psi, H, SU2DMRG2(tol=alg.tol, maxiter=alg.maxiter,
                                 krylovdim=alg.krylovdim,
                                 verbosity=alg.verbosity))
        raise TypeError(
            f"SU2FiniteMPS supports DMRG/DMRG2 (or SU2DMRG/SU2DMRG2), "
            f"got {type(alg)}")

    if alg is None:
        if isinstance(psi, FiniteMPS):
            if trscheme is not None:
                psi, _, _ = find_groundstate_dmrg2(
                    psi, H, DMRG2(tol=max(tol, 1e-8), maxiter=maxiter,
                                  trscheme=trscheme, **kw))
            return find_groundstate_dmrg(
                psi, H, DMRG(tol=tol, maxiter=maxiter, **kw))
        if isinstance(psi, InfiniteMPS):
            # VUMPS with a tolerance floor, refined by gradient descent when
            # a tighter tolerance is requested (reference
            # find_groundstate.jl:19-33)
            vumps_tol = max(tol, 1e-9)
            psi, envs_out, eps = find_groundstate_vumps(
                psi, H, VUMPS(tol=vumps_tol, maxiter=maxiter, **kw))
            if tol < vumps_tol and eps > tol:
                psi, envs_out, eps = find_groundstate_grassmann(
                    psi, H, GradientGrassmann(tol=tol, **kw))
            return psi, envs_out, eps
        raise TypeError(type(psi))

    from .unionalg import ChainedAlg

    if isinstance(alg, ChainedAlg):
        # reference UnionAlg (unionalg.jl:4-26): run the stages in sequence,
        # threading the state from one into the next
        envs_out, eps = envs, None
        for stage in alg:
            psi, envs_out, eps = find_groundstate(psi, H, stage)
        return psi, envs_out, eps
    if isinstance(alg, DMRG):
        return find_groundstate_dmrg(psi, H, alg)
    if isinstance(alg, DMRG2):
        return find_groundstate_dmrg2(psi, H, alg)
    if isinstance(alg, VUMPS):
        return find_groundstate_vumps(psi, H, alg)
    if isinstance(alg, IDMRG1):
        return find_groundstate_idmrg1(psi, H, alg)
    if isinstance(alg, IDMRG2):
        return find_groundstate_idmrg2(psi, H, alg)
    if isinstance(alg, GradientGrassmann):
        from ..states.finitemps import FiniteMPS as _F
        from .grassmann import find_groundstate_grassmann_finite

        if isinstance(psi, _F):
            return find_groundstate_grassmann_finite(psi, H, alg)
        return find_groundstate_grassmann(psi, H, alg)
    from .rsdmrg import RealSpaceParallelDMRG, find_groundstate_rsdmrg

    if isinstance(alg, RealSpaceParallelDMRG):
        return find_groundstate_rsdmrg(psi, H, alg)
    raise TypeError(type(alg))
