"""Fixed-point solver wrapper with convergence and uniqueness warnings.

Counterpart of the reference's `fixedpoint` (reference
src/algorithms/fixedpoint.jl:9-30): the Lanczos branch warns on
non-convergence; the Arnoldi branch additionally detects a non-unique
dominant fixed point (there: a nonzero Schur subdiagonal, i.e. an
unsplittable top 2x2 block). Here the hot solves live inside jitted
iteration bodies and return `converged`/`residual` flags that drivers
aggregate (IterLog.solver_warn); this module provides the host-side
wrapper used OUTSIDE jit plus the uniqueness check drivers run once at
convergence — a magnitude-degenerate top pair of the small Rayleigh-Ritz
spectrum is exactly the unsplittable-Schur-block condition (complex
conjugate pairs and true degeneracies both have equal magnitude).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..utils.logging import logger
from .arnoldi import dominant_eigs, spectrum_arnoldi
from .lanczos import eigsh_smallest


def dominant_gap(matvec: Callable, x0, m: int = 20):
    """Top-2 eigenvalues (by magnitude) of `matvec` from one m-step Arnoldi
    factorization seeded at x0 (ideally the converged fixed point, so the
    second Ritz value is accurate). Returns (lam1, lam2) complex scalars."""
    w, _ = spectrum_arnoldi(matvec, x0, m, nev=2)
    w = np.asarray(w)
    return complex(w[0]), complex(w[1])


def _pseudo_seed(x, freq: float):
    """Deterministic generic start vector with the pytree structure of x
    (no RNG needed; distinct `freq` values give independent directions)."""
    import jax

    def leaf(l):
        n = l.size
        v = jnp.sin(freq * jnp.arange(1, n + 1) + 0.3 * freq)
        return v.reshape(l.shape).astype(l.dtype)

    return jax.tree_util.tree_map(leaf, x)


def uniqueness_warning(matvec: Callable, x, m: int = 20,
                       rel_gap_tol: float = 1e-3,
                       name: str = "fixedpoint") -> bool:
    """Warn when the dominant fixed point of `matvec` is non-unique — the
    functional analogue of the reference's "non-unique fixedpoint detected"
    (fixedpoint.jl:26-28, a nonzero Schur subdiagonal). Two mechanisms:

    (a) magnitude degeneracy of the top Rayleigh-Ritz pair (catches +/-
        pairs and complex rotation pairs — distinct eigenvalues of equal
        magnitude, which single-vector Krylov resolves);
    (b) a TRUE multiplicity is invisible to one Krylov run (the Krylov
        space sees only the start vector's component of the eigenspace —
        this is why the reference's Schur test also misses it), so two
        restarted Arnoldi runs from independent generic seeds are compared:
        same eigenvalue but different eigenvectors => degenerate eigenspace
        (e.g. the symmetry-broken low-T Ising boundary).

    Returns True if non-unique. Call OUTSIDE jit, once at driver
    convergence (cost: one m-step factorization + two restarted solves)."""
    lam1, lam2 = dominant_gap(matvec, x, m)
    a1, a2 = abs(lam1), abs(lam2)
    if a1 <= 0.0:
        return False
    rel_gap = (a1 - a2) / a1
    if rel_gap < rel_gap_tol:
        logger.warning(
            f"{name}: non-unique fixed point detected: dominant transfer "
            f"eigenvalues |{lam1:.6e}| and |{lam2:.6e}| are degenerate to "
            f"relative gap {rel_gap:.2e} (< {rel_gap_tol:.0e}) — the boundary "
            "state may mix symmetry-broken / rotated sectors")
        return True

    from ..utils.tree import tree_inner, tree_norm

    r1 = dominant_eigs(matvec, _pseudo_seed(x, 0.7), m, 50, 1e-8)
    r2 = dominant_eigs(matvec, _pseudo_seed(x, 2.3), m, 50, 1e-8)
    l1, l2 = complex(r1.eigenvalue), complex(r2.eigenvalue)
    if abs(l1) <= 0.0:
        return False
    if abs(l1 - l2) / abs(l1) < 10 * rel_gap_tol:
        ov = abs(complex(tree_inner(r1.eigenvector, r2.eigenvector)))
        ov /= max(float(tree_norm(r1.eigenvector))
                  * float(tree_norm(r2.eigenvector)), 1e-300)
        if ov < 0.99:
            logger.warning(
                f"{name}: non-unique fixed point detected: two independent "
                f"Arnoldi runs agree on the dominant eigenvalue "
                f"({l1:.6e}) but converge to different fixed points "
                f"(overlap {ov:.4f}) — degenerate eigenspace (symmetry-"
                "broken sectors)")
            return True
    return False


def transfer_uniqueness_warning(psi, Os, tol: float = 1e-9,
                                name: str = "leading_boundary",
                                m: int = 20) -> bool:
    """Uniqueness check for a boundary-MPS fixed point: inspects the top of
    the <psi| O |psi> channel-transfer spectrum (per unit cell). Os is the
    stacked (L, w, d, d) MPO tensor array used by the statmech drivers."""
    import jax

    from ..transfermatrix.transfer import transfer_left_mpo

    L, D = psi.period, psi.D
    w = Os.shape[1]

    def mv(v):
        def body(v, xs):
            Oi, A = xs
            return transfer_left_mpo(v, Oi, A, A), None

        v, _ = jax.lax.scan(body, v, (Os, psi.AL))
        return v

    v0 = jnp.broadcast_to(jnp.eye(D, dtype=psi.dtype)[None], (w, D, D))
    # seed with a generic perturbation so a second eigenvector component is
    # present even when the identity-like start is close to the fixed point
    v0 = v0 + 1e-3 * jnp.ones((w, D, D), psi.dtype)
    rel_gap_tol = max(1e-3, float(tol) ** 0.5)
    return uniqueness_warning(mv, v0, m=min(m, 30), rel_gap_tol=rel_gap_tol,
                              name=name)


def fixedpoint(matvec: Callable, x0, which: str = "LM", m: int = 30,
               maxrestarts: int = 100, tol: float = 1e-12,
               name: str = "fixedpoint", verbosity: int = 1,
               check_unique: bool = True):
    """fixedpoint(A, x0, which, ...) -> (val, vec), the host-side wrapper
    matching the reference API (fixedpoint.jl:9-30): `which` is "SR"
    (smallest-real, Hermitian Lanczos) or "LM" (largest-magnitude Arnoldi);
    warns on non-convergence, and for "LM" on a non-unique fixed point."""
    if which.upper() == "SR":
        res = eigsh_smallest(matvec, x0, m, maxrestarts, tol)
    elif which.upper() == "LM":
        res = dominant_eigs(matvec, x0, m, maxrestarts, tol)
    else:
        raise ValueError(f"which must be 'SR' or 'LM', got {which!r}")
    if verbosity >= 1 and not bool(res.converged):
        logger.warning(
            f"{name}: not converged after {int(res.iterations)} restarts: "
            f"normres = {float(res.residual):.4e}")
    if verbosity >= 1 and which.upper() == "LM" and check_unique:
        uniqueness_warning(matvec, res.eigenvector, m=min(m, 30), name=name)
    return res.eigenvalue, res.eigenvector
