"""Fibonacci-anyon symmetric states — the TPU-native counterpart of the
reference's `Vect[FibonacciAnyon]` spaces (TensorKit anyonic sectors), used
by the hard-hexagon example (reference
examples/classic2d/1.hard-hexagon/main.jl:7-8 and MPSKitModels
`hard_hexagon()`).

Design (same masked-dense strategy as the abelian backend,
symmetry/charges.py, and the SU(2) backend, symmetry/su2.py): anyonic
tensors are stored in the orthonormal *fusion-path basis*. A virtual bond
of quantum dimension ~D is a dense padded index carrying a static sector
label per slot (0 = vacuum 1, 1 = tau); the physical leg of a boundary MPS
over tau-anyons is the path height AFTER the site. The Fibonacci fusion
rule tau (x) tau = 1 (+) tau makes every hom space at most 1-dimensional,
so a symmetric tensor is exactly a dense tensor times a static boolean
mask:

    A_mask[l, p, r] = (p == label_r) and not (label_l == 1 == label_r == 1)

(the path constraint: consecutive vacuum heights are forbidden, all other
steps allowed). All contractions stay dense MXU matmuls; masks are
re-applied after decompositions.

Where the anyonic structure genuinely differs from a plain dense MPS is in
*closing loops*: a closed anyon-a loop carries its quantum dimension d_a
(d_1 = 1, d_tau = phi). Open planar contractions (transfers, effective
eigenproblems, QR gauge moves) are metric-free in the orthonormal path
basis, so the entire VUMPS machinery runs unmodified; only trace readouts
change:

  * entanglement entropy uses the quantum trace
        S = -sum_a d_a sum_i p_{a,i} log p_{a,i},
        sum_a d_a sum_i p_{a,i} = 1
    (TensorKit computes tr_q(rho log rho) the same way);
  * eigen-SPECTRA (free energy ratios, correlation lengths) are metric
    free and read off the flat machinery directly.

F-symbol data enters once, in the construction of anyonic MPOs: see
`models/statmech.hard_hexagon_fibonacci` for the derivation of the
critical hard-hexagon transfer MPO from the Temperley-Lieb element
e^{(a)}_{x,x'} = sqrt(d_x d_x')/d_a with loop weight phi.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .category import (
    fibonacci_category, bond_labels as _cat_bond_labels,
    chain_masks as _cat_chain_masks, quantum_schmidt as _cat_schmidt,
    quantum_entropy as _cat_entropy,
)

PHI = (1.0 + np.sqrt(5.0)) / 2.0
QDIMS = np.array([1.0, PHI])  # d_1, d_tau
CATEGORY = fibonacci_category()
# height-pair basis of the hard-hexagon MPO bond (y = upper path height,
# x = height after the threaded horizontal tau): x in y (x) tau
FIB_PAIRS = ((0, 1), (1, 0), (1, 1))


def fib_allowed(a: int, b: int) -> bool:
    """b in a (x) tau: every height step is allowed except 1 -> 1."""
    return bool(CATEGORY.N[a, 1, b])


def fibonacci_bond_labels(D: int) -> np.ndarray:
    """Static sector labels for a virtual bond of dense dimension D:
    n_tau/n_1 -> phi (the asymptotic fusion-path count ratio, matching the
    reference's `virtual_space(D)` which splits quantum dimension evenly:
    examples/classic2d/1.hard-hexagon/main.jl:24-28). Vacuum slots first.

    Delegates to the general fusion-category layer (symmetry/category.py)."""
    return _cat_bond_labels(CATEGORY, D)


def fibonacci_masks(labels: np.ndarray, L: int = 1):
    """(A_mask (L, D, 2, D), C_mask (L, D, D)) for an L-site unit cell
    (uniform labels): physical index = height after the site; bond slots of
    equal sector couple in C. The hard-hexagon boundary wants L=3 — the
    3-sublattice structure of the triangular lattice survives in the
    fusion-path basis (the reference's anyonic tensors quotient it; the
    height representation does not).

    Delegates to the general fusion-category layer (symmetry/category.py)."""
    return _cat_chain_masks(CATEGORY, 1, labels, L)


def fibonacci_env_mask(labels: np.ndarray) -> np.ndarray:
    """(w=3, D, D) boolean sector alignment of GL/GR environments against
    the hard-hexagon MPO: GL[m=(y,x), l_bra, l_ket] is supported on
    label(l_bra) == y and label(l_ket) == x (the bra path carries the upper
    heights; the ket path continues from the post-tau height)."""
    D = labels.shape[0]
    M = np.zeros((len(FIB_PAIRS), D, D), bool)
    for k, (y, x) in enumerate(FIB_PAIRS):
        M[k] = (labels[:, None] == y) & (labels[None, :] == x)
    return M


@dataclasses.dataclass(frozen=True)
class FibonacciInfiniteMPS:
    """A uniform boundary MPS over tau-anyons in the fusion-path basis:
    the dense state plus static bond sector labels."""

    state: object                 # InfiniteMPS
    labels: Tuple[int, ...]

    @property
    def masks(self):
        return fibonacci_masks(np.asarray(self.labels, int),
                               self.state.period)

    @staticmethod
    def random(key, D: int, L: int = 3,
               dtype=jnp.float64) -> "FibonacciInfiniteMPS":
        """L=3 by default: the hard-hexagon boundary fixed point carries the
        triangular lattice's 3-sublattice rotation, which in the height
        basis shows up as a Z3 triple of channel eigenvalues degenerate in
        modulus — representable (and cleanly convergent) only with a 3-site
        unit cell."""
        from ..states.infinitemps import InfiniteMPS

        labels = fibonacci_bond_labels(D)
        A_mask, C_mask = fibonacci_masks(labels, L)
        A = jax.random.normal(key, (L, D, 2, D), dtype)
        A = A * jnp.asarray(A_mask)
        psi = InfiniteMPS.from_A(A)
        Am = jnp.asarray(A_mask).astype(dtype)
        Cm = jnp.asarray(C_mask).astype(dtype)
        psi = InfiniteMPS(psi.AL * Am, psi.AR * Am, psi.AC * Am, psi.C * Cm)
        return FibonacciInfiniteMPS(psi, tuple(int(x) for x in labels))

    def grow(self, key, D_new: int, noise: float = 1e-3) \
            -> "FibonacciInfiniteMPS":
        """Embed into a larger bond (sector blocks keep their slots) and
        seed the new directions with masked noise — the sector-aware
        counterpart of RandExpand used by the reference's hard-hexagon
        scaling loop (there with OptimalExpand)."""
        from ..states.infinitemps import InfiniteMPS

        old = np.asarray(self.labels, int)
        new = fibonacci_bond_labels(D_new)
        # map old slot i -> new slot: k-th old slot of sector a -> k-th new
        # slot of sector a
        pos = {}
        for a in (0, 1):
            old_idx = np.where(old == a)[0]
            new_idx = np.where(new == a)[0]
            assert len(new_idx) >= len(old_idx), "grow() cannot shrink sectors"
            for k, i in enumerate(old_idx):
                pos[i] = new_idx[k]
        perm = np.array([pos[i] for i in range(len(old))], int)

        L = self.state.period
        A_mask, C_mask = fibonacci_masks(new, L)
        A_old = np.asarray(self.state.AL)   # (L, D, 2, D)
        A = np.zeros((L, D_new, 2, D_new), A_old.dtype)
        for i in range(L):
            A[i][np.ix_(perm, range(2), perm)] = A_old[i]
        A = jnp.asarray(A) + noise * jax.random.normal(
            key, A.shape, self.state.dtype) * jnp.asarray(A_mask)
        A = A * jnp.asarray(A_mask)
        psi = InfiniteMPS.from_A(A)
        Am = jnp.asarray(A_mask).astype(psi.dtype)
        Cm = jnp.asarray(C_mask).astype(psi.dtype)
        psi = InfiniteMPS(psi.AL * Am, psi.AR * Am, psi.AC * Am, psi.C * Cm)
        return FibonacciInfiniteMPS(psi, tuple(int(x) for x in new))


def anyonic_schmidt(spsi: FibonacciInfiniteMPS):
    """{sector: probabilities p_{a,i}} with the quantum-trace normalization
    sum_a d_a sum_i p_{a,i} = 1 (general layer: category.quantum_schmidt)."""
    return _cat_schmidt(CATEGORY, np.asarray(spsi.labels, int),
                        np.asarray(spsi.state.C[0]))


def anyonic_entropy(spsi: FibonacciInfiniteMPS) -> float:
    """Quantum-trace entanglement entropy S = -tr_q(rho log rho) =
    -sum_a d_a sum_i p_{a,i} log p_{a,i} (what the reference's `entropy`
    computes for anyonic sectors via TensorKit block traces; general layer:
    category.quantum_entropy)."""
    return _cat_entropy(CATEGORY, np.asarray(spsi.labels, int),
                        np.asarray(spsi.state.C[0]))


def leading_boundary_fibonacci(spsi: FibonacciInfiniteMPS, O, alg=None):
    """Sector-constrained boundary VUMPS for an anyonic transfer MPO in the
    fusion-path basis. Returns (FibonacciInfiniteMPS, envs, eps)."""
    from ..algorithms.statmech import (
        VUMPS_Boundary, _boundary_vumps_iteration, _boundary_vomps_iteration,
    )
    from ..environments.infinite_mpo import mpo_environments
    from ..operators.mpo import DenseMPO
    from ..utils.dynamictols import updatetol
    from ..utils.logging import IterLog
    from ..config import VERBOSE_ITER, matmul_precision

    if alg is None:
        alg = VUMPS_Boundary(tol=1e-6)
    psi = spsi.state
    A_mask, C_mask = spsi.masks
    A_mask = jnp.asarray(A_mask)
    C_mask = jnp.asarray(C_mask)
    env_mask = jnp.asarray(fibonacci_env_mask(np.asarray(spsi.labels, int)))
    Os = jnp.stack([O.site(i) for i in range(psi.period)]).astype(psi.dtype)
    log = IterLog("leading_boundary_fib", alg.verbosity)
    eps = 1.0
    GLg = GRg = None
    # VOMPS warm-up: a few power steps pull a random start into the basin
    # of the dominant boundary state before the eigensolver-driven VUMPS
    # iterations take over (they can otherwise lock onto a subdominant
    # real fixed point of the critical transfer)
    with matmul_precision(psi.dtype):
        for _ in range(10):
            psi, eps, GLg, GRg, _env_resid = _boundary_vomps_iteration(
                psi, Os, alg.gauge_tol, 1e-12, GL_guess=GLg, GR_guess=GRg,
                A_mask=A_mask, C_mask=C_mask, env_mask=env_mask)
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        with matmul_precision(psi.dtype):
            psi, eps, GLg, GRg, diag = _boundary_vumps_iteration(
                psi, Os, alg.krylovdim, alg.gauge_tol, 1e-12, inner_tol,
                GL_guess=GLg, GR_guess=GRg, A_mask=A_mask, C_mask=C_mask,
                env_mask=env_mask)
        log.solver_warn(it, diag[:2], float(inner_tol))
        eps = float(eps)
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, 0.0, eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, 0.0, eps)
    envs = mpo_environments(psi, DenseMPO(tuple(Os[i] for i in range(psi.period))),
                            env_mask=env_mask, select_real=True)
    return dataclasses.replace(spsi, state=psi), envs, eps


def anyonic_entropy_state(psi, bond: int = 0, rank_tol: float = 1e-6):
    """Quantum-trace entanglement entropy of an UNMASKED boundary MPS of an
    anyonic (path-basis) transfer MPO, e.g. the 3-site-unit-cell
    hard-hexagon fixed point where uniform static masks cannot represent
    the per-bond sector split.

    The fixed point is exactly anyonic up to bond-basis rotation (the MPO's
    fusion constraints annihilate path-violating components), so the sector
    structure can be RECOVERED: the physical index equals the height after
    the site, hence the vacuum subspace of bond i is the row space of
    AL[i][:, 0, :]. Each Schmidt vector of C_i is assigned to the sector
    carrying its dominant weight, and the entropy uses the quantum trace
    S = -sum_a d_a sum p log p with sum_a d_a sum p = 1.

    Caveat: the 3-site-unit-cell hard-hexagon boundary carries the Z3
    sublattice twist, which mixes height sectors at the few-percent level
    (the p=0 block's singular spectrum has no sharp rank gap) — recovery is
    exact for 1-cell (masked) states and approximate for the twisted
    3-cell fixed point, where the universal part of S is unchanged.
    """
    AL = np.asarray(psi.AL[bond % psi.period])
    C = np.asarray(psi.C[bond % psi.period])
    # vacuum sector of the right bond = row space of the p=0 block
    M0 = AL[:, 0, :]
    U0, s0, V0 = np.linalg.svd(M0)
    r0 = int(np.sum(s0 > rank_tol * max(s0[0], 1e-300)))
    P0 = V0[:r0].conj().T @ V0[:r0]          # projector onto sector 0
    Us, s, Vs = np.linalg.svd(C)
    # C_i sits on bond i; its ROW space lives on the same bond basis as
    # AL[i]'s right leg (C_i = gauge at the right of site i)
    w0 = np.einsum("ik,ij,jk->k", Us.conj(), P0, Us).real
    sector = (w0 < 0.5).astype(int)          # 1 = tau
    p = s * s
    norm = float(np.sum(QDIMS[sector] * p))
    p = p / norm
    S = 0.0
    for a in (0, 1):
        pa = p[sector == a]
        pa = pa[pa > 1e-300]
        S -= QDIMS[a] * float(np.sum(pa * np.log(pa)))
    return S, {0: p[sector == 0], 1: p[sector == 1]}
