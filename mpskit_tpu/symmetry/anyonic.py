"""Generic anyonic infinite MPS over the fusion-path basis, for ANY
multiplicity-free unitary fusion category — the general-category
counterpart of the Fibonacci backend (symmetry/fibonacci.py), and the
TPU-native stand-in for the reference's anyonic `TensorMap` index sectors
(TensorKit `Vect[FibonacciAnyon]`-style spaces, used e.g. in
reference examples/classic2d/1.hard-hexagon).

The new capability over the Fibonacci backend is **per-bond sector
labels** (`category.chain_bond_labels`): when the fusion graph of the
chain anyon is k-partite the height sectors alternate around the unit
cell — e.g. the Ising σ chain, whose heights live on {1, ψ} and {σ} on
alternating bonds — and no uniform static split exists. Masks are per
site/bond and ride the standard masking hooks of the VUMPS iteration
(`algorithms/vumps._vumps_iteration`), exactly like the abelian
alternating-parity sectors of `symmetry/charges.py`.

Entanglement readouts use the quantum trace per bond
(`category.quantum_schmidt` / `quantum_entropy`).

Scope note (measured, see tests/test_anyonic_vumps.py): in the FLAT
height-tensor-basis embedding the Schmidt vectors of an anyonic chain's
ground state are generally NOT height-pure — a right path segment
starting at height h_1 ∈ a⊗x pairs with left segments ending at several
different a, so the reduced density matrix mixes sectors (unlike the
true anyonic frame, where the cut carries a charge line and Schmidt
sectors are exact). Consequently:

  * where the fusion graph FORCES the sector structure (k-partite
    graphs, e.g. the Ising σ chain), the masked class is exact and
    converges to the true energy — this is the case that needs per-bond
    labels and that dense states cannot mask uniformly;
  * for uniform-sector critical chains (e.g. the golden chain), a
    sector-masked bond of dimension D is strictly weaker than a dense
    bond of the same D (cross-sector Schmidt mixing is disallowed), and
    masked VUMPS stalls above the dense-optimal energy. Use the plain
    dense path (`find_groundstate` on `models.golden_chain()`) there —
    the admissible-path sector is an exact invariant of the MPO either
    way.

There is deliberately NO masked 1-SITE FINITE-DMRG counterpart. The
masked manifold double-encodes the height h_i — as the physical index
p_i AND as the sector of the bond right of site i — but a one-site MPO
update only acts on p: the sector-projected local H_eff keeps exactly
the height-diagonal terms, so a masked finite sweep freezes in a
classical height configuration (measured: σ chain pins at
E = -(L-2)·3/4 with all site solves "converged"). The abelian backend
avoids this because its FSM levels carry the compensating charge
offsets (`aux_charges`), making H_eff commute with the masks; the
anyonic chain MPO's SVD-built FSM does not. The infinite 1-site driver
escapes it because project-AFTER-solve plus fresh environments realign
p against the bond sectors across iterations.

TWO-site updates do not freeze: the middle bond of the window is
re-created by the split, so the height and its bond sector change
together. `symmetry/anyonic_finite.py` provides the sector-resolved
finite DMRG2 and infinite IDMRG2 built on that observation (per-sector
row-block SVDs with dynamic bond allocation — the true-anyonic-frame
counterpart of the reference's symmetric `tsvd!`); use those for masked
finite chains and for uniform-sector infinite chains. The plain dense
path (tests/test_category.py, examples/14) remains available and its
admissible-path sector is exactly invariant."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .category import (
    FusionCategory, chain_masks, chain_bond_labels, quantum_schmidt,
    quantum_entropy,
)


@dataclasses.dataclass(frozen=True)
class AnyonicInfiniteMPS:
    """Uniform MPS over the height basis of a chain of anyons `anyon` in
    category `cat`: dense state + static per-bond sector labels
    (labels[i] labels the bond right of site i)."""

    state: object                        # InfiniteMPS
    cat: FusionCategory
    anyon: int
    labels: Tuple[Tuple[int, ...], ...]  # (L, D)

    @property
    def masks(self):
        return chain_masks(self.cat, self.anyon,
                           np.asarray(self.labels, int),
                           self.state.period)

    @staticmethod
    def random(key, cat: FusionCategory, anyon: int, D: int, L: int,
               seed: Tuple[int, ...] | None = None,
               dtype=jnp.float64) -> "AnyonicInfiniteMPS":
        """Random masked start. `seed` pins bond 0's allowed sector set
        (see `chain_bond_labels`); the default uses the stationary
        support, which for k-partite fusion graphs mixes the sublattice
        classes — pass a seed to select one (e.g. `seed=(1,)` starts the
        Ising σ chain on a σ bond)."""
        from ..states.infinitemps import InfiniteMPS

        labels = chain_bond_labels(cat, anyon, D, L, seed=seed)
        A_mask, C_mask = chain_masks(cat, anyon, labels, L)
        A = jax.random.normal(key, (L, D, cat.n, D), dtype)
        A = A * jnp.asarray(A_mask)
        psi = InfiniteMPS.from_A(A)
        Am = jnp.asarray(A_mask).astype(dtype)
        Cm = jnp.asarray(C_mask).astype(dtype)
        psi = InfiniteMPS(psi.AL * Am, psi.AR * Am, psi.AC * Am,
                          psi.C * Cm)
        return AnyonicInfiniteMPS(psi, cat, int(anyon),
                                  tuple(tuple(int(x) for x in row)
                                        for row in labels))

    def schmidt(self, bond: int = 0):
        """{sector: probabilities} of bond `bond` under the quantum
        trace."""
        return quantum_schmidt(
            self.cat, np.asarray(self.labels[bond % self.state.period]),
            np.asarray(self.state.C[bond % self.state.period]))

    def entropy(self, bond: int = 0) -> float:
        """Quantum-trace entanglement entropy of bond `bond`."""
        return quantum_entropy(
            self.cat, np.asarray(self.labels[bond % self.state.period]),
            np.asarray(self.state.C[bond % self.state.period]))


def find_groundstate_anyonic(spsi: AnyonicInfiniteMPS, H, alg=None):
    """Sector-masked VUMPS on a height-basis chain MPO (e.g.
    `models.anyon_chain(cat, x)`): the per-bond masks are re-applied at
    every gauge/update step, so the state stays exactly in the
    fusion-path sector. Returns (AnyonicInfiniteMPS, envs, eps)."""
    from ..algorithms.vumps import VUMPS, _vumps_iteration
    from ..environments.infinite_ham import hamiltonian_environments
    from ..states.infinitemps import InfiniteMPS
    from ..utils.dynamictols import updatetol
    from ..utils.logging import IterLog
    from ..config import VERBOSE_ITER, matmul_precision

    if alg is None:
        alg = VUMPS()
    psi = spsi.state
    A_mask, C_mask = spsi.masks
    A_mask = jnp.asarray(A_mask)
    C_mask = jnp.asarray(C_mask)
    log = IterLog("VUMPS(anyonic)", alg.verbosity)
    eps = 1.0
    env_guess = None
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        with matmul_precision(psi.dtype):
            psi, eps, env_guess, diag = _vumps_iteration(
                psi, H, alg.krylovdim, alg.eig_maxrestarts, alg.gauge_tol,
                1e-12, inner_tol, A_mask=A_mask, C_mask=C_mask,
                env_guess=env_guess)
        eps = float(eps)
        log.solver_warn(it, diag, float(inner_tol))
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, 0.0, eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, 0.0, eps)
    # final re-canonicalization (iterations regauge locally) + re-mask
    psi = InfiniteMPS.from_AL(psi.AL, psi.C[psi.period - 1],
                              tol=alg.gauge_tol)
    Am = A_mask.astype(psi.AL.dtype)
    Cm = C_mask.astype(psi.C.dtype)
    psi = InfiniteMPS(psi.AL * Am, psi.AR * Am, psi.AC * Am, psi.C * Cm)
    envs = hamiltonian_environments(psi, H, env_init=env_guess)
    return dataclasses.replace(spsi, state=psi), envs, eps
