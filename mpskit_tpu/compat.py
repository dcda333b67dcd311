"""Reference-name compatibility surface.

Every public export of the reference (src/MPSKit.jl:16-55) is reachable
from `mpskit_tpu` under its reference name; this module provides the
pieces whose idiomatic home in the TPU-first design carries a different
name (or that exist only for porting convenience). See docs/parity.md
for the full export-by-export map, including the names that are
deliberately N/A under the functional design (mutating `!` variants,
`poison!`, `recalculate!`, `Cache`).

Dense-array notes: a "space" in the reference is a TensorKit vector
space; in the dense TPU backend it is an integer dimension, so the
`*_virtualspace` / `physicalspace` accessors return ints (for padded
finite states: the SUPPORTED rank of the padded static-D bond, cf.
states/finitemps.py support_mask).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .states.finitemps import FiniteMPS, physical_bond_dims
from .states.infinitemps import InfiniteMPS
from .states.gauging import uniform_leftorth, uniform_rightorth  # noqa: F401
from .utils.periodic import PeriodicArray, PeriodicVector  # noqa: F401
from .transfermatrix.transfer import (  # noqa: F401
    transfer_left, transfer_right, transfer_left_mpo, transfer_right_mpo,
)

# type aliases (reference abstractmps.jl:5-8 exports MPSTensor): every
# MPS/MPO/bond tensor in the dense backend is a jnp.ndarray with the
# documented index conventions (docs/conventions.md)
MPSTensor = jnp.ndarray
MPSBondTensor = jnp.ndarray
MPOTensor = jnp.ndarray


# ---------------------------------------------------------------------------
# TransferMatrix (reference src/transfermatrix/transfermatrix.jl:4-40)


@dataclasses.dataclass(frozen=True)
class TransferMatrix:
    """Lazy single-site (or stacked multi-site) transfer operator.

    `ket`/`bra` are site tensors (D, d, D) — or unit-cell stacks
    (L, D, d, D), applied left-to-right — with an optional MPO middle `W`
    (w, w, d, d). Calling applies the operator to an environment-shaped
    vector from the LEFT; `flip()` reverses direction (reference `flip`,
    transfermatrix.jl:36-40). This is porting-convenience sugar over the
    raw kernels `transfer_left`/`transfer_right` that the hot paths use
    directly (everything inside jit calls the kernels)."""

    ket: jnp.ndarray
    bra: jnp.ndarray
    W: jnp.ndarray | None = None
    flipped: bool = False

    def flip(self) -> "TransferMatrix":
        return dataclasses.replace(self, flipped=not self.flipped)

    def _sites(self):
        ket = self.ket[None] if self.ket.ndim == 3 else self.ket
        bra = self.bra[None] if self.bra.ndim == 3 else self.bra
        if self.W is None:
            Ws = [None] * ket.shape[0]
        else:
            Ws = self.W[None] if self.W.ndim == 4 else self.W
        return ket, bra, Ws

    def __call__(self, v):
        ket, bra, Ws = self._sites()
        order = range(ket.shape[0])
        if self.flipped:
            for i in reversed(list(order)):
                v = (transfer_right(v, ket[i], bra[i]) if Ws[i] is None
                     else transfer_right_mpo(v, Ws[i], ket[i], bra[i]))
            return v
        for i in order:
            v = (transfer_left(v, ket[i], bra[i]) if Ws[i] is None
                 else transfer_left_mpo(v, Ws[i], ket[i], bra[i]))
        return v

    def __mul__(self, other: "TransferMatrix") -> "TransferMatrix":
        """Stack two single-direction transfers (product acts this-then-
        other from the left, matching operator composition order of the
        reference's ProductTransferMatrix)."""
        assert self.flipped == other.flipped and (
            (self.W is None) == (other.W is None))
        cat = lambda a, b: jnp.concatenate(  # noqa: E731
            [a[None] if a.ndim in (3, 4) else a,
             b[None] if b.ndim in (3, 4) else b], axis=0)
        W = None if self.W is None else cat(self.W, other.W)
        return TransferMatrix(cat(self.ket, other.ket),
                              cat(self.bra, other.bra), W, self.flipped)


# ---------------------------------------------------------------------------
# environments / leftenv / rightenv (reference environments(ψ,O),
# FinEnv.jl / mpohaminfenv.jl / permpoinfenv.jl)


def environments(psi, O, **kwargs):
    """Environment cache of <psi| O |psi> — dispatching constructor
    (reference `environments`). Finite states get a `FiniteEnv` (GL/GR
    stacks); InfiniteMPS + MPOHamiltonian the GMRES geometric-series
    `InfiniteHamEnv`; InfiniteMPS/MPSMultiline + DenseMPO the dominant-
    eigenvector `InfiniteMPOEnv`."""
    from .operators.mpo import MPOHamiltonian, DenseMPO
    from .states.multiline import MPSMultiline

    if isinstance(psi, FiniteMPS):
        from .environments.finite import finite_environments

        return finite_environments(psi, O, **kwargs)
    if isinstance(psi, InfiniteMPS) and isinstance(O, MPOHamiltonian):
        from .environments.infinite_ham import hamiltonian_environments

        return hamiltonian_environments(psi, O, **kwargs)
    if isinstance(psi, (InfiniteMPS, MPSMultiline)) and isinstance(
            O, DenseMPO):
        from .environments.infinite_mpo import mpo_environments

        return mpo_environments(psi, O, **kwargs)
    raise TypeError(
        f"no environments for ({type(psi).__name__}, {type(O).__name__});"
        " build the specific cache from mpskit_tpu.environments directly")


def leftenv(envs, i: int, psi=None):
    """GL at site i (reference `leftenv(envs, i, ψ)`; the ψ argument is
    accepted for signature parity and ignored — environments here are
    immutable, never stale)."""
    return envs.leftenv(i)


def rightenv(envs, i: int, psi=None):
    """GR at site i (reference `rightenv(envs, i, ψ)`)."""
    return envs.rightenv(i)


# ---------------------------------------------------------------------------
# utility accessors (reference utility/utility.jl, states/finitemps.jl)


def add_util_leg(op) -> jnp.ndarray:
    """Promote a 1-site operator (d_out, d_in) to an MPO site tensor
    W[a, b, s, t] with trivial (dim-1) virtual legs (reference
    utility/utility.jl:70-77)."""
    op = jnp.asarray(op)
    assert op.ndim == 2
    return op[None, None]


def max_Ds(psi: FiniteMPS) -> np.ndarray:
    """Maximal possible virtual dimension at each of the L+1 bonds given
    the physical spaces, capped at the state's static D (reference
    states/finitemps.jl:297-303). Equals the supported rank of each
    padded bond."""
    return physical_bond_dims(psi.length, psi.physicaldim, psi.D)


def left_virtualspace(psi, i: int = 0) -> int:
    """Dimension of the virtual space left of site i (supported rank for
    padded finite states; the static D for infinite states)."""
    if isinstance(psi, FiniteMPS):
        return int(max_Ds(psi)[i])
    return int(psi.D)


def right_virtualspace(psi, i: int = -1) -> int:
    """Dimension of the virtual space right of site i."""
    if isinstance(psi, FiniteMPS):
        return int(max_Ds(psi)[i % psi.length + 1])
    return int(psi.D)


def physicalspace(psi, i: int = 0) -> int:
    """Physical dimension at site i."""
    return int(psi.physicaldim)


# ---------------------------------------------------------------------------
# excitations (reference effective_excitation_hamiltonian, export list
# src/MPSKit.jl:33; quasiparticleexcitation.jl:234-334)


def effective_excitation_hamiltonian(H, qp, envs=None, right_envs=None,
                                     env_tol: float = 1e-10):
    """Apply the quasiparticle effective Hamiltonian (H_eff − E_gs) to a
    LeftGaugedQP, returning a new QP with updated X blocks — the operator
    the QP eigensolve iterates (reference
    src/algorithms/excitation/quasiparticleexcitation.jl:39-50)."""
    from .algorithms.excitations import (
        _qp_matvec_infinite, _renorm_energies_infinite)
    from .environments.infinite_ham import hamiltonian_environments

    if envs is None:
        envs = hamiltonian_environments(qp.left_gs, H)
    if right_envs is None and qp.right_gs is not qp.left_gs:
        right_envs = hamiltonian_environments(qp.right_gs, H)
    GLs = envs.GLs
    GRs = (right_envs or envs).GRs
    E_left = _renorm_energies_infinite(qp.left_gs, H, envs)
    if right_envs is not None:
        E_right = _renorm_energies_infinite(qp.right_gs, H, right_envs)
        Es = (E_left + E_right) / 2
    else:
        Es = E_left
    Xs = _qp_matvec_infinite(qp.Xs, qp, H, GLs, GRs, Es, env_tol)
    return dataclasses.replace(qp, Xs=Xs)
