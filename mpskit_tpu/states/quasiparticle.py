"""Tangent-space quasiparticle states (reference
src/states/quasiparticle_state.jl).

A left-gauged QP carries ground states (left/right), left null spaces
VL_i of AL_i (AL^dag VL = 0), variational blocks X_i and a momentum; the
site excitation tensor is B_i = VL_i X_i, which automatically satisfies the
left gauge condition AL^dag B = 0. Trivial (non-topological) excitations
share left_gs = right_gs.

The X blocks are stacked (L, Dn, D) arrays, so the QP is a flat pytree that
plugs directly into the Krylov eigensolvers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..tensors.ops import leftnull
from .infinitemps import InfiniteMPS
from .finitemps import FiniteMPS


def null_spaces(ALs):
    """VLs (L, D, d, D(d-1)) for stacked left-isometric tensors."""
    return jax.vmap(leftnull)(ALs)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LeftGaugedQP:
    """Infinite quasiparticle state. momentum is the phase per site."""

    Xs: jnp.ndarray        # (L, D(d-1), D)
    VLs: jnp.ndarray       # (L, D, d, D(d-1))
    left_gs: InfiniteMPS
    right_gs: InfiniteMPS
    momentum: float        # static aux (hashable)
    trivial: bool          # static aux

    def tree_flatten(self):
        return (self.Xs, self.VLs, self.left_gs, self.right_gs), \
            (self.momentum, self.trivial)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   aux[0], aux[1])

    @property
    def period(self) -> int:
        return self.Xs.shape[0]

    def __len__(self):
        return self.period

    def bs(self):
        """Site excitation tensors B_i = VL_i X_i, (L, D, d, D)."""
        return jnp.einsum("ilpk,ikr->ilpr", self.VLs, self.Xs)

    @staticmethod
    def random(key, psi: InfiniteMPS, momentum: float = 0.0,
               right_gs: Optional[InfiniteMPS] = None) -> "LeftGaugedQP":
        right = right_gs if right_gs is not None else psi
        VLs = null_spaces(psi.AL)
        L, _, _, Dn = VLs.shape
        D = psi.D
        if jnp.issubdtype(psi.dtype, jnp.complexfloating):
            rdt = jnp.zeros((), psi.dtype).real.dtype
            k1, k2 = jax.random.split(key)
            Xs = (jax.random.normal(k1, (L, Dn, D), rdt)
                  + 1j * jax.random.normal(k2, (L, Dn, D), rdt)).astype(psi.dtype)
        else:
            Xs = jax.random.normal(key, (L, Dn, D), psi.dtype)
        Xs = Xs / jnp.linalg.norm(Xs)
        return LeftGaugedQP(Xs, VLs, psi, right, float(momentum),
                            right_gs is None)


def right_null_spaces(ARs):
    """VRs (L, D(d-1), d, D) for stacked right-isometric tensors."""
    from ..tensors.ops import rightnull

    return jax.vmap(rightnull)(ARs)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RightGaugedQP:
    """Infinite quasiparticle in the right gauge (reference
    src/states/quasiparticle_state.jl RightGaugedQP): B_i = X_i VR_i with
    VR_i the right null space of AR_i, so B_i AR_i^dag = 0 automatically.
    Obtained from a LeftGaugedQP via
    :func:`mpskit_tpu.states.qp_gauge.left_to_right_gauge`."""

    Xs: jnp.ndarray        # (L, D, D(d-1))
    VRs: jnp.ndarray       # (L, D(d-1), d, D)
    left_gs: InfiniteMPS
    right_gs: InfiniteMPS
    momentum: float        # static aux (hashable)
    trivial: bool          # static aux

    def tree_flatten(self):
        return (self.Xs, self.VRs, self.left_gs, self.right_gs), \
            (self.momentum, self.trivial)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   aux[0], aux[1])

    @property
    def period(self) -> int:
        return self.Xs.shape[0]

    def __len__(self):
        return self.period

    def bs(self):
        """Site excitation tensors B_i = X_i VR_i, (L, D, d, D)."""
        return jnp.einsum("ilk,ikpr->ilpr", self.Xs, self.VRs)


def finite_null_spaces(ALs, D: int, d: int):
    """Rank-aware null spaces for a padded finite MPS: per site the
    complement is taken within the *physically supported* (bl*d, br) block
    of AL (bl/br the nominal bond dims), zero-padded to a static width.
    Returns (VLs (L, D, d, Dn), mask (L, Dn, D))."""
    from .finitemps import physical_bond_dims

    L = ALs.shape[0]
    dims = physical_bond_dims(L, d, D)
    widths = [int(dims[i]) * d - int(dims[i + 1]) for i in range(L)]
    Dn = max(widths + [1])
    VLs, mask = [], jnp.zeros((L, Dn, D), bool)
    for i in range(L):
        bl, br = int(dims[i]), int(dims[i + 1])
        wi = widths[i]
        Vp = jnp.zeros((D, d, Dn), ALs.dtype)
        if wi > 0:
            M = ALs[i][:bl, :, :br].reshape(bl * d, br)
            Q, _ = jnp.linalg.qr(M, mode="complete")
            V = Q[:, br:].reshape(bl, d, wi)
            Vp = Vp.at[:bl, :, :wi].set(V)
            mask = mask.at[i, :wi, :br].set(True)
        VLs.append(Vp)
    return jnp.stack(VLs), mask


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FiniteQP:
    """Finite-chain quasiparticle (reference FiniteQP): B_i = VL_i X_i on a
    finite chain; left of B everything is AL, right of B everything is AR.
    `mask` marks the physically supported X entries (padded bonds near the
    chain ends have smaller tangent spaces)."""

    Xs: jnp.ndarray   # (L, Dn, D)
    VLs: jnp.ndarray  # (L, D, d, Dn)
    ALs: jnp.ndarray  # ground-state left gauge (all sites)
    ARs: jnp.ndarray  # ground-state right gauge (all sites)
    mask: jnp.ndarray  # (L, Dn, D) bool

    def tree_flatten(self):
        return (self.Xs, self.VLs, self.ALs, self.ARs, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def length(self):
        return self.Xs.shape[0]

    def bs(self):
        return jnp.einsum("ilpk,ikr->ilpr", self.VLs,
                          self.Xs * self.mask.astype(self.Xs.dtype))

    @staticmethod
    def random(key, psi: FiniteMPS) -> "FiniteQP":
        ALs, ARs = full_gauges(psi)
        VLs, mask = finite_null_spaces(ALs, psi.D, psi.physicaldim)
        L, _, _, Dn = VLs.shape
        D = psi.D
        if jnp.issubdtype(psi.dtype, jnp.complexfloating):
            rdt = jnp.zeros((), psi.dtype).real.dtype
            k1, k2 = jax.random.split(key)
            Xs = (jax.random.normal(k1, (L, Dn, D), rdt)
                  + 1j * jax.random.normal(k2, (L, Dn, D), rdt)).astype(psi.dtype)
        else:
            Xs = jax.random.normal(key, (L, Dn, D), psi.dtype)
        Xs = Xs * mask.astype(Xs.dtype)
        Xs = Xs / jnp.linalg.norm(Xs)
        return FiniteQP(Xs, VLs, ALs, ARs, mask)


def finite_right_null_spaces(ARs, D: int, d: int):
    """Rank-aware right null spaces for a padded finite MPS: per site the
    complement is taken within the supported (bl, d*br) block of AR.
    Returns (VRs (L, Dn, d, D), mask (L, D, Dn)) where mask marks the
    supported entries of the right-gauge parameters X (D, Dn)."""
    from .finitemps import physical_bond_dims

    L = ARs.shape[0]
    dims = physical_bond_dims(L, d, D)
    widths = [d * int(dims[i + 1]) - int(dims[i]) for i in range(L)]
    Dn = max(widths + [1])
    VRs, mask = [], jnp.zeros((L, D, Dn), bool)
    for i in range(L):
        bl, br = int(dims[i]), int(dims[i + 1])
        wi = widths[i]
        Vp = jnp.zeros((Dn, d, D), ARs.dtype)
        if wi > 0:
            M = ARs[i][:bl, :, :br].reshape(bl, d * br)
            Q, _ = jnp.linalg.qr(jnp.conj(M.T), mode="complete")
            V = jnp.conj(Q[:, bl:].T).reshape(wi, d, br)
            Vp = Vp.at[:wi, :, :br].set(V)
            mask = mask.at[i, :bl, :wi].set(True)
        VRs.append(Vp)
    return jnp.stack(VRs), mask


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FiniteQPRight:
    """Finite-chain quasiparticle in the right gauge: B_i = X_i VR_i with
    B_i AR_i^dag = 0 (counterpart of reference RightGaugedQP on finite
    chains). Same embedding |phi> = sum_n |AL...B_n...AR> as FiniteQP."""

    Xs: jnp.ndarray    # (L, D, Dn)
    VRs: jnp.ndarray   # (L, Dn, d, D)
    ALs: jnp.ndarray
    ARs: jnp.ndarray
    mask: jnp.ndarray  # (L, D, Dn) bool

    def tree_flatten(self):
        return (self.Xs, self.VRs, self.ALs, self.ARs, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def length(self):
        return self.Xs.shape[0]

    def bs(self):
        return jnp.einsum("ilk,ikpr->ilpr",
                          self.Xs * self.mask.astype(self.Xs.dtype),
                          self.VRs)


def qp_to_finitemps(qp) -> FiniteMPS:
    """Convert a finite quasiparticle state into a plain FiniteMPS
    (counterpart of reference src/states/quasiparticle_state.jl:246-341):
    |phi> = sum_n |AL...B_n...AR> is the MPS with block site tensors
    [[AL_n, B_n], [0, AR_n]] at bond dimension 2 D, entering in the AL
    block and leaving in the AR block."""
    L = qp.length
    D, d = qp.ALs.shape[1], qp.ALs.shape[2]
    Bs = qp.bs()
    Dn = 2 * D
    dtype = qp.ALs.dtype
    out = jnp.zeros((L, Dn, d, Dn), dtype)
    for n in range(L):
        out = out.at[n, :D, :, :D].set(qp.ALs[n])
        out = out.at[n, :D, :, D:].set(Bs[n])
        out = out.at[n, D:, :, D:].set(qp.ARs[n])
    # left boundary: physical bond index 0 lives in the AL block (global 0)
    first = out[0]
    first = first.at[D:, :, :].set(0.0)
    out = out.at[0].set(first)
    # right boundary: the walk must END in the AR block, whose physical
    # boundary index is D + 0 — remap it to global index 0
    last = jnp.zeros((Dn, d, Dn), dtype)
    last = last.at[:, :, 0].set(out[L - 1][:, :, D])
    out = out.at[L - 1].set(last)
    return FiniteMPS.from_tensors(out, normalize=False)


def full_gauges(psi: FiniteMPS):
    """(ALs, ARs) with every site's left/right-gauged tensor valid."""
    pl = psi.move_center(psi.length - 1)
    from ..tensors.ops import leftorth

    AL_last, _ = leftorth(pl.AC)
    ALs = pl.ALs.at[psi.length - 1].set(AL_last)
    pr = psi.move_center(0)
    from ..tensors.ops import rightorth

    _, AR_first = rightorth(pr.AC)
    ARs = pr.ARs.at[0].set(AR_first)
    return ALs, ARs
