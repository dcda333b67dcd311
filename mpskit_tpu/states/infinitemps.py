"""Uniform (infinite) matrix product states in mixed canonical form.

Counterpart of the reference's `InfiniteMPS` (reference
src/states/infinitemps.jl): AL/AR/AC/C over a periodic unit cell, with
constructors that gauge-fix raw tensors through the fixed-point iteration
in states/gauging.py. The unit cell is a leading axis of stacked arrays
(the reference's PeriodicVector becomes index arithmetic + jnp.roll).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import Defaults
from .gauging import uniform_leftorth, uniform_rightorth


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class InfiniteMPS:
    """AL, AR, AC: (L, D, d, D); C: (L, D, D) with C[i] the bond matrix to
    the *right* of site i (reference src/states/infinitemps.jl:46-50);
    C[L-1] is the bond between unit cells."""

    AL: jnp.ndarray
    AR: jnp.ndarray
    AC: jnp.ndarray
    C: jnp.ndarray

    def tree_flatten(self):
        return (self.AL, self.AR, self.AC, self.C), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def period(self) -> int:
        return self.AL.shape[0]

    def __len__(self) -> int:
        return self.period

    @property
    def D(self) -> int:
        return self.AL.shape[1]

    @property
    def physicaldim(self) -> int:
        return self.AL.shape[2]

    @property
    def dtype(self):
        return self.AL.dtype

    # ------------------------------------------------------------------
    @staticmethod
    def from_A(A, tol: float = Defaults.tolgauge) -> "InfiniteMPS":
        """Gauge-fix raw unit-cell tensors A (L, D, d, D)
        (reference src/states/infinitemps.jl:139-206)."""
        D = A.shape[1]
        C0 = jnp.eye(D, dtype=A.dtype)
        AL, _, _ = uniform_leftorth(A, C0, tol)
        return InfiniteMPS.from_AL(AL, tol=tol)

    @staticmethod
    def from_AL(AL, C0=None, tol: float = Defaults.tolgauge) -> "InfiniteMPS":
        """Complete the mixed gauge from left-isometric tensors."""
        D = AL.shape[1]
        if C0 is None:
            C0 = jnp.eye(D, dtype=AL.dtype)
        AR, C, _ = uniform_rightorth(AL, C0, tol)
        AC = jnp.einsum("ilpm,imr->ilpr", AL, C)
        return InfiniteMPS(AL, AR, AC, C)

    @staticmethod
    def random(key, L: int, d: int, D: int, dtype=jnp.complex128) -> "InfiniteMPS":
        shape = (L, D, d, D)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            rdt = jnp.zeros((), dtype).real.dtype
            k1, k2 = jax.random.split(key)
            A = (jax.random.normal(k1, shape, rdt)
                 + 1j * jax.random.normal(k2, shape, rdt)).astype(dtype)
        else:
            A = jax.random.normal(key, shape, dtype)
        return InfiniteMPS.from_A(A)

    def repeat(self, n: int) -> "InfiniteMPS":
        """Tile the unit cell n times (reference PeriodicArray repeat)."""
        return InfiniteMPS(
            jnp.tile(self.AL, (n, 1, 1, 1)),
            jnp.tile(self.AR, (n, 1, 1, 1)),
            jnp.tile(self.AC, (n, 1, 1, 1)),
            jnp.tile(self.C, (n, 1, 1)),
        )

    # ------------------------------------------------------------------
    # mixed-gauge fixed points (reference src/states/infinitemps.jl:300-358:
    # l_LL/r_RR etc.). Index convention: [bra, ket].
    def rho_right(self, i) -> jnp.ndarray:
        """Right cap at the bond right of site i: fixed point of the AL
        transfer from the right. rho[m, n] = sum_k conj(C[i])[m,k] C[i][n,k]."""
        Ci = self.C[i % self.period]
        return jnp.einsum("mk,nk->mn", Ci.conj(), Ci)

    def rho_left(self, i) -> jnp.ndarray:
        """Left cap at the bond right of site i: fixed point of the AR
        transfer from the left. rho[m, n] = sum_k conj(C[i])[k,m] C[i][k,n]."""
        Ci = self.C[i % self.period]
        return jnp.einsum("km,kn->mn", Ci.conj(), Ci)

    def rho_rights(self) -> jnp.ndarray:
        return jnp.einsum("imk,ink->imn", self.C.conj(), self.C)

    def rho_lefts(self) -> jnp.ndarray:
        return jnp.einsum("ikm,ikn->imn", self.C.conj(), self.C)

    # ------------------------------------------------------------------
    # the eight reference-named fixed points (src/states/infinitemps.jl:
    # 300-358): dominant eigenvectors of the four gauge combinations of
    # the unit-cell transfer matrix, all closed forms in C. Convention:
    # [bra, ket] like rho_left/rho_right; `i` is the SITE the boundary
    # attaches to (left caps sit on the bond left of site i, right caps
    # on the bond right of site i), matching the reference's `loc`.
    def l_LL(self, i: int = 0) -> jnp.ndarray:
        """Left fixed point of the AL–AL transfer: identity."""
        return jnp.eye(self.D, dtype=self.dtype)

    def l_RR(self, i: int = 0) -> jnp.ndarray:
        """Left fixed point of the AR–AR transfer: C†C at the left bond."""
        return self.rho_left(i - 1)

    def l_RL(self, i: int = 0) -> jnp.ndarray:
        """Left fixed point of the mixed transfer with AR on the ket and
        AL on the bra layer: C at the left bond ([bra, ket] layout)."""
        return self.C[(i - 1) % self.period]

    def l_LR(self, i: int = 0) -> jnp.ndarray:
        """Left fixed point of the mixed transfer with AL on the ket and
        AR on the bra layer: C† at the left bond ([bra, ket] layout)."""
        return self.C[(i - 1) % self.period].conj().T

    def r_RR(self, i: int = -1) -> jnp.ndarray:
        """Right fixed point of the AR–AR transfer: identity."""
        return jnp.eye(self.D, dtype=self.dtype)

    def r_LL(self, i: int = -1) -> jnp.ndarray:
        """Right fixed point of the AL–AL transfer: CC† at the right bond."""
        return self.rho_right(i)

    def r_RL(self, i: int = -1) -> jnp.ndarray:
        """Right fixed point of the mixed transfer with AR on the ket and
        AL on the bra layer: conj(C) at the right bond ([bra, ket]
        layout; the reference's C† becomes an elementwise conj because
        our pairing `einsum('xy,xy->')` is transpose-free)."""
        return self.C[i % self.period].conj()

    def r_LR(self, i: int = -1) -> jnp.ndarray:
        """Right fixed point of the mixed transfer with AL on the ket and
        AR on the bra layer: Cᵀ at the right bond ([bra, ket] layout)."""
        return self.C[i % self.period].T
