"""Window MPS: a finite, mutable window embedded in an infinite background
(reference src/states/windowmps.jl:38-51). The window's boundary
environments are the fixed points of the infinite sides, so local physics
inside the window sees the true infinite system.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .finitemps import FiniteMPS
from .infinitemps import InfiniteMPS


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowMPS:
    left_gs: InfiniteMPS
    window: FiniteMPS
    right_gs: InfiniteMPS

    def tree_flatten(self):
        return (self.left_gs, self.window, self.right_gs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def length(self) -> int:
        return self.window.length

    def __len__(self):
        return self.length

    @property
    def D(self) -> int:
        return self.window.D

    @property
    def dtype(self):
        return self.window.dtype

    @staticmethod
    def from_infinite(psi: InfiniteMPS, L: int, D: int = None) -> "WindowMPS":
        """Cut a length-L window out of an infinite state (reference
        windowmps.jl:99-111). The window tensors start as copies of the
        infinite unit cell; D defaults to (at least) the infinite D."""
        Dw = max(D or psi.D, psi.D)
        p = psi.period
        d = psi.physicaldim
        ARs = jnp.zeros((L, Dw, d, Dw), psi.dtype)
        for i in range(L):
            ARs = ARs.at[i, : psi.D, :, : psi.D].set(psi.AR[i % p])
        AC = jnp.zeros((Dw, d, Dw), psi.dtype).at[: psi.D, :, : psi.D].set(
            psi.AC[0])
        ALs = jnp.zeros_like(ARs)
        for i in range(L):
            ALs = ALs.at[i, : psi.D, :, : psi.D].set(psi.AL[i % p])
        window = FiniteMPS(ALs, ARs, AC, 0)
        return WindowMPS(psi, window, psi)

    def boundary_envs(self, H):
        """(GL0, GRL) boundary environments of the window: left/right
        infinite fixed points padded to the window bond dimension
        (cf. reference FinEnv.jl:84-89 seeding window envs)."""
        from ..environments.infinite_ham import hamiltonian_environments

        envL = hamiltonian_environments(self.left_gs, H)
        envR = hamiltonian_environments(self.right_gs, H)
        w = envL.GLs.shape[1]
        Dw = self.D
        Din = self.left_gs.D
        GL0 = jnp.zeros((w, Dw, Dw), self.dtype)
        GL0 = GL0.at[:, :Din, :Din].set(envL.GLs[0])
        GRL = jnp.zeros((w, Dw, Dw), self.dtype)
        GRL = GRL.at[:, :Din, :Din].set(envR.GRs[self.right_gs.period - 1])
        return GL0, GRL
