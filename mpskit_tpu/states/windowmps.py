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

    def grow(self, n_left: int = 0, n_right: int = 0) -> "WindowMPS":
        """Absorb n_left / n_right unit cells of the infinite sides into
        the window (the growing-window dynamics of reference
        windowmps.jl — expand when correlations reach the window edge).
        The absorbed tensors are exact copies of the ground-state AL / AR
        cells, so the physical state is unchanged; only the mutable region
        gets larger. Static bond dimension is kept, so each distinct
        window length compiles once."""
        win = self.window
        Dw, d = win.D, win.physicaldim
        dtype = win.dtype

        def _pad(A, D_in):
            out = jnp.zeros((Dw, d, Dw), dtype)
            return out.at[:D_in, :, :D_in].set(A.astype(dtype))

        # left absorbed sites are valid ALs; their ARs (and the right
        # absorbed sites' ALs) are placeholders — FiniteMPS gauge moves
        # recompute them from AC before they are ever read
        new_ALs = [
            _pad(self.left_gs.AL[i % self.left_gs.period], self.left_gs.D)
            for i in range(n_left * self.left_gs.period)]
        new_ARs_l = [
            _pad(self.left_gs.AR[i % self.left_gs.period], self.left_gs.D)
            for i in range(n_left * self.left_gs.period)]
        add_ARs = [
            _pad(self.right_gs.AR[i % self.right_gs.period], self.right_gs.D)
            for i in range(n_right * self.right_gs.period)]
        add_ALs = [
            _pad(self.right_gs.AL[i % self.right_gs.period], self.right_gs.D)
            for i in range(n_right * self.right_gs.period)]

        parts_al = ([jnp.stack(new_ALs)] if new_ALs else []) + [win.ALs] + \
            ([jnp.stack(add_ALs)] if add_ALs else [])
        parts_ar = ([jnp.stack(new_ARs_l)] if new_ARs_l else []) + \
            [win.ARs] + ([jnp.stack(add_ARs)] if add_ARs else [])
        ALs = jnp.concatenate(parts_al, axis=0)
        ARs = jnp.concatenate(parts_ar, axis=0)
        center = win.center + len(new_ALs)
        window = FiniteMPS(ALs, ARs, win.AC, center)
        return WindowMPS(self.left_gs, window, self.right_gs)

    def shrink(self, n_left: int = 0, n_right: int = 0):
        """Drop n_left / n_right sites from the window edges, handing them
        back to the infinite boundaries. Exact only when the dropped
        tensors equal the boundary ground-state cells (e.g. sites added by
        :meth:`grow`, or edges that have relaxed back to the ground
        state); the returned `deviation` is the Frobenius norm of the
        difference, i.e. the truncation error of the move. Combining
        `grow` on the leading edge with `shrink` on the trailing edge
        gives a co-moving window (reference windowmps.jl dynamics)."""
        win = self.window
        L = win.length
        Dw, d = win.D, win.physicaldim
        dtype = win.dtype
        assert n_left + n_right < L
        # gauge so dropped left sites are ALs and dropped right sites ARs
        c = min(max(win.center, n_left), L - 1 - n_right)
        win = win.move_center(c)
        ALs, ARs, AC = win.ALs, win.ARs, win.AC

        def _pad(A, D_in):
            out = jnp.zeros((Dw, d, Dw), dtype)
            return out.at[:D_in, :, :D_in].set(A.astype(dtype))

        dev = jnp.zeros((), ALs.real.dtype)
        # a dropped tensor generally equals the boundary cell only up to a
        # bond gauge (move_center re-gauges with qr_pos); extract the gauge
        # U = ref^dag A, fold it into the neighbour, and report only the
        # genuine physical deviation |A - ref U|
        pl = self.left_gs.period
        U = jnp.eye(Dw, dtype=dtype)
        for i in range(n_left):
            ref = _pad(self.left_gs.AL[i % pl], self.left_gs.D)
            eff = jnp.einsum("ab,bpr->apr", U, ALs[i])
            U = jnp.einsum("lpa,lpb->ab", jnp.conj(ref), eff)
            dev = dev + jnp.linalg.norm(
                eff - jnp.einsum("lpa,ab->lpb", ref, U)) ** 2
        pr = self.right_gs.period
        V = jnp.eye(Dw, dtype=dtype)
        for i in range(n_right):
            ref = _pad(self.right_gs.AR[(-1 - i) % pr], self.right_gs.D)
            eff = jnp.einsum("apr,rb->apb", ARs[L - 1 - i], V)
            V = jnp.einsum("apr,bpr->ab", eff, jnp.conj(ref))
            dev = dev + jnp.linalg.norm(
                eff - jnp.einsum("ab,bpr->apr", V, ref)) ** 2
        dev = jnp.sqrt(dev)

        sl = slice(n_left, L - n_right)
        ALs, ARs = ALs[sl], ARs[sl]
        # fold the accumulated gauges into the new edge tensors / AC
        if n_left:
            ALs = ALs.at[0].set(jnp.einsum("ab,bpr->apr", U, ALs[0]))
            if c == n_left:
                AC = jnp.einsum("ab,bpr->apr", U, AC)
            else:
                ARs = ARs.at[0].set(jnp.einsum("ab,bpr->apr", U, ARs[0]))
        if n_right:
            last = L - n_right - n_left - 1
            ARs = ARs.at[last].set(
                jnp.einsum("apr,rb->apb", ARs[last], V))
            if c == L - 1 - n_right:
                AC = jnp.einsum("apr,rb->apb", AC, V)
            else:
                ALs = ALs.at[last].set(
                    jnp.einsum("apr,rb->apb", ALs[last], V))
        window = FiniteMPS(ALs, ARs, AC, c - n_left)
        return WindowMPS(self.left_gs, window, self.right_gs), dev

    def boundary_envs(self, H, H_right=None, env_init=(None, None),
                      return_envs=False):
        """(GL0, GRL) boundary environments of the window: left/right
        infinite fixed points padded to the window bond dimension
        (cf. reference FinEnv.jl:84-89 seeding window envs).

        H_right: operator for the right boundary when it differs from the
        left one (Window-operator evolution). env_init warm-starts the two
        geometric-series solves; with return_envs=True the full infinite
        env objects are returned as well (for reuse across time steps)."""
        from ..environments.infinite_ham import hamiltonian_environments

        envL = hamiltonian_environments(self.left_gs, H, env_init=env_init[0])
        envR = hamiltonian_environments(self.right_gs, H_right or H,
                                        env_init=env_init[1])
        w = envL.GLs.shape[1]
        Dw = self.D
        GL0 = jnp.zeros((w, Dw, Dw), self.dtype)
        GL0 = GL0.at[:, : self.left_gs.D, : self.left_gs.D].set(envL.GLs[0])
        GRL = jnp.zeros((w, Dw, Dw), self.dtype)
        GRL = GRL.at[:, : self.right_gs.D, : self.right_gs.D].set(
            envR.GRs[self.right_gs.period - 1])
        if return_envs:
            return GL0, GRL, envL, envR
        return GL0, GRL
