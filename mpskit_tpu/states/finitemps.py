"""Finite matrix product states.

TPU-native redesign of the reference's `FiniteMPS`
(reference src/states/finitemps.jl): instead of four lazily-materialized
vectors of per-site tensors with `Union{Missing, T}` entries and mutable
gauge views (reference src/states/orthoview.jl), the state is an immutable
pytree of three *uniform-shape stacked arrays* plus a center index:

- ``ALs (L, D, d, D)``: left-orthonormal tensors, valid for sites < center
- ``ARs (L, D, d, D)``: right-orthonormal tensors, valid for sites > center
- ``AC (D, d, D)``: the center tensor

All virtual bonds are padded to a single static D (physical ranks near the
chain ends are smaller; the padding is exact zeros, which every algorithm
preserves — Krylov solves stay in the supported block because the boundary
environments are rank-1). Uniform shapes make sweeps `lax.scan`s and let the
bond dimension shard over a device mesh.
"""

from __future__ import annotations

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from ..tensors.ops import leftorth, rightorth


def physical_bond_dims(L: int, d: int, D: int) -> np.ndarray:
    """Maximal physical rank of bond i (left of site i), i = 0..L."""
    dims = [min(d**i, d ** (L - i), D) for i in range(L + 1)]
    return np.array(dims)


def support_mask(L: int, d: int, D: int) -> np.ndarray:
    """(L, D, d, D) boolean mask of the physically supported entries of a
    padded finite MPS. Multiplying the gauged tensors by this mask after
    every decomposition keeps the exact-zero padding invariant — essential
    in float32 on TPU, where low-precision matmuls and QR junk columns
    otherwise leak amplitude into the unsupported block (which then grows
    along the chain)."""
    dims = physical_bond_dims(L, d, D)
    mask = np.zeros((L, D, d, D), bool)
    for i in range(L):
        mask[i, : dims[i], :, : dims[i + 1]] = True
    return mask


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FiniteMPS:
    ALs: jnp.ndarray  # (L, D, d, D)
    ARs: jnp.ndarray  # (L, D, d, D)
    AC: jnp.ndarray   # (D, d, D)
    center: int       # static

    def tree_flatten(self):
        return (self.ALs, self.ARs, self.AC), (self.center,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    # ------------------------------------------------------------------
    @property
    def length(self) -> int:
        return self.ALs.shape[0]

    def __len__(self) -> int:
        return self.length

    @property
    def D(self) -> int:
        return self.ALs.shape[1]

    @property
    def physicaldim(self) -> int:
        return self.ALs.shape[2]

    @property
    def dtype(self):
        return self.AC.dtype

    # ------------------------------------------------------------------
    @staticmethod
    def from_tensors(As, normalize: bool = True) -> "FiniteMPS":
        """Build a right-canonical FiniteMPS (center = 0) from raw stacked
        site tensors As (L, D, d, D) whose padding is exact zeros."""
        L = As.shape[0]

        def body(carry, A):
            # sweep right-to-left: A <- A @ C, then split C', AR. The carry
            # is normalized per step: raw tensor norms otherwise multiply up
            # to ~|A|^L, overflowing float32 beyond ~20 sites. The true norm
            # is tracked in log space.
            C_right = carry
            A = jnp.einsum("lpm,mr->lpr", A, C_right)
            C, AR = rightorth(A)
            nrm = jnp.maximum(jnp.linalg.norm(C), 1e-30)
            return C / nrm, (AR, jnp.log(nrm))

        C0, (ARs, lognrms) = jax.lax.scan(
            body, jnp.eye(As.shape[1], dtype=As.dtype), As, reverse=True)
        AC = jnp.einsum("lm,mpr->lpr", C0, ARs[0])
        if normalize:
            AC = AC / jnp.maximum(jnp.linalg.norm(AC), 1e-30)
        else:
            AC = AC * jnp.exp(jnp.sum(lognrms)).astype(AC.dtype)
        return FiniteMPS(jnp.zeros_like(ARs), ARs, AC, 0)

    @staticmethod
    def from_dense(vec, d: int, D: int, dtype=None) -> "FiniteMPS":
        """Build a FiniteMPS from a dense state vector of length d^L via an
        SVD chain truncated to bond dimension D — the counterpart of the
        reference's `decompose_localmps` (src/utility/utility.jl:57-68) as
        used by the FiniteMPS-from-dense constructors. Host-side numpy
        (construction-time), padded to the framework's static D."""
        import numpy as np

        vec = np.asarray(vec)
        if dtype is not None:
            vec = vec.astype(dtype)
        n = vec.size
        L = int(round(np.log(n) / np.log(d)))
        assert d ** L == n, "vector length must be d^L"
        dims = physical_bond_dims(L, d, D)
        tensors = []
        carry = vec.reshape(1, n)
        kprev = 1
        for i in range(L - 1):
            M = carry.reshape(kprev * d, -1)
            U, S, Vh = np.linalg.svd(M, full_matrices=False)
            k = min(int(dims[i + 1]), S.shape[0])
            tensors.append(U[:, :k].reshape(kprev, d, k))
            carry = (S[:k, None] * Vh[:k]).reshape(k, -1)
            kprev = k
        tensors.append(carry.reshape(kprev, d, 1))
        As = np.zeros((L, D, d, D), vec.dtype)
        for i, t in enumerate(tensors):
            As[i, : t.shape[0], :, : t.shape[2]] = t
        return FiniteMPS.from_tensors(jnp.asarray(As))

    @staticmethod
    def random(key, L: int, d: int, D: int, dtype=jnp.complex128) -> "FiniteMPS":
        """Random finite MPS with exactly-zero padding outside the physical
        bond ranks (cf. reference src/states/finitemps.jl:143-221 capping
        virtual spaces at full rank)."""
        dims = physical_bond_dims(L, d, D)
        shape = (L, D, d, D)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            rdt = jnp.zeros((), dtype).real.dtype
            k1, k2 = jax.random.split(key)
            As = (jax.random.normal(k1, shape, rdt)
                  + 1j * jax.random.normal(k2, shape, rdt)).astype(dtype)
        else:
            As = jax.random.normal(key, shape, dtype)
        # mask to physical ranks
        mask = np.zeros(shape, bool)
        for i in range(L):
            mask[i, : dims[i], :, : dims[i + 1]] = True
        As = As * jnp.asarray(mask)
        return FiniteMPS.from_tensors(As)

    # ------------------------------------------------------------------
    def normalize(self) -> "FiniteMPS":
        n = jnp.linalg.norm(self.AC)
        return dataclasses.replace(self, AC=self.AC / jnp.maximum(n, 1e-30))

    def norm(self):
        return jnp.linalg.norm(self.AC)

    def move_center(self, i: int) -> "FiniteMPS":
        """Shift the orthogonality center to site i (host loop of QR steps,
        the functional counterpart of the reference's lazy orthoview
        gauge moves, src/states/orthoview.jl:49-79)."""
        psi = self
        while psi.center < i:
            AL, C = leftorth(psi.AC)
            ALs = psi.ALs.at[psi.center].set(AL)
            ACn = jnp.einsum("lm,mpr->lpr", C, psi.ARs[psi.center + 1])
            psi = FiniteMPS(ALs, psi.ARs, ACn, psi.center + 1)
        while psi.center > i:
            C, AR = rightorth(psi.AC)
            ARs = psi.ARs.at[psi.center].set(AR)
            ACn = jnp.einsum("lpm,mr->lpr", psi.ALs[psi.center - 1], C)
            psi = FiniteMPS(psi.ALs, ARs, ACn, psi.center - 1)
        return psi

    def site_tensor(self, i: int) -> jnp.ndarray:
        """The (gauge-dependent) tensor of site i: AL for i < center, AC at
        the center, AR for i > center."""
        if i < self.center:
            return self.ALs[i]
        if i > self.center:
            return self.ARs[i]
        return self.AC

    def bond_matrix(self) -> jnp.ndarray:
        """C to the right of the center site: AC = AL . C."""
        _, C = leftorth(self.AC)
        return C

    def __add__(self, other: "FiniteMPS") -> "FiniteMPS":
        """State addition by virtual-bond direct sum (reference
        src/states/finitemps.jl:375-443): block-diagonal bulk tensors with
        concatenated boundary rows/columns, re-gauged; the result lives at
        bond dimension D1 + D2 (pad/truncate afterwards if needed)."""
        L, d = self.length, self.physicaldim
        assert other.length == L and other.physicaldim == d
        D1, D2 = self.D, other.D
        Dn = D1 + D2
        a = self.move_center(0)
        b = other.move_center(0)
        As_a = [a.AC] + [a.ARs[i] for i in range(1, L)]
        As_b = [b.AC] + [b.ARs[i] for i in range(1, L)]
        out = jnp.zeros((L, Dn, d, Dn), jnp.result_type(self.dtype, other.dtype))
        for i in range(L):
            Ta, Tb = As_a[i], As_b[i]
            if i == 0:
                # boundary: both live on the same (padded index 0) left bond
                out = out.at[0, 0:1, :, :D1].set(Ta[0:1])
                out = out.at[0, 0:1, :, D1:].add(Tb[0:1])
            else:
                out = out.at[i, :D1, :, :D1].set(Ta)
                out = out.at[i, D1:, :, D1:].set(Tb)
        if L > 1:
            # right boundary: both blocks end on bond index 0 — fold the
            # second block's boundary column onto the first
            last = out[L - 1]
            col = last[:, :, D1]  # second block's boundary column (r=0 of it)
            last = last.at[:, :, 0].add(col)
            last = last.at[:, :, D1].set(0.0)
            out = out.at[L - 1].set(last)
        return FiniteMPS.from_tensors(out, normalize=False)

    def __mul__(self, a):
        return dataclasses.replace(self, AC=self.AC * a)

    __rmul__ = __mul__

    def dot(self, other: "FiniteMPS"):
        """<self | other> overlap (reference src/states/finitemps.jl:459)."""
        a = self.move_center(0)
        b = other.move_center(0)
        Aa = a.ARs.at[0].set(a.AC)
        Ab = b.ARs.at[0].set(b.AC)

        def body(v, xs):
            Ta, Tb = xs
            v = jnp.einsum("xy,xsm,ysn->mn", v, Ta.conj(), Tb)
            return v, None

        # only the (0, 0) entry is physical on the left boundary; the two
        # states may have different (static) bond dimensions
        dt = jnp.result_type(self.dtype, other.dtype)
        v0 = jnp.zeros((self.D, other.D), dt).at[0, 0].set(1.0)
        v, _ = jax.lax.scan(body, v0, (Aa.astype(dt), Ab.astype(dt)))
        return v[0, 0]
