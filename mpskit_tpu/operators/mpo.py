"""Matrix product operators.

`MPOHamiltonian` is the TPU-native counterpart of the reference's
SparseMPO/MPOHamiltonian pair (reference src/operators/sparsempo/sparsempo.jl,
src/operators/mpohamiltonian.jl): a Jordan-block / upper-triangular
finite-state-machine MPO. Instead of a sparse array of Union{scalar, tensor}
entries looped over in Julia, the FSM is stored as one dense stacked array
``W[i, a, b, s, t]`` (site, left FSM level, right FSM level, phys-out,
phys-in) so every contraction is a single batched einsum on the MXU; the
FSM *structure* (which entries are nonzero / identity / scalar) is kept as
static host-side metadata used to pick environment-solve strategies
(cf. reference src/environments/mpohaminfenv.jl:93-118) and to drive the
masked block-sparse Pallas kernel.

Conventions: upper-triangular FSM, level 0 = "identity to the left",
level w-1 = "identity to the right"; W[0,0] = W[w-1,w-1] = 1.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# local-operator decomposition (host-side, numpy)
# ----------------------------------------------------------------------------

def decompose_localmpo(O: np.ndarray, tol: float = 1e-12) -> List[np.ndarray]:
    """SVD-chain decomposition of an n-site operator into MPO tensors.

    O has shape (d,)*2n ordered [s1..sn, t1..tn] (outputs then inputs), or
    (d^n, d^n). Returns tensors T_i of shape (k_{i-1}, d, d, k_i) with
    k_0 = k_n = 1, such that contracting the chain reproduces O.
    (Counterpart of reference src/utility/utility.jl:42-54.)
    """
    O = np.asarray(O)
    if O.ndim == 2:
        dn = O.shape[0]
        n = 1
        d = dn
        # infer n assuming smallest prime-ish d? caller should pass full-shape
        # arrays for n > 1; a square matrix is treated as n-site with d
        # inferred only when explicitly reshaped by the caller.
        O = O.reshape(dn, dn)
        return [O.reshape(1, dn, dn, 1)]
    n = O.ndim // 2
    d = O.shape[0]
    # reorder to (s1, t1, s2, t2, ...)
    perm = [i // 2 + (i % 2) * n for i in range(2 * n)]
    M = O.transpose(perm).reshape(1, *([d, d] * n))

    tensors = []
    carry = M.reshape(1 * d * d, -1)
    kprev = 1
    for i in range(n - 1):
        U, S, Vh = np.linalg.svd(carry.reshape(kprev * d * d, -1),
                                 full_matrices=False)
        rank = int(np.sum(S > tol * max(S[0], 1e-30)))
        rank = max(rank, 1)
        U, S, Vh = U[:, :rank], S[:rank], Vh[:rank, :]
        tensors.append(U.reshape(kprev, d, d, rank))
        carry = (S[:, None] * Vh).reshape(rank * d * d, -1)
        kprev = rank
    tensors.append(carry.reshape(kprev, d, d, 1))
    return tensors


# ----------------------------------------------------------------------------
# MPOHamiltonian
# ----------------------------------------------------------------------------

# classification of FSM diagonal blocks for infinite environment solves
DIAG_ZERO = 0
DIAG_IDENTITY = 1
DIAG_SCALAR = 2
DIAG_GENERAL = 3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MPOHamiltonian:
    """Upper-triangular FSM MPO Hamiltonian.

    W: (L, w, w, d, d) complex/real array, W[i, a, b, s, t].
    The structure fields are static (hashable) host-side metadata.
    """

    W: jnp.ndarray
    nonzero_mask: Tuple[Tuple[bool, ...], ...]  # (w, w), static, any-site union
    diag_class: Tuple[int, ...]                 # per level, product over cell
    diag_scalar: Tuple[complex, ...]            # scalar value for DIAG_SCALAR
    # per-site auxiliary abelian charges fused onto the physical legs
    # (set by add_physical_charge; consumed by symmetry.charges masks)
    aux_charges: Tuple[int, ...] = ()

    # -- pytree plumbing ------------------------------------------------
    def tree_flatten(self):
        return (self.W,), (self.nonzero_mask, self.diag_class,
                           self.diag_scalar, self.aux_charges)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    # -- properties ------------------------------------------------------
    @property
    def period(self) -> int:
        return self.W.shape[0]

    @property
    def odim(self) -> int:
        return self.W.shape[1]

    @property
    def physicaldim(self) -> int:
        return self.W.shape[3]

    @property
    def dtype(self):
        return self.W.dtype

    def site(self, i) -> jnp.ndarray:
        """FSM tensor of site i (periodic)."""
        return self.W[i % self.period]

    # -- constructors ------------------------------------------------------
    @staticmethod
    def _analyze(W: np.ndarray) -> "MPOHamiltonian":
        """Build static structure metadata from a concrete (numpy) FSM array."""
        L, w = W.shape[0], W.shape[1]
        d = W.shape[3]
        eye = np.eye(d)
        nz = np.zeros((w, w), bool)
        for a in range(w):
            for b in range(w):
                if np.max(np.abs(W[:, a, b])) > 1e-14:
                    nz[a][b] = True
        diag_class = []
        diag_scalar = []
        for a in range(w):
            # product of diagonal scalars across the unit cell
            kind = DIAG_IDENTITY
            coeff = 1.0 + 0.0j
            for i in range(L):
                blk = W[i, a, a]
                if np.max(np.abs(blk)) <= 1e-14:
                    kind = DIAG_ZERO
                    break
                # proportional to identity?
                c = np.trace(blk) / d
                if np.max(np.abs(blk - c * eye)) <= 1e-14 * max(1.0, abs(c)):
                    coeff *= c
                else:
                    kind = DIAG_GENERAL
                    break
            if kind == DIAG_IDENTITY:
                if abs(coeff - 1.0) > 1e-14:
                    kind = DIAG_SCALAR
            diag_class.append(kind)
            diag_scalar.append(complex(coeff) if kind in (DIAG_IDENTITY, DIAG_SCALAR) else 0.0j)
        return MPOHamiltonian(
            jnp.asarray(W),
            tuple(tuple(bool(x) for x in row) for row in nz),
            tuple(diag_class),
            tuple(diag_scalar),
        )

    @staticmethod
    def from_dense_W(W) -> "MPOHamiltonian":
        """From a raw (L, w, w, d, d) FSM array (host or device)."""
        return MPOHamiltonian._analyze(np.asarray(W))

    @staticmethod
    def from_local(O, period: int = 1, dtype=None) -> "MPOHamiltonian":
        """From an n-site local operator, summed over all (periodic) sites —
        the counterpart of `MPOHamiltonian(::TensorMap)` (reference
        src/operators/mpohamiltonian.jl:16). O has shape (d,)*2n.

        The finite-chain convention matches the reference: H = sum over all
        length-n windows fully inside the chain.
        """
        O = np.asarray(O)
        if dtype is not None:
            O = O.astype(dtype)
        tensors = decompose_localmpo(O)
        n = len(tensors)
        d = tensors[0].shape[1]
        ks = [t.shape[3] for t in tensors[:-1]]  # interior bond ranks
        w = 2 + sum(ks)
        W = np.zeros((1, w, w, d, d), O.dtype)
        W[0, 0, 0] = np.eye(d)
        W[0, w - 1, w - 1] = np.eye(d)
        if n == 1:
            W[0, 0, w - 1] += tensors[0][0, :, :, 0]
        else:
            offsets = [1]
            for k in ks[:-1]:
                offsets.append(offsets[-1] + k)
            # first tensor: 0 -> block 1
            for j in range(ks[0]):
                W[0, 0, offsets[0] + j] = tensors[0][0, :, :, j]
            # middle tensors: block i -> block i+1
            for i in range(1, n - 1):
                for jj in range(ks[i - 1]):
                    for mm in range(ks[i]):
                        W[0, offsets[i - 1] + jj, offsets[i] + mm] = \
                            tensors[i][jj, :, :, mm]
            # last tensor: block n-1 -> end
            for jj in range(ks[-1]):
                W[0, offsets[-1] + jj, w - 1] = tensors[-1][jj, :, :, 0]
        W = np.tile(W, (period, 1, 1, 1, 1))
        return MPOHamiltonian._analyze(W)

    @staticmethod
    def from_fsm(entries: dict, w: int, d: int, period: int = 1,
                 dtype=np.complex128) -> "MPOHamiltonian":
        """From a dict {(site, a, b): matrix-or-scalar} (scalars mean
        scalar * identity), the counterpart of the raw 3D-array constructor
        (reference src/operators/mpohamiltonian.jl:13 and
        docs/src/man/operators.md:47-59)."""
        W = np.zeros((period, w, w, d, d), dtype)
        for (i, a, b), v in entries.items():
            if np.isscalar(v):
                W[i, a, b] = v * np.eye(d)
            else:
                W[i, a, b] = np.asarray(v)
        return MPOHamiltonian._analyze(W)

    # -- algebra (reference src/operators/mpohamiltonian.jl:78-156) -------
    def __add__(self, other):
        if np.isscalar(other):
            # per-site energy shift on the (0, end) block
            Wn = np.asarray(self.W).copy()
            d = self.physicaldim
            for i in range(self.period):
                Wn[i, 0, -1] += other * np.eye(d)
            return MPOHamiltonian._analyze(Wn)
        if isinstance(other, MPOHamiltonian):
            assert self.period == other.period and self.physicaldim == other.physicaldim
            L, w1, _, d, _ = self.W.shape
            w2 = other.odim
            w = w1 + w2 - 2
            Wn = np.zeros((L, w, w, d, d), np.result_type(self.W.dtype, other.W.dtype))
            W1 = np.asarray(self.W)
            W2 = np.asarray(other.W)
            # index map: H1 mid -> 1..w1-2 ; H2 mid -> w1-1..w-2
            def m1(a):
                return 0 if a == 0 else (w - 1 if a == w1 - 1 else a)
            def m2(a):
                return 0 if a == 0 else (w - 1 if a == w2 - 1 else a + w1 - 2)
            for i in range(L):
                for a in range(w1):
                    for b in range(w1):
                        Wn[i, m1(a), m1(b)] += W1[i, a, b]
                for a in range(w2):
                    for b in range(w2):
                        # don't double-count the two shared identity blocks
                        if (a, b) in ((0, 0), (w2 - 1, w2 - 1)):
                            continue
                        Wn[i, m2(a), m2(b)] += W2[i, a, b]
            return MPOHamiltonian._analyze(Wn)
        return NotImplemented

    __radd__ = __add__

    def __sub__(self, other):
        return self + (other * (-1.0) if isinstance(other, MPOHamiltonian) else -other)

    def __mul__(self, a):
        """Scalar multiplication: every FSM path passes exactly one transition
        into the final level, so scaling the last column scales H."""
        Wn = np.asarray(self.W).copy()
        Wn[:, :-1, -1] *= a
        return MPOHamiltonian._analyze(Wn)

    __rmul__ = __mul__

    def __matmul__(self, other: "MPOHamiltonian") -> "MPOHamiltonian":
        """MPO product H1 @ H2 (apply H2 first): FSM tensor product with
        fused virtual levels (reference src/operators/mpohamiltonian.jl:156,
        sparsempo.jl:232-264 — here without re-compression)."""
        assert self.period == other.period and self.physicaldim == other.physicaldim
        L, w1, _, d, _ = self.W.shape
        w2 = other.odim
        W1 = np.asarray(self.W)
        W2 = np.asarray(other.W)
        Wn = np.einsum("iabst,icdtu->iacbdsu", W1, W2).reshape(
            L, w1 * w2, w1 * w2, d, d)
        return MPOHamiltonian._analyze(Wn)

    def repeat(self, n: int) -> "MPOHamiltonian":
        W = np.tile(np.asarray(self.W), (n, 1, 1, 1, 1))
        return MPOHamiltonian._analyze(W)

    def conj(self) -> "MPOHamiltonian":
        return MPOHamiltonian._analyze(np.conj(np.transpose(np.asarray(self.W),
                                                            (0, 1, 2, 4, 3))))

    def remove_orphans(self) -> "MPOHamiltonian":
        """Dead-branch elimination (reference sparsempo.jl:310-349):
        iteratively zero FSM levels that are dead starts (all-zero row at a
        site kills the feeding column at the previous site) or dead ends
        (all-zero column kills the fed row at the next site), then drop
        levels that are dead at every site."""
        W = np.array(self.W)
        tol = 1e-14
        while True:
            L, w = W.shape[0], W.shape[1]
            dead_start = np.ones(w, bool)
            dead_end = np.ones(w, bool)
            for loc in range(L):
                for i in range(w):
                    row_zero = np.max(np.abs(W[loc, i, :])) <= tol
                    col_zero = np.max(np.abs(W[loc, :, i])) <= tol
                    if row_zero:
                        W[(loc - 1) % L, :, i] = 0.0
                    else:
                        dead_start[i] = False
                    if col_zero:
                        W[(loc + 1) % L, i, :] = 0.0
                    else:
                        dead_end[i] = False
            removable = dead_start | dead_end
            if not removable.any():
                break
            keep = np.nonzero(~removable)[0]
            W = W[:, keep][:, :, keep]
        return MPOHamiltonian._analyze(W)

    def add_physical_charge(self, charges) -> "MPOHamiltonian":
        """Fuse a one-dimensional abelian auxiliary charge onto the
        physical leg of each site (reference sparsempo.jl:353-379,
        mpohamiltonian.jl:167). In the masked-dense backend every auxiliary
        space is one-dimensional, so the FSM numbers are unchanged — the
        shift is bookkeeping consumed by the symmetric-state constructors
        (see symmetry.charges: the site-i conservation rule becomes
        c_left + q_phys + aux[i] == c_right)."""
        charges = tuple(int(c) for c in charges)
        from math import gcd

        Lc = len(charges)
        L = self.period
        period = L * Lc // gcd(L, Lc)
        W = np.asarray(self.W)
        W_tiled = np.tile(W, (period // L, 1, 1, 1, 1))
        out = MPOHamiltonian._analyze(W_tiled)
        aux = tuple(charges[i % Lc] for i in range(period))
        return dataclasses.replace(out, aux_charges=aux)

    def to_densempo(self, L: int, tol: float = 1e-12) -> "DenseMPO":
        """Finite-chain conversion MPOHamiltonian -> DenseMPO with SVD bond
        compression — the counterpart of the reference's
        `convert(DenseMPO, SparseMPO)` (sparsempo.jl:282-308): the FSM is
        embedded densely (boundary vectors absorbed into the edge tensors)
        and every virtual bond is truncated below `tol`, which strips the
        FSM's zero blocks and shrinks the ragged edge bonds (w grows
        1, ..., w, ..., 1 near open boundaries)."""
        W = np.asarray(self.W)
        w, d = self.odim, self.physicaldim
        data = [np.array(W[i % self.period]) for i in range(L)]
        data[0] = data[0][:1]          # left boundary selects level 0
        data[-1] = data[-1][:, -1:]    # right boundary selects level w-1
        return DenseMPO(tuple(jnp.asarray(o) for o in data)).compress(tol)

    # -- dense matrix (test oracle) ---------------------------------------
    def to_matrix(self, L: int) -> np.ndarray:
        """Full 2^L-by-2^L (d^L) Hamiltonian matrix for exact
        diagonalization cross-checks. Host-side, small L only."""
        W = np.asarray(self.W)
        w, d = self.odim, self.physicaldim
        E = np.zeros((w, 1, 1), W.dtype)
        E[0, 0, 0] = 1.0
        for i in range(L):
            Wi = W[i % self.period]
            dim = E.shape[1]
            E = np.einsum("aST,abst->bSsTt", E, Wi).reshape(
                w, dim * d, dim * d)
        return E[-1]


# ----------------------------------------------------------------------------
# DenseMPO
# ----------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DenseMPO:
    """Dense (statmech / evolution-operator) MPO: per-site tensors
    O[i][a, b, s, t] (reference src/operators/densempo.jl). For uniform
    bond dimension the tensors are stacked into one (L, w, w, d, d) array;
    finite MPOs with ragged edge bonds keep a tuple of arrays.
    """

    Os: Tuple[jnp.ndarray, ...]

    def tree_flatten(self):
        return tuple(self.Os), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children))

    @property
    def period(self) -> int:
        return len(self.Os)

    def site(self, i) -> jnp.ndarray:
        return self.Os[i % self.period]

    @staticmethod
    def from_array(O, period: int = 1) -> "DenseMPO":
        """O: (w, w, d, d) single-site tensor (or list of them)."""
        if isinstance(O, (list, tuple)):
            return DenseMPO(tuple(jnp.asarray(o) for o in O))
        O = jnp.asarray(O)
        return DenseMPO(tuple([O] * period))

    def stacked_uniform(self, dtype=None) -> "jnp.ndarray":
        """(L, w, w, d, d) array with ragged edge virtual legs zero-padded
        into a uniform width (valid entries at the leading indices; finite
        boundary vectors select index 0 on both ends)."""
        wmax = max(max(o.shape[0], o.shape[1]) for o in self.Os)
        d = self.Os[0].shape[2]
        dt = dtype or self.Os[0].dtype
        out = jnp.zeros((len(self.Os), wmax, wmax, d, d), dt)
        for i, o in enumerate(self.Os):
            out = out.at[i, : o.shape[0], : o.shape[1]].set(o.astype(dt))
        return out

    def compress(self, tol: float = 1e-12) -> "DenseMPO":
        """SVD compression of the virtual bonds (reference
        convert(DenseMPO, SparseMPO), sparsempo.jl:282-308: a left-to-right
        pass truncating each right bond below `tol`, then a right-to-left
        pass on the left bonds). Host-side numpy; returns a DenseMPO with
        (possibly ragged) reduced virtual dimensions."""
        data = [np.asarray(o) for o in self.Os]
        L = len(data)

        def trunc_svd(M):
            U, S, Vh = np.linalg.svd(M, full_matrices=False)
            keep = S > tol * max(S[0], 1e-300)
            r = max(int(keep.sum()), 1)
            return U[:, :r], S[:r], Vh[:r]

        # L2R: compress the right virtual leg, push S V into the next site
        for i in range(L):
            a, b, ds, dt = data[i].shape
            M = data[i].transpose(0, 2, 3, 1).reshape(a * ds * dt, b)
            U, S, Vh = trunc_svd(M)
            r = S.shape[0]
            data[i] = U.reshape(a, ds, dt, r).transpose(0, 3, 1, 2)
            nxt = (i + 1) % L
            data[nxt] = np.einsum("rb,bcst->rcst", S[:, None] * Vh,
                                  data[nxt])
        # R2L: compress the left virtual leg, push U S into the previous
        for i in range(L - 1, -1, -1):
            a, b, ds, dt = data[i].shape
            M = data[i].reshape(a, b * ds * dt)
            U, S, Vh = trunc_svd(M)
            r = S.shape[0]
            data[i] = Vh.reshape(r, b, ds, dt)
            prv = (i - 1) % L
            data[prv] = np.einsum("abst,br->arst", data[prv],
                                  U * S[None, :])
        return DenseMPO(tuple(jnp.asarray(o) for o in data))

    def __matmul__(self, other: "DenseMPO") -> "DenseMPO":
        assert self.period == other.period
        out = []
        for i in range(self.period):
            O1, O2 = self.Os[i], other.Os[i]
            w1l, w1r = O1.shape[0], O1.shape[1]
            w2l, w2r = O2.shape[0], O2.shape[1]
            d = O1.shape[2]
            O = jnp.einsum("abst,cdtu->acbdsu", O1, O2).reshape(
                w1l * w2l, w1r * w2r, d, d)
            out.append(O)
        return DenseMPO(tuple(out))


# ----------------------------------------------------------------------------
# DenseMPO <-> InfiniteMPS conversion (reference densempo.jl:18-28)
# ----------------------------------------------------------------------------

def mpo_to_mps(O: DenseMPO) -> "InfiniteMPS":
    """convert(InfiniteMPS, DenseMPO): fuse the two physical legs of each
    W[a, b, s, t] into one p = (s, t) MPS leg (reference densempo.jl:18-22;
    the braiding tau is trivial in the plain dense case). The result is
    regauged, so only the state (ray) is preserved — use `mps_to_mpo` for
    the inverse."""
    from ..states.infinitemps import InfiniteMPS

    As = []
    for i in range(O.period):
        Oi = O.site(i)
        a, b, s, t = Oi.shape
        As.append(jnp.transpose(Oi, (0, 2, 3, 1)).reshape(a, s * t, b))
    return InfiniteMPS.from_A(jnp.stack(As))


def mps_to_mpo(psi: "InfiniteMPS", d: int) -> DenseMPO:
    """convert(DenseMPO, InfiniteMPS): split the fused physical leg of the
    left-gauged tensors back into (phys-out, phys-in) MPO legs (reference
    densempo.jl:24-28)."""
    Os = []
    for i in range(psi.period):
        A = psi.AL[i]
        D1, p, D2 = A.shape
        assert p == d * d, "physical leg is not a fused d*d MPO leg"
        Os.append(jnp.transpose(A.reshape(D1, d, d, D2), (0, 3, 1, 2)))
    return DenseMPO(tuple(Os))
