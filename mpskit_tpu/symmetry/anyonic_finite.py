"""Finite anyonic chains in the sector-resolved ("true anyonic") frame:
two-site DMRG over height-basis MPS whose bond i carries the fusion-path
charge h_i, with dynamic per-sector bond allocation — the TPU-native
counterpart of the reference running DMRG2 over anyonic `TensorMap`s
(TensorKit `Vect[FibonacciAnyon]` sectors, cf. reference
examples/classic2d/1.hard-hexagon/main.jl:7-8 and the symmetric `tsvd!`
truncation in src/algorithms/groundstate/dmrg.jl:96-137).

Why two-site: the 1-site masked update freezes (the height is double-
encoded as the physical index AND the bond sector, and a 1-site H_eff
restricted to the masked manifold keeps only height-diagonal terms — see
the scope note in `symmetry/anyonic.py`). A TWO-site window changes the
height and its bond sector *together*: the middle bond of the window is
re-created by the split, so every Hamiltonian term acts within the class
and the freeze disappears.

Frame correctness (why flat contractions are exact here). The fusion-path
basis is orthonormal, so full-state inner products are flat. Bond slots
are labeled by the path charge; site tensors decompose into blocks
B^{q→p} (left sector q, height p ∈ q ⊗ x, right sector = p). Two facts
make the padded flat algebra exact on the masked manifold:

  * left isometries are EXACTLY flat: columns of the split's left factor
    have sector-disjoint row support (each row (l, p₁) belongs to the
    single middle sector p₁), so per-sector orthonormal columns are
    globally orthonormal;
  * right tensors are per-block isometric (Σ_p B^{q p} B^{q p †} = I_q) but
    NOT flat-isometric — the cross-sector Gram junk Σ_p B^{q p} B^{q' p †}
    (q ≠ q') is generally nonzero and CANNOT be gauged away inside the
    class (sector-preserving gauges are block-diagonal). It is benign:
    contracting the right tail against itself reads only same-sector
    blocks of the downstream Gram matrix (bra and ket share the physical
    height at every site), so by induction every sector-diagonal block is
    exactly I and the cross blocks never enter any physical contraction.
    The Lanczos metric is therefore the identity and the two-site
    eigenvalue is the exact variational energy.

The split is NOT a plain block SVD (unlike the abelian `_sector_split`):
middle-sector blocks share columns (several q fuse into the same p₂), but
they have disjoint ROWS, so the optimal masked split is an independent
SVD of each middle-sector ROW block over all of its columns, with the
global top-D Schmidt values selecting the sector allocation — error
contributions add because the row blocks span orthogonal subspaces.

Everything here also works for arbitrary-multiplicity categories
(`MultiplicityCategory`, N[a,b,c] > 1 — TensorKit's general case): the
physical index becomes q = (h, μ) with μ < N[h_prev, x, h] the vertex
multiplicity, dimension n·m per site; bond labels remain plain heights
(the path charge), and the row-block split groups rows by height over
all multiplicity copies. Multiplicity-free categories are the m = 1
special case.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .category import FusionCategory, quantum_schmidt, quantum_entropy


# ---------------------------------------------------------------------------
# category introspection: FusionCategory is the m=1 case of the
# multiplicity layer — every helper below works for both, with the
# physical index q = h·m + μ (height, vertex multiplicity)


def _cat_nm(cat) -> Tuple[int, int, np.ndarray]:
    """(n_sectors, max_multiplicity, N) for FusionCategory (m = 1) or
    MultiplicityCategory (m = N.max())."""
    m = int(getattr(cat, "mmax", 1))
    return cat.n, m, np.asarray(cat.N, int)


# ---------------------------------------------------------------------------
# static bond-sector allocation


def anyon_bond_labels_finite(cat: FusionCategory, x: int, D: int, L: int,
                             left: int = 0,
                             right: int | None = None) -> List[np.ndarray]:
    """Per-bond sector labels for the L+1 bonds of a finite chain of L
    anyons x: bond i (i = 0..L) carries the fusion-path charge after i
    anyons, with slot multiplicities proportional to the path weight
    fwd·bwd (a Fibonacci/transfer count), capped at min(paths, D).

    Bond 0 is the boundary charge `left` (default: vacuum) with one live
    slot; bond L is pinned to `right` (default: the lowest-quantum-
    dimension sector reachable in L steps — what `anyon_chain_finite`
    pins via penalties, here enforced exactly by the masks, like fixing
    the fusion-tree boundary sector of a TensorKit `TensorMap`).
    Dead slots carry label -1. Works for multiplicity categories too:
    path counts weight each step by the vertex multiplicity N[a,x,b]."""
    n, _, N = _cat_nm(cat)
    fwd = [dict() for _ in range(L + 1)]
    fwd[0][left] = 1.0
    for i in range(L):
        for a, cnt in fwd[i].items():
            for b in cat.fuse(a, x):
                fwd[i + 1][b] = fwd[i + 1].get(b, 0.0) + cnt * N[a, x, b]
    if right is None:
        right = min(fwd[L], key=lambda a: (cat.qdim[a], a))
    right = int(right)
    if right not in fwd[L]:
        raise ValueError(f"sector {right} unreachable in {L} steps from "
                         f"{left}")
    bwd = [dict() for _ in range(L + 1)]
    bwd[L][right] = 1.0
    for i in range(L - 1, -1, -1):
        for a in range(n):
            tot = 0.0
            for b in cat.fuse(a, x):
                tot += bwd[i + 1].get(b, 0.0) * N[a, x, b]
            if tot:
                bwd[i][a] = tot

    labels = []
    for i in range(L + 1):
        live = sorted(set(fwd[i]) & set(bwd[i]))
        bound = {q: min(fwd[i][q], bwd[i][q]) for q in live}
        lab = np.full(D, -1, int)
        if not bound:
            raise ValueError(f"no admissible sectors at bond {i}")
        if sum(bound.values()) <= D:
            alloc = {q: int(b) for q, b in bound.items()}
        else:
            weights = {q: fwd[i][q] * bwd[i][q] for q in bound}
            totw = sum(weights.values())
            alloc = {q: min(int(bound[q]),
                            max(1, int(np.floor(D * weights[q] / totw))))
                     for q in bound}
            while sum(alloc.values()) > D:
                q = min((c for c in alloc if alloc[c] > 0),
                        key=lambda c: weights[c])
                alloc[q] -= 1
            order = sorted(bound, key=lambda q: -weights[q])
            guard = 0
            while sum(alloc.values()) < D and guard < 10 * D:
                guard += 1
                grew = False
                for q in order:
                    if alloc.get(q, 0) < bound[q] and sum(alloc.values()) < D:
                        alloc[q] += 1
                        grew = True
                if not grew:
                    break
        pos = 0
        for q in sorted(alloc, key=lambda q: (-alloc[q], q)):
            m = alloc[q]
            lab[pos: pos + m] = q
            pos += m
        labels.append(lab)
    return labels


def anyon_masks_finite(cat: FusionCategory, x: int,
                       labels: List[np.ndarray]) -> np.ndarray:
    """(L, D, n·m, D) boolean site masks: A_j[(l), q=(h,μ), (r)] is
    admissible iff the left slot is live, μ < N[label(l), x, h], and the
    right slot carries exactly h (bond sector = height of the site to
    its left). m = 1 for multiplicity-free categories."""
    L = len(labels) - 1
    D = labels[0].shape[0]
    n, m, N = _cat_nm(cat)
    hq = np.repeat(np.arange(n), m)                 # q -> h
    mq = np.tile(np.arange(m), n)                   # q -> μ
    masks = np.zeros((L, D, n * m, D), bool)
    for j in range(L):
        cl, cr = labels[j], labels[j + 1]
        okl = cl >= 0
        adm = np.zeros((D, n * m), bool)            # μ < N[cl[l], x, h]
        adm[okl] = mq[None, :] < N[cl[okl]][:, x][:, hq]
        masks[j] = adm[:, :, None] & (hq[None, :, None]
                                      == cr[None, None, :]) & \
            (cr >= 0)[None, None, :]
    return masks


def anyon_theta_mask(cat: FusionCategory, x: int, cl: np.ndarray,
                     cr: np.ndarray) -> np.ndarray:
    """(D, n·m, n·m, D) two-site window mask: μ₁ < N[label(l), x, h₁],
    μ₂ < N[h₁, x, h₂], and the right slot carries exactly h₂."""
    D = cl.shape[0]
    n, m, N = _cat_nm(cat)
    hq = np.repeat(np.arange(n), m)
    mq = np.tile(np.arange(m), n)
    okl = cl >= 0
    adm1 = np.zeros((D, n * m), bool)               # (l, q1)
    adm1[okl] = mq[None, :] < N[cl[okl]][:, x][:, hq]
    adm2 = mq[None, :] < N[hq][:, x][:, hq]         # (q1, q2)
    right = (hq[:, None] == cr[None, :]) & (cr >= 0)[None, :]  # (q2, r)
    return (adm1[:, :, None, None] & adm2[None, :, :, None]
            & right[None, None, :, :])


# ---------------------------------------------------------------------------
# the sector-resolved two-site split


def anyon_split(theta: np.ndarray, cl: np.ndarray, cr: np.ndarray,
                cat: FusionCategory, x: int, D: int):
    """Split a masked two-site tensor theta (D, n·m, n·m, D) at its
    middle bond: independent SVD of each middle-sector ROW block (rows
    (l, q₁=(h₁,μ₁)) with h₁ = q and μ₁ < N[label(l), x, q]; columns are
    the block's admissible (q₂, r) set), then global top-D Schmidt
    selection across sectors. m = 1 for multiplicity-free categories.

    Returns (AL (D,d,D) flat-left-isometric, S (D,), AR (D,d,D) per-block
    right-isometric (d = n·m the physical dimension), labels_mid (D,),
    err). The truncation error is exact (row blocks are orthogonal
    subspaces)."""
    n, m, N = _cat_nm(cat)
    d = n * m
    M = theta.reshape(D * d, d * D)
    total2 = float(np.vdot(M, M).real)
    live_l = np.where(cl >= 0)[0]
    blocks = {}
    for q in range(n):
        ri = np.array([l * d + q * m + mu for l in live_l
                       for mu in range(N[cl[l], x, q])], int)
        if len(ri) == 0:
            continue
        ci = np.array([(h2 * m + mu2) * D + r
                       for h2 in cat.fuse(q, x)
                       for mu2 in range(N[q, x, h2])
                       for r in np.where(cr == h2)[0]], int)
        if len(ci) == 0:
            continue
        Mq = M[np.ix_(ri, ci)]
        U, s, Vh = np.linalg.svd(Mq, full_matrices=False)
        keep = int(np.sum(s > 1e-14 * max(1.0, s[0] if len(s) else 0.0)))
        if keep:
            blocks[q] = (ri, ci, U, s[:keep], Vh)
    allvals = sorted(((float(sv), q, k) for q, (_, _, _, svals, _) in
                      blocks.items() for k, sv in enumerate(svals)),
                     reverse=True)
    counts: Dict[int, int] = {}
    for _, q, _ in allvals[:D]:
        counts[q] = counts.get(q, 0) + 1
    labels_mid = np.full(D, -1, int)
    AL = np.zeros((D * d, D), theta.dtype)
    AR = np.zeros((D, d * D), theta.dtype)
    S = np.zeros(D, theta.real.dtype if np.iscomplexobj(theta)
                 else theta.dtype)
    pos, kept2 = 0, 0.0
    for q in sorted(counts, key=lambda q: (-counts[q], q)):
        m = counts[q]
        ri, ci, U, sv, Vh = blocks[q]
        labels_mid[pos: pos + m] = q
        AL[np.ix_(ri, range(pos, pos + m))] = U[:, :m]
        AR[np.ix_(range(pos, pos + m), ci)] = Vh[:m]
        S[pos: pos + m] = sv[:m]
        kept2 += float(np.sum(sv[:m] ** 2))
        pos += m
    err = float(np.sqrt(max(total2 - kept2, 0.0) / max(total2, 1e-300)))
    S = S / max(float(np.linalg.norm(S)), 1e-30)
    return (AL.reshape(D, d, D), S, AR.reshape(D, d, D), labels_mid, err)


# ---------------------------------------------------------------------------
# state container


@dataclasses.dataclass(frozen=True)
class AnyonicFiniteMPS:
    """Finite MPS of a chain of anyons `anyon` in `cat`, in the
    sector-resolved frame: dense padded state + static per-bond sector
    labels (labels[i] = path charge of bond i; -1 = dead slot). Boundary
    charges are fixed by construction (bond 0 and bond L each have one
    live sector), so no pinning penalties are needed."""

    state: object                        # FiniteMPS
    cat: FusionCategory
    anyon: int
    labels: Tuple[np.ndarray, ...]       # L+1 arrays of shape (D,)
    schmidt_values: Tuple[np.ndarray, ...] | None = None   # per bond 1..L-1

    @property
    def masks(self) -> np.ndarray:
        return anyon_masks_finite(self.cat, self.anyon, list(self.labels))

    @staticmethod
    def random(key, cat: FusionCategory, anyon: int, D: int, L: int,
               left: int = 0, right: int | None = None,
               dtype=jnp.float64) -> "AnyonicFiniteMPS":
        """Masked random start in right-canonical form. Right tensors are
        per-left-sector row-orthonormalized on the host (the flat LQ
        gauge move would mix sectors — see the module docstring)."""
        from ..states.finitemps import FiniteMPS

        labels = anyon_bond_labels_finite(cat, anyon, D, L, left, right)
        masks = anyon_masks_finite(cat, anyon, labels)
        n, m, _ = _cat_nm(cat)
        d = n * m
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        rng = np.random.default_rng(seed)
        npdt = np.dtype(jnp.zeros((), dtype).dtype.name)
        ARs = np.zeros((L, D, d, D), npdt)
        for j in range(L):
            A = rng.normal(size=(D, d, D)).astype(npdt)
            if np.issubdtype(npdt, np.complexfloating):
                A = A + 1j * rng.normal(size=(D, d, D)).astype(npdt)
            A = A * masks[j]
            M = A.reshape(D, d * D)
            for q in sorted(set(labels[j][labels[j] >= 0].tolist())):
                rows = np.where(labels[j] == q)[0]
                blk = M[rows]
                U, s, Vh = np.linalg.svd(blk, full_matrices=False)
                r = int(np.sum(s > 1e-12 * max(1.0, s[0] if len(s) else 0)))
                newb = np.zeros_like(blk)
                newb[:r] = Vh[:r]
                M[rows] = newb
            ARs[j] = M.reshape(D, d, D)
        AC = (rng.normal(size=(D, d, D)) * masks[0]).astype(npdt)
        AC /= max(np.linalg.norm(AC), 1e-30)
        psi = FiniteMPS(jnp.zeros((L, D, d, D), dtype),
                        jnp.asarray(ARs, dtype), jnp.asarray(AC, dtype), 0)
        return AnyonicFiniteMPS(psi, cat, int(anyon),
                                tuple(np.asarray(l) for l in labels))

    def schmidt(self, bond: int) -> Dict[int, np.ndarray]:
        """{sector: probabilities} of bond `bond` (1..L-1) under the
        quantum trace, from the last sweep's Schmidt values (dead pad
        slots excluded)."""
        S, lab = self._live_bond(bond)
        return quantum_schmidt(self.cat, lab, np.diag(S))

    def entropy(self, bond: int) -> float:
        """Quantum-trace entanglement entropy of bond `bond` — what the
        reference's `entropy` computes for anyonic sectors."""
        S, lab = self._live_bond(bond)
        return quantum_entropy(self.cat, lab, np.diag(S))

    def _live_bond(self, bond: int):
        S = self._bond_S(bond)
        lab = np.asarray(self.labels[bond], int)
        live = lab >= 0
        return S[live], lab[live]

    def _bond_S(self, bond: int) -> np.ndarray:
        if self.schmidt_values is None:
            raise ValueError("run find_groundstate_anyonic_dmrg2 first")
        if not (1 <= bond <= len(self.labels) - 2):
            raise ValueError(f"interior bonds are 1..{len(self.labels)-2}")
        return np.asarray(self.schmidt_values[bond - 1])


# ---------------------------------------------------------------------------
# the driver


def find_groundstate_anyonic_dmrg2(spsi: AnyonicFiniteMPS, H, alg=None):
    """Sector-resolved two-site DMRG for finite anyonic chains: two-site
    eigensolves run jitted on device with the window mask enforced inside
    the Krylov matvec (P·H_eff·P — the manifold restriction); splits run
    host-side per bond with dynamic sector allocation (`anyon_split`).
    H is the plain height-basis chain MPO (e.g. `models.golden_chain()`);
    boundary pinning comes from the masks. Returns
    (AnyonicFiniteMPS, envs, eps)."""
    from ..algorithms.dmrg2 import DMRG2
    from ..algorithms.derivatives import ac2_apply
    from ..linalg.lanczos import eigsh_smallest
    from ..environments.finite import (
        compute_right_envs, compute_left_envs, left_boundary,
        right_boundary, stack_W, FiniteEnv,
    )
    from ..transfermatrix.transfer import (
        transfer_left_mpo, transfer_right_mpo,
    )
    from ..states.finitemps import FiniteMPS
    from ..utils.dynamictols import updatetol
    from ..utils.logging import IterLog
    from ..config import matmul_precision, VERBOSE_ITER

    if alg is None:
        alg = DMRG2()
    cat, x = spsi.cat, spsi.anyon
    psi = spsi.state
    L, D = psi.length, psi.D
    labels = [np.asarray(l, int).copy() for l in spsi.labels]
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]

    @partial(jax.jit, static_argnums=(6, 7))
    def solve_bond(GL, W1, W2, GR, theta0, mask, m, restarts, tol):
        mv = lambda v: mask * ac2_apply(GL, W1, W2, GR, v)
        res = eigsh_smallest(mv, theta0 * mask, m, restarts, tol)
        return res.eigenvector, res.eigenvalue

    tl = jax.jit(transfer_left_mpo)
    tr = jax.jit(transfer_right_mpo)

    GRs = list(compute_right_envs(psi.ARs, Ws,
                                  right_boundary(w, D, psi.dtype)))
    GLs = [left_boundary(w, D, psi.dtype)] * (L + 1)
    ALs, ARs, AC = psi.ALs, psi.ARs, psi.AC

    log = IterLog("DMRG2(anyonic)", alg.verbosity)
    eps, lam_prev, lam = 1.0, None, 0.0
    Svals = [None] * (L - 1)
    with matmul_precision(psi.dtype):
        for it in range(1, alg.maxiter + 1):
            inner_tol = updatetol(eps, it)
            for i in range(L - 1):                     # left-to-right
                mask = jnp.asarray(anyon_theta_mask(
                    cat, x, labels[i], labels[i + 2]), psi.dtype)
                theta = jnp.einsum("lpm,mqr->lpqr", AC, ARs[i + 1])
                theta, lam = solve_bond(GLs[i], Ws[i], Ws[i + 1],
                                        GRs[i + 2], theta, mask,
                                        alg.krylovdim,
                                        alg.eig_maxrestarts, inner_tol)
                AL, S, AR, labq, _err = anyon_split(
                    np.asarray(theta), labels[i], labels[i + 2], cat, x, D)
                labels[i + 1] = labq
                Svals[i] = S
                ALs = ALs.at[i].set(jnp.asarray(AL))
                AC = jnp.asarray(S)[:, None, None].astype(psi.dtype) \
                    * jnp.asarray(AR)
                GLs[i + 1] = tl(GLs[i], Ws[i], ALs[i], ALs[i])
            for i in range(L - 2, -1, -1):             # right-to-left
                mask = jnp.asarray(anyon_theta_mask(
                    cat, x, labels[i], labels[i + 2]), psi.dtype)
                theta = jnp.einsum("lpm,mqr->lpqr", ALs[i], AC)
                theta, lam = solve_bond(GLs[i], Ws[i], Ws[i + 1],
                                        GRs[i + 2], theta, mask,
                                        alg.krylovdim,
                                        alg.eig_maxrestarts, inner_tol)
                AL, S, AR, labq, _err = anyon_split(
                    np.asarray(theta), labels[i], labels[i + 2], cat, x, D)
                labels[i + 1] = labq
                Svals[i] = S
                ARs = ARs.at[i + 1].set(jnp.asarray(AR))
                AC = jnp.asarray(AL).astype(psi.dtype) \
                    * jnp.asarray(S)[None, None, :].astype(psi.dtype)
                GRs[i + 1] = tr(GRs[i + 2], Ws[i + 1], ARs[i + 1],
                                ARs[i + 1])
            lam_f = float(np.real(np.asarray(lam)))
            eps = abs(lam_f - lam_prev) if lam_prev is not None else 1.0
            lam_prev = lam_f
            if alg.verbosity >= VERBOSE_ITER:
                log.conv(it, lam_f, eps)
            if eps < alg.tol:
                break
        else:
            log.cancel(alg.maxiter, lam_prev or 0.0, eps)

    psi = FiniteMPS(ALs, ARs, AC, 0)
    GLs_arr = compute_left_envs(ALs, Ws, left_boundary(w, D, psi.dtype))
    GRs_arr = compute_right_envs(ARs, Ws, right_boundary(w, D, psi.dtype))
    out = AnyonicFiniteMPS(psi, cat, x, tuple(labels),
                           tuple(np.asarray(s) for s in Svals))
    return out, FiniteEnv(GLs_arr, GRs_arr), eps


# ---------------------------------------------------------------------------
# infinite: sector-resolved two-site IDMRG


def find_groundstate_anyonic_idmrg2(spsi, H, alg=None):
    """Sector-resolved two-site IDMRG for infinite anyonic chains
    (`AnyonicInfiniteMPS`, unit cell ≥ 2): the masked counterpart of
    `find_groundstate_idmrg2` (reference src/algorithms/groundstate/
    idmrg.jl:93-204) with the middle-bond split replaced by the anyonic
    per-sector row-block SVD (`anyon_split`) — every bond's sector
    allocation is re-derived from the two-site wavefunction each pass,
    so uniform-sector chains (e.g. the golden chain) converge inside the
    true anyonic frame with dynamically optimal sector splits, which the
    1-site masked VUMPS driver cannot reallocate.

    Returns (AnyonicInfiniteMPS, envs, dC). The final state keeps the
    per-block gauges (a flat re-gauge would mix sectors); AL/AR stem from
    the last two half-sweeps, consistent to O(dC) like any IDMRG fixed
    point."""
    from ..algorithms.dmrg2 import DMRG2
    from ..algorithms.derivatives import ac2_apply
    from ..algorithms.idmrg import _reg_left, _reg_right
    from ..linalg.lanczos import eigsh_smallest
    from ..environments.infinite_ham import hamiltonian_environments
    from ..transfermatrix.transfer import (
        transfer_left_mpo, transfer_right_mpo,
    )
    from ..states.infinitemps import InfiniteMPS
    from .anyonic import AnyonicInfiniteMPS
    from ..utils.dynamictols import updatetol
    from ..utils.logging import IterLog
    from ..config import matmul_precision, VERBOSE_ITER

    if alg is None:
        alg = DMRG2()
    cat, x = spsi.cat, spsi.anyon
    psi = spsi.state
    L, D = psi.AL.shape[0], psi.AL.shape[1]
    assert L >= 2, "two-site IDMRG needs a unit cell of at least 2 sites"
    labels = [np.asarray(l, int).copy() for l in spsi.labels]
    envs = hamiltonian_environments(psi, H)
    Ws = [H.site(i).astype(psi.dtype) for i in range(L)]

    @partial(jax.jit, static_argnums=(6, 7))
    def solve_bond(GL, W1, W2, GR, theta0, mask, m, restarts, tol):
        mv = lambda v: mask * ac2_apply(GL, W1, W2, GR, v)
        res = eigsh_smallest(mv, theta0 * mask, m, restarts, tol)
        return res.eigenvector, res.eigenvalue

    tl = jax.jit(transfer_left_mpo)
    tr = jax.jit(transfer_right_mpo)
    regl = jax.jit(_reg_left)
    regr = jax.jit(_reg_right)

    GLs = [envs.GLs[i] for i in range(L)]
    GRs = [envs.GRs[i] for i in range(L)]
    ALs = [psi.AL[i] for i in range(L)]
    ARs = [psi.AR[i] for i in range(L)]
    AC = psi.AC[0]
    Ss = [None] * L
    S_prev = None

    def _mask(i, j):
        return jnp.asarray(anyon_theta_mask(
            cat, x, labels[(i - 1) % L], labels[j]), psi.dtype)

    log = IterLog("IDMRG2(anyonic)", alg.verbosity)
    dC = 1.0
    with matmul_precision(psi.dtype):
        for it in range(1, alg.maxiter + 1):
            inner_tol = updatetol(dC, it)
            # left-to-right over bonds i = 0..L-1 (sites (i, i+1))
            GL = GLs[0]
            GL_new = [None] * L
            for i in range(L):
                j = (i + 1) % L
                theta = jnp.einsum("lpm,mqr->lpqr", AC, ARs[j])
                theta, lam = solve_bond(GLs[i] if i == 0 else GL,
                                        Ws[i], Ws[j], GRs[j], theta,
                                        _mask(i, j), alg.krylovdim,
                                        alg.eig_maxrestarts, inner_tol)
                AL, S, AR, labq, _ = anyon_split(
                    np.asarray(theta), labels[(i - 1) % L], labels[j],
                    cat, x, D)
                labels[i] = labq
                ALs[i] = jnp.asarray(AL)
                Sj = jnp.asarray(S).astype(psi.dtype)
                GL = regl(tl(GL, Ws[i], ALs[i], ALs[i]), jnp.diag(Sj))
                GL_new[j] = GL
                AC = Sj[:, None, None] * jnp.asarray(AR)
            GLs = GL_new
            # right-to-left over bonds i = L-1..0
            GR = GRs[0]
            GR_new = [None] * L
            for i in range(L - 1, -1, -1):
                j = (i + 1) % L
                theta = jnp.einsum("lpm,mqr->lpqr", ALs[i], AC)
                theta, lam = solve_bond(GLs[i], Ws[i], Ws[j],
                                        GRs[0] if i == L - 1 else GR,
                                        theta, _mask(i, j), alg.krylovdim,
                                        alg.eig_maxrestarts, inner_tol)
                AL, S, AR, labq, _ = anyon_split(
                    np.asarray(theta), labels[(i - 1) % L], labels[j],
                    cat, x, D)
                labels[i] = labq
                Ss[i] = S
                ARs[j] = jnp.asarray(AR)
                Sj = jnp.asarray(S).astype(psi.dtype)
                GR = regr(tr(GRs[0] if i == L - 1 else GR,
                             Ws[j], ARs[j], ARs[j]), jnp.diag(Sj))
                GR_new[i] = GR
                AC = jnp.asarray(AL).astype(psi.dtype) \
                    * Sj[None, None, :]
            GRs = GR_new
            dC = (float(np.linalg.norm(Ss[L - 1] - S_prev))
                  if S_prev is not None else 1.0)
            S_prev = Ss[L - 1].copy()
            if alg.verbosity >= VERBOSE_ITER:
                log.conv(it, float(np.real(np.asarray(lam))), dC)
            if dC < alg.tol:
                break
        else:
            log.cancel(alg.maxiter, 0.0, dC)

    Cs = jnp.stack([jnp.diag(jnp.asarray(Ss[i]).astype(psi.dtype))
                    for i in range(L)])
    AL_st = jnp.stack(ALs)
    AR_st = jnp.stack(ARs)
    AC_st = jnp.einsum("impq,iqr->impr", AL_st, Cs)
    psi = InfiniteMPS(AL_st, AR_st, AC_st, Cs)
    envs = hamiltonian_environments(psi, H)
    out = AnyonicInfiniteMPS(psi, cat, x,
                             tuple(tuple(int(v) for v in row)
                                   for row in labels))
    return out, envs, dC
