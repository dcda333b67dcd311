"""Abelian (U(1)/Z_n) symmetric states — the TPU-native counterpart of the
reference's TensorKit symmetric tensors (SURVEY.md §2.8: `Rep[U1]` spaces,
charge-sectored TensorMaps).

Design: instead of ragged per-sector blocks (hostile to XLA's static-shape
model), every virtual bond keeps the framework's padded dense dimension D
and carries a static *charge label vector* c (length D, one abelian charge
per bond index). Charge conservation is the static mask

    mask[l, p, r] = (c_left[l] + q_phys[p] == c_right[r])

applied to every site tensor. All contractions stay dense MXU matmuls;
QR/SVD preserve the block structure in exact arithmetic (the matrices are
block-diagonal under charge) and the mask is re-applied after every
decomposition, exactly like the rank-support masks. Sector quantum numbers
are exact: total charge is conserved to machine precision, and
entanglement spectra resolve by sector.

This trades the FLOP savings of true block sparsity for exact symmetry
with full MXU shapes — on TPU the dense path is the faster one until
sectors are large enough to tile individually.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..states.finitemps import FiniteMPS, physical_bond_dims


DEAD_LABEL = 10 ** 5  # labels >= this mark padded (dead) bond slots


def _reduce(q, modulus):
    """Reduce a charge mod n (Z_n) or leave it (U(1), modulus None)."""
    return q if modulus is None else q % modulus


def assign_bond_charges(L: int, phys_charges: Sequence[int], D: int,
                        total: int = 0,
                        aux_charges: Sequence[int] = None,
                        modulus: int = None) -> List[np.ndarray]:
    """Static charge label vectors for the L+1 bonds of a finite chain with
    total charge `total`: bond i gets labels drawn from the attainable
    partial-sum charges, with multiplicities proportional to the number of
    paths (a Pascal-triangle count), capped to D per bond and the physical
    rank. Bond 0 carries charge 0, bond L carries `total`.

    aux_charges: optional per-site auxiliary charge fused onto the physical
    leg (the masked-dense realization of the reference's
    `add_physical_charge`, sparsempo.jl:353-379): site i's conservation
    rule becomes c_left + q_phys + aux[i] == c_right.

    modulus: None for U(1); an integer n for Z_n fusion (all charges and
    the conservation rule reduce mod n — e.g. the Z2 spin-flip parity of
    the transverse-field Ising chain, reference
    docs/src/man/algorithms.md:196-211)."""
    phys = np.asarray(phys_charges, int)
    d = len(phys)
    dims = physical_bond_dims(L, d, D)
    aux = np.zeros(L, int) if aux_charges is None else         np.asarray([aux_charges[i % len(aux_charges)] for i in range(L)], int)
    total = _reduce(total, modulus)

    # forward path counts: ways to reach charge q after i sites
    fwd = [dict() for _ in range(L + 1)]
    fwd[0][0] = 1.0
    for i in range(L):
        for q, n in fwd[i].items():
            for p in phys:
                qn = _reduce(q + p + aux[i], modulus)
                fwd[i + 1][qn] = fwd[i + 1].get(qn, 0.0) + n
    # backward counts: ways from charge q at bond i to `total` at bond L
    bwd = [dict() for _ in range(L + 1)]
    bwd[L][total] = 1.0
    for i in range(L - 1, -1, -1):
        for q, n in bwd[i + 1].items():
            for p in phys:
                qn = _reduce(q - p - aux[i], modulus)
                bwd[i][qn] = bwd[i].get(qn, 0.0) + n

    charges = []
    for i in range(L + 1):
        live = sorted(set(fwd[i]) & set(bwd[i]))
        cap = int(dims[i])
        # per-sector Schmidt-rank bound: min(paths from the left, paths
        # from the right); the cap-D truncation trims sectors
        # proportionally to their path weight
        bound = {q: min(fwd[i][q], bwd[i][q]) for q in live
                 if fwd[i][q] > 0 and bwd[i][q] > 0}
        if not bound:
            charges.append(np.full(D, 10**6 * (i + 1), int))
            continue
        if sum(bound.values()) <= cap:
            alloc = {q: int(b) for q, b in bound.items()}
        else:
            weights = {q: fwd[i][q] * bwd[i][q] for q in bound}
            totw = sum(weights.values())
            alloc = {q: min(int(bound[q]),
                            max(1, int(np.floor(cap * weights[q] / totw))))
                     for q in bound}
            # distribute the remainder by largest weight, respecting bounds
            order = sorted(bound, key=lambda q: -weights[q])
            while sum(alloc.values()) > cap:
                q = min((x for x in alloc if alloc[x] > 0),
                        key=lambda x: weights[x])
                alloc[q] -= 1
            guard = 0
            while sum(alloc.values()) < cap and guard < 10 * cap:
                guard += 1
                grew = False
                for q in order:
                    if alloc.get(q, 0) < bound[q] and sum(alloc.values()) < cap:
                        alloc[q] = alloc.get(q, 0) + 1
                        grew = True
                if not grew:
                    break
        # bond-dependent pad value: a constant pad can accidentally satisfy
        # pad + q_phys + aux == pad when the shifts cancel
        lab = np.full(D, 10**6 * (i + 1), int)
        pos = 0
        for q in sorted(alloc, key=lambda q: -alloc[q]):
            n = alloc[q]
            lab[pos: pos + n] = q
            pos += n
        charges.append(lab)
    return charges


def charge_masks_finite(bond_charges: List[np.ndarray],
                        phys_charges: Sequence[int],
                        aux_charges: Sequence[int] = None,
                        modulus: int = None) -> np.ndarray:
    """(L, D, d, D) boolean conservation masks; aux_charges optionally
    shift the conservation rule per site (see assign_bond_charges);
    modulus selects Z_n fusion (dead padded slots never match — their
    labels are >= DEAD_LABEL and are gated out explicitly, since mod
    reduction would otherwise alias them onto live charges)."""
    L = len(bond_charges) - 1
    D = bond_charges[0].shape[0]
    phys = np.asarray(phys_charges, int)
    d = len(phys)
    masks = np.zeros((L, D, d, D), bool)
    for i in range(L):
        a = 0 if aux_charges is None else int(aux_charges[i % len(aux_charges)])
        cl = bond_charges[i][:, None, None]
        cp = phys[None, :, None] + a
        cr = bond_charges[i + 1][None, None, :]
        if modulus is None:
            masks[i] = (cl + cp) == cr
        else:
            live = (cl < DEAD_LABEL) & (cr < DEAD_LABEL)
            masks[i] = ((cl + cp - cr) % modulus == 0) & live
    return masks


def flux_masks_finite(bond_charges: List[np.ndarray],
                      phys_charges: Sequence[int], sector: int,
                      modulus: int = None) -> np.ndarray:
    """(L, D, d, D) boolean masks for a site tensor carrying charge FLUX
    `sector`: c_left + q_phys == c_right + sector (mod n). This is the
    masked-dense realization of the reference's charged quasiparticle
    utility leg (src/states/quasiparticle_state.jl:30-56, excitation space
    `ℂ[typeof(sector)](sector => 1)`): a B tensor supported on this mask
    raises the total chain charge by `sector`."""
    L = len(bond_charges) - 1
    D = bond_charges[0].shape[0]
    phys = np.asarray(phys_charges, int)
    masks = np.zeros((L, D, len(phys), D), bool)
    for i in range(L):
        cl = bond_charges[i][:, None, None]
        cp = phys[None, :, None]
        cr = bond_charges[i + 1][None, None, :]
        live = (cl < DEAD_LABEL) & (cr < DEAD_LABEL)
        if modulus is None:
            masks[i] = ((cl + cp) == (cr + sector)) & live
        else:
            masks[i] = ((cl + cp - cr - sector) % modulus == 0) & live
    return masks


@dataclasses.dataclass(frozen=True)
class SymmetricFiniteMPS:
    """A FiniteMPS constrained to an abelian charge sector: the dense state
    plus static bond charge labels and physical charges."""

    state: FiniteMPS
    bond_charges: Tuple[np.ndarray, ...]
    phys_charges: Tuple[int, ...]
    modulus: int = None  # None = U(1); n = Z_n fusion

    @property
    def masks(self) -> np.ndarray:
        return charge_masks_finite(list(self.bond_charges),
                                   list(self.phys_charges),
                                   modulus=self.modulus)

    def flux_masks(self, sector: int) -> np.ndarray:
        """Charged-excitation masks (see flux_masks_finite)."""
        return flux_masks_finite(list(self.bond_charges),
                                 list(self.phys_charges), sector,
                                 modulus=self.modulus)

    @staticmethod
    def random(key, L: int, phys_charges: Sequence[int], D: int,
               total: int = 0, dtype=jnp.complex128,
               modulus: int = None) -> "SymmetricFiniteMPS":
        d = len(phys_charges)
        bond_charges = assign_bond_charges(L, phys_charges, D, total,
                                           modulus=modulus)
        masks = charge_masks_finite(bond_charges, phys_charges,
                                    modulus=modulus)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            rdt = jnp.zeros((), dtype).real.dtype
            k1, k2 = jax.random.split(key)
            As = (jax.random.normal(k1, (L, D, d, D), rdt)
                  + 1j * jax.random.normal(k2, (L, D, d, D), rdt)).astype(dtype)
        else:
            As = jax.random.normal(key, (L, D, d, D), dtype)
        As = As * jnp.asarray(masks)
        psi = FiniteMPS.from_tensors(As)
        # re-mask after gauging (numerical noise only)
        psi = FiniteMPS(psi.ALs * jnp.asarray(masks),
                        psi.ARs * jnp.asarray(masks),
                        psi.AC * jnp.asarray(masks[0]), 0)
        return SymmetricFiniteMPS(psi, tuple(bond_charges),
                                  tuple(int(q) for q in phys_charges),
                                  modulus)


def _labels_from_counts(counts: dict, D: int) -> np.ndarray:
    tot = sum(counts.values())
    order = sorted(counts, key=lambda q: -counts[q])
    alloc = {}
    for q in order:
        alloc[q] = max(1, int(round(D * counts[q] / tot)))
    while sum(alloc.values()) > D:
        q = min((x for x in alloc if alloc[x] > 0), key=lambda x: counts[x])
        alloc[q] -= 1
        if alloc[q] == 0:
            del alloc[q]
    while sum(alloc.values()) < D:
        for q in order:
            if q in alloc and sum(alloc.values()) < D:
                alloc[q] += 1
    lab = np.zeros(D, int)
    pos = 0
    for q in sorted(alloc, key=lambda q: -alloc[q]):
        lab[pos: pos + alloc[q]] = q
        pos += alloc[q]
    return lab


def uniform_bond_charges_cell(L: int, D: int, phys_charges: Sequence[int],
                              window: int = None,
                              modulus: int = None) -> List[np.ndarray]:
    """Charge labels for the L bonds of a uniform unit cell (bond i sits to
    the right of site i). Sector dimensions follow the path-count
    distribution of a half-window. When every physical charge is odd (e.g.
    spin-1/2 with charges ±1) the bond parity alternates site by site, so
    L must be even and the labels alternate parity."""
    phys = np.asarray(phys_charges, int)
    if window is None:
        window = max(2, int(np.ceil(np.log(D) / np.log(len(phys)))) + 2)
    window += window % 2  # even window -> parity-0 counts

    def counts_after(n):
        counts = {0: 1.0}
        for _ in range(n):
            new = {}
            for q, m in counts.items():
                for p in phys:
                    qn = _reduce(q + p, modulus)
                    new[qn] = new.get(qn, 0.0) + m
            counts = new
        return counts

    all_odd = modulus is None and bool(np.all(phys % 2 != 0))
    even_lab = _labels_from_counts(counts_after(window), D)
    if not all_odd:
        return [even_lab.copy() for _ in range(L)]
    assert L % 2 == 0, \
        "odd physical charges need an even unit cell (alternating parity)"
    odd_lab = _labels_from_counts(counts_after(window + 1), D)
    # bond i has parity (i+1) mod 2 relative to bond L-1 (even by choice)
    return [odd_lab.copy() if i % 2 == 0 else even_lab.copy()
            for i in range(L)]


@dataclasses.dataclass(frozen=True)
class SymmetricInfiniteMPS:
    """A uniform MPS constrained to an abelian sector: per-bond static
    charge labels over the unit cell (zero net charge flux per cell)."""

    state: "object"
    bond_charges: Tuple[np.ndarray, ...]  # L arrays (D,), bond i right of site i
    phys_charges: Tuple[int, ...]
    modulus: int = None  # None = U(1); n = Z_n fusion

    @property
    def masks(self):
        """(A_mask (L, D, d, D), C_mask (L, D, D))."""
        return uniform_charge_masks(list(self.bond_charges),
                                    self.phys_charges,
                                    modulus=self.modulus)

    def flux_masks(self, sector: int):
        """(L, D, d, D) charged-excitation masks over the unit cell (see
        flux_masks_finite): B_i supported here carries charge flux
        `sector` between the surrounding ground-state bond labels."""
        L = len(self.bond_charges)
        D = self.bond_charges[0].shape[0]
        phys = np.asarray(self.phys_charges, int)
        out = np.zeros((L, D, len(phys), D), bool)
        for i in range(L):
            cl = self.bond_charges[(i - 1) % L][:, None, None]
            cp = phys[None, :, None]
            cr = self.bond_charges[i][None, None, :]
            live = (cl < DEAD_LABEL) & (cr < DEAD_LABEL)
            if self.modulus is None:
                out[i] = ((cl + cp) == (cr + sector)) & live
            else:
                out[i] = ((cl + cp - cr - sector) % self.modulus == 0) & live
        return out

    @staticmethod
    def random(key, L: int, phys_charges: Sequence[int], D: int,
               dtype=jnp.complex128,
               modulus: int = None) -> "SymmetricInfiniteMPS":
        from ..states.infinitemps import InfiniteMPS

        d = len(phys_charges)
        bonds = uniform_bond_charges_cell(L, D, phys_charges,
                                          modulus=modulus)
        A_mask, C_mask = uniform_charge_masks(bonds, phys_charges,
                                              modulus=modulus)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            rdt = jnp.zeros((), dtype).real.dtype
            k1, k2 = jax.random.split(key)
            A = (jax.random.normal(k1, (L, D, d, D), rdt)
                 + 1j * jax.random.normal(k2, (L, D, d, D), rdt)).astype(dtype)
        else:
            A = jax.random.normal(key, (L, D, d, D), dtype)
        A = A * jnp.asarray(A_mask)
        psi = InfiniteMPS.from_A(A)
        Am = jnp.asarray(A_mask).astype(dtype)
        Cm = jnp.asarray(C_mask).astype(dtype)
        psi = InfiniteMPS(psi.AL * Am, psi.AR * Am, psi.AC * Am,
                          psi.C * Cm)
        return SymmetricInfiniteMPS(psi, tuple(bonds),
                                    tuple(int(q) for q in phys_charges),
                                    modulus)


def uniform_charge_masks(bond_charges: List[np.ndarray],
                         phys_charges: Sequence[int], modulus: int = None):
    """(A_mask (L, D, d, D), C_mask (L, D, D)) for the unit-cell bonds.
    Site i's left bond is bond (i-1) mod L."""
    L = len(bond_charges)
    D = bond_charges[0].shape[0]
    phys = np.asarray(phys_charges, int)
    d = len(phys)
    A = np.zeros((L, D, d, D), bool)
    C = np.zeros((L, D, D), bool)
    for i in range(L):
        cl = bond_charges[(i - 1) % L][:, None, None]
        cp = phys[None, :, None]
        cr = bond_charges[i][None, None, :]
        if modulus is None:
            A[i] = (cl + cp) == cr
        else:
            live = (cl < DEAD_LABEL) & (cr < DEAD_LABEL)
            A[i] = ((cl + cp - cr) % modulus == 0) & live
        cb = bond_charges[i]
        if modulus is None:
            C[i] = cb[:, None] == cb[None, :]
        else:
            liveC = (cb[:, None] < DEAD_LABEL) & (cb[None, :] < DEAD_LABEL)
            C[i] = ((cb[:, None] - cb[None, :]) % modulus == 0) & liveC
    return A, C


def find_groundstate_symmetric_infinite(spsi: SymmetricInfiniteMPS, H,
                                        alg=None):
    """Sector-constrained VUMPS. Returns (SymmetricInfiniteMPS, envs, eps)."""
    from ..algorithms.vumps import VUMPS, _vumps_iteration
    from ..environments.infinite_ham import hamiltonian_environments
    from ..utils.dynamictols import updatetol
    from ..config import matmul_precision

    if alg is None:
        alg = VUMPS()
    psi = spsi.state
    A_mask, C_mask = spsi.masks
    A_mask = jnp.asarray(A_mask)
    C_mask = jnp.asarray(C_mask)
    eps = 1.0
    env_guess = None
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        with matmul_precision(psi.dtype):
            psi, eps, env_guess, _diag = _vumps_iteration(
                psi, H, alg.krylovdim, alg.eig_maxrestarts, alg.gauge_tol,
                1e-12, inner_tol, A_mask=A_mask, C_mask=C_mask,
                env_guess=env_guess)
        eps = float(eps)
        if eps < alg.tol:
            break
    # final re-canonicalization (iterations regauge locally) + re-mask
    from ..states.infinitemps import InfiniteMPS

    psi = InfiniteMPS.from_AL(psi.AL, psi.C[psi.period - 1],
                              tol=alg.gauge_tol)
    Am = A_mask.astype(psi.AL.dtype)
    Cm = C_mask.astype(psi.C.dtype)
    psi = InfiniteMPS(psi.AL * Am, psi.AR * Am, psi.AC * Am, psi.C * Cm)
    envs = hamiltonian_environments(psi, H, env_init=env_guess)
    return dataclasses.replace(spsi, state=psi), envs, eps


def find_groundstate_symmetric(spsi: SymmetricFiniteMPS, H, alg=None):
    """Charge-sector DMRG: the conservation masks ride the same masking
    hook as the rank-support masks. Returns (SymmetricFiniteMPS, envs, eps).
    """
    from ..algorithms.dmrg import DMRG, _dmrg_sweep
    from ..environments.finite import (
        compute_right_envs, right_boundary, compute_left_envs,
        left_boundary, stack_W, FiniteEnv,
    )
    from ..utils.dynamictols import updatetol
    from ..config import matmul_precision

    if alg is None:
        alg = DMRG()
    psi = spsi.state.move_center(0)
    L, D = psi.length, psi.D
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]
    masks = jnp.asarray(spsi.masks)
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, psi.dtype))
    # copies: _dmrg_sweep donates its tensor args on TPU
    ALs, ARs, AC = (jnp.array(x, copy=True)
                    for x in (psi.ALs, psi.ARs, psi.AC))
    eps = 1.0
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        with matmul_precision(psi.dtype):
            # sector-constrained solves keep the corrective local pass:
            # the masked H_eff has a large degenerate null space and the
            # single-pass recurrence loses ~1e-6 of accuracy against ED
            ALs, ARs, AC, GRs, lam, eps, _diag = _dmrg_sweep(
                ALs, ARs, AC, Ws, GRs, inner_tol, alg.krylovdim,
                alg.eig_maxrestarts, masks=masks, reorth="local")
        eps = float(eps)
        if eps < alg.tol:
            break
    psi = FiniteMPS(ALs, ARs, AC, 0)
    GLs = compute_left_envs(ALs, Ws, left_boundary(w, D, psi.dtype))
    return dataclasses.replace(spsi, state=psi), FiniteEnv(GLs, GRs), eps


def sector_entanglement_spectrum(spsi: SymmetricFiniteMPS, bond: int):
    """{charge: schmidt values} across `bond` — the symmetric counterpart of
    the reference's sector-resolved entanglementplot
    (reference src/utility/plotting.jl:15-126)."""
    psi = spsi.state.move_center(max(bond - 1, 0))
    from ..tensors.ops import leftorth

    _, C = leftorth(psi.AC)
    labels = spsi.bond_charges[bond]
    out = {}
    for q in sorted(set(int(x) for x in labels if x < 10**6)):
        idx = np.where(labels == q)[0]
        blk = np.asarray(C)[np.ix_(idx, idx)]
        s = np.linalg.svd(blk, compute_uv=False)
        out[q] = s[s > 1e-14]
    return out


# ---------------------------------------------------------------------------
# Sector-resolved two-site DMRG (dynamic sector allocation)
# ---------------------------------------------------------------------------

def _sector_split(theta: np.ndarray, cl: np.ndarray, cr: np.ndarray,
                  phys: np.ndarray, D: int, pad: int):
    """Split a two-site tensor theta (D, d, d, D) at its middle bond with a
    per-charge-sector SVD, keeping the global top-D Schmidt values (each
    sector capped by its block rank) — the masked-dense counterpart of the
    reference DMRG2's `tsvd!` over symmetric tensors, which discovers the
    sector distribution dynamically (reference
    src/algorithms/groundstate/dmrg.jl:96-137).

    Rows (l, p1) carry middle charge cl[l] + phys[p1]; columns (p2, r)
    carry cr[r] - phys[p2]; theta is exactly block-diagonal across middle
    charge. Returns (AL (D,d,D), S (D,), AR (D,d,D), labels_mid (D,), err).
    Unused slots get the pad label and zero columns."""
    d = len(phys)
    rowq = (cl[:, None] + phys[None, :]).reshape(-1)          # (D*d,)
    colq = (cr[None, :] - phys[:, None]).reshape(-1)          # (d*D,)
    M = theta.reshape(D * d, d * D)
    live = sorted(set(rowq[np.abs(rowq) < 10**5].tolist())
                  & set(colq[np.abs(colq) < 10**5].tolist()))
    blocks = {}
    total2 = float(np.vdot(M, M).real)
    for q in live:
        ri = np.where(rowq == q)[0]
        ci = np.where(colq == q)[0]
        if len(ri) == 0 or len(ci) == 0:
            continue
        Mq = M[np.ix_(ri, ci)]
        U, s, Vh = np.linalg.svd(Mq, full_matrices=False)
        keepable = int(np.sum(s > 1e-14 * max(1.0, s[0] if len(s) else 0.0)))
        if keepable:
            blocks[q] = (ri, ci, U, s[:keepable], Vh)
    # global top-D selection across sectors
    allvals = sorted(((float(s), q, k) for q, (_, _, _, sv, _) in
                      blocks.items() for k, s in enumerate(sv)),
                     reverse=True)
    kept = allvals[:D]
    counts = {}
    for _, q, _ in kept:
        counts[q] = counts.get(q, 0) + 1
    labels_mid = np.full(D, pad, int)
    AL = np.zeros((D, d, D), theta.dtype)
    AR = np.zeros((D, d, D), theta.dtype)
    S = np.zeros(D, theta.real.dtype if np.iscomplexobj(theta)
                 else theta.dtype)
    pos = 0
    kept2 = 0.0
    for q in sorted(counts):
        n = counts[q]
        ri, ci, U, sv, Vh = blocks[q]
        labels_mid[pos: pos + n] = q
        ALq = np.zeros((D * d, n), theta.dtype)
        ALq[ri] = U[:, :n]
        ARq = np.zeros((n, d * D), theta.dtype)
        ARq[:, ci] = Vh[:n]
        AL[:, :, pos: pos + n] = ALq.reshape(D, d, n)
        AR[pos: pos + n] = ARq.reshape(n, d, D)
        S[pos: pos + n] = sv[:n]
        kept2 += float(np.sum(sv[:n] ** 2))
        pos += n
    err = float(np.sqrt(max(total2 - kept2, 0.0) / max(total2, 1e-300)))
    nrm = np.linalg.norm(S)
    S = S / max(nrm, 1e-30)
    return AL, S, AR, labels_mid, err


def find_groundstate_symmetric_dmrg2(spsi: SymmetricFiniteMPS, H, alg=None):
    """Sector-resolved two-site DMRG with **dynamic sector allocation**:
    every bond split re-derives how many Schmidt vectors each charge
    sector keeps (global top-D across sectors), exactly like the
    reference's DMRG2 over TensorKit symmetric tensors (reference
    src/algorithms/groundstate/dmrg.jl:80-137) — the static path-count
    heuristic of `assign_bond_charges` only seeds the initial state.

    The two-site eigensolves run jitted on device (charge conservation of
    the MPO keeps the Krylov space in-sector); the per-sector SVD splits
    run host-side per bond (static per-bond index sets). Returns
    (SymmetricFiniteMPS with updated bond_charges, envs, eps)."""
    from ..algorithms.dmrg2 import DMRG2
    from ..algorithms.derivatives import ac2_apply
    from ..linalg.lanczos import eigsh_smallest
    from ..environments.finite import (
        compute_right_envs, compute_left_envs, left_boundary,
        right_boundary, stack_W, FiniteEnv,
    )
    from ..transfermatrix.transfer import transfer_left_mpo, transfer_right_mpo
    from ..utils.dynamictols import updatetol
    from ..utils.logging import IterLog
    from ..config import matmul_precision, VERBOSE_ITER

    if alg is None:
        alg = DMRG2()
    psi = spsi.state.move_center(0)
    L, D, d = psi.length, psi.D, psi.physicaldim
    phys = np.asarray(spsi.phys_charges, int)
    bonds = [np.asarray(c, int).copy() for c in spsi.bond_charges]
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]

    @partial(jax.jit, static_argnums=(5, 6))
    def solve_bond(GL, W1, W2, GR, theta0, m, restarts, tol):
        res = eigsh_smallest(
            lambda x: ac2_apply(GL, W1, W2, GR, x), theta0,
            m, restarts, tol)
        return res.eigenvector, res.eigenvalue

    tl = jax.jit(transfer_left_mpo)
    tr = jax.jit(transfer_right_mpo)

    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, psi.dtype))
    GRs = list(GRs)
    GLs = [left_boundary(w, D, psi.dtype)] * (L + 1)
    ALs, ARs, AC = psi.ALs, psi.ARs, psi.AC

    log = IterLog("DMRG2(U1)", alg.verbosity)
    eps, lam_prev, lam = 1.0, None, 0.0
    with matmul_precision(psi.dtype):
        for it in range(1, alg.maxiter + 1):
            inner_tol = updatetol(eps, it)
            err_max = 0.0
            # left-to-right over bonds (i, i+1)
            for i in range(L - 1):
                theta = jnp.einsum("lpm,mqr->lpqr", AC, ARs[i + 1])
                theta, lam = solve_bond(GLs[i], Ws[i], Ws[i + 1], GRs[i + 2],
                                        theta, alg.krylovdim,
                                        alg.eig_maxrestarts, inner_tol)
                AL, S, AR, labq, err = _sector_split(
                    np.asarray(theta), bonds[i], bonds[i + 2], phys, D,
                    pad=10**6 * (i + 2))
                bonds[i + 1] = labq
                err_max = max(err_max, err)
                ALs = ALs.at[i].set(jnp.asarray(AL))
                AC = jnp.asarray(S)[:, None, None].astype(psi.dtype) \
                    * jnp.asarray(AR)
                GLs[i + 1] = tl(GLs[i], Ws[i], ALs[i], ALs[i])
            # right-to-left
            for i in range(L - 2, -1, -1):
                theta = jnp.einsum("lpm,mqr->lpqr", ALs[i], AC)
                theta, lam = solve_bond(GLs[i], Ws[i], Ws[i + 1], GRs[i + 2],
                                        theta, alg.krylovdim,
                                        alg.eig_maxrestarts, inner_tol)
                AL, S, AR, labq, err = _sector_split(
                    np.asarray(theta), bonds[i], bonds[i + 2], phys, D,
                    pad=10**6 * (i + 2))
                bonds[i + 1] = labq
                err_max = max(err_max, err)
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

    psi = FiniteMPS(ALs, ARs, AC, 0)
    GLs_arr = compute_left_envs(ALs, Ws, left_boundary(w, D, psi.dtype))
    GRs_arr = compute_right_envs(ARs, Ws, right_boundary(w, D, psi.dtype))
    spsi = SymmetricFiniteMPS(psi, tuple(bonds), spsi.phys_charges)
    return spsi, FiniteEnv(GLs_arr, GRs_arr), eps


def sector_entanglement_spectrum_infinite(spsi: "SymmetricInfiniteMPS",
                                          bond: int = -1):
    """{charge: schmidt values} of the bond matrix C at a unit-cell bond —
    the infinite-state counterpart of `sector_entanglement_spectrum`
    (reference sector-resolved entanglementplot, utility/plotting.jl:15-126)."""
    L = len(spsi.bond_charges)
    bond = bond % L
    labels = spsi.bond_charges[bond]
    C = np.asarray(spsi.state.C[bond])
    out = {}
    for q in sorted(set(int(x) for x in labels if x < 10 ** 6)):
        idx = np.where(labels == q)[0]
        blk = C[np.ix_(idx, idx)]
        s = np.linalg.svd(blk, compute_uv=False)
        out[q] = s[s > 1e-14]
    return out
