"""Bond-dimension management (reference src/algorithms/changebonds/).

Under the static-shape design, *cutting* is masking (zeroing Schmidt
values in place, shapes unchanged) and *expanding* is a host-level
re-padding of the stacked arrays to a larger static D, with the new
directions seeded either randomly (`RandExpand`) or from the two-site
derivative projected on the tangent null spaces (`OptimalExpand`,
reference optimalexpand.jl:16-102).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..tensors.ops import (
    svd_truncated, TruncationScheme, notrunc, truncdim, leftorth, rightorth,
    leftnull, rightnull,
)
from ..states.finitemps import FiniteMPS
from ..states.infinitemps import InfiniteMPS
from ..environments.finite import (
    finite_environments, stack_W,
)
from ..environments.infinite_ham import hamiltonian_environments
from .derivatives import ac2_apply
from .unionalg import Chainable, ChainedAlg


@dataclasses.dataclass(frozen=True)
class SvdCut(Chainable):
    trscheme: TruncationScheme = dataclasses.field(default_factory=notrunc)


@dataclasses.dataclass(frozen=True)
class RandExpand(Chainable):
    """Expand every bond by `dims` extra directions (random seeds)."""

    dims: int = 8


@dataclasses.dataclass(frozen=True)
class OptimalExpand(Chainable):
    """Expand every bond by `dims` directions chosen from the dominant
    singular vectors of the projected two-site derivative."""

    dims: int = 8


@dataclasses.dataclass(frozen=True)
class VUMPSSvdCut(Chainable):
    trscheme: TruncationScheme = dataclasses.field(default_factory=notrunc)


# ----------------------------------------------------------------------------
# SvdCut
# ----------------------------------------------------------------------------

def _svdcut_finite(psi: FiniteMPS, alg: SvdCut) -> FiniteMPS:
    """Sweep right-to-left truncating every bond (masked, static shapes)."""
    psi = psi.move_center(psi.length - 1)
    L, D = psi.length, psi.D
    AC = psi.AC
    ARs = psi.ARs
    for i in range(psi.length - 1, 0, -1):
        C, AR = rightorth(AC)
        U, S, Vh, _ = svd_truncated(C, D, alg.trscheme)
        S = S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
        AR_new = jnp.einsum("km,mpr->kpr", Vh, AR)
        ARs = ARs.at[i].set(AR_new)
        AC = jnp.einsum("lpm,mk,k->lpk", psi.ALs[i - 1], U,
                        S.astype(U.dtype))
        psi = FiniteMPS(psi.ALs, ARs, AC, i - 1)
    return psi.normalize()


def _svdcut_infinite(psi: InfiniteMPS, alg: SvdCut) -> InfiniteMPS:
    """Truncate the C spectra and rebuild the gauge
    (reference svdcut.jl:13-50)."""
    L, D = psi.period, psi.D
    ALs = psi.AL
    # rotate each bond into its Schmidt basis, masking small values
    Us, Ss, Vhs = [], [], []
    for i in range(L):
        U, S, Vh, _ = svd_truncated(psi.C[i], D, alg.trscheme)
        Us.append(U)
        Ss.append(S / jnp.maximum(jnp.linalg.norm(S), 1e-30))
        Vhs.append(Vh)
    A_new = []
    for i in range(L):
        # rotate the *cell* tensor AL into the per-bond Schmidt bases; the
        # masked U factors zero the discarded directions
        Ui_prev = Us[(i - 1) % L]
        A = jnp.einsum("ml,mpr,rk->lpk", Ui_prev.conj(), psi.AL[i], Us[i])
        A_new.append(A)
    A_new = jnp.stack(A_new)
    return InfiniteMPS.from_A(A_new)


def changebonds(psi, *args):
    """changebonds(psi, alg) or changebonds(psi, H, alg[, envs]).

    A trailing ``envs`` argument is accepted for reference-signature parity
    (changebonds! in changebonds.jl takes one) but has no effect: the
    functional expanders recompute the cheap environments they need from
    the state."""
    if len(args) == 1:
        alg = args[0]
        H = None
    else:
        H = args[0]
        alg = args[1]

    if isinstance(alg, ChainedAlg):
        # reference UnionAlg: apply each bond-management stage in sequence
        # (e.g. ``OptimalExpand() & SvdCut()``)
        for stage in alg:
            psi = changebonds(psi, *((stage,) if H is None else (H, stage)))
        return psi

    # SU(2)-reduced finite chains: OptimalExpand grows MULTIPLET counts
    # per bond from the projected two-site derivative (reference runs the
    # same changebonds on Rep[SU2] spaces, test/algorithms.jl:14-93)
    from ..symmetry.su2_finite import SU2FiniteMPS, expand_bond_reduced

    if isinstance(psi, SU2FiniteMPS):
        if isinstance(alg, OptimalExpand):
            assert H is not None, "OptimalExpand needs the Hamiltonian"
            for bond in range(1, psi.length):
                psi = expand_bond_reduced(psi, H, bond,
                                          extra_mult=alg.dims)
            return psi
        raise TypeError(
            f"SU2FiniteMPS supports OptimalExpand, got {type(alg)}")

    # Multiline / MPO containers (reference svdcut.jl:25-33,
    # randexpand.jl:36-37, optimalexpand.jl:39-45)
    from ..states.multiline import MPSMultiline
    from ..operators.mpo import DenseMPO
    from ..operators.multiline import MPOMultiline

    if isinstance(psi, MPSMultiline):
        return _changebonds_multiline(psi, H, alg)
    if isinstance(psi, MPOMultiline):
        # reference svdcut.jl:29-31: convert to the MPS container, manage
        # bonds there, convert back
        rows = tuple(changebonds(r, *((alg,) if H is None else (H, alg)))
                     for r in psi.rows)
        return MPOMultiline(rows)
    if isinstance(psi, DenseMPO):
        # reference svdcut.jl:26-28 (assumes an infinite MPO)
        from ..operators.mpo import mpo_to_mps, mps_to_mpo

        d = psi.site(0).shape[2]
        return mps_to_mpo(changebonds(mpo_to_mps(psi), alg), d)

    if isinstance(alg, SvdCut):
        if isinstance(psi, FiniteMPS):
            return _svdcut_finite(psi, alg)
        return _svdcut_infinite(psi, alg)
    if isinstance(alg, RandExpand):
        return _expand(psi, alg.dims, H=None, optimal=False)
    if isinstance(alg, OptimalExpand):
        assert H is not None, "OptimalExpand needs the Hamiltonian"
        return _expand(psi, alg.dims, H=H, optimal=True)
    if isinstance(alg, VUMPSSvdCut):
        assert isinstance(psi, InfiniteMPS) and H is not None, \
            "VUMPSSvdCut needs an InfiniteMPS and the Hamiltonian"
        return _vumpssvd_cut(psi, H, alg)
    raise TypeError(type(alg))


def _changebonds_multiline(psi, H, alg):
    """Multiline bond management (reference svdcut.jl:32-33 /
    randexpand.jl:36-37: per-row; optimalexpand.jl:39-45: the expansion
    directions for row r+1 come from the row-r two-site MPO derivative in
    the mixed (ket = row r, bra = row r+1) environments)."""
    from ..states.multiline import MPSMultiline
    from ..operators.multiline import MPOMultiline
    from ..operators.mpo import DenseMPO

    R = psi.nrows
    if isinstance(alg, (SvdCut, RandExpand)):
        return MPSMultiline(tuple(changebonds(r, alg) for r in psi.rows))
    if isinstance(alg, OptimalExpand):
        assert H is not None, "OptimalExpand needs the transfer MPO"
        if isinstance(H, DenseMPO):
            H = MPOMultiline.from_mpo(H, R)
        assert isinstance(H, MPOMultiline) and H.nrows in (1, R)
        new_rows = list(psi.rows)
        for r in range(R):
            new_rows[(r + 1) % R] = _expand_multiline_row(
                psi.rows[r], H.row(r), psi.rows[(r + 1) % R], alg.dims)
        return MPSMultiline(tuple(new_rows))
    raise TypeError(type(alg))


def _expand_multiline_row(below: InfiniteMPS, O, above: InfiniteMPS,
                          extra: int) -> InfiniteMPS:
    """Expand `above` (row r+1) by `extra` directions seeded from the
    dominant singular vectors of the row-r two-site derivative projected
    on row r+1's tangent nullspaces (reference optimalexpand.jl:41-65:
    AC2 of row i-1 pushed through MPO_∂∂AC2(i-1, j), nullspaces of row i)."""
    from ..environments.infinite_mpo import mpo_environments
    from ..tensors.ops import notrunc

    key = jax.random.PRNGKey(42)
    L, D, d = above.period, above.D, above.physicaldim
    D_new = D + extra
    envs = mpo_environments(below, O, psi_bra=above)
    Os = jnp.stack([O.site(i) for i in range(L)]).astype(below.dtype)

    exp_vecs = []
    for i in range(L):
        j = (i + 1) % L
        theta = jnp.einsum("lpm,mqr->lpqr", below.AC[i], below.AR[j])
        h2 = ac2_apply(envs.GLs[i], Os[i], Os[j], envs.GRs[j], theta)
        VL = leftnull(above.AL[i])
        VR = rightnull(above.AR[j])
        M = jnp.einsum("lpk,lpqr,mqr->km", VL.conj(), h2, VR.conj())
        U, S, Vh, _ = svd_truncated(M, min(extra, M.shape[0]), notrunc())
        exp_vecs.append(jnp.einsum("lpk,ke->lpe", VL, U))

    A_new = []
    for i in range(L):
        A = jnp.zeros((D_new, d, D_new), above.dtype)
        A = A.at[:D, :, :D].set(above.AL[i])
        ed = exp_vecs[i].shape[2]
        A = A.at[:D, :, D:D + ed].set(exp_vecs[i])
        A_new.append(A)
    A_stack = jnp.stack(A_new)
    noise = 1e-6 * jax.random.normal(
        key, A_stack.shape, jnp.zeros((), above.dtype).real.dtype
    ).astype(above.dtype)
    mask = jnp.zeros_like(A_stack, dtype=bool).at[:, D:, :, D:].set(True)
    return InfiniteMPS.from_A(A_stack + noise * mask)


def _vumpssvd_cut(psi: InfiniteMPS, H, alg: "VUMPSSvdCut") -> InfiniteMPS:
    """Two-site eigensolve + truncated-SVD re-splitting of every bond
    (reference vumpssvd.jl:19-86): realized as a short IDMRG2 refinement
    under the requested truncation scheme — each bond is repeatedly solved
    as a two-site problem and re-split until the Schmidt spectra are
    self-consistent. Unit cells of 1 are doubled (the reference
    special-cases this too)."""
    from .idmrg import _idmrg2_iteration
    from ..environments.infinite_ham import hamiltonian_environments

    if psi.period == 1:
        psi = psi.repeat(2)
    L = psi.period
    envs = hamiltonian_environments(psi, H)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
    Ss = jnp.stack([jnp.linalg.svd(psi.C[i], compute_uv=False)
                    for i in range(L)])
    ALs, ARs, AC0, GLs, GRs = psi.AL, psi.AR, psi.AC[0], envs.GLs, envs.GRs
    for _ in range(30):
        ALs, ARs, AC0, Ss, GLs, GRs, lam, dC, err, _diag = _idmrg2_iteration(
            ALs, ARs, AC0, Ss, GLs, GRs, 30, 2, alg.trscheme,
            Ws=Ws, inner_tol=1e-9)
        if float(dC) < 1e-8:
            break
    return InfiniteMPS.from_A(ARs)


# ----------------------------------------------------------------------------
# expansion (host-level re-padding)
# ----------------------------------------------------------------------------

def _expand_finite_optimal(psi: FiniteMPS, extra: int, H) -> FiniteMPS:
    """Derivative-seeded finite expansion (reference
    optimalexpand.jl:71-102): at every bond, the two-site derivative is
    projected on the left/right tangent null spaces; its dominant right
    singular vectors seed the new AR rows (so the next sweep's effective
    Hamiltonian at site i already 'sees' the optimal growth directions),
    while the AL/AC side gets zero columns — the state is unchanged.
    """
    from ..states.finitemps import support_mask
    from ..states.quasiparticle import full_gauges
    from ..environments.finite import (
        compute_left_envs, compute_right_envs, left_boundary, right_boundary,
    )

    L, D, d = psi.length, psi.D, psi.physicaldim
    D_new = D + extra
    dtype = psi.dtype
    Ws = stack_W(H, L).astype(dtype)
    w = Ws.shape[1]

    ALs_f, ARs_f = full_gauges(psi)
    GLs = compute_left_envs(ALs_f, Ws, left_boundary(w, D, dtype))
    GRs = compute_right_envs(ARs_f, Ws, right_boundary(w, D, dtype))

    psi0 = psi.move_center(0)
    ALs_new = _pad_bond(psi0.ALs, D_new, (1, 3))
    ARs_new = _pad_bond(psi0.ARs, D_new, (1, 3))
    AC_new = _pad_bond(psi0.AC, D_new, (0, 2))

    p = psi0
    for i in range(L - 1):
        p = p.move_center(i)
        AC_i = p.AC
        theta = jnp.einsum("lpm,mqr->lpqr", AC_i, ARs_f[i + 1])
        h2 = ac2_apply(GLs[i], Ws[i], Ws[i + 1], GRs[i + 2], theta)
        NL = leftnull(AC_i)                 # (D, d, Dd - D)
        NR = rightnull(ARs_f[i + 1])        # (Dd - D, d, D)
        M = jnp.einsum("lpk,lpqr,mqr->km", NL.conj(), h2, NR.conj())
        # dominant RIGHT singular vectors -> new AR rows (ref: V * NR)
        _, S, Vh = jnp.linalg.svd(M, full_matrices=False)
        e = min(extra, Vh.shape[0])
        seed = jnp.einsum("em,mqr->eqr", Vh[:e], NR)
        ARs_new = ARs_new.at[i + 1, D:D + e, :, :D].set(seed)

    mask = jnp.asarray(support_mask(L, d, D_new)).astype(dtype)
    ARs_new = ARs_new * mask
    ALs_new = ALs_new * mask
    AC_new = AC_new * mask[0]
    return FiniteMPS(ALs_new, ARs_new, AC_new, 0)


def _pad_bond(arr, D_new, axes):
    pads = [(0, 0)] * arr.ndim
    for ax in axes:
        pads[ax] = (0, D_new - arr.shape[ax])
    return jnp.pad(arr, pads)


def _expand(psi, extra: int, H=None, optimal: bool = False):
    """Return a new state with every virtual bond enlarged by `extra`
    (padded static shapes). For OptimalExpand the new AL directions come
    from the SVD of the nullspace-projected two-site derivative
    (reference optimalexpand.jl); for RandExpand they are random.

    Finite states are re-padded only: unlike the reference's exact bond
    spaces (where expansion literally changes the vector space and the
    seeded directions matter), the padded static-D representation already
    exposes the full min(d^i, d^(L-i), D_new) supported block to the
    masked local eigensolves, so DMRG explores the new directions on the
    very next sweep regardless of how they are seeded. Seeding is only a
    meaningful accelerant for infinite states, whose AL basis persists
    between iterations."""
    key = jax.random.PRNGKey(42)

    if isinstance(psi, FiniteMPS):
        if optimal and H is not None:
            return _expand_finite_optimal(psi, extra, H)
        D = psi.D
        D_new = D + extra
        psi0 = psi.move_center(0)
        ALs = _pad_bond(psi0.ALs, D_new, (1, 3))
        ARs = _pad_bond(psi0.ARs, D_new, (1, 3))
        AC = _pad_bond(psi0.AC, D_new, (0, 2))
        return FiniteMPS(ALs, ARs, AC, 0)

    if isinstance(psi, InfiniteMPS):
        L, D, d = psi.period, psi.D, psi.physicaldim
        D_new = D + extra
        if optimal and H is not None:
            envs = hamiltonian_environments(psi, H)
            Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
            exp_vecs = []
            for i in range(L):
                j = (i + 1) % L
                theta = jnp.einsum("lpm,mqr->lpqr", psi.AC[i], psi.AR[j])
                h2 = ac2_apply(envs.GLs[i], Ws[i], Ws[j], envs.GRs[j], theta)
                # project out the current tangent directions
                VL = leftnull(psi.AL[i])          # (D, d, D(d-1))
                VR = rightnull(psi.AR[j])         # (D(d-1), d, D)
                M = jnp.einsum("lpk,lpqr,mqr->km", VL.conj(), h2, VR.conj())
                U, S, Vh, _ = svd_truncated(M, min(extra, M.shape[0]),
                                            notrunc())
                # new left directions: VL @ U (D, d, extra)
                newdir = jnp.einsum("lpk,ke->lpe", VL, U)
                exp_vecs.append(newdir)
            A_new = []
            for i in range(L):
                A = jnp.zeros((D_new, d, D_new), psi.dtype)
                A = A.at[:D, :, :D].set(psi.AL[i])
                ed = exp_vecs[i].shape[2]
                A = A.at[:D, :, D:D + ed].set(exp_vecs[i])
                A_new.append(A)
            A_stack = jnp.stack(A_new)
            # random perturbation in the remaining new block keeps full rank
            noise = 1e-6 * jax.random.normal(
                key, A_stack.shape, jnp.zeros((), psi.dtype).real.dtype
            ).astype(psi.dtype)
            mask = jnp.zeros_like(A_stack, dtype=bool).at[:, D:, :, D:].set(True)
            A_stack = A_stack + noise * mask
            return InfiniteMPS.from_A(A_stack)
        # random expansion
        A = _pad_bond(psi.AL, D_new, (1, 3))
        noise = 1e-5 * jax.random.normal(
            key, A.shape, jnp.zeros((), psi.dtype).real.dtype).astype(psi.dtype)
        mask = jnp.zeros_like(A, dtype=bool).at[:, D:, :, :].set(True)
        mask = mask.at[:, :, :, D:].set(True)
        A = A + noise * mask
        return InfiniteMPS.from_A(A)

    raise TypeError(type(psi))
