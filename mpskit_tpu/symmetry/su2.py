"""Non-abelian SU(2)-symmetric states — the TPU-native counterpart of the
reference's `Rep[SU₂]` TensorKit spaces (reference test/setup.jl:46-65,
docs/src/man/algorithms.md:180-186).

Design (extends the masked-dense abelian backend, see charges.py): every
virtual bond keeps the padded dense dimension D, organized as complete
SU(2) multiplets — each index carries a static (j, m) label. SU(2)
invariance of a site tensor A[l, p, r] means A lies in the intertwiner
space Hom(V_l ⊗ V_p, V_r), whose basis is the Clebsch-Gordan tensors

    T^{(α jl, jp, β jr)}[l, p, r] = <jl ml, jp mp | jr mr>

over multiplet pairs (α, β) with admissible fusion |jl-jp| <= jr <= jl+jp.
The static orthonormal basis matrix Q (D·d·D, n_red) turns the symmetry
into two matmuls: P(A) = Q (Qᵀ vec A). Everything else stays dense MXU
work; the projector is re-applied after every eigensolve and gauge move,
so multiplet degeneracies are exact (the decompositions themselves
preserve the structure in exact arithmetic: the Gram matrix of an
intertwiner is ⊕_j G_j ⊗ I_{2j+1}, so sign-fixed QR returns an
intertwiner — the projector only scrubs roundoff).

This is a correctness-first realization of non-abelian symmetry with full
MXU shapes; a reduced-coordinate (fusion-tree storage) fast path is noted
in ROADMAP.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from math import factorial, sqrt
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# Clebsch-Gordan coefficients (exact, integer-factorial arithmetic on 2j)
# ----------------------------------------------------------------------------

def _f(n2: int) -> int:
    """factorial(n2/2) for even n2 (callers guarantee integrality)."""
    assert n2 % 2 == 0 and n2 >= 0, n2
    return factorial(n2 // 2)


@lru_cache(maxsize=None)
def clebsch_gordan2(tj1: int, tm1: int, tj2: int, tm2: int,
                    tJ: int, tM: int) -> float:
    """<j1 m1, j2 m2 | J M> with all spins given as 2j (integers)."""
    if tm1 + tm2 != tM:
        return 0.0
    if not (abs(tj1 - tj2) <= tJ <= tj1 + tj2):
        return 0.0
    if abs(tm1) > tj1 or abs(tm2) > tj2 or abs(tM) > tJ:
        return 0.0
    if (tj1 + tm1) % 2 or (tj2 + tm2) % 2 or (tJ + tM) % 2:
        return 0.0

    pref = (tJ + 1) * (
        _f(tJ + tj1 - tj2) * _f(tJ - tj1 + tj2) * _f(tj1 + tj2 - tJ)
    ) / _f(tj1 + tj2 + tJ + 2)
    pref *= (_f(tJ + tM) * _f(tJ - tM) * _f(tj1 - tm1) * _f(tj1 + tm1)
             * _f(tj2 - tm2) * _f(tj2 + tm2))

    total = 0.0
    # k runs over integers with all factorial args nonnegative
    k_min = max(0, (tj2 - tm1 - tJ) // 2, (tj1 + tm2 - tJ) // 2)
    k_max = min((tj1 + tj2 - tJ) // 2, (tj1 - tm1) // 2, (tj2 + tm2) // 2)
    for k in range(k_min, k_max + 1):
        denom = (factorial(k)
                 * _f(tj1 + tj2 - tJ - 2 * k)
                 * _f(tj1 - tm1 - 2 * k)
                 * _f(tj2 + tm2 - 2 * k)
                 * _f(tJ - tj2 + tm1 + 2 * k)
                 * _f(tJ - tj1 - tm2 + 2 * k))
        total += (-1.0) ** k / denom
    return sqrt(pref) * total


# ----------------------------------------------------------------------------
# Bond structure: complete multiplets with static (j, m) labels
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SU2Bond:
    """A virtual bond as an ordered list of SU(2) multiplets.

    multiplets: tuple of (2j, multiplicity). Dense dimension is
    sum(mult * (2j+1)); indices are laid out multiplet-major."""

    multiplets: Tuple[Tuple[int, int], ...]

    @property
    def dim(self) -> int:
        return sum(m * (tj + 1) for tj, m in self.multiplets)

    @property
    def n_multiplets(self) -> int:
        return sum(m for _, m in self.multiplets)

    def labels(self):
        """(tj[D], tm[D], mult_id[D]): per dense index, 2j, 2m and a unique
        multiplet id."""
        tjs, tms, mids = [], [], []
        mid = 0
        for tj, mult in self.multiplets:
            for _ in range(mult):
                for tm in range(-tj, tj + 1, 2):
                    tjs.append(tj)
                    tms.append(tm)
                    mids.append(mid)
                mid += 1
        return (np.asarray(tjs, int), np.asarray(tms, int),
                np.asarray(mids, int))

    def multiplet_slices(self):
        """[(mid, tj, start, stop)] dense index ranges per multiplet."""
        out = []
        pos = 0
        mid = 0
        for tj, mult in self.multiplets:
            for _ in range(mult):
                out.append((mid, tj, pos, pos + tj + 1))
                pos += tj + 1
                mid += 1
        return out


def build_A_projector(left: SU2Bond, tjp: int, right: SU2Bond) -> np.ndarray:
    """Orthonormal intertwiner basis Q of shape (Dl * d * Dr, n_red) for
    site tensors A[l, p, r] (phys = single spin-(tjp/2) irrep)."""
    Dl, Dr = left.dim, right.dim
    d = tjp + 1
    cols = []
    for (al, tjl, l0, l1) in left.multiplet_slices():
        for (br, tjr, r0, r1) in right.multiplet_slices():
            if not (abs(tjl - tjp) <= tjr <= tjl + tjp):
                continue
            T = np.zeros((Dl, d, Dr))
            for il, tml in enumerate(range(-tjl, tjl + 1, 2)):
                for ip, tmp in enumerate(range(-tjp, tjp + 1, 2)):
                    tmr = tml + tmp
                    if abs(tmr) > tjr:
                        continue
                    ir = (tmr + tjr) // 2
                    T[l0 + il, ip, r0 + ir] = clebsch_gordan2(
                        tjl, tml, tjp, tmp, tjr, tmr)
            v = T.reshape(-1)
            n = np.linalg.norm(v)
            if n > 1e-12:
                cols.append(v / n)
    if not cols:
        raise ValueError("no admissible fusion channels: bond structures "
                         "are incompatible with the physical spin")
    Q = np.stack(cols, axis=1)
    return Q


def build_C_projector(bond: SU2Bond) -> np.ndarray:
    """Orthonormal basis QC (D * D, n_red) of Hom(V, V) intertwiners:
    identity blocks between equal-spin multiplets (Schur)."""
    D = bond.dim
    cols = []
    sl = bond.multiplet_slices()
    for (a, tja, a0, a1) in sl:
        for (b, tjb, b0, b1) in sl:
            if tja != tjb:
                continue
            T = np.zeros((D, D))
            for k in range(tja + 1):
                T[a0 + k, b0 + k] = 1.0
            cols.append(T.reshape(-1) / sqrt(tja + 1))
    return np.stack(cols, axis=1)


def project_A(A, Q):
    """P(A) = unvec(Q (Qᵀ vec A)) — exact SU(2) covariance scrub."""
    shp = A.shape
    v = A.reshape(-1)
    return (Q @ (Q.T.conj() @ v)).reshape(shp)


def project_C(C, QC):
    shp = C.shape
    v = C.reshape(-1)
    return (QC @ (QC.T.conj() @ v)).reshape(shp)


# ----------------------------------------------------------------------------
# SU(2)-symmetric uniform MPS + VUMPS driver
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SU2InfiniteMPS:
    """Uniform MPS over a single-site unit cell with SU(2)-multiplet bond
    structure (same bond on every cell boundary)."""

    state: object                 # InfiniteMPS (period 1)
    bond: SU2Bond
    tjp: int                      # physical 2j

    @staticmethod
    def random(key, bond: SU2Bond, tjp: int,
               dtype=jnp.float64) -> "SU2InfiniteMPS":
        from ..states.infinitemps import InfiniteMPS

        D, d = bond.dim, tjp + 1
        Q = jnp.asarray(build_A_projector(bond, tjp, bond), dtype)
        nred = Q.shape[1]
        coeffs = jax.random.normal(key, (nred,),
                                   jnp.zeros((), dtype).real.dtype)
        A = (Q @ coeffs.astype(dtype)).reshape(1, D, d, D)
        psi = InfiniteMPS.from_A(A)
        sp = SU2InfiniteMPS(psi, bond, tjp)
        return sp.project()

    def project(self) -> "SU2InfiniteMPS":
        from ..states.infinitemps import InfiniteMPS

        psi = self.state
        dtype = psi.dtype
        Q = jnp.asarray(build_A_projector(self.bond, self.tjp, self.bond),
                        dtype)
        QC = jnp.asarray(build_C_projector(self.bond), dtype)
        AL = project_A(psi.AL[0], Q)[None]
        AR = project_A(psi.AR[0], Q)[None]
        AC = project_A(psi.AC[0], Q)[None]
        C = project_C(psi.C[0], QC)[None]
        # renormalize (projection shrinks norms by the roundoff leakage)
        AC = AC / jnp.maximum(jnp.linalg.norm(AC), 1e-30)
        C = C / jnp.maximum(jnp.linalg.norm(C), 1e-30)
        return dataclasses.replace(
            self, state=InfiniteMPS(AL, AR, AC, C))


def find_groundstate_su2_vumps(spsi: SU2InfiniteMPS, H, alg=None):
    """SU(2)-projected VUMPS: the standard dense VUMPS iteration with the
    intertwiner projector applied to (AC, C) after the local eigensolves
    and to the regauged unit cell, keeping the state exactly SU(2)
    covariant (multiplet-degenerate Schmidt spectra to machine precision).
    Returns (SU2InfiniteMPS, envs, eps)."""
    from ..algorithms.vumps import VUMPS
    from ..states.infinitemps import InfiniteMPS
    from ..states.gauging import regauge_ACC
    from ..environments.infinite_ham import hamiltonian_environments
    from ..linalg.lanczos import eigsh_smallest
    from ..algorithms.derivatives import ac_apply, c_apply
    from ..utils.dynamictols import updatetol
    from ..config import matmul_precision

    if alg is None:
        alg = VUMPS()
    psi = spsi.state
    dtype = psi.dtype
    Q = jnp.asarray(build_A_projector(spsi.bond, spsi.tjp, spsi.bond), dtype)
    QC = jnp.asarray(build_C_projector(spsi.bond), dtype)
    Ws = jnp.stack([H.site(0)]).astype(dtype)

    from functools import partial

    @partial(jax.jit, static_argnums=(3, 4))
    def iteration(psi, env_guess, inner_tol, m, restarts):
        envs = hamiltonian_environments(psi, H, tol=1e-12,
                                        env_init=env_guess)
        GL, GR, W = envs.GLs[0], envs.GRs[0], Ws[0]
        res_ac = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x),
                                psi.AC[0], m, restarts, inner_tol,
                                reorth="local")
        res_c = eigsh_smallest(lambda x: c_apply(envs.GLs[0], GR, x),
                               psi.C[0], m, restarts, inner_tol,
                               reorth="local")
        AC = project_A(res_ac.eigenvector, Q)
        C = project_C(res_c.eigenvector, QC)
        AC = AC / jnp.maximum(jnp.linalg.norm(AC), 1e-30)
        C = C / jnp.maximum(jnp.linalg.norm(C), 1e-30)
        AL = project_A(regauge_ACC(AC, C), Q)
        ALC = jnp.einsum("lpm,mr->lpr", AL, C)
        eps = jnp.linalg.norm(AC - ALC)
        psi_new = InfiniteMPS.from_AL(AL[None], C, tol=alg.gauge_tol)
        psi_new = InfiniteMPS(
            project_A(psi_new.AL[0], Q)[None],
            project_A(psi_new.AR[0], Q)[None],
            project_A(psi_new.AC[0], Q)[None],
            project_C(psi_new.C[0], QC)[None])
        return psi_new, eps, envs

    eps = 1.0
    env_guess = None
    for it in range(1, alg.maxiter + 1):
        inner_tol = updatetol(eps, it)
        with matmul_precision(dtype):
            psi, eps, env_guess = iteration(
                psi, env_guess, jnp.asarray(inner_tol), alg.krylovdim,
                alg.eig_maxrestarts)
        eps = float(eps)
        if eps < alg.tol:
            break
    envs = hamiltonian_environments(psi, H, env_init=env_guess)
    return dataclasses.replace(spsi, state=psi), envs, eps


def _multiplicity_matrices(spsi: SU2InfiniteMPS):
    """Per-spin multiplicity matrices M_j[α, β] of the bond matrix C
    (C = ⊕_j M_j ⊗ I_{2j+1} in the multiplet-aligned basis)."""
    C = np.asarray(spsi.state.C[0])
    groups = {}
    for (mid, tj, a0, a1) in spsi.bond.multiplet_slices():
        groups.setdefault(tj, []).append((a0, a1))
    mats = {}
    for tj, sls in groups.items():
        n = len(sls)
        M = np.zeros((n, n), C.dtype)
        for ia, (a0, a1) in enumerate(sls):
            for ib, (b0, b1) in enumerate(sls):
                # average the diagonal of the (2j+1)x(2j+1) identity block
                M[ia, ib] = np.trace(C[a0:a1, b0:b1]) / (tj + 1)
        mats[tj] = M
    return mats


def su2_schmidt_spectrum(spsi: SU2InfiniteMPS):
    """{2j: multiplet singular values} of the bond matrix C — each value
    represents a (2j+1)-fold degenerate dense Schmidt multiplet."""
    return {tj: np.sort(np.linalg.svd(M, compute_uv=False))[::-1]
            for tj, M in _multiplicity_matrices(spsi).items()}


def su2_dense_schmidt_degeneracies(spsi: SU2InfiniteMPS, atol=1e-10):
    """Check the dense Schmidt spectrum of C splits into exactly degenerate
    (2j+1)-multiplets; returns (ok, dense_spectrum)."""
    C = np.asarray(spsi.state.C[0])
    s_dense = np.sort(np.linalg.svd(C, compute_uv=False))[::-1]
    expected = []
    for tj, vals in su2_schmidt_spectrum(spsi).items():
        for v in vals:
            expected += [v] * (tj + 1)
    expected = np.sort(np.asarray(expected))[::-1]
    ok = (len(expected) == len(s_dense)
          and np.allclose(s_dense, expected, atol=atol))
    return ok, s_dense
