"""SU(2)-reduced quasiparticle excitations: multiplet-resolved X blocks.

The reference computes charged/non-abelian excitations by giving the QP X
tensor a utility leg in the excitation sector
(/root/reference/src/states/quasiparticle_state.jl:30-56) and runs the
spin-1 Haldane gap through Rep[SU2] spaces as its flagship SU(2) demo
(/root/reference/docs/src/man/algorithms.md:180-186). Here the same
physics runs in reduced (fusion-tree block) coordinates on top of
`su2_reduced.py`: the excitation carries a definite total spin k_exc and
every hot contraction stays a static list of small dense GEMMs.

Representation
--------------
* ``VL`` — reduced left nullspace of AL: blocks keyed ``(2j_l, 2j_m)``
  (same tree as a site tensor), value ``(n_l, nn_m)`` with ``nn_m`` the
  null multiplicity of right sector j_m; dense embedding is an exact
  isometry orthogonal to AL.
* ``X`` — charged bond matrix: blocks keyed ``(2j_m, 2j_r)`` admissible
  under the excitation spin (``j_m (x) k_exc -> j_r``), value
  ``(nn_m, n_r)``. Plain Frobenius metric on X equals the dense metric
  (all bases below are unit-norm), so the generic Krylov solvers run
  unchanged on X pytrees.
* ``B = VL . X`` — charged site blocks keyed ``(2j_l, 2j_m, 2j_r)``: the
  intermediate spin label j_m is the fusion-tree inner line
  ``(l (x) p) -> m,  m (x) k_exc -> r`` (the outer multiplicity a dense
  pair key cannot resolve).
* Charged environments — blocks keyed ``(2j_bra, 2K, 2j_ket)`` with K the
  total channel fused from the MPO level irrep and k_exc
  (``k_a (x) k_exc -> K``).

As in `su2_reduced.py`, no 6j/9j symbol is hand-derived: every structure
coefficient is probed numerically at trace time by running the dense
contraction at unit multiplicity and projecting on the output basis
element. For k_exc != 0 the mixed charged transfer has spectral radius
strictly below one, so the infinite geometric tails are plain
``(1 - e^{ip} T)`` solves — no cap regularization (the reference's
`exci_transfer_system.jl` regularizes only trivial/identity channels).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from math import sqrt
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .su2 import SU2Bond
from .su2_reduced import (
    RBlocks, ReducedMPO, SU2ReducedState, _admissible, _cg, _site_basis,
    _env_basis, _w_entry_dense, _bond_sectors_from_blocks, reduced_ham_envs,
    rac_apply, tree_dot, tree_normalize,
)
from ..linalg.gmres import linsolve
from ..linalg.lanczos import eigsh_smallest


# ----------------------------------------------------------------------------
# Dense bases for charged objects (numpy; probing/embedding only)
# ----------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _xbond_basis(tjm: int, tke: int, tjr: int) -> np.ndarray:
    """Unit-norm basis X[mm, qe, mr] of a charged bond-matrix block."""
    return _cg(tjm, tke, tjr) / sqrt(tjr + 1)


@lru_cache(maxsize=None)
def _csite_basis(tjl: int, tjp: int, tjm: int, tke: int,
                 tjr: int) -> np.ndarray:
    """Unit-norm basis T[ml, s, qe, mr] of a charged site block with the
    fusion tree (l (x) p) -> m, m (x) k_exc -> r."""
    C1 = _cg(tjl, tjp, tjm)                  # [ml, s, mm]
    C2 = _cg(tjm, tke, tjr)                  # [mm, qe, mr]
    T = np.einsum("lsm,mqr->lsqr", C1, C2)
    return T / sqrt(tjr + 1)


@lru_cache(maxsize=None)
def _eps(tk: int) -> np.ndarray:
    """SU(2) dual (cup/cap) matrix on the spin-k/2 space:
    eps[q', q] = (-1)^((k - m)/2) delta_{m', -m}."""
    E = np.zeros((tk + 1, tk + 1))
    for q in range(tk + 1):
        m2 = 2 * q - tk
        E[tk - q, q] = (-1.0) ** ((tk - m2) // 2)
    return E


@lru_cache(maxsize=None)
def _cenv_basis(tjb: int, tka: int, tke: int, tK: int, tjk: int,
                twist: bool = False) -> np.ndarray:
    """Unit-norm basis E[mb, qa, qe, mk] of a charged environment block:
    the MPO channel k_a and the excitation k_e fuse into the total K.

    ``twist=True`` applies the dual (epsilon) map to the excitation leg:
    in LEFT B-environments the excitation line has crossed to the far
    side of the remaining chain, so it transforms in the dual — measured:
    the untwisted basis captures exactly 1/(tke+1)^2 of the dense left
    source, the twisted basis captures it to 8e-16."""
    Cf = _cg(tka, tke, tK)                   # [qa, qe, Q]
    E = _env_basis(tjb, tK, tjk)             # [mb, Q, mk]
    out = np.einsum("aeQ,bQk->baek", Cf, E)
    if twist:
        out = np.einsum("fe,baek->bafk", _eps(tke), out)
    return out


def _fused_channels(tka: int, tke: int) -> Tuple[int, ...]:
    return tuple(tK for tK in range(abs(tka - tke), tka + tke + 1, 2))


def _w_dense(tka, tkop, tkb, tjp, ident: bool) -> np.ndarray:
    """Dense W[qa, qb, s, t] of one FSM entry, or the exact identity for
    the implicit diagonal identity entries (levels 0 and w-1)."""
    if ident:
        return np.eye(tjp + 1)[None, None]
    return _w_entry_dense(tka, tkop, tkb, tjp)


# ----------------------------------------------------------------------------
# Key enumerations
# ----------------------------------------------------------------------------

def csite_keys(secs_l, tjp, tke, secs_r):
    """Triple keys (tjl, tjm, tjr) of a charged site tensor."""
    out = []
    for tjl, _ in secs_l:
        for tjr, _ in secs_r:
            for tjm in range(abs(tjl - tjp), tjl + tjp + 1, 2):
                if _admissible(tjm, tke, tjr):
                    out.append((tjl, tjm, tjr))
    return tuple(sorted(out))


def cenv_keys(secs, tka, tke):
    """(tjb, tK, tjk) keys of a charged environment at MPO channel tka."""
    out = []
    for tjb, _ in secs:
        for tjk, _ in secs:
            for tK in _fused_channels(tka, tke):
                if _admissible(tjk, tK, tjb):
                    out.append((tjb, tK, tjk))
    return tuple(sorted(out))


def _cenv_zero(secs, tka, tke, like) -> RBlocks:
    d = dict(secs)
    keys = cenv_keys(secs, tka, tke)
    vals = tuple(jnp.zeros((d[tb], d[tk]), like.dtype)
                 for (tb, _, tk) in keys)
    return RBlocks(keys, vals)


# ----------------------------------------------------------------------------
# Dense embeddings (tests only)
# ----------------------------------------------------------------------------

def _offsets(secs):
    out, pos = {}, 0
    for tj, m in secs:
        out[tj] = (pos, m)
        pos += m * (tj + 1)
    return out, pos


def embed_csite(B: RBlocks, secs, tjp: int, tke: int) -> np.ndarray:
    """Dense charged site tensor [l, s, qe, r]."""
    off, D = _offsets(secs)
    A = np.zeros((D, tjp + 1, tke + 1, D))
    for (tjl, tjm, tjr), blk in B.items():
        (l0, nl), (r0, nr) = off[tjl], off[tjr]
        dl, dr = tjl + 1, tjr + 1
        T = _csite_basis(tjl, tjp, tjm, tke, tjr)
        blkT = np.einsum("ab,lsqr->alsqbr", np.asarray(blk), T)
        A[l0:l0 + nl * dl, :, :, r0:r0 + nr * dr] += blkT.reshape(
            nl * dl, tjp + 1, tke + 1, nr * dr)
    return A


def restrict_csite(A: np.ndarray, secs, tjp: int, tke: int) -> RBlocks:
    off, _ = _offsets(secs)
    keys = csite_keys(secs, tjp, tke, secs)
    vals = []
    for (tjl, tjm, tjr) in keys:
        (l0, nl), (r0, nr) = off[tjl], off[tjr]
        dl, dr = tjl + 1, tjr + 1
        T = _csite_basis(tjl, tjp, tjm, tke, tjr)
        view = np.asarray(A)[l0:l0 + nl * dl, :, :, r0:r0 + nr * dr].reshape(
            nl, dl, tjp + 1, tke + 1, nr, dr)
        vals.append(jnp.asarray(np.einsum("alsqbr,lsqr->ab", view, T)))
    return RBlocks(keys, tuple(vals))


def embed_cenv(G: RBlocks, secs, tka: int, tke: int,
               twist: bool = False) -> np.ndarray:
    """Dense charged environment [bra, qa, qe, ket]. twist=True uses
    the left-walk (dual excitation leg) basis."""
    off, D = _offsets(secs)
    E = np.zeros((D, tka + 1, tke + 1, D))
    for (tjb, tK, tjk), blk in G.items():
        (b0, nb), (k0, nk) = off[tjb], off[tjk]
        db, dk = tjb + 1, tjk + 1
        T = _cenv_basis(tjb, tka, tke, tK, tjk, twist)
        blkT = np.einsum("ab,xqey->axqeby", np.asarray(blk), T)
        E[b0:b0 + nb * db, :, :, k0:k0 + nk * dk] += blkT.reshape(
            nb * db, tka + 1, tke + 1, nk * dk)
    return E


def restrict_cenv(E: np.ndarray, secs, tka: int, tke: int,
                  twist: bool = False) -> RBlocks:
    off, _ = _offsets(secs)
    keys = cenv_keys(secs, tka, tke)
    vals = []
    for (tjb, tK, tjk) in keys:
        (b0, nb), (k0, nk) = off[tjb], off[tjk]
        db, dk = tjb + 1, tjk + 1
        T = _cenv_basis(tjb, tka, tke, tK, tjk, twist)
        view = np.asarray(E)[b0:b0 + nb * db, :, :, k0:k0 + nk * dk].reshape(
            nb, db, tka + 1, tke + 1, nk, dk)
        vals.append(jnp.asarray(np.einsum("axqeby,xqey->ab", view, T)))
    return RBlocks(keys, tuple(vals))


# ----------------------------------------------------------------------------
# Reduced left nullspace
# ----------------------------------------------------------------------------

def left_null_reduced(AL: RBlocks, tjp: int) -> RBlocks:
    """VL with VL^dag AL = 0 and VL a dense isometry, per right sector:
    complete the QR of the stacked (and 1/sqrt(2j_m+1)-scaled) AL columns
    (reference leftnull; here per-multiplet).

    The null sectors run over EVERY j_m reachable from l (x) p — including
    sectors absent from the bond (nm = 0), whose null space is the whole
    stacked row space. Enumerating only AL.keys would silently drop those
    channels (measured: 6 of 16 null dimensions on a {1/2 x2, 3/2}
    spin-1 bond), truncating the excitation ansatz."""
    secs_l = {}
    secs_m = {}
    for (tjl, tjm_), blk in AL.items():
        secs_l[tjl] = blk.shape[0]
        secs_m[tjm_] = blk.shape[1]
    tjms = sorted({tjm for tjl in secs_l
                   for tjm in range(abs(tjl - tjp), tjl + tjp + 1, 2)})
    keys, vals = [], []
    dtype = AL.dtype
    for tjm in tjms:
        rows, meta = [], []
        for tjl in sorted(secs_l):
            if not _admissible(tjl, tjp, tjm):
                continue
            blk = AL.get((tjl, tjm))
            nl = secs_l[tjl]
            meta.append((tjl, nl))
            # a missing block is an all-zero block of the tjm sector's bond
            # multiplicity — NOT 0 columns, which would break the
            # concatenate whenever another tjl block of the same tjm sector
            # is present (ADVICE r4); state constructors currently emit
            # every admissible key, so this is defensive
            rows.append(blk if blk is not None
                        else jnp.zeros((nl, secs_m.get(tjm, 0)), dtype))
        S = jnp.concatenate(rows, axis=0) / sqrt(tjm + 1)
        R, nm = S.shape[0], S.shape[1]
        if R <= nm:
            continue                          # no null directions
        if nm == 0:
            N = jnp.eye(R, dtype=dtype)
        else:
            Q, _ = jnp.linalg.qr(S, mode="complete")
            N = Q[:, nm:]                     # (R, R - nm)
        pos = 0
        for (tjl, nl) in meta:
            keys.append((tjl, tjm))
            vals.append(sqrt(tjm + 1) * N[pos:pos + nl])
            pos += nl
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    return RBlocks(tuple(keys[i] for i in order),
                   tuple(vals[i] for i in order))


def null_sectors(VL: RBlocks):
    """((2j_m, nn_m), ...) of the null bond."""
    out = {}
    for (tjl, tjm), blk in VL.items():
        out[tjm] = blk.shape[1]
    return tuple(sorted(out.items()))


def x_keys(VL: RBlocks, secs_r, tke: int):
    nsec = null_sectors(VL)
    return tuple(sorted((tjm, tjr) for tjm, _ in nsec for tjr, _ in secs_r
                        if _admissible(tjm, tke, tjr)))


def random_x(key, VL: RBlocks, secs_r, tke: int, dtype) -> RBlocks:
    nsec = dict(null_sectors(VL))
    rsec = dict(secs_r)
    keys = x_keys(VL, tuple(sorted(rsec.items())), tke)
    vals = []
    for i, (tjm, tjr) in enumerate(keys):
        k = jax.random.fold_in(key, i)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            rdt = jnp.zeros((), dtype).real.dtype
            v = (jax.random.normal(k, (nsec[tjm], rsec[tjr]), rdt)
                 + 1j * jax.random.normal(jax.random.fold_in(k, 1),
                                          (nsec[tjm], rsec[tjr]), rdt))
            vals.append(v.astype(dtype))
        else:
            vals.append(jax.random.normal(k, (nsec[tjm], rsec[tjr]), dtype))
    return RBlocks(keys, tuple(vals))


# ----------------------------------------------------------------------------
# Probed structure coefficients
# ----------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _probe_vlx(tjp, tke, tjl, tjm, tjr) -> float:
    """B block (tjl,tjm,tjr) = coeff * VL[(tjl,tjm)] @ X[(tjm,tjr)]."""
    SB = _site_basis(tjl, tjp, tjm)
    XB = _xbond_basis(tjm, tke, tjr)
    out = np.einsum("lsm,mqr->lsqr", SB, XB)
    T = _csite_basis(tjl, tjp, tjm, tke, tjr)
    return float(np.einsum("lsqr,lsqr->", out, T))


@lru_cache(maxsize=None)
def _probe_pullback(tjp, tke, tjl, tjm, tjr) -> float:
    """X' block (tjm,tjr) += coeff * VL[(tjl,tjm)]^dag @ y[(tjl,tjm,tjr)]."""
    SB = _site_basis(tjl, tjp, tjm)
    CB = _csite_basis(tjl, tjp, tjm, tke, tjr)
    out = np.einsum("lsm,lsqr->mqr", SB, CB)
    XB = _xbond_basis(tjm, tke, tjr)
    return float(np.einsum("mqr,mqr->", out, XB))


@lru_cache(maxsize=None)
def _probe_cpush_left(tka, tkop, tkb, tke, tjp, ident,
                      tjx, tKi, tjy, tjm, tKo, tjn) -> float:
    """Charged left push (bra=AL ket=AR) through one FSM entry:
    out[(tjm,tKo,tjn)] += c * AL[(tjx,tjm)]^dag lB[(tjx,tKi,tjy)]
    AR[(tjy,tjn)]."""
    if not (_admissible(tjy, tKi, tjx) and _admissible(tjn, tKo, tjm)
            and _admissible(tjx, tjp, tjm) and _admissible(tjy, tjp, tjn)):
        return 0.0
    E = _cenv_basis(tjx, tka, tke, tKi, tjy, True)  # [mx, qa, qe, my]
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Ab = _site_basis(tjx, tjp, tjm)
    Ak = _site_basis(tjy, tjp, tjn)
    out = np.einsum("xaey,abst,xsm,ytn->mben", E, W, Ab, Ak)
    Eo = _cenv_basis(tjm, tkb, tke, tKo, tjn, True)
    return float(np.einsum("mben,mben->", out, Eo))


@lru_cache(maxsize=None)
def _probe_csrc_left(tka, tkop, tkb, tke, tjp, ident,
                     tjx, tjy, tjmid, tjn, tjm, tKo) -> float:
    """Left source: out[(tjm,tKo,tjn)] += c * AL[(tjx,tjm)]^dag
    gl[(tjx,tjy)] W B[(tjy,tjmid,tjn)] with gl uncharged at channel tka."""
    if not (_admissible(tjy, tka, tjx) and _admissible(tjn, tKo, tjm)
            and _admissible(tjx, tjp, tjm)):
        return 0.0
    E = _env_basis(tjx, tka, tjy)              # [mx, qa, my]
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Ab = _site_basis(tjx, tjp, tjm)
    Bk = _csite_basis(tjy, tjp, tjmid, tke, tjn)  # [my, t, qe, mn]
    out = np.einsum("xay,abst,xsm,yten->mben", E, W, Ab, Bk)
    Eo = _cenv_basis(tjm, tkb, tke, tKo, tjn, True)
    return float(np.einsum("mben,mben->", out, Eo))


@lru_cache(maxsize=None)
def _probe_cpush_right(tka, tkop, tkb, tke, tjp, ident,
                       tjm, tKi, tjn, tjx, tKo, tjy) -> float:
    """Charged right push (bra=AR ket=AL):
    out[(tjx,tKo,tjy)] += c * AR[(tjx,tjm)]^dag rB[(tjm,tKi,tjn)]
    AL[(tjy,tjn)]^T."""
    if not (_admissible(tjn, tKi, tjm) and _admissible(tjy, tKo, tjx)
            and _admissible(tjx, tjp, tjm) and _admissible(tjy, tjp, tjn)):
        return 0.0
    E = _cenv_basis(tjm, tkb, tke, tKi, tjn)   # [mm, qb, qe, mn]
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Ab = _site_basis(tjx, tjp, tjm)            # bra AR
    Ak = _site_basis(tjy, tjp, tjn)            # ket AL
    out = np.einsum("mben,abst,xsm,ytn->xaey", E, W, Ab, Ak)
    Eo = _cenv_basis(tjx, tka, tke, tKo, tjy)
    return float(np.einsum("xaey,xaey->", out, Eo))


@lru_cache(maxsize=None)
def _probe_csrc_right(tka, tkop, tkb, tke, tjp, ident,
                      tjm, tjn, tjy, tjmid, tjx, tKo) -> float:
    """Right source: out[(tjx,tKo,tjy)] += c * AR[(tjx,tjm)]^dag
    gr[(tjm,tjn)] W B[(tjy,tjmid,tjn)]^T with gr uncharged at channel
    tkb."""
    if not (_admissible(tjn, tkb, tjm) and _admissible(tjy, tKo, tjx)
            and _admissible(tjx, tjp, tjm)):
        return 0.0
    E = _env_basis(tjm, tkb, tjn)              # [mm, qb, mn]
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Ab = _site_basis(tjx, tjp, tjm)            # bra AR
    Bk = _csite_basis(tjy, tjp, tjmid, tke, tjn)
    out = np.einsum("mbn,abst,xsm,yten->xaey", E, W, Ab, Bk)
    Eo = _cenv_basis(tjx, tka, tke, tKo, tjy)
    return float(np.einsum("xaey,xaey->", out, Eo))


@lru_cache(maxsize=None)
def _probe_cac_center(tka, tkop, tkb, tke, tjp, ident,
                      tjx, tjy, tjmid, tjn, tjmo, tjr) -> float:
    """Matvec term 1: y[(tjx,tjmo,tjr)] += c * gl[(tjx,tjy)]
    B[(tjy,tjmid,tjn)] gr[(tjr,tjn)]^T through one FSM entry."""
    if not (_admissible(tjy, tka, tjx) and _admissible(tjn, tkb, tjr)
            and _admissible(tjx, tjp, tjmo) and _admissible(tjmo, tke, tjr)):
        return 0.0
    Gl = _env_basis(tjx, tka, tjy)
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Bk = _csite_basis(tjy, tjp, tjmid, tke, tjn)
    Gr = _env_basis(tjr, tkb, tjn)
    out = np.einsum("xay,abst,yten,rbn->xser", Gl, W, Bk, Gr)
    T = _csite_basis(tjx, tjp, tjmo, tke, tjr)
    return float(np.einsum("xser,xser->", out, T))


@lru_cache(maxsize=None)
def _probe_cac_lb(tka, tkop, tkb, tke, tjp, ident,
                  tjx, tKi, tjy, tjn, tjmo, tjr) -> float:
    """Matvec term 2: y[(tjx,tjmo,tjr)] += c * lB[(tjx,tKi,tjy)]
    AR[(tjy,tjn)] gr[(tjr,tjn)]^T."""
    if not (_admissible(tjy, tKi, tjx) and _admissible(tjn, tkb, tjr)
            and _admissible(tjy, tjp, tjn) and _admissible(tjx, tjp, tjmo)
            and _admissible(tjmo, tke, tjr)):
        return 0.0
    E = _cenv_basis(tjx, tka, tke, tKi, tjy, True)
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Ak = _site_basis(tjy, tjp, tjn)
    Gr = _env_basis(tjr, tkb, tjn)
    out = np.einsum("xaey,abst,ytn,rbn->xser", E, W, Ak, Gr)
    T = _csite_basis(tjx, tjp, tjmo, tke, tjr)
    return float(np.einsum("xser,xser->", out, T))


@lru_cache(maxsize=None)
def _probe_cac_rb(tka, tkop, tkb, tke, tjp, ident,
                  tjx, tjy, tjn, tKi, tjr, tjmo) -> float:
    """Matvec term 3: y[(tjx,tjmo,tjr)] += c * gl[(tjx,tjy)]
    AL[(tjy,tjn)] rB[(tjr,tKi,tjn)]^T."""
    if not (_admissible(tjy, tka, tjx) and _admissible(tjn, tKi, tjr)
            and _admissible(tjy, tjp, tjn) and _admissible(tjx, tjp, tjmo)
            and _admissible(tjmo, tke, tjr)):
        return 0.0
    Gl = _env_basis(tjx, tka, tjy)
    W = _w_dense(tka, tkop, tkb, tjp, ident)
    Ak = _site_basis(tjy, tjp, tjn)            # ket AL
    E = _cenv_basis(tjr, tkb, tke, tKi, tjn)   # [mr, qb, qe, mn]
    out = np.einsum("xay,abst,ytn,rben->xser", Gl, W, Ak, E)
    T = _csite_basis(tjx, tjp, tjmo, tke, tjr)
    return float(np.einsum("xser,xser->", out, T))


# ----------------------------------------------------------------------------
# Runtime charged kernels (static GEMM lists)
# ----------------------------------------------------------------------------

def vl_x(VL: RBlocks, X: RBlocks, tjp: int, tke: int) -> RBlocks:
    """B = VL . X as charged site blocks."""
    keys, vals = [], []
    for (tjm, tjr), xblk in X.items():
        for (tjl, tjm2), vblk in VL.items():
            if tjm2 != tjm:
                continue
            c = _probe_vlx(tjp, tke, tjl, tjm, tjr)
            keys.append((tjl, tjm, tjr))
            vals.append(c * (vblk @ xblk))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    return RBlocks(tuple(keys[i] for i in order),
                   tuple(vals[i] for i in order))


def vl_pullback(VL: RBlocks, Y: RBlocks, X_like: RBlocks, tjp: int,
                tke: int) -> RBlocks:
    """X' = VL^dag . Y projected on the X key structure."""
    out = {k: jnp.zeros_like(v) for k, v in X_like.items()}
    for (tjl, tjm, tjr), yblk in Y.items():
        if (tjm, tjr) not in out:
            continue
        vblk = VL.get((tjl, tjm))
        if vblk is None:
            continue
        c = _probe_pullback(tjp, tke, tjl, tjm, tjr)
        out[(tjm, tjr)] = out[(tjm, tjr)] + c * (vblk.conj().T @ yblk)
    return RBlocks(X_like.keys, tuple(out[k] for k in X_like.keys))


def _entry_iter(mpo: ReducedMPO):
    """FSM entries plus the implicit identity diagonals, as
    (a, b, tkop, weight, ident)."""
    w = mpo.odim
    out = [(a, b, tkop, wgt, False) for (a, b, tkop, wgt) in mpo.entries]
    out.append((0, 0, 0, 1.0, True))
    out.append((w - 1, w - 1, 0, 1.0, True))
    return tuple(out)


def cpush_left(lB: RBlocks, entry, mpo: ReducedMPO, tke, AL: RBlocks,
               AR: RBlocks, out: RBlocks) -> RBlocks:
    a, b, tkop, wgt, ident = entry
    tka, tkb = mpo.channels[a], mpo.channels[b]
    tjp = mpo.tjp
    acc = {k: v for k, v in out.items()}
    for (tjx, tKi, tjy) in lB.keys:
        for (tjx2, tjm) in AL.keys:
            if tjx2 != tjx:
                continue
            for (tjy2, tjn) in AR.keys:
                if tjy2 != tjy:
                    continue
                for tKo in _fused_channels(tkb, tke):
                    if (tjm, tKo, tjn) not in acc:
                        continue
                    c = _probe_cpush_left(tka, tkop, tkb, tke, tjp, ident,
                                          tjx, tKi, tjy, tjm, tKo, tjn)
                    if abs(c) < 1e-14:
                        continue
                    acc[(tjm, tKo, tjn)] = acc[(tjm, tKo, tjn)] + \
                        (wgt * c) * (AL[(tjx, tjm)].conj().T
                                     @ lB[(tjx, tKi, tjy)] @ AR[(tjy, tjn)])
    return RBlocks(out.keys, tuple(acc[k] for k in out.keys))


def csrc_left(gl: RBlocks, entry, mpo: ReducedMPO, tke, AL: RBlocks,
              B: RBlocks, out: RBlocks) -> RBlocks:
    a, b, tkop, wgt, ident = entry
    tka, tkb = mpo.channels[a], mpo.channels[b]
    tjp = mpo.tjp
    acc = {k: v for k, v in out.items()}
    for (tjx, tjy) in gl.keys:
        for (tjx2, tjm) in AL.keys:
            if tjx2 != tjx:
                continue
            for (tjy2, tjmid, tjn) in B.keys:
                if tjy2 != tjy:
                    continue
                for tKo in _fused_channels(tkb, tke):
                    if (tjm, tKo, tjn) not in acc:
                        continue
                    c = _probe_csrc_left(tka, tkop, tkb, tke, tjp, ident,
                                         tjx, tjy, tjmid, tjn, tjm, tKo)
                    if abs(c) < 1e-14:
                        continue
                    acc[(tjm, tKo, tjn)] = acc[(tjm, tKo, tjn)] + \
                        (wgt * c) * (AL[(tjx, tjm)].conj().T
                                     @ gl[(tjx, tjy)]
                                     @ B[(tjy, tjmid, tjn)])
    return RBlocks(out.keys, tuple(acc[k] for k in out.keys))


def cpush_right(rB: RBlocks, entry, mpo: ReducedMPO, tke, AR: RBlocks,
                AL: RBlocks, out: RBlocks) -> RBlocks:
    a, b, tkop, wgt, ident = entry
    tka, tkb = mpo.channels[a], mpo.channels[b]
    tjp = mpo.tjp
    acc = {k: v for k, v in out.items()}
    for (tjm, tKi, tjn) in rB.keys:
        for (tjx, tjm2) in AR.keys:
            if tjm2 != tjm:
                continue
            for (tjy, tjn2) in AL.keys:
                if tjn2 != tjn:
                    continue
                for tKo in _fused_channels(tka, tke):
                    if (tjx, tKo, tjy) not in acc:
                        continue
                    c = _probe_cpush_right(tka, tkop, tkb, tke, tjp, ident,
                                           tjm, tKi, tjn, tjx, tKo, tjy)
                    if abs(c) < 1e-14:
                        continue
                    acc[(tjx, tKo, tjy)] = acc[(tjx, tKo, tjy)] + \
                        (wgt * c) * (AR[(tjx, tjm)].conj()
                                     @ rB[(tjm, tKi, tjn)]
                                     @ AL[(tjy, tjn)].T)
    return RBlocks(out.keys, tuple(acc[k] for k in out.keys))


def csrc_right(gr: RBlocks, entry, mpo: ReducedMPO, tke, AR: RBlocks,
               B: RBlocks, out: RBlocks) -> RBlocks:
    a, b, tkop, wgt, ident = entry
    tka, tkb = mpo.channels[a], mpo.channels[b]
    tjp = mpo.tjp
    acc = {k: v for k, v in out.items()}
    for (tjm, tjn) in gr.keys:
        for (tjx, tjm2) in AR.keys:
            if tjm2 != tjm:
                continue
            for (tjy, tjmid, tjn2) in B.keys:
                if tjn2 != tjn:
                    continue
                for tKo in _fused_channels(tka, tke):
                    if (tjx, tKo, tjy) not in acc:
                        continue
                    c = _probe_csrc_right(tka, tkop, tkb, tke, tjp, ident,
                                          tjm, tjn, tjy, tjmid, tjx, tKo)
                    if abs(c) < 1e-14:
                        continue
                    acc[(tjx, tKo, tjy)] = acc[(tjx, tKo, tjy)] + \
                        (wgt * c) * (AR[(tjx, tjm)].conj()
                                     @ gr[(tjm, tjn)]
                                     @ B[(tjy, tjmid, tjn)].T)
    return RBlocks(out.keys, tuple(acc[k] for k in out.keys))


def cac_apply(gls, grs, lBs, rBs, mpo: ReducedMPO, tke, AL: RBlocks,
              AR: RBlocks, B: RBlocks) -> RBlocks:
    """The three charged AC-derivative terms summed over FSM entries:
    gl W B gr + lB W AR gr + gl W AL rB, on charged site blocks."""
    tjp = mpo.tjp
    out = {k: jnp.zeros_like(v) for k, v in B.items()}
    for entry in _entry_iter(mpo):
        a, b, tkop, wgt, ident = entry
        tka, tkb = mpo.channels[a], mpo.channels[b]
        gl, gr, lB, rB = gls[a], grs[b], lBs[a], rBs[b]
        for (tjx, tjmo, tjr) in B.keys:
            acc = out[(tjx, tjmo, tjr)]
            # term 1: B center
            for (tjy2, tjmid, tjn) in B.keys:
                if (tjx, tjy2) not in gl.keys or (tjr, tjn) not in gr.keys:
                    continue
                c = _probe_cac_center(tka, tkop, tkb, tke, tjp, ident,
                                      tjx, tjy2, tjmid, tjn, tjmo, tjr)
                if abs(c) < 1e-14:
                    continue
                acc = acc + (wgt * c) * (
                    gl[(tjx, tjy2)] @ B[(tjy2, tjmid, tjn)]
                    @ gr[(tjr, tjn)].T)
            # term 2: lB with AR ket
            for (tjx2, tKi, tjy) in lB.keys:
                if tjx2 != tjx:
                    continue
                for (tjy2, tjn) in AR.keys:
                    if tjy2 != tjy or (tjr, tjn) not in gr.keys:
                        continue
                    c = _probe_cac_lb(tka, tkop, tkb, tke, tjp, ident,
                                      tjx, tKi, tjy, tjn, tjmo, tjr)
                    if abs(c) < 1e-14:
                        continue
                    acc = acc + (wgt * c) * (
                        lB[(tjx, tKi, tjy)] @ AR[(tjy, tjn)]
                        @ gr[(tjr, tjn)].T)
            # term 3: rB with AL ket
            for (tjy, tjn) in AL.keys:
                if (tjx, tjy) not in gl.keys:
                    continue
                for (tjr2, tKi, tjn2) in rB.keys:
                    if tjr2 != tjr or tjn2 != tjn:
                        continue
                    c = _probe_cac_rb(tka, tkop, tkb, tke, tjp, ident,
                                      tjx, tjy, tjn, tKi, tjr, tjmo)
                    if abs(c) < 1e-14:
                        continue
                    acc = acc + (wgt * c) * (
                        gl[(tjx, tjy)] @ AL[(tjy, tjn)]
                        @ rB[(tjr, tKi, tjn)].T)
            out[(tjx, tjmo, tjr)] = acc
    return RBlocks(B.keys, tuple(out[k] for k in B.keys))


# ----------------------------------------------------------------------------
# Charged B-environments (single-site unit cell, momentum-phased tails)
# ----------------------------------------------------------------------------

def qp_envs_reduced(B: RBlocks, AL: RBlocks, AR: RBlocks, gls, grs,
                    mpo: ReducedMPO, tke: int, phase, tol=1e-10):
    """(lBs, rBs): per-FSM-level charged environments of the single
    B insertion. phase = e^{-ip} scalar (left walk; the right walk uses
    its conjugate). For tke != 0 the charged transfer is strictly
    contractive, so identity-diagonal tails are plain linsolves (the
    reference regularizes only trivial excitations,
    exci_transfer_system.jl)."""
    assert tke != 0, (
        "spin-0 reduced excitations coincide with the dense uncharged "
        "path (run excitations_infinite on the embedded state)")
    w = mpo.odim
    secs = _bond_sectors_from_blocks(AL)
    entries = _entry_iter(mpo)
    # the walks below geometric-solve ONLY the identity diagonals at
    # levels 0 / w-1; a diagonal entry at a middle level (exponentially
    # decaying interactions) would need its own linsolve and is silently
    # skipped by the 'a != b' pushes — refuse instead of being wrong
    bad = [e for e in entries
           if e[0] == e[1] and e[0] not in (0, w - 1)]
    if bad:
        raise NotImplementedError(
            "qp_envs_reduced: diagonal FSM entries at middle levels "
            f"{sorted({e[0] for e in bad})} are not supported (each needs "
            "its own geometric-tail linsolve); decompose the interaction "
            "into strictly upper-triangular form first")

    # -- left walk: levels 0..w-1 ----------------------------------------
    lBs = [None] * w
    for b in range(w):
        tkb = mpo.channels[b]
        F = _cenv_zero(secs, tkb, tke, AL)
        for e in entries:
            if e[1] != b:
                continue
            a = e[0]
            if a != b and lBs[a] is not None:
                F = cpush_left(lBs[a], e, mpo, tke, AL, AR, F)
            F = csrc_left(gls[a], e, mpo, tke, AL, B, F)
        F = jax.tree_util.tree_map(lambda v: phase * v, F)
        if b in (0, w - 1):
            ident_e = (b, b, 0, 1.0, True)
            zero = _cenv_zero(secs, tkb, tke, AL)

            def mv(x, _e=ident_e, _z=zero):
                y = cpush_left(x, _e, mpo, tke, AL, AR, _z)
                return jax.tree_util.tree_map(lambda v: phase * v, y)

            lBs[b] = linsolve(mv, F, a0=1.0, a1=-1.0, tol=tol)
        else:
            lBs[b] = F

    # -- right walk: levels w-1..0 ----------------------------------------
    phase_r = jnp.conj(phase)
    rBs = [None] * w
    for a in range(w - 1, -1, -1):
        tka = mpo.channels[a]
        F = _cenv_zero(secs, tka, tke, AR)
        for e in entries:
            if e[0] != a:
                continue
            b = e[1]
            if b != a and rBs[b] is not None:
                F = cpush_right(rBs[b], e, mpo, tke, AR, AL, F)
            F = csrc_right(grs[b], e, mpo, tke, AR, B, F)
        F = jax.tree_util.tree_map(lambda v: phase_r * v, F)
        if a in (0, w - 1):
            ident_e = (a, a, 0, 1.0, True)
            zero = _cenv_zero(secs, tka, tke, AR)

            def mv(x, _e=ident_e, _z=zero):
                y = cpush_right(x, _e, mpo, tke, AR, AL, _z)
                return jax.tree_util.tree_map(lambda v: phase_r * v, y)

            rBs[a] = linsolve(mv, F, a0=1.0, a1=-1.0, tol=tol)
        else:
            rBs[a] = F
    return lBs, rBs


# ----------------------------------------------------------------------------
# The reduced quasiparticle solve
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ReducedQP:
    """SU(2)-reduced quasiparticle: X blocks on the left-gauge null bond,
    excitation spin tke/2, momentum p."""
    X: RBlocks
    VL: RBlocks
    tke: int
    momentum: float


def qp_matvec_reduced(X: RBlocks, VL: RBlocks, state: SU2ReducedState,
                      mpo: ReducedMPO, tke: int, gls, grs, E0, phase,
                      env_tol=1e-10) -> RBlocks:
    """(H_eff(p) - E0) X in reduced coordinates."""
    tjp = state.tjp
    B = vl_x(VL, X, tjp, tke)
    lBs, rBs = qp_envs_reduced(B, state.AL, state.AR, gls, grs, mpo, tke,
                               phase, tol=env_tol)
    y = cac_apply(gls, grs, lBs, rBs, mpo, tke, state.AL, state.AR, B)
    Xp = vl_pullback(VL, y, X, tjp, tke)
    return jax.tree_util.tree_map(lambda a, b: a - E0 * b, Xp, X)


def excitations_su2_reduced(mpo: ReducedMPO, state: SU2ReducedState,
                            momenta, tke: int = 2, num: int = 1,
                            tol: float = 1e-8, krylovdim: int = 20,
                            maxrestarts: int = 60, env_tol: float = 1e-10,
                            key=None):
    """Reduced-coordinate quasiparticle excitation energies in the spin
    tke/2 multiplet sector. Returns (energies (n_momenta, num), qps).

    The flagship use is the spin-1 Heisenberg Haldane gap at p = pi in the
    adjoint (tke=2) sector, the reference's headline SU(2) demo
    (docs/src/man/algorithms.md:180-186)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if np.isscalar(momenta):
        momenta = [momenta]
    tjp = state.tjp
    AL, AR, AC, C = state.AL, state.AR, state.AC, state.C
    dtype = AL.dtype

    gls, grs, _, _ = reduced_ham_envs(AL, AR, C, mpo, tjp, tol=env_tol)
    E0 = jnp.real(tree_dot(AC, rac_apply(gls, grs, mpo, AC))) / \
        jnp.real(tree_dot(AC, AC))

    VL = left_null_reduced(AL, tjp)
    secs = _bond_sectors_from_blocks(AL)
    X0 = random_x(key, VL, secs, tke, dtype)
    assert X0.keys, f"excitation spin {tke}/2 unreachable from the bond"
    X0 = tree_normalize(X0)

    energies, qps = [], []
    for p in momenta:
        if jnp.issubdtype(dtype, jnp.complexfloating):
            phase = jnp.asarray(np.exp(-1j * p), dtype)
        else:
            assert abs(np.sin(p)) < 1e-12, \
                "momentum != 0 mod pi requires a complex dtype"
            phase = jnp.asarray(np.cos(p), dtype)

        found = []
        es = []
        for _ in range(num):
            shift = 100.0 * (1.0 + abs(float(E0)))

            def mv(X, _found=tuple(found)):
                y = qp_matvec_reduced(X, VL, state, mpo, tke, gls, grs,
                                      E0, phase, env_tol=env_tol)
                for xf in _found:
                    ov = shift * tree_dot(xf, X)
                    y = jax.tree_util.tree_map(
                        lambda yv, fv: yv + ov * fv, y, xf)
                return y

            res = eigsh_smallest(mv, X0, krylovdim, maxrestarts, tol,
                                 reorth="local")
            es.append(res.eigenvalue)
            found.append(res.eigenvector)
        energies.append(jnp.stack(es))
        qps.append([ReducedQP(x, VL, tke, float(p)) for x in found])
    return jnp.stack(energies), qps
