"""SU(2) reduced-coordinate (fusion-tree) fast path.

The dense projector backend in `su2.py` keeps full (D, d, D) tensors and
scrubs them with an O(D^2 d n_red) intertwiner projection — correct, but
the compute does not shrink with the symmetry. This module stores ONLY the
reduced degrees of freedom (one multiplicity block per admissible multiplet
pair) and runs every hot contraction as small dense GEMMs over those
blocks — the TPU-native counterpart of TensorKit's `Rep[SU₂]` block-sparse
`TensorMap`s that the reference relies on for its SU(2) tests/examples
(reference test/setup.jl:46-65, docs/src/man/algorithms.md:180-186).

Design
------
* A virtual bond is an `SU2Bond` (multiplets `((2j, mult), ...)`, from
  su2.py). A reduced site tensor is an `RBlocks` pytree keyed by admissible
  `(2j_left, 2j_right)` pairs, each value a `(mult_l, mult_r)` array equal
  to the coefficients of the dense tensor in the ORTHONORMAL (unit
  Frobenius norm) Clebsch-Gordan basis. Orthonormal coefficients mean the
  plain Frobenius metric on blocks equals the dense metric, so the generic
  Krylov machinery (`linalg.lanczos`, `linalg.gmres`) runs UNCHANGED on
  reduced pytrees.
* MPO FSM levels carry irrep labels (`ReducedMPO.channels`); each nonzero
  entry is an irreducible tensor operator of spin k with a scalar reduced
  weight. The three spherical S-components of the dense Heisenberg FSM fuse
  into ONE k=1 channel.
* Every contraction kernel (transfer, source accumulation, AC/C effective
  Hamiltonians) is a static list of `coeff * (block @ block @ block)`
  GEMMs. The scalar structure coefficients (Wigner 6j/9j recouplings in
  disguise) are NOT hand-derived: they are probed numerically at trace time
  by running the corresponding dense contraction at unit multiplicity and
  projecting on the output basis element (`_probe_*` below, cached per spin
  structure). This keeps every phase/normalization convention self-
  consistent by construction.

Oracles: embed/restrict roundtrips, reduced-vs-dense kernel equality on
random states, and the spin-1 Heisenberg ground-state energy
(tests/test_su2_reduced.py).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from math import sqrt
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .su2 import SU2Bond, clebsch_gordan2
from ..linalg.gmres import linsolve_info
from ..linalg.lanczos import eigsh_smallest
from ..tensors.ops import qr_pos, lq_pos


# ----------------------------------------------------------------------------
# Dense Clebsch-Gordan data (numpy, probing/embedding only — never in the
# runtime hot path)
# ----------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _cg(tj1: int, tj2: int, tJ: int) -> np.ndarray:
    """CG tensor C[m1, m2, M] = <j1 m1, j2 m2 | J M> (indices over 2m in
    -2j..2j step 2)."""
    d1, d2, dJ = tj1 + 1, tj2 + 1, tJ + 1
    C = np.zeros((d1, d2, dJ))
    for i1, tm1 in enumerate(range(-tj1, tj1 + 1, 2)):
        for i2, tm2 in enumerate(range(-tj2, tj2 + 1, 2)):
            tM = tm1 + tm2
            if abs(tM) <= tJ and (tJ + tM) % 2 == 0:
                C[i1, i2, (tM + tJ) // 2] = clebsch_gordan2(
                    tj1, tm1, tj2, tm2, tJ, tM)
    return C


def _admissible(tj1: int, tj2: int, tJ: int) -> bool:
    return abs(tj1 - tj2) <= tJ <= tj1 + tj2 and (tj1 + tj2 + tJ) % 2 == 0


@lru_cache(maxsize=None)
def _site_basis(tjl: int, tjp: int, tjr: int) -> np.ndarray:
    """Unit-Frobenius-norm basis tensor T[ml, mp, mr] for a site block."""
    return _cg(tjl, tjp, tjr) / sqrt(tjr + 1)


@lru_cache(maxsize=None)
def _env_basis(tj_bra: int, tk: int, tj_ket: int) -> np.ndarray:
    """Unit-norm basis E[m_bra, q, m_ket] for an environment block carrying
    MPO channel irrep k (k=0 reduces to delta/sqrt(d_bra), matching the
    bond-matrix basis)."""
    C = _cg(tj_ket, tk, tj_bra)            # [m_ket, q, m_bra]
    return np.transpose(C, (2, 1, 0)) / sqrt(tj_bra + 1)


@lru_cache(maxsize=None)
def _op_tensor(tjs: int, tk: int) -> np.ndarray:
    """Unit-norm irreducible tensor operator T[q, s, t] = <s||T^k||s>-free
    Wigner-Eckart matrix elements on the physical spin (s = out, t = in)."""
    C = _cg(tjs, tk, tjs)                  # [t, q, s]
    T = np.transpose(C, (1, 2, 0))
    n = np.linalg.norm(T)
    return T / n


@lru_cache(maxsize=None)
def _w_entry_dense(tka: int, tkop: int, tkb: int, tjs: int) -> np.ndarray:
    """Dense channel form W[qa, qb, s, t] of one FSM entry: the operator's
    q index is fused with the incoming channel via CG into the outgoing."""
    if not _admissible(tka, tkop, tkb):
        raise ValueError((tka, tkop, tkb))
    C = _cg(tka, tkop, tkb)                # [qa, qop, qb]
    T = _op_tensor(tjs, tkop)              # [qop, s, t]
    return np.einsum("aob,ost->abst", C, T)


# ----------------------------------------------------------------------------
# Reduced block containers
# ----------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RBlocks:
    """Static-keyed block dict: keys are tuples of spin labels, values are
    multiplicity matrices. A valid pytree (keys are aux data)."""

    keys: Tuple[tuple, ...]
    vals: Tuple

    def tree_flatten(self):
        return self.vals, self.keys

    @classmethod
    def tree_unflatten(cls, keys, vals):
        return cls(keys, tuple(vals))

    def __getitem__(self, key):
        return self.vals[self.keys.index(key)]

    def get(self, key, default=None):
        return self[key] if key in self.keys else default

    def replace(self, key, val):
        i = self.keys.index(key)
        vals = list(self.vals)
        vals[i] = val
        return RBlocks(self.keys, tuple(vals))

    def items(self):
        return zip(self.keys, self.vals)

    @property
    def dtype(self):
        return self.vals[0].dtype


def _bond_sectors(bond: SU2Bond) -> Tuple[Tuple[int, int], ...]:
    """((2j, mult), ...) with unique, sorted 2j."""
    acc: Dict[int, int] = {}
    for tj, m in bond.multiplets:
        acc[tj] = acc.get(tj, 0) + m
    return tuple(sorted(acc.items()))


def site_keys(bond_l: SU2Bond, tjp: int, bond_r: SU2Bond):
    return tuple((tjl, tjr)
                 for tjl, _ in _bond_sectors(bond_l)
                 for tjr, _ in _bond_sectors(bond_r)
                 if _admissible(tjl, tjp, tjr))


def env_keys(bond: SU2Bond, tk: int):
    """(2j_bra, 2j_ket) pairs admissible for a channel-k environment."""
    secs = _bond_sectors(bond)
    return tuple((tjb, tjk) for tjb, _ in secs for tjk, _ in secs
                 if _admissible(tjk, tk, tjb))


def random_site(key, bond: SU2Bond, tjp: int, dtype=jnp.float64) -> RBlocks:
    secs = dict(_bond_sectors(bond))
    keys = site_keys(bond, tjp, bond)
    vals = []
    for i, (tjl, tjr) in enumerate(keys):
        k = jax.random.fold_in(key, i)
        vals.append(jax.random.normal(k, (secs[tjl], secs[tjr]), dtype))
    return RBlocks(keys, tuple(vals))


def identity_c(bond: SU2Bond, dtype=jnp.float64) -> RBlocks:
    """Reduced coefficients of the dense identity on the bond."""
    secs = _bond_sectors(bond)
    keys = tuple((tj, tj) for tj, _ in secs)
    vals = tuple(sqrt(tj + 1) * jnp.eye(m, dtype=dtype) for tj, m in secs)
    return RBlocks(keys, vals)


def rho_from_c(C: RBlocks, side: str) -> RBlocks:
    """Reduced density matrix from the reduced bond matrix: right cap
    rho_R = C C^dag, left cap rho_L = C^dag C (dense), as k=0 env blocks."""
    vals = []
    for (tj, _), M in C.items():
        P = M @ M.conj().T if side == "right" else M.conj().T @ M
        vals.append(P / sqrt(tj + 1))
    return RBlocks(C.keys, tuple(vals))


def tree_dot(a, b):
    tot = None
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        s = jnp.sum(la.conj() * lb)
        tot = s if tot is None else tot + s
    return tot


# ----------------------------------------------------------------------------
# Dense embedding / restriction (tests + probing)
# ----------------------------------------------------------------------------

def _sector_offsets(bond: SU2Bond):
    """{2j: (offset, mult)} assuming sector-major dense layout."""
    out = {}
    pos = 0
    for tj, m in _bond_sectors(bond):
        out[tj] = (pos, m)
        pos += m * (tj + 1)
    return out


def embed_site(B: RBlocks, bond_l: SU2Bond, tjp: int,
               bond_r: SU2Bond) -> np.ndarray:
    offL, offR = _sector_offsets(bond_l), _sector_offsets(bond_r)
    Dl, Dr, d = bond_l.dim, bond_r.dim, tjp + 1
    A = np.zeros((Dl, d, Dr))
    for (tjl, tjr), blk in B.items():
        (l0, nl), (r0, nr) = offL[tjl], offR[tjr]
        dl, dr = tjl + 1, tjr + 1
        T = _site_basis(tjl, tjp, tjr)
        blkT = np.einsum("ab,lpr->alpbr", np.asarray(blk), T)
        A[l0:l0 + nl * dl, :, r0:r0 + nr * dr] = blkT.reshape(
            nl * dl, d, nr * dr)
    return A


def restrict_site(A: np.ndarray, bond_l: SU2Bond, tjp: int,
                  bond_r: SU2Bond) -> RBlocks:
    offL, offR = _sector_offsets(bond_l), _sector_offsets(bond_r)
    keys = site_keys(bond_l, tjp, bond_r)
    vals = []
    for (tjl, tjr) in keys:
        (l0, nl), (r0, nr) = offL[tjl], offR[tjr]
        dl, dr = tjl + 1, tjr + 1
        T = _site_basis(tjl, tjp, tjr)
        view = np.asarray(A)[l0:l0 + nl * dl, :, r0:r0 + nr * dr].reshape(
            nl, dl, tjp + 1, nr, dr)
        vals.append(jnp.asarray(np.einsum("alpbr,lpr->ab", view, T)))
    return RBlocks(keys, tuple(vals))


def embed_env(G: RBlocks, bond: SU2Bond, tk: int) -> np.ndarray:
    """Dense (D, dk, D) channel environment [bra, q, ket]."""
    off = _sector_offsets(bond)
    D = bond.dim
    E = np.zeros((D, tk + 1, D))
    for (tjb, tjk), blk in G.items():
        (b0, nb), (k0, nk) = off[tjb], off[tjk]
        db, dk = tjb + 1, tjk + 1
        T = _env_basis(tjb, tk, tjk)
        blkT = np.einsum("ab,xqy->axqby", np.asarray(blk), T)
        E[b0:b0 + nb * db, :, k0:k0 + nk * dk] = blkT.reshape(
            nb * db, tk + 1, nk * dk)
    return E


def embed_c(C: RBlocks, bond: SU2Bond) -> np.ndarray:
    E = embed_env(C, bond, 0)
    return E[:, 0, :]


def restrict_env(E: np.ndarray, bond: SU2Bond, tk: int) -> RBlocks:
    off = _sector_offsets(bond)
    keys = env_keys(bond, tk)
    vals = []
    for (tjb, tjk) in keys:
        (b0, nb), (k0, nk) = off[tjb], off[tjk]
        db, dk = tjb + 1, tjk + 1
        T = _env_basis(tjb, tk, tjk)
        view = np.asarray(E)[b0:b0 + nb * db, :, k0:k0 + nk * dk].reshape(
            nb, db, tk + 1, nk, dk)
        vals.append(jnp.asarray(np.einsum("axqby,xqy->ab", view, T)))
    return RBlocks(keys, tuple(vals))


# ----------------------------------------------------------------------------
# Reduced MPO
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ReducedMPO:
    """SU(2)-reduced FSM MPO: `channels[a]` is the irrep 2k carried by FSM
    level a; `entries` are (a, b, 2k_op, weight) with the operator the
    unit-norm spin-2k_op irreducible tensor on the physical spin. Upper
    triangular; levels 0 and w-1 are identity channels (2k=0) with implicit
    diagonal identity entries, matching the MPOHamiltonian FSM convention
    (operators/mpo.py)."""

    tjp: int
    channels: Tuple[int, ...]
    entries: Tuple[Tuple[int, int, int, float], ...]

    @property
    def odim(self):
        return len(self.channels)

    def entries_into(self, b):
        return tuple(e for e in self.entries if e[1] == b and e[0] != b)

    def entries_from(self, a):
        return tuple(e for e in self.entries if e[0] == a and e[1] != a)

    def dense_fsm(self) -> np.ndarray:
        """Dense FSM W[A, B, s, t] with channel levels expanded to their
        (2k+1) spherical components — consumable by MPOHamiltonian for
        cross-checks."""
        d = self.tjp + 1
        dims = [tk + 1 for tk in self.channels]
        offs = np.concatenate([[0], np.cumsum(dims)]).astype(int)
        wD = int(offs[-1])
        W = np.zeros((wD, wD, d, d))
        eye = np.eye(d)
        for lvl in (0, self.odim - 1):
            W[offs[lvl], offs[lvl]] += eye
        for (a, b, tkop, wgt) in self.entries:
            blk = wgt * _w_entry_dense(self.channels[a], tkop,
                                       self.channels[b], self.tjp)
            W[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] += np.transpose(
                blk, (0, 1, 2, 3))
        return W


def heisenberg_reduced(tjs: int = 2, J: float = 1.0) -> ReducedMPO:
    """Spin-(tjs/2) Heisenberg chain  H = J sum_i S_i . S_{i+1}  as a
    3-level reduced FSM (identity, one k=1 channel, identity). The channel
    weights are CALIBRATED numerically: with unit weights the two-site FSM
    path gives some scalar multiple of S.S; the ratio fixes the product
    weight (conventions never enter by hand)."""
    d = tjs + 1
    # dense spin matrices
    j = tjs / 2.0
    mz = np.array([j - n for n in range(d)])
    sp = np.zeros((d, d))
    for n in range(1, d):
        m = mz[n]
        sp[n - 1, n] = sqrt(j * (j + 1) - m * (m + 1))
    sx, sy_i = (sp + sp.T) / 2.0, (sp - sp.T) / 2.0  # sy_i = i*Sy (real)
    ss = (np.kron(sx, sx) - np.kron(sy_i, sy_i)
          + np.kron(np.diag(mz), np.diag(mz)))       # S.S on two sites
    # FSM path with unit weights
    Wd = _w_entry_dense(0, 2, 2, tjs)[0]             # [qb, s, t]
    Wd2 = _w_entry_dense(2, 2, 0, tjs)[:, 0]         # [qa, s, t]
    h2 = np.einsum("qsu,qtv->stuv", Wd, Wd2).reshape(d * d, d * d)
    ratio = ss.reshape(-1) @ h2.reshape(-1) / (h2.reshape(-1) @
                                               h2.reshape(-1))
    return ReducedMPO(tjp=tjs, channels=(0, 2, 0),
                      entries=((0, 1, 2, J * ratio), (1, 2, 2, 1.0)))


def bilinear_biquadratic_reduced(tjs: int = 2, theta: float = 0.0
                                 ) -> ReducedMPO:
    """H = sum_i cos(theta) S.S + sin(theta) (S.S)^2 via the isotropic
    channel decomposition  sum_k c_k sum_q T^k_q (T^k_q)^dag  (k=0,1,2)."""
    d = tjs + 1
    j = tjs / 2.0
    mz = np.array([j - n for n in range(d)])
    sp = np.zeros((d, d))
    for n in range(1, d):
        m = mz[n]
        sp[n - 1, n] = sqrt(j * (j + 1) - m * (m + 1))
    sx, sy_i = (sp + sp.T) / 2.0, (sp - sp.T) / 2.0
    ss = (np.kron(sx, sx) - np.kron(sy_i, sy_i)
          + np.kron(np.diag(mz), np.diag(mz)))
    target = (np.cos(theta) * ss + np.sin(theta) * (ss @ ss))
    # basis: two-site FSM paths per channel k (unit weights)
    chans, paths = [], []
    for tk in (0, 2, 4):
        if tk > 2 * tjs:
            continue
        Wa = _w_entry_dense(0, tk, tk, tjs)[0]       # [qb, s, t]
        Wb = _w_entry_dense(tk, tk, 0, tjs)[:, 0]    # [qa, s, t]
        paths.append(np.einsum("qsu,qtv->stuv", Wa, Wb).reshape(-1))
        chans.append(tk)
    M = np.stack(paths, axis=1)
    coeffs, *_ = np.linalg.lstsq(M, target.reshape(-1), rcond=None)
    resid = np.linalg.norm(M @ coeffs - target.reshape(-1))
    if resid > 1e-10:
        raise ValueError(f"two-site term not isotropic (residual {resid})")
    channels = (0,) + tuple(chans) + (0,)
    w = len(channels)
    entries = []
    for i, (tk, c) in enumerate(zip(chans, coeffs)):
        entries.append((0, 1 + i, tk, float(c)))
        entries.append((1 + i, w - 1, tk, 1.0))
    return ReducedMPO(tjp=tjs, channels=channels, entries=tuple(entries))


# ----------------------------------------------------------------------------
# Structure-coefficient probing
# ----------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _probe_transfer_left(tka, tkop, tkb, tjp, tjx, tjy, tjm, tjn) -> float:
    """out[(jm,jn)] += coeff * Abra^dag gl Aket for one FSM entry: probe the
    dense contraction at unit multiplicity."""
    if not (_admissible(tjx, tjp, tjm) and _admissible(tjy, tjp, tjn)
            and _admissible(tjy, tka, tjx) and _admissible(tjn, tkb, tjm)):
        return 0.0
    E_in = _env_basis(tjx, tka, tjy)       # [mx, qa, my]
    W = _w_entry_dense(tka, tkop, tkb, tjp)  # [qa, qb, s, t]
    Ab = _site_basis(tjx, tjp, tjm)        # [mx, s, mm]
    Ak = _site_basis(tjy, tjp, tjn)        # [my, t, mn]
    out = np.einsum("xay,abst,xsm,ytn->mbn", E_in, W, Ab, Ak)
    E_out = _env_basis(tjm, tkb, tjn)
    return float(np.einsum("mbn,mbn->", out, E_out))


@lru_cache(maxsize=None)
def _probe_transfer_right(tka, tkop, tkb, tjp, tjm, tjn, tjx, tjy) -> float:
    """out[(jx,jy)] += coeff * Abra gr Aket^T (right-moving transfer):
    gr block at (jm_bra, jn_ket), site blocks (jx->jm) and (jy->jn)."""
    if not (_admissible(tjx, tjp, tjm) and _admissible(tjy, tjp, tjn)
            and _admissible(tjn, tkb, tjm) and _admissible(tjy, tka, tjx)):
        return 0.0
    E_in = _env_basis(tjm, tkb, tjn)       # [mm, qb, mn]
    W = _w_entry_dense(tka, tkop, tkb, tjp)
    Ab = _site_basis(tjx, tjp, tjm)        # [mx, s, mm]
    Ak = _site_basis(tjy, tjp, tjn)        # [my, t, mn]
    out = np.einsum("mbn,abst,xsm,ytn->xay", E_in, W, Ab, Ak)
    E_out = _env_basis(tjx, tka, tjy)
    return float(np.einsum("xay,xay->", out, E_out))


@lru_cache(maxsize=None)
def _probe_ac(tka, tkop, tkb, tjp, tjx, tjy, tjn, tjr) -> float:
    """AC' block (jx, jr) += coeff * gl[(jx,jy)] B[(jy,jn)] gr[(jr,jn)]^T."""
    if not (_admissible(tjy, tka, tjx) and _admissible(tjn, tkb, tjr)
            and _admissible(tjy, tjp, tjn) and _admissible(tjx, tjp, tjr)):
        return 0.0
    Gl = _env_basis(tjx, tka, tjy)         # [mx, qa, my]
    W = _w_entry_dense(tka, tkop, tkb, tjp)
    X = _site_basis(tjy, tjp, tjn)         # [my, t, mn]
    Gr = _env_basis(tjr, tkb, tjn)         # [mr, qb, mn]
    out = np.einsum("xay,abst,ytn,rbn->xsr", Gl, W, X, Gr)
    T = _site_basis(tjx, tjp, tjr)
    return float(np.einsum("xsr,xsr->", out, T))


@lru_cache(maxsize=None)
def _probe_ac_identity(tjp, tjx, tjy, tjn, tjr) -> float:
    """AC' coefficient for the implicit diagonal identity entries of the
    FSM (levels 0 and w-1): k=0 environments, W = I_d."""
    if not (tjx == tjy and tjr == tjn and _admissible(tjy, tjp, tjn)
            and _admissible(tjx, tjp, tjr)):
        return 0.0
    Gl = _env_basis(tjx, 0, tjy)[:, 0]     # [mx, my]
    X = _site_basis(tjy, tjp, tjn)         # [my, t, mn]
    Gr = _env_basis(tjr, 0, tjn)[:, 0]     # [mr, mn]
    out = np.einsum("xy,ytn,rn->xtr", Gl, X, Gr)
    T = _site_basis(tjx, tjp, tjr)
    return float(np.einsum("xsr,xsr->", out, T))


@lru_cache(maxsize=None)
def _probe_c(tka, tjx, tjy, tjr) -> float:
    """C' block (jx) += coeff * gl[(jx,jy)] C[jy] gr[(jr=jx,jy)]^T at one
    channel level (gl and gr share the level, q contracted through)."""
    if not (_admissible(tjy, tka, tjx) and _admissible(tjy, tka, tjr)
            and tjx == tjr):
        return 0.0
    Gl = _env_basis(tjx, tka, tjy)
    Cb = np.eye(tjy + 1) / sqrt(tjy + 1)
    Gr = _env_basis(tjr, tka, tjy)
    out = np.einsum("xay,yn,ran->xr", Gl, Cb, Gr)
    T = np.eye(tjx + 1) / sqrt(tjx + 1)
    return float(np.einsum("xr,xr->", out, T))


_ID_ENTRY = (0, 0)  # (tka=0, tkop=0) with dense identity W — plain transfer


@lru_cache(maxsize=None)
def _probe_plain_left(tjp, tjx, tjm, tjy, tjn) -> float:
    """Plain (identity-channel) transfer coefficient: k=0 env, W = I_d."""
    if not (_admissible(tjx, tjp, tjm) and _admissible(tjy, tjp, tjn)
            and tjx == tjy and tjm == tjn):
        return 0.0
    E_in = _env_basis(tjx, 0, tjy)[:, 0]   # [mx, my]
    Ab = _site_basis(tjx, tjp, tjm)
    Ak = _site_basis(tjy, tjp, tjn)
    out = np.einsum("xy,xsm,ysn->mn", E_in, Ab, Ak)
    E_out = _env_basis(tjm, 0, tjn)[:, 0]
    return float(np.einsum("mn,mn->", out, E_out))


@lru_cache(maxsize=None)
def _probe_plain_right(tjp, tjx, tjm, tjy, tjn) -> float:
    if not (_admissible(tjx, tjp, tjm) and _admissible(tjy, tjp, tjn)
            and tjx == tjy and tjm == tjn):
        return 0.0
    E_in = _env_basis(tjm, 0, tjn)[:, 0]
    Ab = _site_basis(tjx, tjp, tjm)
    Ak = _site_basis(tjy, tjp, tjn)
    out = np.einsum("mn,xsm,ysn->xy", E_in, Ab, Ak)
    E_out = _env_basis(tjx, 0, tjy)[:, 0]
    return float(np.einsum("xy,xy->", out, E_out))


# ----------------------------------------------------------------------------
# Runtime reduced kernels (static GEMM lists inside jit)
# ----------------------------------------------------------------------------

def rtransfer_left_plain(v: RBlocks, B: RBlocks, Bbar: RBlocks,
                         tjp: int) -> RBlocks:
    """Identity-channel left transfer: v' = sum Abra^dag v Aket."""
    out = {}
    for (tjx, tjy) in v.keys:
        for (tjl, tjm) in B.keys:
            if tjl != tjx:
                continue
            c = _probe_plain_left(tjp, tjx, tjm, tjy, tjm)
            if abs(c) < 1e-14 or (tjy, tjm) not in B.keys:
                continue
            g = c * (Bbar[(tjx, tjm)].conj().T @ v[(tjx, tjy)]
                     @ B[(tjy, tjm)])
            out[(tjm, tjm)] = out.get((tjm, tjm), 0.0) + g
    keys = tuple(sorted(out))
    return RBlocks(keys, tuple(out[k] for k in keys))


def rtransfer_right_plain(v: RBlocks, B: RBlocks, Bbar: RBlocks,
                          tjp: int) -> RBlocks:
    out = {}
    for (tjm, tjn) in v.keys:
        for (tjx, tjm2) in B.keys:
            if tjm2 != tjm:
                continue
            c = _probe_plain_right(tjp, tjx, tjm, tjx, tjn)
            if abs(c) < 1e-14 or (tjx, tjn) not in B.keys:
                continue
            g = c * (Bbar[(tjx, tjm)].conj() @ v[(tjm, tjn)]
                     @ B[(tjx, tjn)].T)
            out[(tjx, tjx)] = out.get((tjx, tjx), 0.0) + g
    keys = tuple(sorted(out))
    return RBlocks(keys, tuple(out[k] for k in keys))


def _env_zero(bond_secs, tk, like) -> RBlocks:
    secs = dict(bond_secs)
    keys = tuple((tb, tn) for tb in secs for tn in secs
                 if _admissible(tn, tk, tb))
    keys = tuple(sorted(keys))
    vals = tuple(jnp.zeros((secs[tb], secs[tn]), like.dtype)
                 for (tb, tn) in keys)
    return RBlocks(keys, vals)


def rtransfer_left_entry(gl: RBlocks, entry, mpo: ReducedMPO, B: RBlocks,
                         out: RBlocks) -> RBlocks:
    """Accumulate one FSM entry's left transfer into `out` (channel of the
    target level)."""
    a, b, tkop, wgt = entry
    tka, tkb = mpo.channels[a], mpo.channels[b]
    for (tjx, tjy) in gl.keys:
        for (tjxx, tjm) in B.keys:
            if tjxx != tjx:
                continue
            for (tjyy, tjn) in B.keys:
                if tjyy != tjy or (tjm, tjn) not in out.keys:
                    continue
                c = _probe_transfer_left(tka, tkop, tkb, mpo.tjp,
                                         tjx, tjy, tjm, tjn)
                if abs(c) < 1e-14:
                    continue
                g = (wgt * c) * (B[(tjx, tjm)].conj().T @ gl[(tjx, tjy)]
                                 @ B[(tjy, tjn)])
                out = out.replace((tjm, tjn), out[(tjm, tjn)] + g)
    return out


def rtransfer_right_entry(gr: RBlocks, entry, mpo: ReducedMPO, B: RBlocks,
                          out: RBlocks) -> RBlocks:
    a, b, tkop, wgt = entry
    tka, tkb = mpo.channels[a], mpo.channels[b]
    for (tjm, tjn) in gr.keys:
        for (tjx, tjmm) in B.keys:
            if tjmm != tjm:
                continue
            for (tjy, tjnn) in B.keys:
                if tjnn != tjn or (tjx, tjy) not in out.keys:
                    continue
                c = _probe_transfer_right(tka, tkop, tkb, mpo.tjp,
                                          tjm, tjn, tjx, tjy)
                if abs(c) < 1e-14:
                    continue
                g = (wgt * c) * (B[(tjx, tjm)].conj() @ gr[(tjm, tjn)]
                                 @ B[(tjy, tjn)].T)
                out = out.replace((tjx, tjy), out[(tjx, tjy)] + g)
    return out


def rac_apply(gls, grs, mpo: ReducedMPO, B: RBlocks) -> RBlocks:
    """Reduced effective AC Hamiltonian: sum over FSM entries (a,b) of
    gl[a] W[ab] B gr[b] (the diagonal identity levels contribute through
    their k=0 entries implicitly: (0,0) and (w-1,w-1))."""
    w = mpo.odim
    entries = mpo.entries + ((0, 0, 0, None), (w - 1, w - 1, 0, None))
    out = {k: jnp.zeros_like(v) for k, v in B.items()}
    for (a, b, tkop, wgt) in entries:
        gl, gr = gls[a], grs[b]
        tka, tkb = mpo.channels[a], mpo.channels[b]
        identity = wgt is None
        for (tjx, tjy) in gl.keys:
            for (tjyy, tjn) in B.keys:
                if tjyy != tjy:
                    continue
                for (tjr, tjnn) in gr.keys:
                    if tjnn != tjn or (tjx, tjr) not in out:
                        continue
                    if identity:
                        c = _probe_ac_identity(mpo.tjp, tjx, tjy, tjn, tjr)
                    else:
                        c = wgt * _probe_ac(tka, tkop, tkb, mpo.tjp,
                                            tjx, tjy, tjn, tjr)
                    if abs(c) < 1e-14:
                        continue
                    out[(tjx, tjr)] = out[(tjx, tjr)] + c * (
                        gl[(tjx, tjy)] @ B[(tjy, tjn)] @ gr[(tjr, tjn)].T)
    return RBlocks(B.keys, tuple(out[k] for k in B.keys))


def rc_apply(gls, grs, mpo: ReducedMPO, C: RBlocks) -> RBlocks:
    """Reduced zero-site Hamiltonian: sum over levels a of
    gl[a] C gr[a] with the channel index contracted through."""
    out = {k: jnp.zeros_like(v) for k, v in C.items()}
    for a in range(mpo.odim):
        gl, gr = gls[a], grs[a]
        tka = mpo.channels[a]
        for (tjx, tjy) in gl.keys:
            if (tjy, tjy) not in C.keys:
                continue
            for (tjr, tjyy) in gr.keys:
                if tjyy != tjy or tjr != tjx or (tjx, tjx) not in out:
                    continue
                c = _probe_c(tka, tjx, tjy, tjr)
                if abs(c) < 1e-14:
                    continue
                out[(tjx, tjx)] = out[(tjx, tjx)] + c * (
                    gl[(tjx, tjy)] @ C[(tjy, tjy)] @ gr[(tjr, tjy)].T)
    return RBlocks(C.keys, tuple(out[k] for k in C.keys))


# ----------------------------------------------------------------------------
# Reduced uniform gauging (single-site unit cell)
# ----------------------------------------------------------------------------

def _stack_left(B: RBlocks, tjr: int):
    """vstack of all blocks flowing into right sector tjr; returns
    (matrix, [(key, nl)])."""
    rows, meta = [], []
    for (tjl, tjr2), blk in B.items():
        if tjr2 == tjr:
            rows.append(blk)
            meta.append(((tjl, tjr2), blk.shape[0]))
    return jnp.concatenate(rows, axis=0), meta


def _unstack_left(M, meta):
    out = {}
    pos = 0
    for key, nl in meta:
        out[key] = M[pos:pos + nl]
        pos += nl
    return out


def left_qr_reduced(B: RBlocks):
    """(AL, C): per right sector tjr, QR of the stacked blocks scaled so AL
    is exactly left-isometric in the dense sense (sum_jl AL^dag AL =
    (2jr+1) I in orthonormal-coefficient storage)."""
    tjrs = sorted({k[1] for k in B.keys})
    al = {}
    ckeys, cvals = [], []
    for tjr in tjrs:
        S, meta = _stack_left(B, tjr)
        sq = sqrt(tjr + 1)
        Q, R = qr_pos(S / sq)
        al.update({k: sq * v for k, v in _unstack_left(Q, meta).items()})
        ckeys.append((tjr, tjr))
        cvals.append(sq * R)
    AL = RBlocks(B.keys, tuple(al[k] for k in B.keys))
    return AL, RBlocks(tuple(ckeys), tuple(cvals))


def _stack_right(B: RBlocks, tjl: int):
    cols, meta = [], []
    for (tjl2, tjr), blk in B.items():
        if tjl2 == tjl:
            cols.append(blk)
            meta.append(((tjl2, tjr), blk.shape[1]))
    return jnp.concatenate(cols, axis=1), meta


def _unstack_right(M, meta):
    out = {}
    pos = 0
    for key, nr in meta:
        out[key] = M[:, pos:pos + nr]
        pos += nr
    return out


def right_lq_reduced(B: RBlocks):
    """(C, AR): per left sector tjl, LQ of the hstacked blocks; AR is
    exactly right-isometric in the dense sense."""
    tjls = sorted({k[0] for k in B.keys})
    ar = {}
    ckeys, cvals = [], []
    for tjl in tjls:
        S, meta = _stack_right(B, tjl)
        sq = sqrt(tjl + 1)
        L, Q = lq_pos(S / sq)
        ar.update({k: sq * v for k, v in _unstack_right(Q, meta).items()})
        ckeys.append((tjl, tjl))
        cvals.append(sq * L)
    AR = RBlocks(B.keys, tuple(ar[k] for k in B.keys))
    return RBlocks(tuple(ckeys), tuple(cvals)), AR


def rmul_c_right(B: RBlocks, C: RBlocks) -> RBlocks:
    """Reduced blocks of A . C_dense (bond matrix on the right leg)."""
    vals = []
    for (tjl, tjr), blk in B.items():
        M = C[(tjr, tjr)] / sqrt(tjr + 1)
        vals.append(blk @ M)
    return RBlocks(B.keys, tuple(vals))


def rmul_c_left(C: RBlocks, B: RBlocks) -> RBlocks:
    vals = []
    for (tjl, tjr), blk in B.items():
        M = C[(tjl, tjl)] / sqrt(tjl + 1)
        vals.append(M @ blk)
    return RBlocks(B.keys, tuple(vals))


def tree_normalize(x):
    n = jnp.sqrt(jnp.real(tree_dot(x, x)))
    return jax.tree_util.tree_map(
        lambda l: l / jnp.maximum(n, 1e-30), x)


def uniform_gauge_reduced(A: RBlocks, tjp: int, tol=1e-13, maxiter=200):
    """(AL, AR, AC, C) from a raw reduced site tensor: alternating
    C A -> AL C' QR iteration (and the mirror), single-site unit cell."""
    keys_c = tuple(sorted({(k[1], k[1]) for k in A.keys}))
    sector_dim = {k[1]: blk.shape[1] for k, blk in A.items()}
    C = RBlocks(keys_c, tuple(
        jnp.eye(sector_dim[tj], dtype=A.dtype) for (tj, _) in keys_c))
    C = tree_normalize(C)
    AL = A
    for _ in range(maxiter):
        CA = rmul_c_left(C, A)
        AL, C_new = left_qr_reduced(CA)
        C_new = tree_normalize(C_new)
        err = jnp.sqrt(jnp.real(tree_dot(
            jax.tree_util.tree_map(lambda a, b: a - b, C_new, C),
            jax.tree_util.tree_map(lambda a, b: a - b, C_new, C))))
        C = C_new
        if float(err) < tol:
            break
    # right gauge from AL: AC = AL C_R with C_R the right fixed point
    CR = C
    for _ in range(maxiter):
        ACr = rmul_c_right(AL, CR)
        CR_new, AR = right_lq_reduced(ACr)
        CR_new = tree_normalize(CR_new)
        err = jnp.sqrt(jnp.real(tree_dot(
            jax.tree_util.tree_map(lambda a, b: a - b, CR_new, CR),
            jax.tree_util.tree_map(lambda a, b: a - b, CR_new, CR))))
        CR = CR_new
        if float(err) < tol:
            break
    AC = rmul_c_right(AL, CR)
    return AL, AR, AC, CR


def regauge_acc_reduced(AC: RBlocks, C: RBlocks) -> RBlocks:
    """AL = argmin |AC - AL C| (reference regauge!, ortho.jl:127-131):
    per right sector, Q_AC Q_C^dag."""
    tjrs = sorted({k[1] for k in AC.keys})
    al = {}
    for tjr in tjrs:
        S, meta = _stack_left(AC, tjr)
        QA, _ = qr_pos(S)
        QC, _ = qr_pos(C[(tjr, tjr)])
        Q = QA @ QC.conj().T
        al.update({k: sqrt(tjr + 1) * v
                   for k, v in _unstack_left(Q, meta).items()})
    return RBlocks(AC.keys, tuple(al[k] for k in AC.keys))


def regauge_cac_reduced(C: RBlocks, AC: RBlocks) -> RBlocks:
    """AR = argmin |AC - C AR| via LQ (mirror)."""
    tjls = sorted({k[0] for k in AC.keys})
    ar = {}
    for tjl in tjls:
        S, meta = _stack_right(AC, tjl)
        _, QA = lq_pos(S)
        _, QC = lq_pos(C[(tjl, tjl)])
        Q = QC.conj().T @ QA
        ar.update({k: sqrt(tjl + 1) * v
                   for k, v in _unstack_right(Q, meta).items()})
    return RBlocks(AC.keys, tuple(ar[k] for k in AC.keys))


# ----------------------------------------------------------------------------
# Reduced infinite Hamiltonian environments (single-site unit cell)
# ----------------------------------------------------------------------------

def reduced_ham_envs(AL: RBlocks, AR: RBlocks, C: RBlocks,
                     mpo: ReducedMPO, tjp: int, tol=1e-12,
                     gl_init=None, gr_init=None):
    """(gls, grs, e_density, resid): FSM-level-walked reduced environments,
    geometric series on the identity levels solved by the shared restarted
    GMRES (reference mpohaminfenv.jl:76-175, here on reduced blocks)."""
    w = mpo.odim
    secs = _bond_sectors_from_blocks(AL)
    dtype = AL.dtype
    cap_r = rho_from_c(C, "right")
    cap_l = rho_from_c(C, "left")
    eye_r = identity_c_from_blocks(AL, dtype)

    gls = [None] * w
    grs = [None] * w
    gls[0] = eye_r
    grs[w - 1] = eye_r
    resid = jnp.zeros((), jnp.zeros((), dtype).real.dtype)
    e_density = jnp.zeros((), dtype)

    # left walk: levels 1..w-1
    for b in range(1, w):
        tkb = mpo.channels[b]
        out = _env_zero(secs, tkb, AL)
        for entry in mpo.entries_into(b):
            a = entry[0]
            out = rtransfer_left_entry(gls[a], entry, mpo, AL, out)
        if b == w - 1:
            # identity diagonal: geometric series, regularized
            e_density = jnp.real(tree_dot(cap_r, out))
            F_reg = _sub_pair(out, cap_r, eye_r)

            def mv_reg(x):
                Tx = rtransfer_left_plain(x, AL, AL, tjp)
                return _sub_pair(Tx, cap_r, eye_r)

            guess = None if gl_init is None else _sub_pair(
                gl_init[b], cap_r, eye_r)
            x0, r = linsolve_info(mv_reg, F_reg, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=12, maxiter=100,
                                  stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))
            gls[b] = x0
        else:
            gls[b] = out  # zero diagonal (strictly upper FSM interior)

    # right walk: levels w-2..0
    for a in range(w - 2, -1, -1):
        tka = mpo.channels[a]
        out = _env_zero(secs, tka, AR)
        for entry in mpo.entries_from(a):
            b = entry[1]
            out = rtransfer_right_entry(grs[b], entry, mpo, AR, out)
        if a == 0:
            F_reg = _sub_pair(out, cap_l, eye_r)

            def mv_reg(x):
                Tx = rtransfer_right_plain(x, AR, AR, tjp)
                return _sub_pair(Tx, cap_l, eye_r)

            guess = None if gr_init is None else _sub_pair(
                gr_init[a], cap_l, eye_r)
            x0, r = linsolve_info(mv_reg, F_reg, x0=guess, a0=1.0, a1=-1.0,
                                  tol=tol, restart=12, maxiter=100,
                                  stall_exit=True)
            resid = jnp.maximum(resid, jnp.real(r))
            grs[a] = x0
        else:
            grs[a] = out
    return gls, grs, e_density, resid


def _bond_sectors_from_blocks(B: RBlocks):
    secs = {}
    for (tjl, tjr), blk in B.items():
        secs[tjl] = blk.shape[0]
        secs[tjr] = blk.shape[1]
    return tuple(sorted(secs.items()))


def identity_c_from_blocks(B: RBlocks, dtype) -> RBlocks:
    secs = _bond_sectors_from_blocks(B)
    keys = tuple((tj, tj) for tj, _ in secs)
    vals = tuple(sqrt(tj + 1) * jnp.eye(n, dtype=dtype) for tj, n in secs)
    return RBlocks(keys, vals)


def _sub_pair(x: RBlocks, cap: RBlocks, eye: RBlocks) -> RBlocks:
    """x - <x, cap> * eye (rank-1 regularization on the identity channel;
    all three share the k=0 diagonal key structure)."""
    c = tree_dot(cap, x)
    vals = tuple(xv - c * eye[k] for k, xv in x.items())
    return RBlocks(x.keys, vals)


# ----------------------------------------------------------------------------
# Reduced VUMPS
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SU2ReducedState:
    """Uniform reduced MPS (single-site unit cell)."""
    AL: RBlocks
    AR: RBlocks
    AC: RBlocks
    C: RBlocks
    tjp: int

    @staticmethod
    def random(key, bond: SU2Bond, tjp: int, dtype=jnp.float64):
        A = random_site(key, bond, tjp, dtype)
        AL, AR, AC, C = uniform_gauge_reduced(A, tjp)
        return SU2ReducedState(AL, AR, tree_normalize(AC),
                               tree_normalize(C), tjp)


def find_groundstate_su2_reduced(state: SU2ReducedState, mpo: ReducedMPO,
                                 tol=1e-8, maxiter=200, krylovdim=10,
                                 eig_maxrestarts=4, verbosity=0):
    """VUMPS in reduced coordinates. Returns (state, e_density, eps)."""
    from functools import partial as _partial

    tjp = state.tjp

    @_partial(jax.jit, static_argnums=(5, 6))
    def iteration(AL, AR, AC, C, inner_tol, m, restarts,
                  gl_guess=None, gr_guess=None):
        gls, grs, e, resid = reduced_ham_envs(
            AL, AR, C, mpo, tjp, tol=1e-12,
            gl_init=gl_guess, gr_init=gr_guess)
        res_ac = eigsh_smallest(lambda x: rac_apply(gls, grs, mpo, x),
                                AC, m, restarts, inner_tol, reorth="local")
        res_c = eigsh_smallest(lambda x: rc_apply(gls, grs, mpo, x),
                               C, m, restarts, inner_tol, reorth="local")
        ACn = tree_normalize(res_ac.eigenvector)
        Cn = tree_normalize(res_c.eigenvector)
        ALn = regauge_acc_reduced(ACn, Cn)
        ARn = regauge_cac_reduced(Cn, ACn)
        diff = jax.tree_util.tree_map(
            lambda a, b: a - b, ACn, rmul_c_right(ALn, Cn))
        eps = jnp.sqrt(jnp.real(tree_dot(diff, diff)))
        return ALn, ARn, ACn, Cn, eps, e, resid, gls, grs

    from ..utils.dynamictols import updatetol
    from ..utils.logging import IterLog

    log = IterLog("VUMPS(SU2-reduced)", verbosity)
    AL, AR, AC, C = state.AL, state.AR, state.AC, state.C
    eps, e = 1.0, 0.0
    gls = grs = None
    for it in range(1, maxiter + 1):
        inner_tol = updatetol(eps, it)
        AL, AR, AC, C, eps_j, e_j, resid, gls, grs = iteration(
            AL, AR, AC, C, jnp.asarray(inner_tol), krylovdim,
            eig_maxrestarts, gl_guess=gls, gr_guess=grs)
        eps, e = float(eps_j), float(e_j)
        if verbosity >= 2:
            log.conv(it, e, eps)
        if float(resid) > 1e-6 and verbosity >= 1:
            from ..utils.logging import logger
            logger.warning(
                f"SU2-reduced VUMPS it {it}: env GMRES residual "
                f"{float(resid):.3e}")
        if eps < tol:
            break
    else:
        log.cancel(it, e, eps)
    return SU2ReducedState(AL, AR, AC, C, state.tjp), e, eps


def schmidt_spectrum_reduced(state: SU2ReducedState):
    """{2j: multiplet singular values} from the reduced bond matrix — each
    entry is a (2j+1)-fold degenerate dense Schmidt multiplet."""
    out = {}
    for (tj, _), M in state.C.items():
        s = np.linalg.svd(np.asarray(M), compute_uv=False) / sqrt(tj + 1)
        out[tj] = np.sort(s)[::-1]
    return out
