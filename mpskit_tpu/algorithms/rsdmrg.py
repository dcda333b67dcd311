"""Real-space (segment-parallel) DMRG — algorithm-level parallelism over
the device mesh.

Beyond-reference capability: MPSKit.jl's parallelism is shared-memory
threads over sites/FSM blocks (SURVEY.md §2.7, reference
src/algorithms/groundstate/vumps.jl:39-49); plain DMRG sweeps are
inherently sequential in the chain direction. Here the chain is split
into `nseg` contiguous segments that run full one-site DMRG mini-sweeps
*simultaneously* — block-Jacobi in real space, in the spirit of
Stoudenmire & White, PRB 87, 155137 (2013) — with the segment axis a
leading batch axis (`jax.vmap`) that shards over the mesh's 'site' axis,
so each TPU core owns a segment and the round's wall-clock is one
mini-sweep of L/nseg sites.

Round structure (all inside ONE jit):

1. *Capture pass*: a left-to-right QR scan over the current
   right-canonical state yields fresh left isometries ``ALf`` and the
   bond matrix ``C(b)`` at every bond (exactly satisfying
   ``C(i)·AR(i) = ALf(i)·C(i+1)``).
2. Global environment scans give ``GL`` at every segment start (from
   ``ALf``) and ``GR`` stacks (from the old ARs).
3. Every segment k solves its sites with frozen outer environments:
   a standard `_dmrg_sweep_impl` on the sub-chain with boundary
   environments ``GL[a_k]``/``GR[b_k+1]`` and initial center
   ``C(a_k)·AR(a_k)`` — vmapped over k.
4. *Stitch*: the updated segments are spliced back into one chain.
   Segment k's output carries the interface bond matrix inside its
   center, so the stale copy ``C(a_{k+1})`` at its right edge is divided
   out with a Tikhonov-regularized right-solve (the Λ⁻¹ step of
   real-space parallel DMRG; regularization replaces the hard
   pseudo-inverse cutoff). At the joint fixed point the splice is exact,
   so the converged state and energy match serial DMRG.
5. Re-canonicalize (reverse QR scan, masked) back to center 0.

Information propagates one segment per round, so convergence needs a few
more rounds than serial DMRG needs sweeps; each round is ~nseg× cheaper
in wall-clock on an nseg-core mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_ITER
from ..environments.finite import (
    left_boundary, right_boundary, compute_left_envs, compute_right_envs,
    stack_W,
)
from ..states.finitemps import FiniteMPS, support_mask, physical_bond_dims
from ..tensors.ops import leftorth, rightorth, TruncationScheme, notrunc
from ..utils.logging import IterLog
from ..utils.dynamictols import updatetol
from .dmrg import _dmrg_sweep, _dmrg_sweep_impl
from .dmrg2 import _dmrg2_sweep_impl, bond_support_vectors
from .unionalg import Chainable


@dataclasses.dataclass(frozen=True)
class RealSpaceParallelDMRG(Chainable):
    """Segment-parallel one-site DMRG.

    nseg: number of chain segments (must divide L; one mesh core each).
    warmup: serial sweeps before the parallel rounds (seeds the
        interfaces; block-Jacobi then only has to refine).
    rcond: Tikhonov scale for the interface bond-matrix right-solve;
        None picks a dtype-aware default (1e-6 f64 / 3e-4 f32).
    """

    nseg: int = 4
    tol: float = 1e-10
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    eig_maxrestarts: int = 4
    warmup: int = 2
    verbosity: int = Defaults.verbosity
    reorth: str = "local1"
    rcond: Optional[float] = None
    # two_site=True runs TWO-site mini-sweeps inside every segment
    # (RS-DMRG2): each segment's interior bonds are re-split by truncated
    # SVD every round, so a poorly seeded interior Schmidt basis is
    # repaired in-round instead of over many one-site rounds — the
    # block-Jacobi analogue of DMRG2 vs DMRG. Interface bonds stay
    # one-site (they are owned by the stitch); convergence is measured by
    # energy stationarity, as in DMRG2.
    two_site: bool = False
    trscheme: TruncationScheme = dataclasses.field(default_factory=notrunc)
    # called as finalize(iter, psi, H) after every round (same contract as
    # DMRG/VUMPS, reference dmrg.jl:19); may return a replacement state
    finalize: Optional[object] = None
    # run the capture/stitch/re-canonicalization passes in f64 for an f32
    # state. None = auto: on only on the CPU backend with x64 enabled
    # (on TPU the emulated-f64 QR is ~25x slower AND NaNs on the zero
    # columns these passes produce — measured; f32 rounds there rely on
    # the best-iterate tracking instead).
    stitch_f64: Optional[bool] = None


def _bond_support_masks(L, d, D):
    """(L, D, D) boolean masks of the supported block of the bond matrix
    right of each site."""
    dims = physical_bond_dims(L, d, D)
    m = np.zeros((L, D, D), bool)
    for i in range(L):
        m[i, : dims[i + 1], : dims[i + 1]] = True
    return m


def _sanitize(x, rel=None):
    """Zero entries below rel·max|x| (default: machine epsilon).

    The interface right-solve and the bond-matrix products leave entries
    spanning the full exponent range (measured down to 1e-21 at D=512
    f32); Householder QR column norms (entry²) on such columns UNDERFLOW
    to zero and the 'orthogonal' factor comes out wildly non-orthogonal
    (measured orth-err ~1e6), which explodes the environment scans to
    1e25 and NaNs the segment solves. Entries below eps·max are
    indistinguishable from matmul rounding noise, so zeroing them before
    every QR/LQ in the capture/re-canonicalization scans loses nothing
    and keeps every surviving column norm representable."""
    if rel is None:
        rel = float(jnp.finfo(x.dtype).eps)
    m = jnp.max(jnp.abs(x))
    return jnp.where(jnp.abs(x) > rel * m, x, 0.0).astype(x.dtype)


def _solve_left(C, A, lam):
    """X ≈ C⁻¹ · A over the LEFT index of a site tensor A (D, d, D), via
    the Tikhonov-regularized normal equations X = (CᴴC + λI)⁻¹·Cᴴ·A — a
    Cholesky solve (TPU-friendly; LAPACK-style pinv needs an SVD, which
    SIGABRTs the TPU compiler inside loops).

    Conditioning note: the stale interface bond matrix must be divided
    out of the RIGHT segment's center (whose content in weak Schmidt
    directions is itself σ-weighted, so the quotient stays O(1)) — NOT
    out of the left segment's edge isometry, whose O(1) rows in dead
    directions would be amplified by 1/σ and destroy the f32 state at
    large D (measured divergence at D=512)."""
    D = C.shape[0]
    G = C.conj().T @ C + lam * jnp.eye(D, dtype=C.dtype)
    Y = jnp.einsum("ml,mpr->lpr", C.conj(), A)
    X = jax.scipy.linalg.solve(G, Y.reshape(D, -1), assume_a="pos")
    return X.reshape(A.shape)


@partial(jax.jit, static_argnums=(5, 6, 7),
         static_argnames=("reorth", "mesh", "stitch_f64", "two_site",
                          "trscheme"))
def _rs_round(ARs, AC, Ws, masks, bond_masks, nseg: int, m: int,
              restarts: int, inner_tol, lam_reg, reorth: str = "local1",
              mesh=None, stitch_f64: bool = False, two_site: bool = False,
              trscheme: Optional[TruncationScheme] = None):
    """One parallel round: capture → segment sweeps (vmapped) → stitch →
    re-canonicalize. State convention in/out: center 0 (AC + ARs[1:])."""
    L, D, d = ARs.shape[0], ARs.shape[1], ARs.shape[2]
    w = Ws.shape[1]
    dtype = AC.dtype
    Lseg = L // nseg
    # The capture/stitch/re-canonicalization passes optionally run at
    # HIGHER precision than the mini-sweeps (stitch_f64, CPU-only auto
    # default — see RealSpaceParallelDMRG): the interface division
    # injects O(rcond) error per round in the stitch's own arithmetic,
    # and at f32 that slow leak was measured to erode a converged state
    # (~1e-2 energy drift over ~10 rounds at D=32..512). In f64 the same
    # passes are exact to ~1e-12 and cost only O(L·D³) FLOPs.
    if stitch_f64:
        hi = (jnp.complex128
              if jnp.issubdtype(dtype, jnp.complexfloating) else jnp.float64)
    else:
        hi = dtype
    maskf = masks.astype(dtype)
    bmaskf = bond_masks.astype(hi)

    # ---- 1. capture pass: fresh ALs + bond matrix at every bond ----
    raw = jnp.concatenate([AC[None], ARs[1:]], axis=0).astype(hi)

    # The capture/re-canonicalization QRs see tensors whose dead Schmidt
    # directions decay without bound (products of tiny bond-matrix
    # entries): columns underflow f32 norms OR (after _sanitize) become
    # exactly zero, and the TPU/XLA Householder QR mishandles both
    # (measured: intermittent orth-err up to 1e6 at D=512 f32, which
    # explodes the environment scans; the f64 QR NaNs on exactly-zero
    # columns, see tensors/ops._svd_via_gram). Serial sweeps never hit
    # this because eigensolve outputs carry ~eps·max noise in EVERY
    # direction — so replicate that invariant: after sanitizing, bump the
    # matrix diagonal by 4·eps·max (above the sanitize cutoff, at the
    # matmul noise floor of the stitch precision).
    bump = 4.0 * float(jnp.finfo(jnp.zeros((), hi).real.dtype).eps)

    def _floored_left(Ain):
        eta = (bump * jnp.max(jnp.abs(Ain))).astype(Ain.dtype)
        B = Ain.reshape(-1, Ain.shape[-1])
        B = B + eta * jnp.eye(B.shape[0], B.shape[1], dtype=Ain.dtype)
        return B.reshape(Ain.shape)

    def _floored_right(Ain):
        eta = (bump * jnp.max(jnp.abs(Ain))).astype(Ain.dtype)
        B = Ain.reshape(Ain.shape[0], -1)
        B = B + eta * jnp.eye(B.shape[0], B.shape[1], dtype=Ain.dtype)
        return B.reshape(Ain.shape)

    def capL(C, xs):
        A, mk, bm = xs
        Ain = _floored_left(_sanitize(jnp.einsum("lm,mpr->lpr", C, A)))
        AL, Cn = leftorth(Ain)
        AL = AL * mk
        Cn = Cn * bm
        Cn = Cn / jnp.maximum(jnp.linalg.norm(Cn), 1e-30)
        return Cn, (AL, Cn)

    _, (ALf, Cs) = jax.lax.scan(
        capL, jnp.eye(D, dtype=hi), (raw, maskf.astype(hi), bmaskf))
    ALf = ALf.astype(dtype)

    # ---- 2. global environments ----
    GLs = compute_left_envs(ALf, Ws, left_boundary(w, D, dtype))
    GRs = compute_right_envs(ARs, Ws, right_boundary(w, D, dtype))

    # ---- 3. per-segment stacks (segment k owns sites k·Lseg..(k+1)·Lseg-1)
    starts = [k * Lseg for k in range(nseg)]
    ARs_seg = ARs.reshape(nseg, Lseg, D, d, D)
    Ws_seg = Ws.reshape(nseg, Lseg, w, w, d, d)
    masks_seg = masks.reshape(nseg, Lseg, D, d, D)
    AC0 = [AC] + [
        jnp.einsum("lm,mpr->lpr", Cs[a - 1],
                   ARs[a].astype(hi)).astype(dtype) for a in starts[1:]]
    AC_seg = jnp.stack(AC0)
    GL0_seg = jnp.stack([GLs[a] for a in starts])
    GRL_seg = jnp.stack([GRs[a + Lseg] for a in starts])
    GRs_seg = jnp.stack([
        jax.lax.dynamic_slice_in_dim(GRs, a, Lseg + 1) for a in starts])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        seg_sh = NamedSharding(mesh, P("site"))
        (ARs_seg, Ws_seg, masks_seg, AC_seg, GL0_seg, GRL_seg, GRs_seg) = (
            jax.lax.with_sharding_constraint(x, seg_sh)
            for x in (ARs_seg, Ws_seg, masks_seg, AC_seg, GL0_seg,
                      GRL_seg, GRs_seg))

    # ---- 4. simultaneous segment mini-sweeps ----
    if two_site:
        # RS-DMRG2: two-site mini-sweeps with the global bond-support
        # vectors sliced per segment (segment k owns bonds a_k..a_k+Lseg)
        sup = jnp.asarray(bond_support_vectors(L, d, D))
        sup_seg = jnp.stack([
            jax.lax.dynamic_slice_in_dim(sup, a, Lseg + 1) for a in starts])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sup_seg = jax.lax.with_sharding_constraint(
                sup_seg, NamedSharding(mesh, P("site")))

        def seg_sweep2(ALs_k, ARs_k, AC_k, Ws_k, GRs_k, GL0_k, GRL_k, sup_k):
            return _dmrg2_sweep_impl(
                ALs_k, ARs_k, AC_k, Ws_k, GRs_k, inner_tol, m, restarts,
                trscheme, GL0=GL0_k, GRL=GRL_k, sup=sup_k)

        ALs_n, ARs_n, AC_n, _, lam, eps, diag = jax.vmap(seg_sweep2)(
            jnp.zeros_like(ARs_seg), ARs_seg, AC_seg, Ws_seg, GRs_seg,
            GL0_seg, GRL_seg, sup_seg)
    else:
        def seg_sweep(ALs_k, ARs_k, AC_k, Ws_k, GRs_k, GL0_k, GRL_k, mk):
            return _dmrg_sweep_impl(
                ALs_k, ARs_k, AC_k, Ws_k, GRs_k, inner_tol, m, restarts,
                GL0=GL0_k, GRL=GRL_k, masks=mk, reorth=reorth,
                use_fast=False)

        ALs_n, ARs_n, AC_n, _, lam, eps, diag = jax.vmap(seg_sweep)(
            jnp.zeros_like(ARs_seg), ARs_seg, AC_seg, Ws_seg, GRs_seg,
            GL0_seg, GRL_seg, masks_seg)

    # ---- 5. stitch: centers back in, stale interface bond matrices out.
    # Segment k>0's center was seeded as C(a_k)·AR(a_k) while segment k-1's
    # tail keeps the state's full right-canonical weight, so the spliced
    # chain would double-count C(a_k); divide it back out of the center
    # (see _solve_left for why the center and not the tail).
    heads = jax.vmap(_solve_left, in_axes=(0, 0, None))(
        jnp.stack([Cs[a - 1] for a in starts[1:]]),
        AC_n[1:].astype(hi), lam_reg.astype(jnp.zeros((), hi).real.dtype))
    heads = jnp.concatenate([AC_n[:1].astype(hi),
                             jax.vmap(_sanitize)(heads)])
    raw_new = ARs_n.astype(hi).at[:, 0].set(heads)
    raw_new = (raw_new.reshape(L, D, d, D) * maskf.astype(hi))

    # ---- 6. re-canonicalize to center 0 (masked reverse QR scan) ----
    def capR(C, xs):
        A, mk = xs
        Ain = _floored_right(_sanitize(jnp.einsum("lpm,mr->lpr", A, C)))
        Cn, AR = rightorth(Ain)
        AR = AR * mk
        nrm = jnp.maximum(jnp.linalg.norm(Cn), 1e-30)
        return Cn / nrm, AR

    C0, ARs_out = jax.lax.scan(
        capR, jnp.eye(D, dtype=hi), (raw_new, maskf.astype(hi)),
        reverse=True)
    AC_out = jnp.einsum("lm,mpr->lpr", C0, ARs_out[0]) * maskf[0].astype(hi)
    AC_out = AC_out / jnp.maximum(jnp.linalg.norm(AC_out), 1e-30)
    ARs_out = ARs_out.astype(dtype)
    AC_out = AC_out.astype(dtype)

    n_unconv = jnp.sum(diag[0]).astype(jnp.int32)
    worst = jnp.max(diag[1])
    return ARs_out, AC_out, lam[0], jnp.max(eps), (n_unconv, worst)


def find_groundstate_rsdmrg(psi: FiniteMPS, H,
                            alg: RealSpaceParallelDMRG = RealSpaceParallelDMRG(),
                            mesh=None):
    """Run segment-parallel DMRG. Returns (psi, envs, epsilon).

    mesh: optional `jax.sharding.Mesh` with a 'site' axis; the stacked
    segment tensors are then placed so each core runs one segment's
    mini-sweep (validated on the virtual CPU mesh; the round function is
    identical sharded and unsharded)."""
    from ..config import matmul_precision

    L, D, d = psi.length, psi.D, psi.physicaldim
    if alg.nseg < 2:
        raise ValueError("nseg must be >= 2 (use DMRG for a single segment)")
    if L % alg.nseg != 0:
        raise ValueError(f"nseg={alg.nseg} must divide L={L}")
    if L // alg.nseg < 2:
        raise ValueError("segments need at least 2 sites")
    psi = psi.move_center(0)
    Ws = stack_W(H, L).astype(psi.dtype)
    w = Ws.shape[1]
    masks = jnp.asarray(support_mask(L, d, D))
    bond_masks = jnp.asarray(_bond_support_masks(L, d, D))
    x64_on = jnp.zeros((), jnp.float64).dtype == jnp.dtype(jnp.float64)
    is_f64 = jnp.zeros((), psi.dtype).real.dtype == jnp.dtype(jnp.float64)
    stitch_f64 = alg.stitch_f64
    if stitch_f64 is None:
        stitch_f64 = (not is_f64) and x64_on and (
            jax.default_backend() == "cpu")
    if alg.rcond is None:
        if is_f64:
            rcond = 1e-6
        else:
            # f32 state: with an f64 stitch rcond only needs to sit above
            # the f32 DATA noise; with f32 stitch arithmetic it needs the
            # wider margin.
            rcond = 1e-5 if stitch_f64 else 3e-4
    else:
        rcond = alg.rcond
    lam_reg = jnp.asarray(rcond ** 2, jnp.zeros((), psi.dtype).real.dtype)

    ALs, ARs, AC = (jnp.array(x, copy=True)
                    for x in (psi.ALs, psi.ARs, psi.AC))
    log = IterLog("RS-DMRG", alg.verbosity)
    log.init()
    eps = 1.0

    with matmul_precision(psi.dtype):
        # serial warmup sweeps seed the interfaces
        GRs = compute_right_envs(ARs, Ws, right_boundary(w, D, psi.dtype))
        for it in range(alg.warmup):
            ALs, ARs, AC, GRs, lam, eps, diag = _dmrg_sweep(
                ALs, ARs, AC, Ws, GRs, updatetol(float(eps), it + 1),
                alg.krylovdim, alg.eig_maxrestarts, masks=masks,
                reorth=alg.reorth)
            eps = float(eps)

        # best-iterate tracking: each round's site eigenvalue is a true
        # Rayleigh quotient of the global H (variational, >= E0), so the
        # lowest-lam iterate is the best state seen. The rounds are
        # block-Jacobi and at finite precision can drift after converging
        # (the interface division injects O(rcond·eps_stitch) per round);
        # stop after `patience` rounds without improvement and return the
        # best, never the drifted tail.
        lam = jnp.zeros(())
        best = (ARs, AC, float("inf"), 1.0)
        stall, patience = 0, 3
        it = 0
        lam_prev = None
        for it in range(1, alg.maxiter + 1):
            inner_tol = updatetol(eps, it)
            ARs, AC, lam, eps, diag = _rs_round(
                ARs, AC, Ws, masks, bond_masks, alg.nseg, alg.krylovdim,
                alg.eig_maxrestarts, inner_tol, lam_reg, reorth=alg.reorth,
                mesh=mesh, stitch_f64=stitch_f64, two_site=alg.two_site,
                trscheme=alg.trscheme if alg.two_site else None)
            lamf = float(jnp.real(lam))
            if alg.two_site:
                # two-site rounds report the truncation error in `eps`;
                # convergence is energy stationarity (as in DMRG2)
                eps = (abs(lamf - lam_prev)
                       if lam_prev is not None else 1.0)
                lam_prev = lamf
            else:
                eps = float(eps)
            if alg.finalize is not None:
                cur = FiniteMPS(jnp.zeros_like(ARs), ARs, AC, 0)
                new = alg.finalize(it, cur, H) or cur
                ARs, AC = (jnp.array(x, copy=True)
                           for x in (new.ARs, new.AC))
            log.solver_warn(it, diag, float(inner_tol))
            if alg.verbosity >= VERBOSE_ITER:
                log.conv(it, lamf, eps)
            gain = best[2] - lamf
            if lamf < best[2]:
                best = (ARs, AC, lamf, eps)
            if eps < alg.tol:
                break
            tiny = 10 * float(jnp.finfo(
                jnp.zeros((), psi.dtype).real.dtype).eps) * max(
                abs(lamf), 1.0)
            stall = 0 if gain > max(alg.tol, tiny) else stall + 1
            if stall >= patience:
                break
        else:
            log.cancel(it, float(jnp.real(lam)), eps)
        if eps >= alg.tol and best[2] < float("inf"):
            ARs, AC, _, eps = best

    from ..environments.finite import finite_environments

    out = FiniteMPS(jnp.zeros_like(ARs), ARs, AC, 0)
    return out, finite_environments(out, H), eps
