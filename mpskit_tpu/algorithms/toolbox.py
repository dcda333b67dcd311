"""Measurement toolbox (reference src/algorithms/toolbox.jl).

entropy, entanglement_spectrum, calc_galerkin, variance, correlation_length
and friends. Spectrum-valued functions return fixed-width arrays with
zero-padding beyond the physical rank (static shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..states.finitemps import FiniteMPS
from ..tensors.ops import leftorth, safe_xlogx
from ..environments.finite import finite_environments, stack_W
from .derivatives import ac_apply


def entanglement_spectrum(psi, bond: int = None):
    """Schmidt values across `bond` (to the right of site bond-1 for finite
    states; defaults to the middle bond / after-center bond).
    (Reference src/algorithms/toolbox.jl:65-69.)"""
    from ..states.windowmps import WindowMPS

    if isinstance(psi, WindowMPS):
        psi = psi.window
    if isinstance(psi, FiniteMPS):
        if bond is None:
            bond = psi.length // 2
        p = psi.move_center(max(bond - 1, 0))
        if bond == 0:
            return jnp.ones((1,), jnp.float64)
        C = p.bond_matrix()
        S = jnp.linalg.svd(C, compute_uv=False)
        return S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
    # infinite states: singular values of C[bond]
    from ..states.infinitemps import InfiniteMPS

    if isinstance(psi, InfiniteMPS):
        C = psi.C[(bond if bond is not None else 0) % psi.period]
        S = jnp.linalg.svd(C, compute_uv=False)
        return S / jnp.maximum(jnp.linalg.norm(S), 1e-30)
    raise TypeError(type(psi))


def entropy(psi, bond: int = None):
    """Von Neumann entanglement entropy at a bond
    (reference src/algorithms/toolbox.jl:2-5)."""
    S = entanglement_spectrum(psi, bond)
    p = S**2
    return -jnp.sum(safe_xlogx(p))


def entropy_profile(psi: FiniteMPS):
    """Entanglement entropy at every interior bond x = 1..L-1 of a finite
    state (one left-to-right gauge pass; the Calabrese-Cardy input).
    (Reference computes this per-bond via `entropy(psi, bond)`,
    src/algorithms/toolbox.jl:2-5.)"""
    out = []
    p = psi
    for x in range(1, psi.length):
        p = p.move_center(x - 1)
        C = p.bond_matrix()
        S = jnp.linalg.svd(C, compute_uv=False)
        q = (S / jnp.maximum(jnp.linalg.norm(S), 1e-30)) ** 2
        out.append(-jnp.sum(safe_xlogx(q)))
    return jnp.stack(out)


def calc_galerkin(psi, H, envs=None):
    """Galerkin residual ||(1 - P_tangent) H_eff AC|| at the center site
    (reference src/algorithms/toolbox.jl:17-38)."""
    if isinstance(psi, FiniteMPS):
        if envs is None:
            envs = finite_environments(psi, H)
        c = psi.center
        W = stack_W(H, psi.length)[c].astype(psi.AC.dtype)
        y = ac_apply(envs.leftenv(c), W, envs.rightenv(c), psi.AC)
        AL, _ = leftorth(psi.AC)
        z = jnp.einsum("lpm,lpr->mr", AL.conj(), y)
        return jnp.linalg.norm(y - jnp.einsum("lpm,mr->lpr", AL, z))
    from ..states.infinitemps import InfiniteMPS
    from ..environments.infinite_ham import hamiltonian_environments

    if isinstance(psi, InfiniteMPS):
        if envs is None:
            envs = hamiltonian_environments(psi, H)
        L = psi.period
        Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)

        def site(GL, W, GR, AC, AL):
            y = ac_apply(GL, W, GR, AC)
            z = jnp.einsum("lpm,lpr->mr", AL.conj(), y)
            return jnp.linalg.norm(y - jnp.einsum("lpm,mr->lpr", AL, z))

        return jnp.max(jax.vmap(site)(envs.GLs, Ws, envs.GRs, psi.AC, psi.AL))
    raise TypeError(type(psi))


# ----------------------------------------------------------------------------
# transfer spectra / correlation lengths
# ----------------------------------------------------------------------------

def transfer_spectrum(psi, num: int = 5, krylovdim: int = 40, sector=None):
    """Leading eigenvalues of the unit-cell AL transfer operator
    (reference src/algorithms/toolbox.jl:43-56). Returns eigenvalues sorted
    by descending magnitude (lambda_1 = 1 for a normalized state).

    sector: charge flux of the transfer eigenvector — the reference's
    `transfer_spectrum(psi; sector=...)` selects eigenvectors v with
    charge(bra) - charge(ket) = sector. Requires an abelian-symmetric
    state (`symmetry.charges.SymmetricInfiniteMPS`), whose static bond
    charge labels confine the Arnoldi iteration to the flux-q subspace;
    sector=0 on a symmetric state restricts to charge-diagonal
    eigenvectors (the untwisted channel)."""
    from ..states.infinitemps import InfiniteMPS
    from ..transfermatrix.transfer import transfer_left
    from ..linalg.arnoldi import spectrum_arnoldi

    charges = None
    if not isinstance(psi, InfiniteMPS):
        from ..symmetry.charges import SymmetricInfiniteMPS

        if isinstance(psi, SymmetricInfiniteMPS):
            # transfer eigenvectors live on the cell-boundary bond
            charges = np.asarray(psi.bond_charges[len(psi.bond_charges) - 1])
            psi = psi.state
        else:
            raise TypeError(type(psi))
    if sector is not None and charges is None:
        raise ValueError(
            "sector-resolved transfer_spectrum needs a SymmetricInfiniteMPS "
            "(static bond charge labels)")
    L, D = psi.period, psi.D

    M = None
    if sector is not None:
        live = charges < 10 ** 6          # exclude padding sentinels
        flux = charges[:, None] - charges[None, :] == sector
        M = jnp.asarray(flux & live[:, None] & live[None, :],
                        dtype=psi.dtype)

    def mv(v):
        if M is not None:
            v = v * M

        def body(v, A):
            return transfer_left(v, A, A), None

        v, _ = jax.lax.scan(body, v, psi.AL)
        return v if M is None else v * M

    v0 = jnp.eye(D, dtype=psi.dtype) + 0.1 * psi.rho_right(L - 1).astype(psi.dtype)
    if M is not None:
        key = jax.random.PRNGKey(0)
        v0 = (v0 + jax.random.normal(key, (D, D),
                                     jnp.zeros((), psi.dtype).real.dtype)
              .astype(psi.dtype)) * M
    lams, _ = spectrum_arnoldi(mv, v0, m=min(krylovdim, D * D), nev=num)
    return lams


def marek_gap(psi, num: int = 5, krylovdim: int = 40):
    """(epsilon, delta): epsilon = -log|lambda_2| is the inverse correlation
    length per unit cell, delta the gap to the next transfer eigenvalue —
    used for extrapolation (reference toolbox.jl:87-127)."""
    lams = transfer_spectrum(psi, num=max(num, 3), krylovdim=krylovdim)
    mags = jnp.abs(lams) / jnp.abs(lams[0])
    eps = -jnp.log(mags[1])
    delta = -jnp.log(mags[2]) + jnp.log(mags[1])
    return eps, delta


def correlation_length(psi, krylovdim: int = 40):
    """xi = L / epsilon in units of sites (reference toolbox.jl:87-127)."""
    eps, _ = marek_gap(psi, krylovdim=krylovdim)
    return psi.period / eps


# ----------------------------------------------------------------------------
# variance
# ----------------------------------------------------------------------------

def variance(psi, H, envs=None):
    """Energy variance <H^2> - <H>^2 for finite states (exact, via the MPO
    product); for infinite states the two-site tangent variance density
    (the standard Hubig-style local variance, cf. reference
    toolbox.jl:136-179). Finite quasiparticle states embed into a
    FiniteMPS first (reference toolbox.jl:154-156); LazySum operators are
    materialized (reference toolbox.jl:175-180)."""
    from .expval import expectation_value
    from ..operators.lazysum import LazySum, MultipliedOperator
    from ..states.quasiparticle import FiniteQP, qp_to_finitemps

    if isinstance(H, LazySum):
        return variance(psi, H.sum_materialized(), envs=None)
    if isinstance(H, MultipliedOperator):
        return variance(psi, H.eval_at(0.0), envs=None)
    if isinstance(psi, FiniteQP):
        return variance(qp_to_finitemps(psi), H)
    from ..states.windowmps import WindowMPS

    if isinstance(psi, WindowMPS):
        # Hubig-style two-site tangent variance summed over the window,
        # with the boundary environments seeded from the infinite sides
        # (reference toolbox.jl:147-153 window variance)
        from ..environments.finite import compute_right_envs, stack_W
        from ..tensors.ops import leftorth, leftnull, rightnull
        from ..transfermatrix.transfer import transfer_left_mpo
        from .derivatives import ac2_apply

        win = psi.window.move_center(0)
        L = win.length
        Ws = stack_W(H, L).astype(win.dtype)
        GL0, GRL = psi.boundary_envs(H)
        # GLs[i] = left of site i (recomputed from the AL stack once the
        # center has passed; here we walk the center ourselves and only
        # use GLs[i] at the step where sites < i are AL-gauged)
        GRs = compute_right_envs(win.ARs, Ws, GRL)
        total = 0.0
        psi_c = win
        GL = GL0
        for i in range(L - 1):
            AC = psi_c.AC
            theta = jnp.einsum("lpm,mqr->lpqr", AC, psi_c.ARs[i + 1])
            h2 = ac2_apply(GL, Ws[i], Ws[i + 1], GRs[i + 2], theta)
            ALi, _ = leftorth(AC)
            VL = leftnull(ALi)
            VR = rightnull(psi_c.ARs[i + 1])
            M = jnp.einsum("lpk,lpqr,mqr->km", VL.conj(), h2, VR.conj())
            total = total + jnp.sum(jnp.abs(M) ** 2)
            if i < L - 2:
                psi_c = psi_c.move_center(i + 1)
                GL = transfer_left_mpo(GL, Ws[i], psi_c.ALs[i],
                                       psi_c.ALs[i])
        return jnp.real(total)
    if isinstance(psi, FiniteMPS):
        H2 = H @ H
        e = expectation_value(psi, H)
        e2 = expectation_value(psi, H2)
        return jnp.real(e2) - jnp.real(e) ** 2
    from ..states.infinitemps import InfiniteMPS
    from ..environments.infinite_ham import hamiltonian_environments
    from ..states.quasiparticle import null_spaces
    from .derivatives import ac2_apply

    if isinstance(psi, InfiniteMPS):
        if envs is None:
            envs = hamiltonian_environments(psi, H)
        L = psi.period
        Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
        VLs = null_spaces(psi.AL)
        from ..tensors.ops import rightnull

        total = 0.0
        for i in range(L):
            j = (i + 1) % L
            theta = jnp.einsum("lpm,mqr->lpqr", psi.AC[i], psi.AR[j])
            h2 = ac2_apply(envs.GLs[i], Ws[i], Ws[j], envs.GRs[j], theta)
            VR = rightnull(psi.AR[j])
            M = jnp.einsum("lpk,lpqr,mqr->km", VLs[i].conj(), h2, VR.conj())
            total = total + jnp.sum(jnp.abs(M) ** 2)
        return jnp.real(total)
    raise TypeError(type(psi))


# ----------------------------------------------------------------------------
# exact diagonalization (reference src/algorithms/ED.jl:4-53)
# ----------------------------------------------------------------------------

def exact_diagonalization(H, L: int, num: int = 1, dtype=jnp.complex128,
                          tol: float = 1e-12, key=None):
    """Ground state(s) of H on L sites by Lanczos on the middle-site
    effective Hamiltonian of a maximal-bond-dimension FiniteMPS. Returns
    (energies (num,), states list)."""
    from ..states.finitemps import FiniteMPS
    from ..environments.finite import (
        finite_environments, stack_W,
    )
    from ..linalg.lanczos import eigsh_smallest

    if key is None:
        key = jax.random.PRNGKey(0)
    d = H.physicaldim
    mid = L // 2
    D = d ** min(mid, L - mid, 10)
    psi = FiniteMPS.random(key, L, d, D, dtype=dtype)
    psi = psi.move_center(mid)
    envs = finite_environments(psi, H)
    W = stack_W(H, L)[mid].astype(dtype)
    GL, GR = envs.leftenv(mid), envs.rightenv(mid)

    energies, states, xs = [], [], []
    shift = 10.0 + abs(float(jnp.linalg.norm(jnp.asarray(H.W)))) * L

    for k in range(num):
        found = tuple(xs)

        def mv(x, _found=found):
            y = ac_apply(GL, W, GR, x)
            for xf in _found:
                y = y + shift * jnp.vdot(xf, x) * xf
            return y

        res = eigsh_smallest(mv, psi.AC, m=30, maxrestarts=200, tol=tol)
        energies.append(res.eigenvalue)
        xs.append(res.eigenvector)
        states.append(
            FiniteMPS(psi.ALs, psi.ARs, res.eigenvector, mid))
    return jnp.stack(energies), states


# ----------------------------------------------------------------------------
# periodic boundary conditions (reference toolbox.jl:186-306)
# ----------------------------------------------------------------------------

def periodic_boundary_conditions(H, L: int):
    """Wrap an MPOHamiltonian onto a ring of L sites (reference
    toolbox.jl:186-306, general FSM case). The reference tracks triples
    (progress-above, lent level, progress-below) through fuser isometries;
    in the dense backend the same bookkeeping is explicit wrap channels:

    A term crossing the cut occupies FSM level b ("lent") at the bond
    between sites L-1 and 0. Its remainder is carried by channels
    (b, a, phase): the TAIL continues the original FSM from level b at
    site 0 (a walks b -> end), then WAITS on the identity, then the HEAD
    replays the start of the FSM (a walks start -> b) and closes exactly
    at level b on the last site. Injection/closure are absorbed into the
    site-0 row and site-(L-1) column, so the standard open-chain boundary
    vectors (level 0 left, last level right) apply unchanged.

    Supports arbitrary n-site interactions (any upper-triangular FSM,
    including nonzero mid diagonals = exponential interactions) and
    multi-site unit cells (L must be a multiple of the period)."""
    import numpy as np
    from ..operators.mpo import MPOHamiltonian

    P = H.period
    assert L % P == 0, "ring length must be a multiple of the unit cell"
    W = np.asarray(H.W)
    w, d = H.odim, H.physicaldim
    mids = range(1, w - 1)

    # wrap-channel index map
    extra = []
    for b in mids:
        for a in range(b, w):          # tail states (a = w-1 is "waiting")
            extra.append(("T", b, a))
        for a in range(1, b + 1):      # head states (mid levels <= b)
            extra.append(("H", b, a))
    wn = w + len(extra)
    emap = {lbl: w - 1 + i for i, lbl in enumerate(extra)}

    def lvl(a):   # base levels keep their index; end moves to the last slot
        return wn - 1 if a == w - 1 else a

    Ws = np.zeros((L, wn, wn, d, d), W.dtype)
    for i in range(L):
        Wi = W[i % P]
        # base OBC transitions
        for a in range(w):
            for b in range(w):
                Ws[i, lvl(a), lvl(b)] += Wi[a, b]
        for b in mids:
            # tail progress (T,b,a) -> (T,b,a2) via the original FSM
            for a in range(b, w - 1):
                for a2 in range(a, w):
                    Ws[i, emap[("T", b, a)], emap[("T", b, a2)]] += Wi[a, a2]
            # waiting: identity carry
            Ws[i, emap[("T", b, w - 1)], emap[("T", b, w - 1)]] += \
                Wi[w - 1, w - 1]
            # head start from waiting, then head progress below level b
            for k in range(1, b + 1):
                Ws[i, emap[("T", b, w - 1)], emap[("H", b, k)]] += Wi[0, k]
                for k2 in range(k, b + 1):
                    Ws[i, emap[("H", b, k)], emap[("H", b, k2)]] += Wi[k, k2]

    # site-0 injection: the tail's first operator continues from the lent
    # level b (absorbed into the start row)
    for b in mids:
        for a2 in range(b, w):
            Ws[0, 0, emap[("T", b, a2)]] += W[0][b, a2]
    # site-(L-1) closure: the head's last operator reaches level b at the
    # cut (absorbed into the end column); incl. single-site heads from the
    # waiting state
    for b in mids:
        WL = W[(L - 1) % P]
        Ws[L - 1, emap[("T", b, w - 1)], wn - 1] += WL[0, b]
        for k in range(1, b + 1):
            Ws[L - 1, emap[("H", b, k)], wn - 1] += WL[k, b]
    # wrap channels must not leak through the open boundaries
    for lbl, c in emap.items():
        Ws[0, c, :] = 0.0
        Ws[L - 1, :, c] = 0.0
    return MPOHamiltonian.from_dense_W(Ws).remove_orphans()


def periodic_boundary_conditions_densempo(O, L: int):
    """Ring trace of a DenseMPO as an open-chain DenseMPO (reference
    toolbox.jl:309-341): the cut virtual index alpha rides along as a
    spectator — middle tensors become block-diagonal copies
    O'[(a,alpha),(b,alpha)] = O[a,b]; the first site emits alpha, the last
    site closes it (trace over the ring)."""
    import numpy as np
    from ..operators.mpo import DenseMPO

    Os = [np.asarray(O.site(i)) for i in range(L)]
    w = Os[0].shape[0]
    d = Os[0].shape[2]
    first = np.zeros((1, w * w, d, d), Os[0].dtype)
    for al in range(w):
        for b in range(w):
            first[0, b * w + al] = Os[0][al, b]
    mids = []
    for i in range(1, L - 1):
        M = np.zeros((w * w, w * w, d, d), Os[i].dtype)
        for al in range(w):
            for a in range(w):
                for b in range(w):
                    M[a * w + al, b * w + al] = Os[i][a, b]
        mids.append(M)
    last = np.zeros((w * w, 1, d, d), Os[-1].dtype)
    for al in range(w):
        for a in range(w):
            last[a * w + al, 0] = Os[L - 1][a, al]
    import jax.numpy as jnp
    return DenseMPO(tuple(jnp.asarray(x)
                          for x in [first] + mids + [last]))


# ----------------------------------------------------------------------------
# fidelity susceptibility (reference src/algorithms/fidelity_susceptibility.jl)
# ----------------------------------------------------------------------------

def fidelity_susceptibility(psi, H, Vs, envs=None, tol: float = 1e-8):
    """Tangent-space linear response: solve (H_eff - E) x_a = -P_T V_a |psi>
    per perturbation V_a and return the Gram matrix <x_a, rhs_b>
    (reference fidelity_susceptibility.jl:4-29). Infinite states only."""
    from ..states.infinitemps import InfiniteMPS
    from ..states.quasiparticle import LeftGaugedQP
    from ..environments.infinite_ham import hamiltonian_environments
    from ..algorithms.excitations import (
        _qp_matvec_infinite, _renorm_energies_infinite,
    )
    from ..linalg.gmres import linsolve_cg

    assert isinstance(psi, InfiniteMPS)
    if envs is None:
        envs = hamiltonian_environments(psi, H)
    L = psi.period
    Es = _renorm_energies_infinite(psi, H, envs)
    qp0 = LeftGaugedQP.random(jax.random.PRNGKey(0), psi, momentum=0.0)

    rhss = []
    for V in Vs:
        venvs = hamiltonian_environments(psi, V)
        Wv = jnp.stack([V.site(i) for i in range(L)]).astype(psi.dtype)

        def site(GL, W, GR, AC, VL):
            y = ac_apply(GL, W, GR, AC)
            return jnp.einsum("lpk,lpr->kr", VL.conj(), y)

        rhs = jax.vmap(site)(venvs.GLs, Wv, venvs.GRs, psi.AC, qp0.VLs)
        rhss.append(rhs)

    def hmv(X):
        return _qp_matvec_infinite(X, qp0, H, envs.GLs, envs.GRs, Es, tol)

    # H_eff - E is Hermitian PSD on the tangent space: hand-rolled CG (the
    # operator itself nests GMRES environment solves, so jax.scipy solvers
    # cannot be stacked here)
    sols = [linsolve_cg(hmv, rhs, tol=tol) for rhs in rhss]
    # Gram matrix of the tangent solutions (reference
    # fidelity_susceptibility.jl:25-27)
    n = len(Vs)
    G = jnp.zeros((n, n), psi.dtype)
    for a in range(n):
        for b in range(n):
            G = G.at[a, b].set(jnp.vdot(sols[a], sols[b]))
    return G
