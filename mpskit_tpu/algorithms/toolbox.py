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


def calc_galerkin(psi, H, envs=None):
    """Galerkin residual ||(1 - P_tangent) H_eff AC|| at the center site
    (reference src/algorithms/toolbox.jl:17-38)."""
    if isinstance(psi, FiniteMPS):
        if envs is None:
            envs = finite_environments(psi, H)
        c = psi.center
        W = stack_W(H, psi.length)[c]
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

def transfer_spectrum(psi, num: int = 5, krylovdim: int = 40):
    """Leading eigenvalues of the unit-cell AL transfer operator
    (reference src/algorithms/toolbox.jl:43-56). Returns eigenvalues sorted
    by descending magnitude (lambda_1 = 1 for a normalized state)."""
    from ..states.infinitemps import InfiniteMPS
    from ..transfermatrix.transfer import transfer_left
    from ..linalg.arnoldi import spectrum_arnoldi

    assert isinstance(psi, InfiniteMPS)
    L, D = psi.period, psi.D

    def mv(v):
        def body(v, A):
            return transfer_left(v, A, A), None

        v, _ = jax.lax.scan(body, v, psi.AL)
        return v

    v0 = jnp.eye(D, dtype=psi.dtype) + 0.1 * psi.rho_right(L - 1).astype(psi.dtype)
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
    toolbox.jl:136-179)."""
    from .expval import expectation_value

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
    """Wrap an MPOHamiltonian built from (at most) 2-site local terms onto a
    ring of L sites: the boundary interaction travels through extra FSM
    channels that stay open across the whole chain. Returns per-site FSM
    tensors as a stacked (L, w+r, w+r, d, d) MPOHamiltonian."""
    import numpy as np
    from ..operators.mpo import MPOHamiltonian

    assert H.period == 1, "PBC wrapping currently assumes a 1-site cell"
    W = np.asarray(H.W[0])
    w, d = H.odim, H.physicaldim
    # channels: FSM mid-levels k = 1..w-2 carry 2-site terms M1_k (x) M2_k
    # with M1_k = W[0, k], M2_k = W[k, end]
    r = w - 2
    wn = w + r
    # level layout: 0 = start, 1..w-2 = OBC mids, w-1..wn-2 = boundary
    # carries, wn-1 = end (the final level must stay last)
    def remap(a):
        return wn - 1 if a == w - 1 else a

    Ws = np.zeros((L, wn, wn, d, d), W.dtype)
    for i in range(L):
        for a in range(w):
            for b in range(w):
                Ws[i, remap(a), remap(b)] = W[a, b]
    # boundary term: at site 0 emit M2_k into carry channel (w - 1 + k - 1),
    # carry identity through sites 1..L-2, close with M1_k at site L-1
    for k in range(1, w - 1):
        c = w - 2 + k
        Ws[0, 0, c] = W[k, w - 1]          # M2_k applied at site 0
        for i in range(1, L - 1):
            Ws[i, c, c] = np.eye(d)
        Ws[L - 1, c, wn - 1] = W[0, k]     # M1_k applied at site L-1
    return MPOHamiltonian.from_dense_W(Ws)


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
