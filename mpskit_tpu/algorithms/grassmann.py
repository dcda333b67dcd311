"""Riemannian gradient optimization over the Grassmann manifold of
left-isometric MPS tensors (reference src/algorithms/grassmann.jl +
groundstate/gradient_grassmann.jl).

Energy of a uniform MPS is a function on the product of Grassmann
manifolds of the AL tensors. Because the environments are self-consistent
fixed points, the tangent gradient is the *local* derivative
G_i = VL_i VL_i^dag (H^AC_i AC_i) C_i^dag — no differentiation through the
environment solves is needed. We run nonlinear conjugate gradient
(Polak-Ribiere) with QR retraction and backtracking line search, one
jit-compiled step per iteration.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_ITER
from ..states.infinitemps import InfiniteMPS
from ..tensors.ops import qr_pos, leftnull
from ..environments.infinite_ham import hamiltonian_environments
from ..utils.logging import IterLog
from .derivatives import ac_apply
from .unionalg import Chainable


@dataclasses.dataclass(frozen=True)
class GradientGrassmann(Chainable):
    tol: float = 1e-8
    maxiter: int = 300
    step0: float = 0.05
    verbosity: int = Defaults.verbosity


@partial(jax.jit, static_argnums=(2,))
def _energy_and_gradient(psi: InfiniteMPS, H, env_tol: float,
                         env_guess=None):
    """Returns (e_density, tangent gradient stacked (L, D, d, D), envs).
    `env_guess` warm-starts the environment GMRES solves (same pattern as
    the VUMPS driver; ~3x per evaluation at D=256)."""
    L = psi.period
    envs = hamiltonian_environments(psi, H, tol=env_tol,
                                    env_init=env_guess)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)

    def site(GL, W, GR, AC, AL, C):
        y = ac_apply(GL, W, GR, AC)          # H^AC AC
        G = jnp.einsum("lpr,mr->lpm", y, C.conj())  # d E / d AL*
        # precondition with the Tikhonov-regularized density matrix
        # rho = C C^dag (reference grassmann.jl:59-130): G <- G inv(rho + d)
        rho = C @ C.conj().T
        delta = 1e-12 + 1e-3 * jnp.linalg.norm(G) ** 2
        rho_reg = rho + delta * jnp.eye(rho.shape[0], dtype=rho.dtype)
        G = jnp.linalg.solve(rho_reg.T, G.reshape(-1, rho.shape[0]).T).T \
            .reshape(G.shape)
        # project onto the horizontal (tangent) space: G - AL (AL^dag G)
        z = jnp.einsum("lpm,lpk->mk", AL.conj(), G)
        return G - jnp.einsum("lpm,mk->lpk", AL, z)

    grads = jax.vmap(site)(envs.GLs, Ws, envs.GRs, psi.AC, psi.AL, psi.C)
    return envs.e_density, grads, envs


def _retract(ALs, xi, alpha):
    """QR retraction: AL <- qf(AL + alpha * xi), per site."""
    L, D, d, _ = ALs.shape

    def site(AL, x):
        M = (AL + alpha * x).reshape(D * d, D)
        Q, _ = qr_pos(M)
        return Q.reshape(D, d, D)

    return jax.vmap(site)(ALs, xi)


def find_groundstate_grassmann(psi: InfiniteMPS, H,
                               alg: GradientGrassmann = GradientGrassmann()):
    """Nonlinear CG over the AL Grassmann manifold. Returns
    (psi, envs, grad_norm)."""
    log = IterLog("GradGrassmann", alg.verbosity)
    e, g, env_guess = _energy_and_gradient(psi, H, 1e-12)
    e = float(jnp.real(e))
    direction = jax.tree_util.tree_map(lambda x: -x, g)
    gnorm_prev = float(jnp.linalg.norm(g))
    alpha = alg.step0
    gnorm = gnorm_prev

    for it in range(1, alg.maxiter + 1):
        # backtracking line search on the retracted point
        improved = False
        for _ in range(12):
            ALs_new = _retract(psi.AL, direction, alpha)
            psi_new = InfiniteMPS.from_AL(ALs_new)
            e_new, g_new, env_guess = _energy_and_gradient(
                psi_new, H, 1e-12, env_guess=env_guess)
            e_new = float(jnp.real(e_new))
            if e_new < e + 1e-14:
                improved = True
                break
            alpha *= 0.5
        if not improved:
            break
        psi, e = psi_new, e_new
        gnorm = float(jnp.linalg.norm(g_new))
        if gnorm < alg.tol:
            g = g_new
            break
        # Polak-Ribiere beta with projection transport (re-project old
        # direction onto the new tangent space)
        beta = max(0.0, float(jnp.real(
            jnp.vdot(g_new, g_new - g) / jnp.maximum(gnorm_prev**2, 1e-30))))

        def project(AL, x):
            z = jnp.einsum("lpm,lpk->mk", AL.conj(), x)
            return x - jnp.einsum("lpm,mk->lpk", AL, z)

        dir_t = jax.vmap(project)(psi.AL, direction)
        direction = jax.tree_util.tree_map(
            lambda gn, dt: -gn + beta * dt, g_new, dir_t)
        g, gnorm_prev = g_new, gnorm
        alpha = min(alpha * 2.0, 1.0)
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, e, gnorm)
        # surface unconverged environment geometric-series solves (reference
        # warns per solve, mpohaminfenv.jl:97-98)
        if alg.verbosity >= 1 and float(env_guess.resid) > 1e-6:
            from ..utils.logging import logger

            logger.warning(
                f"GradGrassmann: iteration {it}: environment GMRES residual "
                f"{float(env_guess.resid):.4e} (not converged)")

    envs = hamiltonian_environments(psi, H, env_init=env_guess)
    return psi, envs, gnorm


# ----------------------------------------------------------------------------
# finite chains (reference gradient_grassmann.jl works on FiniteMPS too:
# the quality-gate matrix test/algorithms.jl:14-93 includes it)
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=())
def _energy_and_gradient_finite(Xs, Ws, mask):
    """Energy and horizontal gradient for a finite chain of left isometries
    Xs (L, D, d, D) (sites 0..L-2 left-isometric, site L-1 normalized into
    the 1-supported last bond) — the finite Grassmann parametrization: the
    state is the chain itself, norm exactly 1."""
    from ..environments.finite import (
        compute_left_envs, compute_right_envs, left_boundary, right_boundary,
    )

    L, D = Xs.shape[0], Xs.shape[1]
    w = Ws.shape[1]
    dtype = Xs.dtype
    GLs = compute_left_envs(Xs, Ws, left_boundary(w, D, dtype))
    GRs = compute_right_envs(Xs, Ws, right_boundary(w, D, dtype))
    # GRs[i] = env right of site i-1 (L+1 entries); site i uses GRs[i+1]
    e = jnp.vdot(Xs[0], ac_apply(GLs[0], Ws[0], GRs[1], Xs[0]))

    # right density matrices rho_i (the metric of the embedded state
    # manifold at the right bond of site i): identity-transfer scan of the
    # chain from the right — the finite analogue of C C^dag
    def rho_body(rho, X):
        rho_prev = jnp.einsum("lpm,mn,kpn->lk", X, rho, X.conj())
        return rho_prev, rho

    eye = jnp.eye(D, dtype=dtype)
    _, rhos = jax.lax.scan(rho_body, eye, Xs, reverse=True)
    # rhos[i] = density at the right bond of site i

    def site(GL, W, GR, X, rho, mk):
        G = ac_apply(GL, W, GR, X)
        # subtract the norm-direction component (E X rho): the raw
        # derivative contains it because the chain parametrizes the state
        # directly; without it the "gradient" never vanishes
        G = G - jnp.real(e) * jnp.einsum("lpm,mn->lpn", X, rho)
        z0 = jnp.einsum("lpm,lpk->mk", X.conj(), G)
        G_raw = (G - jnp.einsum("lpm,mk->lpk", X, z0)) * mk
        # precondition with the regularized density (reference
        # grassmann.jl:59-130)
        delta = 1e-12 + 1e-3 * jnp.linalg.norm(G) ** 2
        rho_reg = rho + delta * jnp.eye(D, dtype=dtype)
        G = jnp.linalg.solve(rho_reg.T, G.reshape(-1, D).T).T.reshape(G.shape)
        z = jnp.einsum("lpm,lpk->mk", X.conj(), G)
        return (G - jnp.einsum("lpm,mk->lpk", X, z)) * mk, G_raw

    grads, raw = jax.vmap(site)(GLs[:-1], Ws, GRs[1:], Xs, rhos,
                                mask.astype(dtype))
    # the UNpreconditioned tangent gradient doubles as the convergence
    # measure (the rho^-1-scaled one amplifies near-null Schmidt
    # directions and never decays to zero at finite precision) and as the
    # steepest-descent restart direction
    return jnp.real(e), grads, raw


def find_groundstate_grassmann_finite(psi, H,
                                      alg: GradientGrassmann =
                                      GradientGrassmann()):
    """Nonlinear CG over the product of finite-chain Grassmann manifolds.
    Returns (FiniteMPS, envs, grad_norm)."""
    from ..states.finitemps import FiniteMPS, support_mask
    from ..environments.finite import stack_W, finite_environments

    log = IterLog("GradGrassmann", alg.verbosity)
    L, D = psi.length, psi.D
    p = psi.move_center(L - 1)
    AC = p.AC / jnp.maximum(jnp.linalg.norm(p.AC), 1e-30)
    Xs = p.ALs.at[L - 1].set(AC)
    Ws = stack_W(H, L).astype(psi.dtype)
    mask = jnp.asarray(support_mask(L, psi.physicaldim, D))

    def retract(Xs, xi, alpha):
        def site(X, x, mk):
            M = (X + alpha * x).reshape(-1, D)
            Q, _ = qr_pos(M)
            return Q.reshape(X.shape) * mk

        return jax.vmap(site)(Xs, xi, mask.astype(Xs.dtype))

    e, g, g_raw = _energy_and_gradient_finite(Xs, Ws, mask)
    e = float(e)
    direction = -g
    is_steepest = True
    gnorm_prev = float(jnp.linalg.norm(g))
    gnorm = gnorm_prev
    alpha = alg.step0
    for it in range(1, alg.maxiter + 1):
        improved = False
        for _ in range(12):
            Xs_new = retract(Xs, direction, alpha)
            e_new, g_new, g_raw_new = _energy_and_gradient_finite(
                Xs_new, Ws, mask)
            e_new = float(e_new)
            if e_new < e + 1e-14:
                improved = True
                break
            alpha *= 0.5
        if not improved:
            if is_steepest:
                break
            # the CG direction stopped being a descent direction —
            # restart from the RAW steepest descent before giving up (the
            # preconditioned one can be junk-dominated near convergence)
            direction = -g_raw
            is_steepest = True
            alpha = alg.step0
            continue
        Xs, e = Xs_new, e_new
        g_raw = g_raw_new
        gnorm = float(jnp.linalg.norm(g_raw))
        if gnorm < alg.tol:
            g = g_new
            break
        beta = max(0.0, float(jnp.real(
            jnp.vdot(g_new, g_new - g) / jnp.maximum(gnorm_prev**2, 1e-30))))

        def project(X, x):
            z = jnp.einsum("lpm,lpk->mk", X.conj(), x)
            return x - jnp.einsum("lpm,mk->lpk", X, z)

        dir_t = jax.vmap(project)(Xs, direction) * mask.astype(Xs.dtype)
        direction = -g_new + beta * dir_t
        is_steepest = beta == 0.0
        g, gnorm_prev = g_new, gnorm
        alpha = min(alpha * 2.0, 1.0)
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, e, gnorm)

    psi = FiniteMPS.from_tensors(Xs)
    envs = finite_environments(psi, H)
    return psi, envs, gnorm
