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


@dataclasses.dataclass(frozen=True)
class GradientGrassmann:
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

    envs = hamiltonian_environments(psi, H, env_init=env_guess)
    return psi, envs, gnorm
