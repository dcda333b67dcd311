"""Statistical-mechanics boundary algorithms: `leading_boundary` with VUMPS
or VOMPS (reference src/algorithms/statmech/vumps.jl, vomps.jl).

Finds the boundary MPS fixed point of a transfer MPO (2D partition
function): per-site updates maximize the dominant eigenvalue, so the local
solves are non-Hermitian Arnoldi (:LM) instead of Lanczos (:SR).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Defaults, VERBOSE_ITER
from ..linalg.arnoldi import dominant_eigs, dominant_eigs_real
from ..states.infinitemps import InfiniteMPS
from ..states.multiline import MPSMultiline
from ..states.gauging import regauge_ACC
from ..operators.mpo import DenseMPO
from ..operators.multiline import MPOMultiline
from ..environments.infinite_mpo import mpo_environments
from ..utils.logging import IterLog, logger
from ..utils.dynamictols import updatetol
from .derivatives import ac_apply, c_apply


@dataclasses.dataclass(frozen=True)
class VUMPS_Boundary:
    tol: float = 1e-10
    maxiter: int = Defaults.maxiter
    krylovdim: int = Defaults.krylovdim
    gauge_tol: float = Defaults.tolgauge
    verbosity: int = Defaults.verbosity


@dataclasses.dataclass(frozen=True)
class VOMPS:
    """Power-method boundary update (reference statmech/vomps.jl:27-87)."""

    tol: float = 1e-9
    maxiter: int = 500
    gauge_tol: float = Defaults.tolgauge
    verbosity: int = Defaults.verbosity


@partial(jax.jit, static_argnums=(2, 3, 4))
def _boundary_vumps_iteration(psi: InfiniteMPS, Os, m: int, gauge_tol: float,
                              env_tol: float, inner_tol=1e-6,
                              GL_guess=None, GR_guess=None,
                              A_mask=None, C_mask=None, env_mask=None):
    L = psi.period
    O_mpo = DenseMPO(tuple(Os[i] for i in range(L)))
    envs = mpo_environments(psi, O_mpo, tol=env_tol, krylovdim=m,
                            GL0=GL_guess, GR0=GR_guess, env_mask=env_mask,
                            select_real=env_mask is not None)
    GL_next = jnp.roll(envs.GLs, -1, axis=0)

    # sector masks (e.g. the Fibonacci path constraint, symmetry/fibonacci.py)
    # constrain the Krylov space itself: a :LM solve can otherwise converge
    # onto a spurious mixed-sector dominant vector that post-masking would
    # destroy (unlike the :SR Hamiltonian case of symmetry/charges.py)
    Am = None if A_mask is None else A_mask.astype(psi.dtype)
    Cm = None if C_mask is None else C_mask.astype(psi.dtype)

    if Am is None:
        def solve_ac(GL, Oi, GR, AC):
            res = dominant_eigs(lambda x: ac_apply(GL, Oi, GR, x), AC,
                                m, 20, inner_tol)
            return res.eigenvector, res.converged, res.residual

        def solve_c(GLn, GR, C):
            res = dominant_eigs(lambda x: c_apply(GLn, GR, x), C,
                                m, 20, inner_tol)
            return res.eigenvector, res.converged, res.residual

        ACs, convA, residA = jax.vmap(solve_ac)(envs.GLs, Os, envs.GRs, psi.AC)
        Cs, convC, residC = jax.vmap(solve_c)(GL_next, envs.GRs, psi.C)
    else:
        # in the masked (anyonic) path the physical AC/C eigenpairs are
        # real while spurious complex rotation modes can carry a larger
        # magnitude — select the dominant real pair
        _solver = dominant_eigs_real if env_mask is not None else dominant_eigs

        def solve_ac(GL, Oi, GR, AC, Mi):
            res = _solver(
                lambda x: Mi * ac_apply(GL, Oi, GR, Mi * x), AC,
                m, 20, inner_tol)
            return res.eigenvector, res.converged, res.residual

        def solve_c(GLn, GR, C, Mi):
            res = _solver(
                lambda x: Mi * c_apply(GLn, GR, Mi * x), C,
                m, 20, inner_tol)
            return res.eigenvector, res.converged, res.residual

        ACs, convA, residA = jax.vmap(solve_ac)(envs.GLs, Os, envs.GRs,
                                                psi.AC, Am)
        Cs, convC, residC = jax.vmap(solve_c)(GL_next, envs.GRs, psi.C, Cm)
    # solver diagnostics for the driver's IterLog.solver_warn (reference
    # warns on unconverged fixed-point / local solves,
    # permpoinfenv.jl:179-185, fixedpoint.jl:12-14)
    n_unconv = (jnp.sum(~convA) + jnp.sum(~convC)).astype(jnp.int32)
    diag = (n_unconv,
            jnp.maximum(jnp.max(residA), jnp.max(residC)),
            jnp.real(envs.resid))
    if A_mask is not None:
        ACs = ACs * A_mask.astype(ACs.dtype)
    if C_mask is not None:
        Cs = Cs * C_mask.astype(Cs.dtype)

    ALs = jax.vmap(regauge_ACC)(ACs, Cs)
    if A_mask is not None:
        ALs = ALs * A_mask.astype(ALs.dtype)
    ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
    # remove the global phase per site before measuring convergence
    phase = jnp.einsum("ilpr,ilpr->i", ALC.conj(), ACs)
    phase = phase / jnp.maximum(jnp.abs(phase), 1e-30)
    eps = jnp.max(jnp.linalg.norm(
        (ACs - phase[:, None, None, None] * ALC).reshape(L, -1), axis=1))

    if A_mask is None:
        psi_new = InfiniteMPS.from_AL(ALs, psi.C[L - 1], tol=gauge_tol)
    else:
        # masked path: build AR locally from (C_{i-1}, AC_i) instead of
        # re-gauging through from_AL's fixed-point eigensolves — those
        # rotate the bond basis within (near-degenerate) sectors, which
        # fights the static masks at criticality
        from ..states.gauging import regauge_CAC

        C_prev = jnp.roll(Cs, 1, axis=0)
        ARs = jax.vmap(regauge_CAC)(C_prev, ACs)
        Am = A_mask.astype(ACs.dtype)
        Cm = C_mask.astype(Cs.dtype)
        psi_new = InfiniteMPS(ALs * Am, ARs * Am, ACs * Am, Cs * Cm)
    return psi_new, eps, envs.GLs[0], envs.GRs[L - 1], diag


@partial(jax.jit, static_argnums=(2, 3))
def _boundary_vomps_iteration(psi: InfiniteMPS, Os, gauge_tol: float,
                              env_tol: float, GL_guess=None, GR_guess=None,
                              A_mask=None, C_mask=None, env_mask=None):
    """One power-method step: single MPO application instead of an
    eigensolve. Optional sector masks as in _boundary_vumps_iteration."""
    L = psi.period
    O_mpo = DenseMPO(tuple(Os[i] for i in range(L)))
    envs = mpo_environments(psi, O_mpo, tol=env_tol,
                            GL0=GL_guess, GR0=GR_guess, env_mask=env_mask,
                            select_real=env_mask is not None)
    GL_next = jnp.roll(envs.GLs, -1, axis=0)

    ACs = jax.vmap(ac_apply)(envs.GLs, Os, envs.GRs, psi.AC)
    Cs = jax.vmap(c_apply)(GL_next, envs.GRs, psi.C)
    if A_mask is not None:
        ACs = ACs * A_mask.astype(ACs.dtype)
    if C_mask is not None:
        Cs = Cs * C_mask.astype(Cs.dtype)
    ACs = ACs / jnp.linalg.norm(ACs.reshape(L, -1), axis=1)[:, None, None, None]
    Cs = Cs / jnp.linalg.norm(Cs.reshape(L, -1), axis=1)[:, None, None]

    ALs = jax.vmap(regauge_ACC)(ACs, Cs)
    if A_mask is not None:
        ALs = ALs * A_mask.astype(ALs.dtype)
    ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
    phase = jnp.einsum("ilpr,ilpr->i", ALC.conj(), ACs)
    phase = phase / jnp.maximum(jnp.abs(phase), 1e-30)
    eps = jnp.max(jnp.linalg.norm(
        (ACs - phase[:, None, None, None] * ALC).reshape(L, -1), axis=1))
    if A_mask is None:
        psi_new = InfiniteMPS.from_AL(ALs, psi.C[L - 1], tol=gauge_tol)
    else:
        from ..states.gauging import regauge_CAC

        C_prev = jnp.roll(Cs, 1, axis=0)
        ARs = jax.vmap(regauge_CAC)(C_prev, ACs)
        Am = A_mask.astype(ACs.dtype)
        Cm = C_mask.astype(Cs.dtype)
        psi_new = InfiniteMPS(ALs * Am, ARs * Am, ACs * Am, Cs * Cm)
    return psi_new, eps, envs.GLs[0], envs.GRs[L - 1], jnp.real(envs.resid)


@partial(jax.jit, static_argnums=(2,))
def _boundary_value_and_gradient(psi: InfiniteMPS, Os, env_tol: float,
                                 GL0=None, GR0=None):
    """Free-energy objective f = -(1/L) sum_i log|lambda_i| and its tangent
    gradient over the AL Grassmann manifold (reference grassmann.jl applied
    to the statmech cost, cf. gradient_grassmann.jl leading_boundary
    method). Environments are treated as self-consistent fixed points, so
    the gradient is the local derivative -(T^AC AC) C^dag / conj(lambda),
    preconditioned with inv(rho) and projected horizontally — zero exactly
    at the VUMPS fixed point."""
    L = psi.period
    O_mpo = DenseMPO(tuple(Os[i] for i in range(L)))
    envs = mpo_environments(psi, O_mpo, tol=env_tol, GL0=GL0, GR0=GR0)

    def site(GL, Oi, GR, AC, AL, C):
        y = ac_apply(GL, Oi, GR, AC)
        lam = jnp.einsum("lpr,lpr->", AC.conj(), y)   # local Rayleigh quotient
        G = -jnp.einsum("lpr,mr->lpm", y, C.conj()) / lam.conj()
        rho = C @ C.conj().T
        delta = 1e-12 + 1e-3 * jnp.linalg.norm(G) ** 2
        rho_reg = rho + delta * jnp.eye(rho.shape[0], dtype=rho.dtype)
        G = jnp.linalg.solve(rho_reg.T, G.reshape(-1, rho.shape[0]).T).T \
            .reshape(G.shape)
        z = jnp.einsum("lpm,lpk->mk", AL.conj(), G)
        return lam, G - jnp.einsum("lpm,mk->lpk", AL, z)

    lams, grads = jax.vmap(site)(envs.GLs, Os, envs.GRs, psi.AC, psi.AL,
                                 psi.C)
    f = -jnp.sum(jnp.log(jnp.abs(lams))) / L
    return f, grads, envs.GLs[0], envs.GRs[L - 1]


def _leading_boundary_grassmann(psi: InfiniteMPS, Os, alg):
    """Riemannian conjugate-gradient maximization of the leading transfer
    eigenvalue (the GradientGrassmann method of reference
    find_groundstate/leading_boundary)."""
    from .grassmann import _retract

    log = IterLog("GradGrassmann", alg.verbosity)
    GLg = GRg = None
    f, g, GLg, GRg = _boundary_value_and_gradient(psi, Os, 1e-12)
    f = float(jnp.real(f))
    direction = jax.tree_util.tree_map(lambda x: -x, g)
    gnorm_prev = float(jnp.linalg.norm(g))
    gnorm = gnorm_prev
    alpha = alg.step0

    for it in range(1, alg.maxiter + 1):
        improved = False
        for _ in range(12):
            ALs_new = _retract(psi.AL, direction, alpha)
            psi_new = InfiniteMPS.from_AL(ALs_new)
            f_new, g_new, GLg, GRg = _boundary_value_and_gradient(
                psi_new, Os, 1e-12, GL0=GLg, GR0=GRg)
            f_new = float(jnp.real(f_new))
            if f_new < f + 1e-14:
                improved = True
                break
            alpha *= 0.5
        if not improved:
            break
        psi, f = psi_new, f_new
        gnorm = float(jnp.linalg.norm(g_new))
        if gnorm < alg.tol:
            break
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
            log.conv(it, f, gnorm)

    L = psi.period
    envs = mpo_environments(psi, DenseMPO(tuple(Os[i] for i in range(L))),
                            GL0=GLg, GR0=GRg)
    return psi, envs, gnorm


def leading_boundary(psi, O, alg=None):
    """Boundary fixed point of a transfer MPO. Accepts an InfiniteMPS with
    a DenseMPO or a sparse-FSM MPOHamiltonian/SparseMPO (reference
    MPOMultiline admits Union{SparseMPO, DenseMPO} rows,
    src/operators/mpomultiline.jl:14-18 — sparse rows are consumed through
    their stacked site tensors directly, no `to_densempo` SVD pass), or an
    MPSMultiline with an MPOMultiline (rows coupled cyclically, reference
    src/algorithms/statmech/vumps.jl:20-84). Returns (psi, envs, eps)."""
    if alg is None:
        alg = VUMPS_Boundary()
    if isinstance(psi, MPSMultiline) or (
            isinstance(O, MPOMultiline) and O.nrows > 1):
        return _leading_boundary_multiline(psi, O, alg)
    if isinstance(O, MPOMultiline):
        O = O.rows[0]
    assert isinstance(psi, InfiniteMPS)
    L = psi.period
    assert O.period == L or O.period == 1
    Os = jnp.stack([O.site(i) for i in range(L)]).astype(psi.dtype)

    from .grassmann import GradientGrassmann
    if isinstance(alg, GradientGrassmann):
        return _leading_boundary_grassmann(psi, Os, alg)

    log = IterLog("leading_boundary", alg.verbosity)
    eps = 1.0
    GLg = GRg = None
    for it in range(1, alg.maxiter + 1):
        if isinstance(alg, VOMPS):
            psi, eps, GLg, GRg, env_resid = _boundary_vomps_iteration(
                psi, Os, alg.gauge_tol, 1e-12, GL_guess=GLg, GR_guess=GRg)
            if float(env_resid) > 1e-6 and alg.verbosity >= 1:
                logger.warning(
                    f"leading_boundary(VOMPS): iteration {it}: environment "
                    f"fixed-point residual {float(env_resid):.4e} (Arnoldi "
                    "not converged)")
        else:
            inner_tol = updatetol(eps, it)
            # previous-iteration fixed points seed the env eigensolves
            # (reference permpoinfenv.jl:44-63 guess reuse)
            psi, eps, GLg, GRg, diag = _boundary_vumps_iteration(
                psi, Os, alg.krylovdim, alg.gauge_tol, 1e-12, inner_tol,
                GL_guess=GLg, GR_guess=GRg)
            log.solver_warn(it, diag[:2], float(inner_tol))
            if float(diag[2]) > 1e-6 and alg.verbosity >= 1:
                logger.warning(
                    f"leading_boundary: iteration {it}: environment "
                    f"fixed-point residual {float(diag[2]):.4e} (Arnoldi "
                    "not converged)")
        eps = float(eps)
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, 0.0, eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, 0.0, eps)

    envs = mpo_environments(psi, DenseMPO(tuple(Os[i] for i in range(L))))
    # reference fixedpoint.jl:9-30 warns when the dominant transfer
    # eigenvalue is (near-)degenerate — silent wrong answers otherwise on
    # symmetry-broken / critical boundary problems
    if getattr(alg, "verbosity", 0) >= 1:
        from ..linalg.fixedpoint import transfer_uniqueness_warning

        transfer_uniqueness_warning(psi, Os, tol=max(alg.tol, 1e-9),
                                    name="leading_boundary")
    return psi, envs, eps


# ----------------------------------------------------------------------------
# multi-row Multiline boundaries (reference statmech/vumps.jl:20-84:
# per-column updates of a RecursiveVec of row ACs, rows coupled r -> r+1)
# ----------------------------------------------------------------------------

def _leading_boundary_multiline(psi, O, alg):
    from ..states.multiline import MPSMultiline

    if isinstance(psi, InfiniteMPS):
        psi = MPSMultiline.from_mps(psi, O.nrows)
    R = psi.nrows
    L = psi.period
    assert isinstance(O, MPOMultiline) and O.nrows == R
    dtype = psi.rows[0].dtype
    Os = [jnp.stack([O.row(r).site(i) for i in range(L)]).astype(dtype)
          for r in range(R)]

    log = IterLog("leading_boundary_multiline", alg.verbosity)
    eps = 1.0
    guesses = [(None, None)] * R
    for it in range(1, alg.maxiter + 1):
        env_tol = max(float(updatetol(eps, it)) * 1e-2, 1e-12)
        # per-row mixed environments: ket = row r, bra = row r+1, seeded
        # with the previous iteration's fixed points
        envs = [mpo_environments(psi.rows[r], O.row(r),
                                 psi_bra=psi.rows[(r + 1) % R], tol=env_tol,
                                 GL0=guesses[r][0], GR0=guesses[r][1])
                for r in range(R)]
        guesses = [(e.GLs[0], e.GRs[L - 1]) for e in envs]
        GLs = jnp.stack([e.GLs for e in envs])   # (R, L, w, D, D)
        GRs = jnp.stack([e.GRs for e in envs])
        ACs = jnp.stack([p.AC for p in psi.rows])  # (R, L, D, d, D)
        Cs = jnp.stack([p.C for p in psi.rows])
        Osr = jnp.stack(Os)

        # coupled eigenproblem: applying the row-r transfer maps row r to
        # row r+1; solve for the dominant fixed point of the cycle
        def mv_ac(x):
            def one(GL_r, O_r, GR_r, x_r):
                return jax.vmap(ac_apply)(GL_r, O_r, GR_r, x_r)

            y = jax.vmap(one)(GLs, Osr, GRs, x)
            return jnp.roll(y, 1, axis=0)

        def mv_c(x):
            GL_next = jnp.roll(GLs, -1, axis=1)

            def one(GLn_r, GR_r, x_r):
                return jax.vmap(c_apply)(GLn_r, GR_r, x_r)

            y = jax.vmap(one)(GL_next, GRs, x)
            return jnp.roll(y, 1, axis=0)

        inner_tol = float(updatetol(eps, it))
        resA = dominant_eigs(mv_ac, ACs, alg.krylovdim, 20, inner_tol)
        resC = dominant_eigs(mv_c, Cs, alg.krylovdim, 20, inner_tol)
        ACs_n, Cs_n = resA.eigenvector, resC.eigenvector
        n_unconv = int(~resA.converged) + int(~resC.converged)
        log.solver_warn(it, (n_unconv, max(float(resA.residual),
                                           float(resC.residual))), inner_tol)
        env_resid = max(float(jnp.real(e.resid)) for e in envs)
        if env_resid > 1e-6 and alg.verbosity >= 1:
            logger.warning(
                f"leading_boundary_multiline: iteration {it}: environment "
                f"fixed-point residual {env_resid:.4e} (Arnoldi not "
                "converged)")

        rows_new = []
        eps_rows = []
        for r in range(R):
            ACr = ACs_n[r] / jnp.linalg.norm(
                ACs_n[r].reshape(L, -1), axis=1)[:, None, None, None]
            Cr = Cs_n[r] / jnp.linalg.norm(
                Cs_n[r].reshape(L, -1), axis=1)[:, None, None]
            ALs = jax.vmap(regauge_ACC)(ACr, Cr)
            ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cr)
            phase = jnp.einsum("ilpr,ilpr->i", ALC.conj(), ACr)
            phase = phase / jnp.maximum(jnp.abs(phase), 1e-30)
            eps_rows.append(float(jnp.max(jnp.linalg.norm(
                (ACr - phase[:, None, None, None] * ALC).reshape(L, -1),
                axis=1))))
            rows_new.append(InfiniteMPS.from_AL(ALs, tol=alg.gauge_tol))
        psi = MPSMultiline(tuple(rows_new))
        eps = max(eps_rows)
        if alg.verbosity >= VERBOSE_ITER:
            log.conv(it, 0.0, eps)
        if eps < alg.tol:
            break
    else:
        log.cancel(alg.maxiter, 0.0, eps)

    envs = [mpo_environments(psi.rows[r], O.row(r),
                             psi_bra=psi.rows[(r + 1) % R])
            for r in range(R)]
    return psi, envs, eps
