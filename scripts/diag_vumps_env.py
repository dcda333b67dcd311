"""Diagnose the steady-state VUMPS env GMRES: cycles used, residuals,
and timing vs a hypothetical early-exit (for perf work, round 3)."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import _vumps_iteration
from mpskit_tpu.environments.infinite_ham import (
    calc_envs_paired, hamiltonian_environments)
from mpskit_tpu.config import matmul_precision

D, m, restarts = 256, 10, 2
dtype = jnp.float32
H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D, dtype=dtype)
tol = jnp.asarray(1e-6, jnp.float32)

env = None
with matmul_precision(dtype):
    for _ in range(6):
        psi, eps, env, _d = _vumps_iteration(
            psi, H, m, restarts, 1e-8, 1e-8, tol, env_guess=env)
    float(eps)

    # instrument: patch linsolve_info's gmres to report cycles
    from mpskit_tpu.linalg import gmres as G

    @jax.jit
    def paired(psi, env):
        return calc_envs_paired(psi, H, jnp.asarray(1.2e-6, jnp.float32),
                                GL_init=env.GLs, GR_init=env.GRs)

    out = paired(psi, env)
    float(jnp.real(out[2]))
    t0 = time.perf_counter()
    for _ in range(5):
        out = paired(psi, env)
    float(jnp.real(out[2]))
    print("paired env walk:", (time.perf_counter() - t0) / 5 * 1e3, "ms; resid",
          float(out[3]))

    # count cycles by calling gmres_restarted directly on the same system
    from mpskit_tpu.operators.mpo import DIAG_IDENTITY

    orig = G.gmres_restarted
    def counting(op, b, x0, tol_, restart=30, maxiter=40):
        x, relres, it = orig(op, b, x0, tol_, restart, maxiter)
        jax.debug.print("gmres cycles={it} relres={r}", it=it, r=relres)
        return x, relres, it
    G.gmres_restarted = counting
    # call UNJITTED so the debug prints fire (linsolve_info resolves
    # gmres_restarted from module globals at call time -> patched)
    out = calc_envs_paired(psi, H, jnp.asarray(1.2e-6, jnp.float32),
                           GL_init=env.GLs, GR_init=env.GRs)
    print("resid:", float(out[3]))
