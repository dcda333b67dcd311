"""Time one steady-state VUMPS iteration (bench metric 2) under knob
variants. Run one variant per process (knobs are trace-time constants):

  python scripts/exp_vumps_variants.py [env_restart] [reorth] [env_tol_x]

env_tol_x scales the dtype tolerance floor (1.0 = current model)."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

env_restart = int(sys.argv[1]) if len(sys.argv) > 1 else 12
reorth = sys.argv[2] if len(sys.argv) > 2 else "local"
tol_x = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

import jax
import jax.numpy as jnp
import numpy as np

import mpskit_tpu
from mpskit_tpu.environments import infinite_ham as ih
ih._ENV_RESTART = env_restart
# env_tol_x scales the inner environment-solve tolerance (1.0 = the
# dtype-floor model in hamiltonian_environments); applied below via tol

# patch the local-solve reorth by rebuilding the jitted iteration with the
# requested mode (the module hardcodes "local")
import dataclasses
from functools import partial
from mpskit_tpu.linalg.lanczos import eigsh_smallest
from mpskit_tpu.algorithms.derivatives import ac_apply, c_apply
from mpskit_tpu.environments.infinite_ham import hamiltonian_environments


@partial(jax.jit, static_argnums=(2, 3))
def iteration(psi, H, m, restarts, inner_tol, env_guess=None):
    L = psi.period
    envs = hamiltonian_environments(psi, H, tol=1e-8 * tol_x,
                                    env_init=env_guess)
    Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)

    def solve_ac(GL, W, GR, AC):
        res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC,
                             m, restarts, inner_tol, reorth=reorth)
        return res.eigenvector, res.converged

    def solve_c(GL_next, GR, C):
        res = eigsh_smallest(lambda x: c_apply(GL_next, GR, x), C,
                             m, restarts, inner_tol, reorth=reorth)
        return res.eigenvector, res.converged

    GL_next = jnp.roll(envs.GLs, -1, axis=0)
    ACs, _ = jax.vmap(solve_ac)(envs.GLs, Ws, envs.GRs, psi.AC)
    Cs, _ = jax.vmap(solve_c)(GL_next, envs.GRs, psi.C)
    from mpskit_tpu.states.gauging import regauge_ACC, regauge_CAC
    ALs = jax.vmap(regauge_ACC)(ACs, Cs)
    ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
    eps = jnp.max(jnp.linalg.norm((ACs - ALC).reshape(L, -1), axis=1))
    C_prev = jnp.roll(Cs, 1, axis=0)
    ARs = jax.vmap(regauge_CAC)(C_prev, ACs)
    from mpskit_tpu.states.infinitemps import InfiniteMPS
    return InfiniteMPS(ALs, ARs, ACs, Cs), eps, envs


def main():
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import InfiniteMPS
    from mpskit_tpu.config import matmul_precision

    D, m, restarts = 256, 10, 2
    H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D,
                             dtype=jnp.float32)
    # tol_x scales BOTH solve tolerances (env solves above via
    # hamiltonian_environments, inner eigensolves here) — previously it
    # was parsed but the inner tol stayed hardcoded (ADVICE r4)
    tol = jnp.asarray(1e-6 * tol_x, jnp.float32)
    env = None
    with matmul_precision(jnp.float32):
        for _ in range(8):
            psi, eps, env = iteration(psi, H, m, restarts, tol,
                                      env_guess=env)
        float(eps)
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            psi, eps, env = iteration(psi, H, m, restarts, tol,
                                      env_guess=env)
        float(eps)
        dt = (time.perf_counter() - t0) / n
    print(f"restart={env_restart} reorth={reorth} tol_x={tol_x}: "
          f"{dt*1e3:.2f} ms/iter (eps {float(eps):.2e})")


main()
