"""Wall-clock breakdown of one steady-state VUMPS iteration at D=256 f32
(the second bench metric): environment solves vs local eigensolves vs
regauge. Run on the TPU host, alone (no concurrent TPU processes)."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import _vumps_iteration
from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
from mpskit_tpu.algorithms.derivatives import ac_apply, c_apply
from mpskit_tpu.linalg.lanczos import eigsh_smallest
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

    envs_fn = jax.jit(lambda p, e: hamiltonian_environments(
        p, H, tol=1e-8, env_init=e))

    Ws = jnp.stack([H.site(i) for i in range(psi.period)]).astype(psi.dtype)

    @jax.jit
    def local_solves(envs, psi):
        def solve_ac(GL, W, GR, AC):
            r = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC,
                               m, restarts, tol, reorth="local")
            return r.eigenvector
        def solve_c(GLn, GR, C):
            r = eigsh_smallest(lambda x: c_apply(GLn, GR, x), C,
                               m, restarts, tol, reorth="local")
            return r.eigenvector
        GLn = jnp.roll(envs.GLs, -1, axis=0)
        ACs = jax.vmap(solve_ac)(envs.GLs, Ws, envs.GRs, psi.AC)
        Cs = jax.vmap(solve_c)(GLn, envs.GRs, psi.C)
        return ACs, Cs

    def t(f, *a, n=5):
        r = f(*a)
        float(jnp.real(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        float(jnp.real(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        return (time.perf_counter() - t0) / n, r

    t_env, envs = t(envs_fn, psi, env)
    t_loc, _ = t(local_solves, envs, psi)
    t_full, _ = t(lambda: _vumps_iteration(
        psi, H, m, restarts, 1e-8, 1e-8, tol, env_guess=env))

print(f"full iteration : {t_full*1e3:7.2f} ms")
print(f"  env solves   : {t_env*1e3:7.2f} ms")
print(f"  local solves : {t_loc*1e3:7.2f} ms")
print(f"  rest (regauge+overheads): {(t_full-t_env-t_loc)*1e3:7.2f} ms")
