"""Measure the single-core XLA-CPU float64 reference times used by
bench.py's vs_baseline (see BASELINE.md): the exact same sweep/iteration
code as the TPU benchmark, on one CPU core, for the w=3 lattice TFIM.

Run:  taskset -c 0 env XLA_FLAGS=--xla_cpu_multi_thread_eigen=false \
      JAX_PLATFORMS=cpu python scripts/bench_cpu_ref.py
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

L, D, d, G = 32, 512, 2, 1.5
KRYLOVDIM, RESTARTS = 10, 2
D_VUMPS = 256
DTYPE = jnp.float64

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import FiniteMPS, InfiniteMPS
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.algorithms.vumps import _vumps_iteration
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W
from mpskit_tpu.states.finitemps import support_mask

H = transverse_field_ising_lattice(g=G, dtype=np.float64)

# VUMPS iteration, D=256 — warmup depth MATCHES bench.py's VUMPS_WARMUP
# (both sides measure the converged warm-start steady state)
psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D_VUMPS, dtype=DTYPE)
tol = jnp.asarray(1e-6, jnp.float64)
env = None
for _ in range(8):
    psi, eps, env, _diag = _vumps_iteration(psi, H, KRYLOVDIM, RESTARTS,
                                            1e-8, 1e-8, tol, env_guess=env)
float(eps)
t0 = time.perf_counter()
psi, eps, env, _diag = _vumps_iteration(psi, H, KRYLOVDIM, RESTARTS,
                                        1e-8, 1e-8, tol, env_guess=env)
float(eps)
print("cpu_1core_vumps_iter_s", time.perf_counter() - t0, flush=True)

# DMRG sweep, D=512
psi = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D, dtype=DTYPE)
Ws = stack_W(H, L).astype(DTYPE)
GRs = compute_right_envs(psi.ARs, Ws, right_boundary(Ws.shape[1], D, DTYPE))
masks = jnp.asarray(support_mask(L, d, D))
itol = jnp.asarray(1e-6, jnp.float64)
a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, itol,
                                           KRYLOVDIM, RESTARTS, masks=masks)
float(jnp.real(lam))
t0 = time.perf_counter()
a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, itol,
                                           KRYLOVDIM, RESTARTS, masks=masks)
float(jnp.real(lam))
print("cpu_1core_dmrg_sweep_s", time.perf_counter() - t0, flush=True)
