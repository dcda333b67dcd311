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
from mpskit_tpu.algorithms.vumps import (_vumps_iteration,
                                         _vumps_iterations_scan)
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W
from mpskit_tpu.states.finitemps import support_mask

H = transverse_field_ising_lattice(g=G, dtype=np.float64)

# VUMPS iteration, D=256 — protocol MATCHES bench.py exactly: 8 single
# warmup iterations, a scan-batched 32-iteration DRY call on the same
# inputs (compile; no donation, state untouched), then the SAME call
# timed. Both sides therefore time iterations 9..40 — the actively
# converging warm-started regime (deeper windows measure post-converged
# solves whose exit_tol truncation degenerates the iteration to probes,
# ~12x cheaper and representative of nothing) — with the same
# device-side batching (the scan gains the CPU nothing — in-process XLA
# has no dispatch gap — but keeps the code path identical).
psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D_VUMPS, dtype=DTYPE)
tol = jnp.asarray(1e-6, jnp.float64)
env = None
for _ in range(8):
    psi, eps, env, _diag = _vumps_iteration(psi, H, KRYLOVDIM, RESTARTS,
                                            1e-8, 1e-8, tol, env_guess=env)
float(eps)
n = 32
_, eps_dry, _, _ = _vumps_iterations_scan(psi, H, KRYLOVDIM, RESTARTS,
                                          1e-8, 1e-8, n, tol, envs=env)
float(eps_dry)
# 3 back-to-back replays of the same batch, one readback — matches
# bench.py exactly (96 executed iterations of the 9..40 window)
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    psi2, eps, env2, _diag = _vumps_iterations_scan(
        psi, H, KRYLOVDIM, RESTARTS, 1e-8, 1e-8, n, tol, envs=env)
float(eps)
print("cpu_1core_vumps_iter_s", (time.perf_counter() - t0) / (n * reps),
      flush=True)

# DMRG sweep, D=512 — 1 warm sweep + 6 timed with cheap_galerkin,
# matching bench.py's protocol exactly
psi = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D, dtype=DTYPE)
Ws = stack_W(H, L).astype(DTYPE)
GRs = compute_right_envs(psi.ARs, Ws, right_boundary(Ws.shape[1], D, DTYPE))
masks = jnp.asarray(support_mask(L, d, D))
itol = jnp.asarray(1e-6, jnp.float64)
a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, itol,
                                           KRYLOVDIM, RESTARTS, masks=masks,
                                           cheap_galerkin=True)
float(jnp.real(lam))
n = 6
t0 = time.perf_counter()
for _ in range(n):
    a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, itol,
                                               KRYLOVDIM, RESTARTS,
                                               masks=masks,
                                               cheap_galerkin=True)
float(jnp.real(lam))
print("cpu_1core_dmrg_sweep_s", (time.perf_counter() - t0) / n, flush=True)
