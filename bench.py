"""Benchmark: the two driver-defined metrics (see BASELINE.md):
  1. VUMPS iteration time, infinite TFIM at D=256 (one JSON line), then
  2. one-site DMRG sweep time, finite TFIM at D=512 (the headline metric,
     printed LAST so a last-line parser picks it up).

Each line is {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against a 64-core CPU reference derived from a
MEASURED single-core CPU run of the exact same code (XLA CPU backend,
float64, w=3 lattice TFIM: 228.1 s/sweep for the DMRG sweep, 7.79 s/iter
for the VUMPS iteration on this machine — scripts/bench_cpu_ref.py,
re-measured round 2 after the warm-start/local-reorth speedups also
accelerated the CPU path) scaled by an idealized 64x: the reference
library publishes no numbers (see BASELINE.md), so perfect CPU scaling is
assumed — a strongly reference-favoring baseline (a Krylov-dominated
D=256 iteration does not actually scale 64x). vs_baseline > 1 means
faster.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# benchmark configuration
L = 32          # chain length
D = 512         # bond dimension
d = 2           # physical dimension
G = 1.5         # TFIM field
KRYLOVDIM = 10  # Lanczos dimension per site solve
RESTARTS = 2
DTYPE = jnp.float32  # MXU path; float64 available for 1e-8 parity runs

CPU_REFERENCE_SWEEP_S = 228.07 / 64  # measured 1-core / idealized 64x scaling
CPU_REFERENCE_VUMPS_S = 7.789 / 64   # measured 1-core VUMPS iter, D=256 f64
D_VUMPS = 256


def bench_vumps():
    """Steady-state VUMPS iteration (warm-started environments) on the
    infinite TFIM at D=256 — the second BASELINE.md metric."""
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import InfiniteMPS
    from mpskit_tpu.algorithms.vumps import _vumps_iteration
    from mpskit_tpu.config import matmul_precision
    import numpy as np

    dtype = DTYPE
    H = transverse_field_ising_lattice(g=G, dtype=np.float64)  # w=3 minimal FSM
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D_VUMPS,
                             dtype=dtype)
    tol = jnp.asarray(1e-6, jnp.float32)
    env = None
    with matmul_precision(dtype):
        for _ in range(3):   # compile + settle into warm-start regime
            psi, eps, env, _d = _vumps_iteration(
                psi, H, KRYLOVDIM, RESTARTS, 1e-8, 1e-8, tol, env_guess=env)
        float(eps)           # host readback = real sync on axon
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            psi, eps, env, _d = _vumps_iteration(
                psi, H, KRYLOVDIM, RESTARTS, 1e-8, 1e-8, tol, env_guess=env)
        float(eps)
        dt = (time.perf_counter() - t0) / n
    assert np.isfinite(float(eps))
    print(json.dumps({
        "metric": f"vumps_iteration_time_tfim_D{D_VUMPS}_{jnp.dtype(DTYPE).name}",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(CPU_REFERENCE_VUMPS_S / dt, 2),
    }))


def main():
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
    from mpskit_tpu.environments.finite import (
        compute_right_envs, right_boundary, stack_W,
    )
    import numpy as np

    from mpskit_tpu.states.finitemps import support_mask

    dtype = DTYPE
    H = transverse_field_ising_lattice(g=G, dtype=np.float64)  # w=3 minimal FSM
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D, dtype=dtype)
    Ws = stack_W(H, L).astype(dtype)
    w = Ws.shape[1]
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dtype))
    masks = jnp.asarray(support_mask(L, d, D))
    inner_tol = jnp.asarray(1e-6, jnp.float32 if dtype == jnp.float32 else jnp.float64)

    from mpskit_tpu.config import matmul_precision

    # warmup/compile + one sweep to settle state; a host readback forces a
    # full device sync (block_until_ready does not block on the axon tunnel).
    # The f32 path pins BF16_BF16_F32_X3 matmuls (the TPU default one-pass
    # bf16 destabilizes the sweeps — see mpskit_tpu.config).
    with matmul_precision(dtype):
        ALs, ARs, AC, GRs2, lam, eps, _diag = _dmrg_sweep(
            psi.ALs, psi.ARs, psi.AC, Ws, GRs, inner_tol, KRYLOVDIM,
            RESTARTS, masks=masks)
        lam0 = float(jnp.real(lam))
        assert np.isfinite(lam0), "benchmark sweep produced a non-finite energy"

        # timed sweeps from the warmed state
        n_sweeps = 3
        t0 = time.perf_counter()
        for _ in range(n_sweeps):
            ALs, ARs, AC, GRs2, lam, eps, _diag = _dmrg_sweep(
                ALs, ARs, AC, Ws, GRs2, inner_tol, KRYLOVDIM, RESTARTS,
                masks=masks)
        lam1 = float(jnp.real(lam))
        dt = (time.perf_counter() - t0) / n_sweeps
    assert np.isfinite(lam1), "benchmark sweep produced a non-finite energy"

    print(json.dumps({
        "metric": f"dmrg_sweep_time_tfim_L{L}_D{D}_{jnp.dtype(DTYPE).name}",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(CPU_REFERENCE_SWEEP_S / dt, 2),
    }))


if __name__ == "__main__":
    bench_vumps()
    main()   # headline DMRG metric printed last
