"""Capture a JAX profiler trace of the headline DMRG sweep (the tracing
aux subsystem of SURVEY.md §5; view with TensorBoard or Perfetto).

Usage (on a TPU host):
    python scripts/profile_sweep.py [outdir] [D] [L]

Writes an XPlane trace under `outdir` (default /tmp/mpskit_trace) covering
one fully-compiled sweep, so the trace shows steady-state device work:
Lanczos matvec fusions, QR/eigh calls, and host gaps.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mpskit_trace"
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from mpskit_tpu.models.hamiltonians import (
        transverse_field_ising_lattice as transverse_field_ising)
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.states.finitemps import support_mask
    from mpskit_tpu.environments.finite import (compute_right_envs,
                                                right_boundary, stack_W)
    from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
    from mpskit_tpu.config import matmul_precision

    dt = jnp.float32
    H = transverse_field_ising(g=1.5, dtype=np.float64)
    Ws = stack_W(H, L).astype(dt)
    w = Ws.shape[1]
    masks = jnp.asarray(support_mask(L, 2, D))
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
    tol = jnp.asarray(1e-6, jnp.float32)

    with matmul_precision(dt):
        a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
        # warm-up: compile + one sweep
        a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, tol, 10, 2,
                                            masks=masks)
        float(jnp.real(lam))  # host readback = real sync on axon
        # second warm sweep so the traced one matches the bench's timed regime
        a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, tol, 10, 2,
                                            masks=masks)
        float(jnp.real(lam))

        with jax.profiler.trace(outdir):
            t0 = time.perf_counter()
            a, b, c, g2, lam, eps, _diag = _dmrg_sweep(a, b, c, Ws, g2, tol, 10, 2,
                                                masks=masks)
            float(jnp.real(lam))
            dt_s = time.perf_counter() - t0
    print(f"traced one L={L} D={D} sweep in {dt_s:.3f} s -> {outdir}")


if __name__ == "__main__":
    main()
