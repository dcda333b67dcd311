"""Large-bond-dimension single-chip scaling of the headline DMRG sweep:
D in {512, 1024, 2048} on one v5e chip (the production-scale regime the
bond-sharded multi-chip path extends across a slice).

Run on a TPU host:  python scripts/bench_large_d.py

At D=2048 the per-site matvec is a (3*2048 x 4096) x (4096 x 2048)-class
contraction chain -- MXU-saturating shapes; HBM holds the L=32
environment stacks (~3.2 GB at w=3 f32) comfortably.
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np


def sweep_time(D, L=32, n_sweeps=2):
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.states.finitemps import support_mask
    from mpskit_tpu.environments.finite import (compute_right_envs,
                                                right_boundary, stack_W)
    from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
    from mpskit_tpu.config import matmul_precision

    dt = jnp.float32
    H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
    Ws = stack_W(H, L).astype(dt)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(Ws.shape[1], D, dt))
    masks = jnp.asarray(support_mask(L, 2, D))
    tol = jnp.asarray(1e-6, jnp.float32)
    with matmul_precision(dt):
        a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
        a, b, c, g2, lam, eps, _ = _dmrg_sweep(a, b, c, Ws, g2, tol, 10, 2,
                                               masks=masks)
        assert np.isfinite(float(jnp.real(lam)))
        t0 = time.perf_counter()
        for _ in range(n_sweeps):
            a, b, c, g2, lam, eps, _ = _dmrg_sweep(a, b, c, Ws, g2, tol,
                                                   10, 2, masks=masks)
        float(jnp.real(lam))  # host readback = device sync under axon
        return (time.perf_counter() - t0) / n_sweeps


def main():
    for D in (512, 1024, 2048):
        t = sweep_time(D)
        # per-sweep matvec-dominated FLOP scale ~ D^3
        print(f"D={D:5d}  {t:8.3f} s/sweep   {t / (D/512)**3:.3f} s normalized (D/512)^3")


if __name__ == "__main__":
    main()
