"""In-situ timing of D=512 DMRG sweep variants on the chip (one process,
init paid once). Each variant: 2 warm sweeps + 3 timed, from the same
random start. Also records the 20-sweep energy trajectory of the
candidates so convergence-per-sweep parity is checked in the same run.

Usage: python scripts/exp_sweep_variants.py
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

L, D, d, G = 32, 512, 2, 1.5

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.finitemps import support_mask
from mpskit_tpu.environments.finite import (compute_right_envs,
                                            right_boundary, stack_W)
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.config import matmul_precision

dt = jnp.float32
H = transverse_field_ising_lattice(g=G, dtype=np.float64)
Ws = stack_W(H, L).astype(dt)
w = Ws.shape[1]
masks = jnp.asarray(support_mask(L, d, D))
psi0 = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D, dtype=dt)
GRs0 = compute_right_envs(psi0.ARs, Ws, right_boundary(w, D, dt))
tol = jnp.asarray(1e-6, jnp.float32)


def run(name, m, r, n_time=3, n_traj=12, **kw):
    with matmul_precision(dt):
        # _dmrg_sweep donates its tensor args: hand each variant fresh copies
        a, b, c, g2 = (jnp.array(psi0.ALs), jnp.array(psi0.ARs),
                       jnp.array(psi0.AC), jnp.array(GRs0))
        es = []
        for i in range(2):
            a, b, c, g2, lam, eps, _ = _dmrg_sweep(a, b, c, Ws, g2, tol,
                                                   m, r, masks=masks, **kw)
            es.append(float(jnp.real(lam)))
        t0 = time.perf_counter()
        for i in range(n_time):
            a, b, c, g2, lam, eps, _ = _dmrg_sweep(a, b, c, Ws, g2, tol,
                                                   m, r, masks=masks, **kw)
            es.append(float(jnp.real(lam)))
        float(jnp.real(lam))
        t = (time.perf_counter() - t0) / n_time
        for i in range(n_traj - 2 - n_time):
            a, b, c, g2, lam, eps, _ = _dmrg_sweep(a, b, c, Ws, g2, tol,
                                                   m, r, masks=masks, **kw)
            es.append(float(jnp.real(lam)))
    print(f"{name:28s} {t*1e3:8.1f} ms/sweep   E: "
          + " ".join(f"{e:.6f}" for e in es[:4])
          + f" ... {es[-1]:.8f}", flush=True)
    return t, es


run("baseline m=10 r=2", 10, 2)
run("cheap_galerkin m=10 r=2", 10, 2, cheap_galerkin=True)
run("m=20 r=1", 20, 1)
run("m=16 r=1", 16, 1)
run("m=8 r=2", 8, 2)
run("cheap+m=16 r=1", 16, 1, cheap_galerkin=True)
