import time, jax, jax.numpy as jnp
import numpy as np
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W

L, D, dt = 32, 512, jnp.float32
H = transverse_field_ising(g=1.5, dtype=np.float64)
Ws = stack_W(H, L).astype(dt)
w = Ws.shape[1]

for (m, r) in [(16, 1), (10, 2), (8, 2)]:
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
    tol = jnp.asarray(1e-6, jnp.float32)
    a, b, c = psi.ALs, psi.ARs, psi.AC
    g2 = GRs
    Es = []
    # warmup/compile
    a, b, c, g2, lam, eps = _dmrg_sweep(a, b, c, Ws, g2, tol, m, r)
    Es.append(float(jnp.real(lam)))
    t0 = time.perf_counter()
    for _ in range(5):
        a, b, c, g2, lam, eps = _dmrg_sweep(a, b, c, Ws, g2, tol, m, r)
        Es.append(float(jnp.real(lam)))
    dtm = (time.perf_counter()-t0)/5
    print(f"m={m} r={r}: {dtm:.3f} s/sweep; E trajectory: " +
          " ".join(f"{e:.8f}" for e in Es), flush=True)
