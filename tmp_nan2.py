import jax, jax.numpy as jnp, numpy as np, sys
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W

dt = jnp.float32
for (L, D) in [(32, 64), (16, 512), (32, 256)]:
    H = transverse_field_ising(g=1.5, dtype=np.float64)
    Ws = stack_W(H, L).astype(dt)
    w = Ws.shape[1]
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
    tol = jnp.asarray(1e-6, jnp.float32)
    a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
    for it in range(2):
        a, b, c, g2, lam, eps = _dmrg_sweep(a, b, c, Ws, g2, tol, 10, 2)
    print(f"L={L} D={D}: E={float(jnp.real(lam)):.6f} eps={float(eps):.4f} nanA={bool(jnp.any(jnp.isnan(a)))} nanGR={bool(jnp.any(jnp.isnan(g2)))}", flush=True)
