import jax, jax.numpy as jnp, numpy as np
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W

dt = jnp.float32
for L in [16, 24, 32]:
    D = 64
    H = transverse_field_ising(g=1.5, dtype=np.float64)
    Ws = stack_W(H, L).astype(dt)
    w = Ws.shape[1]
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
    bad_psi = bool(jnp.any(~jnp.isfinite(psi.ARs))) or bool(jnp.any(~jnp.isfinite(psi.AC)))
    # per-site AR norms
    norms = jnp.linalg.norm(psi.ARs.reshape(L, -1), axis=1)
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
    grn = jnp.linalg.norm(GRs.reshape(L + 1, -1), axis=1)
    print(f"L={L}: psi bad={bad_psi} AR norms=[{float(norms.min()):.3e},{float(norms.max()):.3e}] "
          f"GR norms min/max=[{float(grn.min()):.3e},{float(grn.max()):.3e}] "
          f"GR nan={bool(jnp.any(~jnp.isfinite(GRs)))}", flush=True)
