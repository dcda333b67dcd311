import jax, jax.numpy as jnp, numpy as np
from mpskit_tpu.tensors.ops import qr_pos, leftorth
from mpskit_tpu.linalg.lanczos import eigsh_smallest

dt = jnp.float32
# 1) eigsh on TPU f32 with breakdown (small invariant subspace)
n = 64
key = jax.random.PRNGKey(0)
M = jax.random.normal(key, (n, n), dt); M = (M + M.T)/2
res = eigsh_smallest(lambda x: M @ x, jnp.ones((n,), dt), 10, 2, 1e-6)
print("eigsh dense:", float(res.eigenvalue), "resid", float(res.residual), flush=True)
w_np = np.linalg.eigvalsh(np.asarray(M, np.float64))
print("expected:", w_np[0], flush=True)

# rank-1 operator -> breakdown after 1 step
P = jnp.outer(jnp.ones((n,), dt), jnp.ones((n,), dt)) / n
res2 = eigsh_smallest(lambda x: -(P @ x), jnp.ones((n,), dt), 10, 2, 1e-6)
print("eigsh rank1 (expect -1):", float(res2.eigenvalue), flush=True)

# 2) QR of rank-deficient f32 on TPU
A = jnp.zeros((128, 64), dt).at[:2, :].set(jax.random.normal(key, (2, 64), dt))
Q, R = qr_pos(A)
print("qr rank-deficient: any nan Q:", bool(jnp.any(jnp.isnan(Q))), "R:", bool(jnp.any(jnp.isnan(R))), flush=True)

# 3) small padded DMRG sweep on TPU
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W
L, D = 16, 64
H = transverse_field_ising(g=1.5, dtype=np.float64)
Ws = stack_W(H, L).astype(dt)
w = Ws.shape[1]
psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
print("psi any nan:", bool(jnp.any(jnp.isnan(psi.AC))), flush=True)
GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
print("GRs any nan:", bool(jnp.any(jnp.isnan(GRs))), flush=True)
tol = jnp.asarray(1e-6, jnp.float32)
a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
for it in range(3):
    a, b, c, g2, lam, eps = _dmrg_sweep(a, b, c, Ws, g2, tol, 10, 2)
    print("sweep", it, "E:", float(jnp.real(lam)), "eps:", float(eps), flush=True)
