import jax, jax.numpy as jnp, numpy as np
from mpskit_tpu.tensors.ops import qr_pos

dt = jnp.float32
key = jax.random.PRNGKey(0)
for (m, n, rank) in [(1024, 512, 4), (1024, 512, 512), (128, 64, 2), (64, 32, 32)]:
    A = jnp.zeros((m, n), dt)
    A = A.at[:rank, :].set(jax.random.normal(key, (rank, n), dt))
    Q, R = qr_pos(A)
    ortho = float(jnp.linalg.norm(Q.T @ Q - jnp.eye(n)))
    recon = float(jnp.linalg.norm(Q @ R - A) / max(float(jnp.linalg.norm(A)), 1e-30))
    mx = float(jnp.max(jnp.abs(Q)))
    print(f"m={m} n={n} rank={rank}: ortho_err={ortho:.3e} recon={recon:.3e} maxQ={mx:.3e}", flush=True)
