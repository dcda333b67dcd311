import time, jax, jax.numpy as jnp
import sys
from mpskit_tpu.ops.fsm_kernels import ac_apply_pallas
from mpskit_tpu.algorithms.derivatives import ac_apply

D = int(sys.argv[1]) if len(sys.argv) > 1 else 256
d, w = 2, 5
key = jax.random.PRNGKey(0)
GL = jax.random.normal(key, (w, D, D), jnp.float32)
GR = jax.random.normal(jax.random.fold_in(key,1), (w, D, D), jnp.float32)
W = jax.random.normal(jax.random.fold_in(key,2), (w, w, d, d), jnp.float32)
x = jax.random.normal(jax.random.fold_in(key,3), (D, d, D), jnp.float32)
t0=time.time()
y1 = ac_apply_pallas(GL, W, GR, x)
print("pallas compile+run:", time.time()-t0, flush=True)
y0 = jax.jit(lambda: ac_apply(GL, W, GR, x))()
print("rel err:", float(jnp.linalg.norm(y0-y1)/jnp.linalg.norm(y0)), flush=True)

def chain(f):
    g = jax.jit(lambda x: jax.lax.fori_loop(0, 20, lambda i, v: f(GL, W, GR, v/jnp.linalg.norm(v)), x))
    _ = float(jnp.sum(jnp.abs(g(x))))
    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.abs(g(x))))
    return (time.perf_counter()-t0)/20

t_e = chain(lambda GL, W, GR, v: ac_apply(GL, W, GR, v))
t_p = chain(lambda GL, W, GR, v: ac_apply_pallas(GL, W, GR, v))
print(f"D={D} einsum: {t_e*1e3:.3f} ms ({2*2*w*d*D**3/t_e/1e12:.1f} TF/s)  pallas: {t_p*1e3:.3f} ms ({2*2*w*d*D**3/t_p/1e12:.1f} TF/s)", flush=True)
