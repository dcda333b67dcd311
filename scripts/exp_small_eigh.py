"""Cost of the per-restart small dense solves inside the sweep loops at
realistic counts: eigh of the 10x10 tridiagonal Rayleigh-Ritz matrix (one
per Lanczos restart) chained 128x in one jit, vs a hand-rolled implicit-QL
alternative, vs the 10-vector basis_combine. Identifies how much of the
44 ms non-matvec/non-QR sweep residue sits in the tiny eigendecompositions.
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

m, D, d = 10, 512, 2
dt = jnp.float32
N = 128  # ~restarts per sweep (64 site visits x 2)

rng = np.random.default_rng(0)
alpha = jnp.asarray(rng.standard_normal((N, m)), dt)
beta = jnp.asarray(np.abs(rng.standard_normal((N, m))) + 0.1, dt)


@jax.jit
def eigh_chain(alpha, beta):
    def body(acc, ab):
        a, b = ab
        T = jnp.diag(a) + jnp.diag(b[:-1], 1) + jnp.diag(b[:-1], -1)
        evals, evecs = jnp.linalg.eigh(T)
        return acc + evals[0] * evecs[0, 0], None

    out, _ = jax.lax.scan(body, jnp.zeros((), dt), (alpha, beta))
    return out


@jax.jit
def eigh_batched(alpha, beta):
    def mk(a, b):
        return jnp.diag(a) + jnp.diag(b[:-1], 1) + jnp.diag(b[:-1], -1)

    Ts = jax.vmap(mk)(alpha, beta)
    evals, evecs = jnp.linalg.eigh(Ts)
    return jnp.sum(evals[:, 0] * evecs[:, 0, 0])


def timeit(name, fn, *args, n=10):
    y = fn(*args)
    float(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(y)
    per = (time.perf_counter() - t0) / n
    print(f"{name:34s} {per*1e3:8.2f} ms  ({per/N*1e6:7.1f} us each)",
          flush=True)


timeit(f"{N}x eigh(10x10) in scan", eigh_chain, alpha, beta)
timeit(f"{N}x eigh(10x10) batched vmap", eigh_batched, alpha, beta)
