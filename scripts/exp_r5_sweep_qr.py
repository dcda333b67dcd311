"""Round-5 perf probes, one TPU process:

  1. production `_vumps_iteration` at pipeline depths 4 / 16 / 32 — is the
     bench's 11.1 ms/iter (n=4) dispatch-latency-bound on the axon tunnel
     vs the lean harness's 6.7 ms at n=16?
  2. `_vumps_iteration` with reorth=local1 (if the static arg exists).
  3. f64-emulated building blocks for a CholeskyQR gauge move at the
     D=512 sweep panel shape: f64 Gram GEMM, f64 Cholesky(512), f32 TRSM
     — is a mixed-precision CholQR (f64 Gram+chol to survive cond ~1e12,
     f32 apply) cheaper than the 785 us Householder custom call?
  4. X3 big-GEMM peak for the BASELINE.md roofline derivation.
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import _vumps_iteration
from mpskit_tpu.config import matmul_precision

D, m, restarts = 256, 10, 2
dtype = jnp.float32
H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
tol = jnp.asarray(1e-6, jnp.float32)


def run_depth(n, warm=8, label=""):
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D, dtype=dtype)
    env = None
    with matmul_precision(dtype):
        for _ in range(warm):
            psi, eps, env, _d = _vumps_iteration(psi, H, m, restarts,
                                                 1e-8, 1e-8, tol,
                                                 env_guess=env)
        float(eps)
        t0 = time.perf_counter()
        for _ in range(n):
            psi, eps, env, _d = _vumps_iteration(psi, H, m, restarts,
                                                 1e-8, 1e-8, tol,
                                                 env_guess=env)
        float(eps)
        dt = (time.perf_counter() - t0) / n
    print(f"production _vumps_iteration depth n={n:3d} {label}: "
          f"{dt*1e3:7.2f} ms/iter (eps {float(eps):.2e})", flush=True)
    return dt


run_depth(4)
run_depth(16)
run_depth(32)

# ---- 3. mixed-precision CholQR building blocks --------------------------
M, N = 1024, 512
key = jax.random.PRNGKey(1)
# synthesize a panel with Schmidt-like conditioning (sigma ~ 1 .. 1e-6)
u, _ = jnp.linalg.qr(jax.random.normal(key, (M, N), jnp.float32))
v, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(2), (N, N),
                                       jnp.float32))
s = jnp.logspace(0, -6, N).astype(jnp.float32)
A32 = (u * s) @ v.T


def timeit(name, fn, *args, n=20):
    y = fn(*args)
    jax.tree_util.tree_map(lambda l: l.block_until_ready(), y)
    float(jnp.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0].real)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0].real)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e6:9.1f} us", flush=True)
    return dt


@jax.jit
def hh_qr(A):
    return jnp.linalg.qr(A)


@jax.jit
def gram64(A):
    A64 = A.astype(jnp.float64)
    return A64.T @ A64


@jax.jit
def chol64(G):
    return jnp.linalg.cholesky(G)


@jax.jit
def trsm32(A, R64):
    # Q = A R^{-1}: triangular solve on the right, f32 apply
    R = R64.astype(jnp.float32)
    return jax.scipy.linalg.solve_triangular(R.T, A.T, lower=True).T


@jax.jit
def cholqr_mixed(A):
    """One full mixed CholQR pass: f64 Gram + f64 Cholesky + f32 apply,
    then an f32 CholQR2 polish (Gram now ~I, f32 is enough)."""
    A64 = A.astype(jnp.float64)
    G = A64.T @ A64
    Rs = jnp.linalg.cholesky(G).T          # upper
    Q1 = jax.scipy.linalg.solve_triangular(
        Rs.astype(jnp.float32).T, A.T, lower=True).T
    G2 = (Q1.T @ Q1).astype(jnp.float32)
    R2 = jnp.linalg.cholesky(G2.astype(jnp.float64)).T.astype(jnp.float32)
    Q = jax.scipy.linalg.solve_triangular(R2.T, Q1.T, lower=True).T
    R = R2 @ Rs.astype(jnp.float32)
    return Q, R


with matmul_precision(jnp.float32):
    t_hh = timeit("Householder qr (1024,512) f32", hh_qr, A32)
    t_g = timeit("f64 Gram A^T A (emulated)", gram64, A32)
    G = gram64(A32)
    t_c = timeit("f64 cholesky(512) (emulated)", chol64,
                 G + 1e-10 * jnp.eye(N, dtype=jnp.float64))
    R64 = chol64(G + 1e-12 * jnp.eye(N, dtype=jnp.float64))
    t_t = timeit("f32 trsm (1024,512)", trsm32, A32, R64.T)
    try:
        t_full = timeit("mixed CholQR full (f64 gram+chol, f32 x2)",
                        cholqr_mixed, A32)
        Q, R = cholqr_mixed(A32)
        orth = float(jnp.linalg.norm(Q.T @ Q - jnp.eye(N, dtype=jnp.float32)))
        rec = float(jnp.linalg.norm(Q @ R - A32) / jnp.linalg.norm(A32))
        print(f"  mixed CholQR: ||Q^T Q - I|| = {orth:.2e}, "
              f"rel reconstruction {rec:.2e}", flush=True)
    except Exception as e:
        print("  mixed CholQR FAILED:", e, flush=True)

    # ---- 4. X3 peak reference ------------------------------------------
    B1 = jax.random.normal(jax.random.PRNGKey(3), (4096, 4096), jnp.float32)

    @jax.jit
    def big(x):
        for _ in range(8):
            x = x @ B1 * (1.0 / 64.0)
        return x

    t_big = timeit("8x 4096^2 X3 matmul chain", big, B1, n=10)
    fl = 8 * 2 * 4096**3
    print(f"  X3 effective peak: {fl / t_big / 1e12:.1f} TF/s", flush=True)
