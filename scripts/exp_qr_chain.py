"""In-jit chain timing (64 iterations in one lax.scan) of the QR panel
variants at D=512 f32: Householder qr_pos vs shifted CholeskyQR2, plus the
C = AL^dag AC recovery einsum. This is the true in-sweep cost (isolated
per-call timings carry ~1.5 ms axon dispatch overhead)."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

D, d = 512, 2
dt = jnp.float32

from mpskit_tpu.config import matmul_precision
from mpskit_tpu.tensors.ops import leftorth, cholesky_qr2, qr_pos

rng = np.random.default_rng(0)
A = rng.standard_normal((D * d, D))
U, S, Vh = np.linalg.svd(A, full_matrices=False)
S = np.exp(-np.linspace(0.0, 12.0, D))
AC = (U * S[None, :]) @ Vh
AC = jnp.asarray(AC / np.linalg.norm(AC), dt).reshape(D, d, D)

N = 64


def chain(step):
    @jax.jit
    def run(x):
        def body(x, _):
            AL, C = step(x)
            return jnp.einsum("lpm,mr->lpr", AL, C), None

        y, _ = jax.lax.scan(body, x, None, length=N)
        return y

    return run


def house(x):
    return leftorth(x)


def cholqr(x):
    Q, R = cholesky_qr2(x.reshape(D * d, D))
    return Q.reshape(D, d, D), R


def cholqr_proj(x):
    # isometry from shifted CholQR2; C as the exact projection AL^dag AC
    # (small-Schmidt directions of R are noise-floored by the shift, the
    # projection is not)
    Q, _ = cholesky_qr2(x.reshape(D * d, D))
    AL = Q.reshape(D, d, D)
    C = jnp.einsum("lpm,lpr->mr", AL.conj(), x)
    return AL, C


def timeit(name, fn, x):
    with matmul_precision(dt):
        y = fn(x)
        float(y[0, 0, 0])
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            y = fn(x)
        float(y[0, 0, 0])
        t = (time.perf_counter() - t0) / n / N
    # quality: isometry + reconstruction of one application in f64
    AL, C = (house if fn is run_house else
             cholqr if fn is run_chol else cholqr_proj)(x)
    Q = np.asarray(AL, np.float64).reshape(D * d, D)
    iso = np.linalg.norm(Q.T @ Q - np.eye(D))
    rec = np.linalg.norm(Q @ np.asarray(C, np.float64)
                         - np.asarray(x, np.float64).reshape(D * d, D))
    print(f"{name:24s} {t*1e6:8.1f} us/panel   iso {iso:.2e}  rec {rec:.2e}",
          flush=True)


def eigh_isqrt(x):
    """Gauge move via Gram eigendecomposition: AL = AC V lam^-1/2 V^T,
    C = V lam^1/2 V^T. AL C == AC holds ALGEBRAICALLY for any spectral
    floor, so reconstruction stays exact even when small Schmidt
    directions are below the f32 Gram noise; only the isometry of those
    near-null columns degrades."""
    M = x.reshape(D * d, D)
    G = M.T @ M
    lam, V = jnp.linalg.eigh(G)
    lam = jnp.maximum(lam, 1e-12 * jnp.max(lam))
    isq = (V * (1.0 / jnp.sqrt(lam))[None, :]) @ V.T
    AL = (M @ isq).reshape(D, d, D)
    C = (V * jnp.sqrt(lam)[None, :]) @ V.T
    return AL, C


def scholqr3(x):
    """Shifted CholeskyQR3 (sChol + CholQR2): the extra round restores
    orthogonality for cond up to ~1/u (f32 ~1.7e7), which plain
    CholeskyQR2 cannot do on rank-deficient DMRG panels."""
    M = x.reshape(D * d, D)
    G = M.T @ M
    s = 11.0 * (D * d * D) * jnp.finfo(dt).eps * jnp.trace(G) / D
    R1 = jnp.linalg.cholesky(G + s * jnp.eye(D, dtype=dt), upper=True)
    Q1 = jax.scipy.linalg.solve_triangular(R1.T, M.T, lower=True).T
    G2 = Q1.T @ Q1
    R2 = jnp.linalg.cholesky(G2, upper=True)
    Q2 = jax.scipy.linalg.solve_triangular(R2.T, Q1.T, lower=True).T
    G3 = Q2.T @ Q2
    R3 = jnp.linalg.cholesky(G3, upper=True)
    Q = jax.scipy.linalg.solve_triangular(R3.T, Q2.T, lower=True).T
    return Q.reshape(D, d, D), R3 @ (R2 @ R1)


def eigh_proj(x):
    """eigh-based isometry with C recovered as the exact projection."""
    M = x.reshape(D * d, D)
    G = M.T @ M
    lam, V = jnp.linalg.eigh(G)
    lam = jnp.maximum(lam, 1e-12 * jnp.max(lam))
    isq = (V * (1.0 / jnp.sqrt(lam))[None, :]) @ V.T
    AL = (M @ isq).reshape(D, d, D)
    C = jnp.einsum("lpm,lpr->mr", AL, x)
    return AL, C


run_house = chain(house)
run_chol = chain(cholqr)
run_chol_proj = chain(cholqr_proj)
run_eigh = chain(eigh_isqrt)
run_schol3 = chain(scholqr3)
run_eigh_proj = chain(eigh_proj)


def quality(fn, x):
    AL, C = fn(x)
    Q = np.asarray(AL, np.float64).reshape(D * d, D)
    iso = np.linalg.norm(Q.T @ Q - np.eye(D))
    rec = np.linalg.norm(Q @ np.asarray(C, np.float64)
                         - np.asarray(x, np.float64).reshape(D * d, D))
    return iso, rec


def timeit2(name, run, step, x):
    with matmul_precision(dt):
        y = run(x)
        float(y[0, 0, 0])
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            y = run(x)
        float(y[0, 0, 0])
        t = (time.perf_counter() - t0) / n / N
        iso, rec = quality(jax.jit(step), x)
    print(f"{name:24s} {t*1e6:8.1f} us/panel   iso {iso:.2e}  rec {rec:.2e}",
          flush=True)


timeit("householder", run_house, AC)
timeit("cholqr2 (R2R1)", run_chol, AC)
timeit("cholqr2 + proj C", run_chol_proj, AC)
timeit2("eigh_isqrt", run_eigh, eigh_isqrt, AC)
timeit2("eigh + proj C", run_eigh_proj, eigh_proj, AC)
timeit2("scholqr3", run_schol3, scholqr3, AC)
