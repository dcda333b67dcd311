"""QR-panel alternatives at D=512 f32 on the chip: Householder QR custom
call vs CholeskyQR2 vs eigh-based inverse-sqrt vs Newton-Schulz polar.
Each must produce (AL isometric, C) from AC (D, d, D); isometry error and
reconstruction error are printed alongside the time."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

D, d = 512, 2
dt = jnp.float32

from mpskit_tpu.config import matmul_precision
from mpskit_tpu.tensors.ops import leftorth

# realistic AC: random with a decaying Schmidt spectrum (host-side SVD —
# device SVD SIGABRTs the TPU compiler, see ROADMAP)
rng = np.random.default_rng(0)
A = rng.standard_normal((D * d, D))
U, S, Vh = np.linalg.svd(A, full_matrices=False)
S = np.exp(-np.linspace(0.0, 12.0, D))
AC = (U * S[None, :]) @ Vh
AC = jnp.asarray(AC / np.linalg.norm(AC), dt).reshape(D, d, D)


def qr_house(AC):
    return leftorth(AC)


def cholqr2(AC):
    M = AC.reshape(D * d, D)
    eps = jnp.asarray(1e-12, dt)
    G = M.T @ M
    Rg = jnp.linalg.cholesky(G + eps * jnp.trace(G) * jnp.eye(D, dtype=dt),
                             upper=True)
    Q1 = jax.scipy.linalg.solve_triangular(Rg.T, M.T, lower=True).T
    G2 = Q1.T @ Q1
    R2 = jnp.linalg.cholesky(G2 + eps * jnp.eye(D, dtype=dt), upper=True)
    Q = jax.scipy.linalg.solve_triangular(R2.T, Q1.T, lower=True).T
    C = (R2 @ Rg)
    return Q.reshape(D, d, D), C


def eigh_isqrt(AC):
    M = AC.reshape(D * d, D)
    G = M.T @ M
    lam, V = jnp.linalg.eigh(G)
    lam = jnp.maximum(lam, 1e-12 * jnp.max(lam))
    isq = (V * (1.0 / jnp.sqrt(lam))[None, :]) @ V.T
    Q = M @ isq
    C = (V * jnp.sqrt(lam)[None, :]) @ V.T
    return Q.reshape(D, d, D), C


def ns_polar(AC, iters=9):
    # Newton-Schulz on the Gram side: Y -> Q = M (V_k), V_{k+1} via the
    # cubic iteration on X = G / ||G||; converges only for well-conditioned
    # G (small Schmidt values stall) — measured for timing reference
    M = AC.reshape(D * d, D)
    G = M.T @ M
    nrm = jnp.linalg.norm(G)
    X = G / nrm
    Yk = jnp.eye(D, dtype=dt)

    def body(carry, _):
        X, Yk = carry
        T = 0.5 * (3.0 * jnp.eye(D, dtype=dt) - X)
        return (T @ X @ T, Yk @ T), None

    (X, Yk), _ = jax.lax.scan(body, (X, Yk), None, length=iters)
    isq = Yk / jnp.sqrt(nrm)
    Q = M @ isq
    C = jnp.linalg.solve(isq, jnp.eye(D, dtype=dt))
    return Q.reshape(D, d, D), C


def check(name, fn):
    with matmul_precision(dt):
        f = jax.jit(fn)
        Q, C = f(AC)
        float(Q[0, 0, 0])
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            Q, C = f(AC)
        float(Q[0, 0, 0])
        t = (time.perf_counter() - t0) / n
        Qm = np.asarray(Q.reshape(D * d, D), np.float64)
        iso = np.linalg.norm(Qm.T @ Qm - np.eye(D))
        rec = np.linalg.norm(
            (Qm @ np.asarray(C, np.float64)).reshape(-1)
            - np.asarray(AC, np.float64).reshape(-1))
    print(f"{name:16s} {t*1e6:9.1f} us   iso_err {iso:.2e}   rec_err {rec:.2e}",
          flush=True)


check("householder", qr_house)
check("cholqr2", cholqr2)
check("eigh_isqrt", eigh_isqrt)
check("ns_polar", ns_polar)
