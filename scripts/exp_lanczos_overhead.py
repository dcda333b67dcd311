"""Isolate the non-matvec overhead of the hot Lanczos site solves at
D=512, w=3, f32 (the bench sweep's regime): chain 64 eigsh_smallest solves
in one jit and compare against the raw matvec-chain cost for the same
matvec count. Also times matvec layout variants (current 3-einsum vs a
per-site prefolded GL*W two-GEMM form).
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

D, d, w, m, restarts = 512, 2, 3, 10, 2
dt = jnp.float32
NSOLVE = 64

from mpskit_tpu.config import matmul_precision
from mpskit_tpu.algorithms.derivatives import ac_apply, ac_apply_fast
from mpskit_tpu.linalg.lanczos import eigsh_smallest

rng = np.random.default_rng(0)
GL = jnp.asarray(rng.standard_normal((w, D, D)) / D, dt)
GR = jnp.asarray(rng.standard_normal((w, D, D)) / D, dt)
# symmetrize so the operator is Hermitian-ish (Lanczos stability)
GL = 0.5 * (GL + GL.transpose(0, 2, 1))
GR = 0.5 * (GR + GR.transpose(0, 2, 1))
W0 = jnp.asarray(rng.standard_normal((w, w, d, d)), dt)
W0 = 0.5 * (W0 + W0.transpose(0, 1, 3, 2))
x0 = jnp.asarray(rng.standard_normal((D, d, D)), dt)
x0 = x0 / jnp.linalg.norm(x0)
tol = jnp.asarray(1e-6, jnp.float32)


def timeit(name, fn, *args, n=3):
    y = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].real))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].real))
    per = (time.perf_counter() - t0) / n
    print(f"{name:44s} {per*1e3:9.2f} ms", flush=True)
    return per


@jax.jit
def solve_chain(x):
    def body(x, _):
        res = eigsh_smallest(lambda v: ac_apply(GL, W0, GR, v), x,
                             m, restarts, tol, reorth="local1",
                             matvec_fast=lambda v: ac_apply_fast(
                                 GL, W0, GR, v))
        y = res.eigenvector
        # rotate so successive solves see fresh inputs
        return jnp.roll(y, 1, axis=2), None

    y, _ = jax.lax.scan(body, x, None, length=NSOLVE)
    return y


@jax.jit
def solve_chain_nofast(x):
    def body(x, _):
        res = eigsh_smallest(lambda v: ac_apply(GL, W0, GR, v), x,
                             m, restarts, tol, reorth="local1")
        return jnp.roll(res.eigenvector, 1, axis=2), None

    y, _ = jax.lax.scan(body, x, None, length=NSOLVE)
    return y


def matvec_chain_n(nmat):
    @jax.jit
    def run(x):
        def body(x, _):
            y = ac_apply(GL, W0, GR, x)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30), None

        y, _ = jax.lax.scan(body, x, None, length=nmat)
        return y

    return run


# prefolded variant: GLW[b,s,t,x,y] once per solve, then 2 GEMMs per matvec
def ac_apply_folded(GLW, GR, x):
    t = jnp.einsum("bstxy,ytn->bsxn", GLW, x)
    return jnp.einsum("bsxn,brn->xsr", t, GR)


@jax.jit
def matvec_folded_chain(x):
    GLW = jnp.einsum("axy,abst->bstxy", GL, W0)

    def body(x, _):
        y = ac_apply_folded(GLW, GR, x)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-30), None

    y, _ = jax.lax.scan(body, x, None, length=220)
    return y


with matmul_precision(dt):
    # per-solve matvec count with fast path: probe 1 + bf16 m + X3 m = 21
    t_solve = timeit(f"{NSOLVE} eigsh solves (fast path)", solve_chain, x0)
    t_solve2 = timeit(f"{NSOLVE} eigsh solves (X3 only)", solve_chain_nofast,
                      x0)
    t_mv220 = timeit("220 X3 matvecs (+norm)", matvec_chain_n(220), x0)
    t_fold = timeit("220 folded-GLW matvecs (+norm)", matvec_folded_chain, x0)
    per_mv = t_mv220 / 220
    # X3-only chain: restarts capped at 2 -> 1 + 2m matvecs... maxrestarts=2
    nmv_x3 = NSOLVE * (2 * m)
    print(f"\nX3 matvec: {per_mv*1e6:.1f} us; folded: "
          f"{t_fold/220*1e6:.1f} us")
    print(f"X3-only solves: {t_solve2*1e3:.1f} ms vs matvec-only "
          f"{nmv_x3*per_mv*1e3:.1f} ms -> overhead "
          f"{(t_solve2-nmv_x3*per_mv)/NSOLVE*1e6:.1f} us/solve")
