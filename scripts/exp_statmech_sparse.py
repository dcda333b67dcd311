"""Round-5 (VERDICT r4 weak-5 / round-3 stretch directive 8): does
threading the static `nonzero_mask` into the boundary/derivative einsums
pay at wide FSM width w?

The dense stacked path costs 2 w d D^3 (the two big GEMMs, independent of
FSM sparsity) + w^2 d^2 D^2 (the middle W contraction, the only term
sparsity can cut). For a realistic sparse FSM (identity diagonals, first
row, last column: nnz ~ 3w - 2 of w^2 blocks) the middle term is the
dense-vs-sparse delta: predicted fraction w^2 d^2 D^2 / (2 w d D^3)
= w d / (2 D) — 1.6% at w=4, 12.5% at w=32 (D=256, d=2).

Measures, per (w, D): dense ac_apply vs sparse-gathered middle (static
Python loop over nonzero (a,b) pairs at trace time), in a scan chain of
64 matvecs. Records the answer for ROADMAP."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from mpskit_tpu.config import matmul_precision

D, d = 256, 2
dtype = jnp.float32
NMAT = 64


def make_fsm(w, key):
    """Sparse FSM pattern: identity diagonal at 0 and w-1, decaying
    middle diagonal, first row, last column (exponentially decaying
    long-range interaction shape). nnz = 3(w-2) + 4."""
    nz = np.zeros((w, w), bool)
    nz[0, 0] = nz[w - 1, w - 1] = True
    for a in range(1, w - 1):
        nz[a, a] = True            # decay diagonal
        nz[0, a] = True            # first row
        nz[a, w - 1] = True        # last column
    nz[0, w - 1] = True
    W = np.zeros((w, w, d, d), np.float32)
    rng = np.random.default_rng(int(key))
    for a in range(w):
        for b in range(w):
            if nz[a, b]:
                W[a, b] = rng.standard_normal((d, d))
    return jnp.asarray(W), tuple(map(tuple, nz.tolist()))


def ac_apply_dense(GL, W, GR, x):
    t = jnp.einsum("axy,ytn->axtn", GL, x)
    t = jnp.einsum("axtn,abst->bxsn", t, W)
    return jnp.einsum("bxsn,brn->xsr", t, GR)


def ac_apply_sparse(GL, W, GR, x, nz):
    w = W.shape[0]
    t = jnp.einsum("axy,ytn->axtn", GL, x)
    cols = []
    for b in range(w):
        acc = None
        for a in range(w):
            if not nz[a][b]:
                continue
            term = jnp.einsum("xtn,st->xsn", t[a], W[a, b])
            acc = term if acc is None else acc + term
        cols.append(acc if acc is not None
                    else jnp.zeros((D, d, D), x.dtype))
    t2 = jnp.stack(cols)
    return jnp.einsum("bxsn,brn->xsr", t2, GR)


def chain(apply_fn):
    @jax.jit
    def run(GL, W, GR, x):
        def body(x, _):
            y = apply_fn(GL, W, GR, x)
            return y * (1.0 / 50.0), None
        y, _ = jax.lax.scan(body, x, None, length=NMAT)
        return y
    return run


def timeit(fn, *args, n=10):
    y = fn(*args)
    float(jnp.asarray(y).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(jnp.asarray(y).ravel()[0])
    return (time.perf_counter() - t0) / n / NMAT


with matmul_precision(dtype):
    for w in (4, 8, 16, 32):
        W, nz = make_fsm(w, 7)
        key = jax.random.PRNGKey(w)
        GL = jax.random.normal(key, (w, D, D), dtype) / D
        GR = jax.random.normal(key, (w, D, D), dtype) / D
        x = jax.random.normal(key, (D, d, D), dtype)
        td = timeit(chain(ac_apply_dense), GL, W, GR, x)
        ts = timeit(chain(partial(
            lambda GL, W, GR, x, nz: ac_apply_sparse(GL, W, GR, x, nz),
            nz=nz)), GL, W, GR, x)
        nnz = sum(sum(r) for r in nz)
        print(f"w={w:2d} nnz={nnz:3d}/{w*w:4d}: dense {td*1e6:7.1f} us  "
              f"sparse {ts*1e6:7.1f} us  speedup {td/ts:5.2f}x", flush=True)
