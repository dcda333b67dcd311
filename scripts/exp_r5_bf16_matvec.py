"""Round-5: is the INEXACT (one-pass bf16) ac_apply leaving speed on the
table? The sweep's guarded mixed-precision site solves run ~10 bf16
matvecs per site (62 sites): at the round-3 measured 70 us each that is
~43 ms of the 181 ms sweep. The bf16 matvec is bandwidth-bound in
principle (~20 MB of HBM traffic -> ~24 us at 819 GB/s), so a fused
Pallas kernel keeping the (a,x,t,n) intermediate in VMEM could cut it.

Step 1 (this script): measure the current XLA ac_apply_fast chain and an
in-VMEM Pallas candidate at the bench shapes (D=512, w=3, d=2, f32 in /
f32 out, bf16 MXU passes)."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpskit_tpu.algorithms.derivatives import ac_apply, ac_apply_fast
from mpskit_tpu.config import matmul_precision

D, d, w = 512, 2, 3
dt = jnp.float32
NMAT = 256

key = jax.random.PRNGKey(0)
GL = jax.random.normal(key, (w, D, D), dt) / D
GR = jax.random.normal(jax.random.PRNGKey(1), (w, D, D), dt) / D
W = jax.random.normal(jax.random.PRNGKey(2), (w, w, d, d), dt)
x0 = jax.random.normal(jax.random.PRNGKey(3), (D, d, D), dt)


def chain(apply_fn):
    @jax.jit
    def run(x):
        def body(x, _):
            y = apply_fn(GL, W, GR, x)
            return y * (1.0 / 50.0), None
        y, _ = jax.lax.scan(body, x, None, length=NMAT)
        return y
    return run


def timeit(name, fn, *args, n=5):
    y = fn(*args)
    float(jnp.asarray(y).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(jnp.asarray(y).ravel()[0])
    per = (time.perf_counter() - t0) / n / NMAT
    print(f"{name:40s} {per*1e6:8.1f} us/matvec", flush=True)
    return per


# ---- Pallas fused bf16 matvec ------------------------------------------
# y[x,s,r] = GL[a,x,yy] X[yy,t,n] W[a,b,s,t] GR[b,r,n], all three stages
# in one kernel, intermediate t1 resident in VMEM, bf16 MXU passes with
# f32 accumulation. Grid over bra (x) tiles.
TX = 128          # x-tile


def _kernel(GLr, Xr, Wr, GRr, Yr):
    # GLr: (w, TX, D) f32; Xr: (D, d*D) f32; Wr: (w, w, d, d) f32;
    # GRr: (w, D, D) f32; Yr: (TX, d*D) f32
    t1 = [None] * w
    for a in range(w):
        t1[a] = jnp.dot(GLr[a].astype(jnp.bfloat16),
                        Xr[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)  # (TX, d*D)
    acc = jnp.zeros((TX * d, D), jnp.float32)
    for b in range(w):
        # t2[b][x, s, n] = sum_{a,t} W[a,b,s,t] t1[a][x, t, n]
        t2 = jnp.zeros((TX, d, D), jnp.float32)
        for a in range(w):
            t1a = t1[a].reshape(TX, d, D)
            for s in range(d):
                contrib = jnp.zeros((TX, D), jnp.float32)
                for t in range(d):
                    contrib = contrib + Wr[a, b, s, t] * t1a[:, t, :]
                t2 = t2.at[:, s, :].add(contrib)
        # y[x,s,r] += t2[b][x,s,n] GR[b][r,n]
        acc = acc + jnp.dot(t2.reshape(TX * d, D).astype(jnp.bfloat16),
                            GRr[b].astype(jnp.bfloat16).T,
                            preferred_element_type=jnp.float32)
    Yr[:] = acc.reshape(TX, d * D)


@jax.jit
def pallas_fast(GL, W, Wmat, GR, x):
    X2 = x.reshape(D, d * D)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((D, d * D), jnp.float32),
        grid=(D // TX,),
        in_specs=[
            pl.BlockSpec((w, TX, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, d * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w, d, d), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TX, d * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(GL, X2, Wmat, GR)
    return out.reshape(D, d, D)


def pallas_apply(GL, W, GR, x):
    return pallas_fast(GL, W, W, GR, x)


with matmul_precision(dt):
    t_x3 = timeit("X3 ac_apply (XLA)", chain(ac_apply), x0)
    t_bf = timeit("bf16 ac_apply_fast (XLA)", chain(ac_apply_fast), x0)
    # correctness of the pallas kernel vs the XLA bf16 path
    try:
        y_ref = ac_apply(GL, W, GR, x0)
        y_pl = pallas_apply(GL, W, GR, x0)
        rel = float(jnp.linalg.norm(y_pl - y_ref) / jnp.linalg.norm(y_ref))
        print(f"pallas vs X3 rel err {rel:.2e} (bf16 noise ~2e-3 expected)",
              flush=True)
        t_pl = timeit("bf16 fused pallas", chain(pallas_apply), x0)
        print(f"pallas/XLA-bf16 speed: {t_bf/t_pl:.2f}x", flush=True)
    except Exception as e:
        print("pallas kernel FAILED:", repr(e)[:500], flush=True)
