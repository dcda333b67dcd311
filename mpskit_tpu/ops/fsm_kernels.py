"""Pallas TPU kernels for the hot FSM contractions.

The effective-Hamiltonian application (SURVEY.md §2.3/§2.5: the hottest
code path, reference src/algorithms/derivatives.jl:77-104 and
src/transfermatrix/transfer.jl) is fused into a single kernel: the
(w, D, D) environments, the (w, w, d, d) FSM tensor and the (D, d, D)
center tensor are contracted without materializing the (w, D, d, D)
intermediates in HBM. The FSM loops over (a, b, s, t) are unrolled at
trace time (w and d are small static constants); the two D^3 contractions
run on the MXU.

out[x, s, r] = GL[a, x, y] W[a, b, s, t] AC[y, t, n] GR[b, r, n]

Tiling: grid (i, k) over bra-tiles of size Tx and ket-chunks of size Tn;
the output block (Tx, d, D) is revisited across k and accumulated, so no
(w, D, d, D) intermediate ever leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pallas_available = True
except Exception:  # pragma: no cover
    pallas_available = False


def _ac_kernel(w: int, d: int, D: int, Tx: int, Tn: int,
               gl_ref, wop_ref, x_ref, gr_ref, out_ref):
    # gl (w, Tx, D), wop (w, w, d, d), x (D, d, Tn), gr (w, D, Tn),
    # out (Tx, d, D) accumulated over the k grid dimension
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    gl = gl_ref[:].reshape(w * Tx, D)
    xm = x_ref[:].reshape(D, d * Tn)
    # t1[(a tx), (t n)] — first MXU matmul
    t1 = jnp.dot(gl, xm, preferred_element_type=jnp.float32)
    t1 = t1.reshape(w, Tx, d, Tn)
    wop = wop_ref[:]

    for s in range(d):
        acc = jnp.zeros((Tx, D), jnp.float32)
        for b in range(w):
            # t2[tx, n] = sum_{a, t} W[a, b, s, t] * t1[a, tx, t, n]
            t2 = jnp.zeros((Tx, Tn), jnp.float32)
            for a in range(w):
                for t in range(d):
                    t2 = t2 + wop[a, b, s, t] * t1[a, :, t, :]
            # acc[tx, r] += t2[tx, n] GR[b, r, n] — second MXU matmul
            acc = acc + jax.lax.dot_general(
                t2, gr_ref[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, s, :] = out_ref[:, s, :] + acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5))
def ac_apply_pallas(GL, W, GR, x, tile_x: int = 128, tile_n: int = 128):
    """Fused H_eff^{AC} application (float32). D must be a multiple of the
    tile sizes."""
    w, D, _ = GL.shape
    d = W.shape[2]
    Tx = min(tile_x, D)
    Tn = min(tile_n, D)
    assert D % Tx == 0 and D % Tn == 0

    kern = functools.partial(_ac_kernel, w, d, D, Tx, Tn)
    grid = (D // Tx, D // Tn)
    # index maps use i*0-style constants so every coordinate shares the grid
    # index dtype (mixed i64 constants fail Mosaic legalization under x64)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, Tx, D), lambda i, k: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w, d, d),
                         lambda i, k: (i * 0, i * 0, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, d, Tn), lambda i, k: (k * 0, k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, D, Tn), lambda i, k: (k * 0, k * 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tx, d, D), lambda i, k: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, d, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * w * d * D**3,
            bytes_accessed=(2 * w * D * D + 2 * D * d * D) * 4,
            transcendentals=0,
        ),
    )(GL, W, x, GR)
