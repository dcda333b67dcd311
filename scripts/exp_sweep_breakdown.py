"""Micro-breakdown of the D=512 sweep cost on the chip: times (a) a pure
X3 ac_apply matvec chain matching the sweep's matvec count, (b) the QR
panels, (c) basis_combine + norms, against (d) the full sweep. Identifies
where the non-matvec 40% of the sweep sits after the round-3 solver
changes."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

L, D, d, G, m, r = 32, 512, 2, 1.5, 10, 2

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.finitemps import support_mask
from mpskit_tpu.environments.finite import (compute_right_envs,
                                            right_boundary, stack_W)
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.algorithms.derivatives import ac_apply
from mpskit_tpu.tensors.ops import leftorth
from mpskit_tpu.config import matmul_precision

dt = jnp.float32
H = transverse_field_ising_lattice(g=G, dtype=np.float64)
Ws = stack_W(H, L).astype(dt)
w = Ws.shape[1]
masks = jnp.asarray(support_mask(L, d, D))
psi = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D, dtype=dt)
GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
tol = jnp.asarray(1e-6, jnp.float32)

GL = jnp.ones((w, D, D), dt) / D
GR = jnp.ones((w, D, D), dt) / D
W0 = Ws[L // 2]


def timeit(name, fn, *args, n=3):
    y = fn(*args)
    jax.tree_util.tree_map(lambda l: l.block_until_ready(), y)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].real))  # axon sync
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].real))
    dt_ = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt_*1e3:9.2f} ms", flush=True)
    return dt_


NMAT = 22 * 64  # ~matvecs per sweep (20 Krylov + probe + Galerkin, 64 visits)


@jax.jit
def matvec_chain(x):
    def body(x, _):
        y = ac_apply(GL, W0, GR, x)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-30), None

    y, _ = jax.lax.scan(body, x, None, length=NMAT)
    return y


@jax.jit
def matvec_chain_nonorm(x):
    def body(x, _):
        y = ac_apply(GL, W0, GR, x)
        return y * (1.0 / 50.0), None

    y, _ = jax.lax.scan(body, x, None, length=NMAT)
    return y


@jax.jit
def qr_chain(x):
    def body(x, _):
        AL, C = leftorth(x)
        return jnp.einsum("lpm,mr->lpr", AL, C), None

    y, _ = jax.lax.scan(body, x, None, length=64)
    return y


with matmul_precision(dt):
    a, b, c, g2 = psi.ALs, psi.ARs, psi.AC, GRs
    a, b, c, g2, lam, eps, _ = _dmrg_sweep(a, b, c, Ws, g2, tol, m, r,
                                           masks=masks)
    float(jnp.real(lam))
    x0 = jnp.array(c)  # fresh buffer (the warm sweep donated psi.AC)
    t_sweep = timeit("full sweep", lambda: _dmrg_sweep(
        jnp.array(a), jnp.array(b), jnp.array(c), Ws, jnp.array(g2),
        tol, m, r, masks=masks))
    t_mv = timeit(f"{NMAT} X3 matvecs + norm", matvec_chain, x0)
    t_mv2 = timeit(f"{NMAT} X3 matvecs no-norm", matvec_chain_nonorm, x0)
    t_qr = timeit("64 QR panels (+recombine)", qr_chain, x0)
    print(f"\nmatvec+norm fraction: {t_mv/t_sweep:.2%}; "
          f"norm overhead per sweep: {(t_mv-t_mv2)*1e3:.1f} ms; "
          f"residual (basis ops, eigh, combines): "
          f"{(t_sweep-t_mv-t_qr)*1e3:.1f} ms")
