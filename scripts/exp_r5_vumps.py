"""Round-5 VUMPS perf experiments at the bench workload (infinite TFIM,
D=256, f32, steady-state warm-started iteration). One process, sequential
measurements (axon remote compiles are serialized):

  a) per-call dispatch overhead (tiny jitted fn, pipelined loop)
  b) baseline iteration (reorth=local, env restart 12) at n=16 pipelined
  c) reorth=local1 variant
  d) env restart 8 / 16 variants
  e) BATCHED AC+C local solves: C is embedded as an AC-shaped lane
     (physical slot 0) with a per-lane diagonal-identity W, so both
     eigensolves run as ONE vmapped Lanczos over 2L lanes — halves the
     sequential Lanczos overhead chain at the cost of ~1 extra cheap
     c-lane matvec (latency-bound at D=256).

Prints one line per measurement; results are recorded in ROADMAP.md.
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.states.gauging import regauge_ACC, regauge_CAC
from mpskit_tpu.states.infinitemps import InfiniteMPS as IMPS
from mpskit_tpu.environments import infinite_ham as ih
from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
from mpskit_tpu.algorithms.derivatives import ac_apply, c_apply
from mpskit_tpu.algorithms.vumps import _vumps_iteration
from mpskit_tpu.linalg.lanczos import eigsh_smallest
from mpskit_tpu.config import matmul_precision

D, m, restarts = 256, 10, 2
dtype = jnp.float32
H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
tol = jnp.asarray(1e-6, jnp.float32)


def make_iteration(reorth="local"):
    @partial(jax.jit, static_argnums=(2, 3))
    def iteration(psi, H, m, restarts, inner_tol, env_guess=None):
        L = psi.period
        envs = hamiltonian_environments(psi, H, tol=1e-8,
                                        env_init=env_guess)
        Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)

        def solve_ac(GL, W, GR, AC):
            res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC,
                                 m, restarts, inner_tol, reorth=reorth)
            return res.eigenvector

        def solve_c(GLn, GR, C):
            res = eigsh_smallest(lambda x: c_apply(GLn, GR, x), C,
                                 m, restarts, inner_tol, reorth=reorth)
            return res.eigenvector

        GLn = jnp.roll(envs.GLs, -1, axis=0)
        ACs = jax.vmap(solve_ac)(envs.GLs, Ws, envs.GRs, psi.AC)
        Cs = jax.vmap(solve_c)(GLn, envs.GRs, psi.C)
        ALs = jax.vmap(regauge_ACC)(ACs, Cs)
        ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
        eps = jnp.max(jnp.linalg.norm((ACs - ALC).reshape(L, -1), axis=1))
        ARs = jax.vmap(regauge_CAC)(jnp.roll(Cs, 1, axis=0), ACs)
        return IMPS(ALs, ARs, ACs, Cs), eps, envs
    return iteration


def make_iteration_batched(reorth="local"):
    """AC and C eigensolves combined into ONE vmapped Lanczos (2L lanes)."""
    @partial(jax.jit, static_argnums=(2, 3))
    def iteration(psi, H, m, restarts, inner_tol, env_guess=None):
        L, Dv, d = psi.period, psi.D, psi.physicaldim
        envs = hamiltonian_environments(psi, H, tol=1e-8,
                                        env_init=env_guess)
        Ws = jnp.stack([H.site(i) for i in range(L)]).astype(psi.dtype)
        w = Ws.shape[1]
        # C lane: x[y, 0, n] = C[y, n]; W_c[a, a, 0, 0] = 1 makes
        # ac_apply(GL_next, W_c, GR, x) == c_apply(GL_next, GR, C) on slot 0
        Wc = jnp.zeros((w, w, d, d), psi.dtype).at[
            jnp.arange(w), jnp.arange(w), 0, 0].set(1.0)
        GLn = jnp.roll(envs.GLs, -1, axis=0)
        C_pad = jnp.zeros((L, Dv, d, Dv), psi.dtype).at[:, :, 0, :].set(
            psi.C)
        GL_b = jnp.concatenate([envs.GLs, GLn], axis=0)
        GR_b = jnp.concatenate([envs.GRs, envs.GRs], axis=0)
        W_b = jnp.concatenate([Ws, jnp.broadcast_to(Wc, (L,) + Wc.shape)],
                              axis=0)
        X_b = jnp.concatenate([psi.AC, C_pad], axis=0)

        def solve(GL, W, GR, X):
            res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), X,
                                 m, restarts, inner_tol, reorth=reorth)
            return res.eigenvector

        out = jax.vmap(solve)(GL_b, W_b, GR_b, X_b)
        ACs, Cs = out[:L], out[L:, :, 0, :]
        ALs = jax.vmap(regauge_ACC)(ACs, Cs)
        ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
        eps = jnp.max(jnp.linalg.norm((ACs - ALC).reshape(L, -1), axis=1))
        ARs = jax.vmap(regauge_CAC)(jnp.roll(Cs, 1, axis=0), ACs)
        return IMPS(ALs, ARs, ACs, Cs), eps, envs
    return iteration


def run(iteration, label, n=16, warm=8):
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D, dtype=dtype)
    env = None
    with matmul_precision(dtype):
        for _ in range(warm):
            psi, eps, env = iteration(psi, H, m, restarts, tol,
                                      env_guess=env)
        float(eps)
        t0 = time.perf_counter()
        for _ in range(n):
            psi, eps, env = iteration(psi, H, m, restarts, tol,
                                      env_guess=env)
        float(eps)
        dt = (time.perf_counter() - t0) / n
    print(f"{label:48s} {dt*1e3:7.2f} ms/iter (eps {float(eps):.2e})",
          flush=True)
    return dt


# --- a) dispatch overhead -------------------------------------------------
@jax.jit
def _tiny(x):
    return x * 1.000001


x = jnp.ones((8, 128), dtype)
x = _tiny(x)
float(x[0, 0])
for n in (10, 100):
    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = _tiny(y)
    float(y[0, 0])
    print(f"dispatch: {n} tiny chained calls: "
          f"{(time.perf_counter()-t0)/n*1e3:.3f} ms/call", flush=True)

# --- b..e) iteration variants --------------------------------------------
base = run(make_iteration("local"), "baseline local restart=12")
run(make_iteration("local1"), "reorth=local1 restart=12")
ih._ENV_RESTART = 8
run(make_iteration("local"), "local restart=8")
ih._ENV_RESTART = 16
run(make_iteration("local"), "local restart=16")
ih._ENV_RESTART = 12
bat = run(make_iteration_batched("local"), "BATCHED AC+C local restart=12")
run(make_iteration_batched("local1"), "BATCHED AC+C local1 restart=12")
ih._ENV_RESTART = 8
run(make_iteration_batched("local1"), "BATCHED AC+C local1 restart=8")
ih._ENV_RESTART = 12
print(f"batched speedup vs baseline: {base/bat:.3f}x", flush=True)
