"""On-device component breakdown of the steady-state VUMPS iteration at
D=256 f32 (iterations 9..40 regime): each component timed as a 32-deep
device-side scan so the numbers decompose the 5.4 ms scan-batched
iteration (bench.py round-5 protocol), not dispatch latency.

Components: (a) hamiltonian_environments (paired geometric GMRES solves),
(b) AC eigensolves, (c) C eigensolves, (d) regauge QR/LQ + eps, (e) the
full iteration."""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.states.gauging import regauge_ACC, regauge_CAC
from mpskit_tpu.algorithms.vumps import (_vumps_iteration,
                                         _vumps_iterations_scan)
from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
from mpskit_tpu.algorithms.derivatives import ac_apply, c_apply
from mpskit_tpu.linalg.lanczos import eigsh_smallest
from mpskit_tpu.config import matmul_precision

D, m, restarts = 256, 10, 2
dtype = jnp.float32
H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
tol = jnp.asarray(1e-6, jnp.float32)
N = 32

psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D, dtype=dtype)
env = None
with matmul_precision(dtype):
    for _ in range(8):
        psi, eps, env, _d = _vumps_iteration(psi, H, m, restarts, 1e-8,
                                             1e-8, tol, env_guess=env)
    float(eps)

    Ws = jnp.stack([H.site(i) for i in range(psi.period)]).astype(psi.dtype)

    def timeit(name, fn, *args, n=3):
        y = fn(*args)
        float(jnp.real(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(*args)
        float(jnp.real(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / n / N
        print(f"{name:44s} {dt*1e3:8.3f} ms/iter", flush=True)
        return dt

    # (e) full iteration (the bench number)
    @jax.jit
    def full(psi, env):
        return _vumps_iterations_scan(psi, H, m, restarts, 1e-8, 1e-8, N,
                                      tol, envs=env)

    # (a) environments only, chained (perturb psi slightly per step so the
    # warm start stays realistic rather than idempotent)
    @jax.jit
    def envs_only(psi, env):
        def body(carry, _):
            e = hamiltonian_environments(psi, H, tol=1e-8, env_init=carry)
            return e, e.resid
        e, r = jax.lax.scan(body, env, None, length=N)
        return r

    # (b) AC solves chained
    @jax.jit
    def ac_only(psi, env):
        def body(AC, _):
            def solve(GL, W, GR, ac):
                r = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), ac,
                                   m, restarts, tol, reorth="local1")
                return r.eigenvector
            return jax.vmap(solve)(env.GLs, Ws, env.GRs, AC), None
        ac, _ = jax.lax.scan(body, psi.AC, None, length=N)
        return ac

    # (c) C solves chained
    @jax.jit
    def c_only(psi, env):
        GLn = jnp.roll(env.GLs, -1, axis=0)
        def body(C, _):
            def solve(GL, GR, c):
                r = eigsh_smallest(lambda x: c_apply(GL, GR, x), c,
                                   m, restarts, tol, reorth="local1")
                return r.eigenvector
            return jax.vmap(solve)(GLn, env.GRs, C), None
        c, _ = jax.lax.scan(body, psi.C, None, length=N)
        return c

    # (d) regauge + eps chained
    @jax.jit
    def regauge_only(psi):
        def body(carry, _):
            ACs, Cs = carry
            ALs = jax.vmap(regauge_ACC)(ACs, Cs)
            ALC = jnp.einsum("ilpm,imr->ilpr", ALs, Cs)
            eps = jnp.max(jnp.linalg.norm(
                (ACs - ALC).reshape(ACs.shape[0], -1), axis=1))
            ARs = jax.vmap(regauge_CAC)(jnp.roll(Cs, 1, axis=0), ACs)
            # feed outputs back so the chain has data dependencies
            return (ACs + 0.0 * ARs, Cs + 0.0 * eps), eps
        (_, _), epss = jax.lax.scan(body, (psi.AC, psi.C), None, length=N)
        return epss

    t_full = timeit("full iteration (scan x32)", full, psi, env)
    t_env = timeit("hamiltonian_environments (scan x32)", envs_only, psi,
                   env)
    t_ac = timeit("AC eigensolves (scan x32)", ac_only, psi, env)
    t_c = timeit("C eigensolves (scan x32)", c_only, psi, env)
    t_rg = timeit("regauge QR/LQ + eps (scan x32)", regauge_only, psi)
    print(f"\nsum of parts {1e3*(t_env+t_ac+t_c+t_rg):.3f} vs full "
          f"{1e3*t_full:.3f} ms", flush=True)
