"""Bond-dimension sharding over a device mesh: the D x D virtual bonds of
the MPS span all devices, XLA inserts the ICI collectives inside every
Krylov matvec. Run with real TPUs or
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import mpskit_tpu as mk
from mpskit_tpu.parallel import make_mesh, shard_finite_mps, shard_env, replicate
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.environments.finite import (
    compute_right_envs, right_boundary, stack_W,
)

L, D, d = 16, 256, 2
dtype = jnp.float32

mesh = make_mesh(bond=len(jax.devices()))
H = mk.models.transverse_field_ising(g=1.2, dtype=np.float64)
psi = mk.FiniteMPS.random(jax.random.PRNGKey(0), L, d, D, dtype=dtype)
psi = shard_finite_mps(psi, mesh)

Ws = replicate(stack_W(H, L).astype(dtype), mesh)
w = Ws.shape[1]
GRs = shard_env(compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dtype)),
                mesh)
tol = jnp.asarray(1e-6, jnp.float32)

ALs, ARs, AC, GRs, lam, eps, _diag = _dmrg_sweep(
    psi.ALs, psi.ARs, psi.AC, Ws, GRs, tol, 16, 2)
print("sharded sweep energy:", float(jnp.real(lam)))
print("AC sharding:", AC.sharding)
