"""Real-space parallel DMRG: the chain is cut into segments that run
one-site DMRG mini-sweeps simultaneously, one per mesh core (block-Jacobi
in real space, Stoudenmire-White style) — algorithm-level parallelism the
reference does not have. Run with real TPUs or
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import mpskit_tpu as mk
from mpskit_tpu.algorithms.rsdmrg import find_groundstate_rsdmrg
from mpskit_tpu.parallel import make_mesh

L, D, d = 32, 64, 2
nseg = min(8, len(jax.devices()))
while L % nseg:
    nseg -= 1

H = mk.models.transverse_field_ising(g=1.5, dtype=np.float64)
psi0 = mk.FiniteMPS.random(jax.random.PRNGKey(0), L, d, D,
                           dtype=jnp.float64)

# serial reference
psi_s, envs_s, eps_s = mk.find_groundstate(
    psi0, H, mk.DMRG(tol=1e-10, maxiter=40, verbosity=0))
E_s = float(mk.expectation_value(psi_s, H, envs=envs_s))
print(f"serial DMRG: E = {E_s:.12f}")

# segment-parallel, one segment per mesh core
mesh = make_mesh(site=nseg, bond=1)
alg = mk.RealSpaceParallelDMRG(nseg=nseg, tol=1e-10, maxiter=60,
                               verbosity=0)
psi_p, envs_p, eps_p = find_groundstate_rsdmrg(psi0, H, alg, mesh=mesh)
E_p = float(mk.expectation_value(psi_p, H, envs=envs_p))
print(f"RS-DMRG x{nseg}:  E = {E_p:.12f}")
print(f"|dE| = {abs(E_p - E_s):.2e}")
