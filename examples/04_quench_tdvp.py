"""Global quench dynamics with TDVP: prepare the TFIM ground state at g0,
quench to g1, track energy and entanglement growth."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import mpskit_tpu as mk

L, D = 16, 32
H0 = mk.models.transverse_field_ising(g=1.5)
H1 = mk.models.transverse_field_ising(g=0.5)

psi = mk.FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
psi, envs, _ = mk.find_groundstate(psi, H0, alg=mk.DMRG(tol=1e-9))

# cast to complex for real-time evolution
import jax.numpy as jnp
psi = mk.FiniteMPS(psi.ALs.astype(jnp.complex128),
                   psi.ARs.astype(jnp.complex128),
                   psi.AC.astype(jnp.complex128), psi.center)

ts = np.linspace(0, 1.0, 11)
for t0, t1 in zip(ts[:-1], ts[1:]):
    psi, _ = mk.timestep(psi, H1, t0, t1 - t0, mk.TDVP())
    print(f"t={t1:.1f}  E={float(mk.expectation_value(psi, H1)):+.6f}  "
          f"S_mid={float(mk.entropy(psi, L // 2)):.4f}")
