"""Infinite spin-1 Heisenberg chain: VUMPS ground state and the Haldane
gap from the quasiparticle ansatz at momentum pi (counterpart of the
reference's docs/examples quantum1d demos)."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import mpskit_tpu as mk

D = 48
H = mk.models.heisenberg_XXX(spin=1)  # = 4 * sum S.S

psi = mk.InfiniteMPS.random(jax.random.PRNGKey(0), 1, 3, D)
psi, envs, eps = mk.find_groundstate(psi, H, alg=mk.VUMPS(tol=1e-9))
print("energy density:", float(mk.expectation_value(psi, H, envs=envs)[0]))
print("correlation length:", float(mk.correlation_length(psi)))

es, qps = mk.excitations(H, mk.QuasiparticleAnsatz(tol=1e-6), np.pi, psi,
                         envs=envs)
print("Haldane gap:", float(es[0, 0]) / 4, "(literature: 0.41047925)")
