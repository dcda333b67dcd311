"""Finite-chain ground state with DMRG (counterpart of the reference's
README quickstart): transverse-field Ising, energy, entanglement."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import mpskit_tpu as mk

L, g, D = 24, 0.8, 32

H = mk.models.transverse_field_ising(g=g)
psi = mk.FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
psi, envs, eps = mk.find_groundstate(psi, H, alg=mk.DMRG(tol=1e-9))

print("ground energy:", float(mk.expectation_value(psi, H, envs=envs)))
print("mid-chain entropy:", float(mk.entropy(psi, L // 2)))
print("energy variance:", float(mk.variance(psi, H)))
