"""2D classical Ising partition function at criticality: boundary-MPS
fixed point with leading_boundary (counterpart of the reference's
classic2d examples)."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import mpskit_tpu as mk
from mpskit_tpu.models.statmech import classical_ising

O = classical_ising()  # critical temperature
psi = mk.InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 16)
psi, envs, eps = mk.leading_boundary(psi, O, mk.VUMPS_Boundary(tol=1e-9))
lam = complex(mk.expectation_value(psi, O, envs=envs))
print("leading eigenvalue per site:", lam.real, "(exact ~ 2.5337)")
print("boundary entanglement entropy:", float(mk.entropy(psi)))
