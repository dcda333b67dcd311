"""Spin-1/2 Heisenberg (XXZ point): why the unit cell matters.

Counterpart of the reference's examples/quantum1d/4.xxz-heisenberg: a
1-site uniform ansatz CANNOT represent the antiferromagnetic ground state
(the fixed point is non-injective — the transfer spectrum develops a
second eigenvalue on the unit circle) and VUMPS stalls; a 2-site unit
cell converges cleanly to the Bethe-ansatz energy
e = 1/4 - ln 2 = -0.443147... per site (in S.S units).

Run: JAX_PLATFORMS=cpu python examples/12_xxz_unit_cell.py
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpskit_tpu.models import heisenberg_XXX
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.toolbox import transfer_spectrum


if __name__ == "__main__":
    D = 24
    H = heisenberg_XXX(spin=0.5, dtype=np.float64)  # 4 S.S convention
    e_bethe = 0.25 - np.log(2.0)

    # 1-site cell: stalls (non-injective target state)
    psi1 = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D,
                              dtype=jnp.float64)
    psi1, envs1, eps1 = find_groundstate_vumps(
        psi1, H, VUMPS(tol=1e-10, maxiter=60, verbosity=0))
    lams = np.abs(np.asarray(transfer_spectrum(psi1, num=3)))
    print(f"1-site cell: eps={eps1:.1e} — VUMPS cannot converge: the"
          " antiferromagnetic target is non-injective as a 1-site state"
          f" (e/site={float(np.real(envs1.e_density)) / 4:.6f}, junk)")

    # 2-site cell: clean convergence to the Bethe energy
    psi2 = InfiniteMPS.random(jax.random.PRNGKey(1), 2, 2, D,
                              dtype=jnp.float64)
    psi2, envs2, eps2 = find_groundstate_vumps(
        psi2, H, VUMPS(tol=1e-10, maxiter=250, verbosity=0))
    e2 = float(np.real(envs2.e_density)) / 4
    print(f"2-site cell: eps={eps2:.1e}  e/site={e2:.6f}  "
          f"(Bethe: {e_bethe:.6f}, diff={abs(e2 - e_bethe):.1e})")
