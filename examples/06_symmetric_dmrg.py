"""Charge-sector DMRG with the abelian symmetric backend: Heisenberg chain
in fixed total-Sz sectors, with sector-resolved entanglement."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import mpskit_tpu as mk
from mpskit_tpu.symmetry.charges import (
    SymmetricFiniteMPS, find_groundstate_symmetric,
    sector_entanglement_spectrum,
)

L, D = 16, 32
H = mk.models.heisenberg_XXX(spin=0.5)

for total in [0, 2, 4]:  # total charge = 2 * total Sz
    spsi = SymmetricFiniteMPS.random(
        jax.random.PRNGKey(0), L, phys_charges=[1, -1], D=D, total=total)
    spsi, envs, eps = find_groundstate_symmetric(
        spsi, H, mk.DMRG(tol=1e-8, maxiter=60))
    E = float(mk.expectation_value(spsi.state, H, envs=envs))
    print(f"Sz_tot = {total / 2:>4}: E = {E:+.8f}")

spec = sector_entanglement_spectrum(spsi, L // 2)
for q, s in sorted(spec.items()):
    print(f"  sector {q:+d}: largest Schmidt value {s[0]:.4f} ({len(s)} values)")
