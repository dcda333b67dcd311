"""Ising-anyon (sigma) chain: per-bond sector structure and the exact
critical energy.

A chain of sigma anyons (Ising fusion category) is the simplest system
whose fusion graph is BIPARTITE: heights after each site alternate
between {1, psi} and {sigma}, so the virtual bonds of the height-basis
MPS carry different sector sets on even/odd bonds — a per-bond static
structure no uniform sector split can express
(mpskit_tpu.symmetry.chain_bond_labels).

The chain H = -J sum_i P^(1)_i is exactly unitarily equivalent to the
critical transverse-field Ising model (tests/test_category.py proves the
finite map), so the infinite chain's ground energy per anyon site is
exactly -1/2 - 1/pi.

Counterpart of the reference's anyonic spin chains over TensorKit
`Vect[IsingAnyon]`-style spaces."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from mpskit_tpu.symmetry import AnyonicInfiniteMPS, find_groundstate_anyonic
from mpskit_tpu.symmetry.category import ising_category
from mpskit_tpu.models import ising_anyon_chain
from mpskit_tpu.algorithms import VUMPS, expectation_value


def main():
    jax.config.update("jax_platforms", "cpu")  # small D: CPU is fine

    cat = ising_category()
    H = ising_anyon_chain(period=2)

    # seed=(sigma,) pins bond 0 to the sigma sublattice class
    spsi = AnyonicInfiniteMPS.random(jax.random.PRNGKey(3), cat, anyon=1,
                                     D=12, L=2, seed=(1,))
    print("bond sector labels (0=1, 1=sigma, 2=psi):")
    for i, row in enumerate(spsi.labels):
        print(f"  bond {i}: {row}")

    spsi, envs, eps = find_groundstate_anyonic(
        spsi, H, VUMPS(tol=1e-8, maxiter=200, verbosity=1))

    e = float(np.mean(np.real(np.asarray(
        expectation_value(spsi.state, H, envs=envs)))))
    exact = -0.5 - 1.0 / np.pi
    print(f"e = {e:.6f}   exact = {exact:.6f}   err = {abs(e - exact):.2e}")

    for b in (0, 1):
        print(f"bond {b}: quantum-trace S = {spsi.entropy(b):.4f}  "
              f"sectors {sorted(set(spsi.labels[b]))}")


if __name__ == "__main__":
    main()
