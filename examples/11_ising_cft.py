"""Finite-size CFT spectrum of the critical quantum Ising model.

Counterpart of the reference's examples/quantum1d/1.ising-cft: exact
diagonalization of the PERIODIC transverse-field Ising chain through the
MPS machinery (maximal-bond-dimension effective middle-site Lanczos),
momentum labels from the translation-operator MPO, and the rescaled gaps

    Delta_i = (E_i - E_0) * L / (2 pi v),   v = 2,

which reproduce the Ising CFT scaling dimensions {0, 1/8, 1, 9/8, ...}.

Run: JAX_PLATFORMS=cpu python examples/11_ising_cft.py   (from the repo root)
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.operators.mpo import DenseMPO
from mpskit_tpu.operators.apply import apply_densempo_finite
from mpskit_tpu.algorithms.toolbox import (
    exact_diagonalization, periodic_boundary_conditions,
    periodic_boundary_conditions_densempo,
)


def translation_mpo(L: int) -> DenseMPO:
    """The ring-closed translation operator: site tensor
    O[a, b, s, t] = delta(a, s) delta(t, b) (output = incoming bond,
    outgoing bond = input), wrapped onto L sites."""
    d = 2
    O = np.zeros((d, d, d, d))
    for a in range(d):
        for t in range(d):
            O[a, t, a, t] = 1.0
    return periodic_boundary_conditions_densempo(DenseMPO.from_array(O), L)


if __name__ == "__main__":
    L, num = 12, 8
    H = periodic_boundary_conditions(transverse_field_ising(g=1.0), L)
    energies, states = exact_diagonalization(H, L, num=num)
    energies = np.real(np.asarray(energies))

    T = translation_mpo(L)
    Tpsi = [apply_densempo_finite(T, s) for s in states]

    # diagonalize the translation within (near-)degenerate energy clusters
    # (the eigensolver returns an arbitrary basis inside each subspace)
    momenta = np.zeros(num)
    i = 0
    while i < num:
        j = i + 1
        while j < num and abs(energies[j] - energies[i]) < 1e-6:
            j += 1
        M = np.zeros((j - i, j - i), complex)
        for a in range(i, j):
            for b in range(i, j):
                M[a - i, b - i] = complex(states[a].dot(Tpsi[b]))
        w, _ = np.linalg.eig(M)
        momenta[i:j] = np.sort(np.angle(w))
        i = j
    v = 2.0
    dims = (energies - energies[0]) * L / (2 * np.pi * v)
    print(" level   E              Delta     p L / (2 pi)")
    for k in range(num):
        print(f"   {k}   {energies[k]:+.8f}   {dims[k]:.4f}   "
              f"{momenta[k] * L / (2 * np.pi):+.2f}")
    print("Ising CFT: Delta in {0, 1/8, 1, 1+1/8, 2, ...}")
