"""The spin-1 Haldane phase as a symmetry-protected topological phase.

Counterpart of the reference's examples/quantum1d/5.haldane-spt: the
VUMPS ground state of the antiferromagnetic spin-1 Heisenberg chain shows
the two SPT fingerprints:

  * every entanglement level is (at least) doubly degenerate — the
    half-integer edge spin forces even multiplets in the Schmidt spectrum;
  * long-range den Nijs-Rommelse string order
    <S^z_i exp(i pi sum_{i<k<j} S^z_k) S^z_j> -> -0.3743 (j - i -> inf)
    while the plain spin-spin correlator decays exponentially.

Run: JAX_PLATFORMS=cpu python examples/10_haldane_spt.py
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpskit_tpu.models import heisenberg_XXX
from mpskit_tpu.models.spins import spinmatrices
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.toolbox import entanglement_spectrum
from mpskit_tpu.algorithms.correlators import correlator, string_correlator


if __name__ == "__main__":
    D = 48
    H = heisenberg_XXX(spin=1, dtype=np.float64)  # 4 S.S convention
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 3, D,
                             dtype=jnp.float64)
    psi, envs, eps = find_groundstate_vumps(
        psi, H, VUMPS(tol=1e-10, maxiter=250, verbosity=0))
    print(f"converged eps={eps:.1e}, e/site = "
          f"{float(np.real(envs.e_density)) / 4:.10f} (S.S units; "
          "exact -1.401484039)")

    # SPT fingerprint 1: doubly degenerate entanglement spectrum
    S = np.asarray(entanglement_spectrum(psi))
    S = S[S > 1e-8]
    pairs = S[: len(S) // 2 * 2].reshape(-1, 2)
    gap = np.max(np.abs(pairs[:, 0] - pairs[:, 1]) / pairs[:, 0])
    print(f"entanglement levels (top 8): {np.round(S[:8], 6)}")
    print(f"max relative splitting within pairs: {gap:.2e}")

    # SPT fingerprint 2: string order saturates, spin order decays
    _, _, Sz, _ = spinmatrices(1)
    Sz = np.real(Sz)
    expZ = np.diag(np.exp(1j * np.pi * np.diag(Sz))).real
    js = [4, 8, 16, 32]
    zz = np.real(np.asarray(correlator(psi, Sz, Sz, 0, js)))
    so = np.real(np.asarray(string_correlator(psi, Sz, expZ, Sz, 0, js)))
    for j, a, b in zip(js, zz, so):
        print(f"j={j:3d}:  <Sz Sz> = {a:+.6f}   string order = {b:+.6f}")
