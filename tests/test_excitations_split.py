"""Split-complex QP dispersion at arbitrary momentum: parity against the
complex-native `excitations_infinite` on the infinite TFIM (the on-chip
path for the TPU's no-complex runtime; reference
src/algorithms/excitation/exci_transfer_system.jl:1-86 relies on complex
phases that the real-dtype path cannot represent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations_infinite)
from mpskit_tpu.algorithms.excitations_split import dispersion_split

pytestmark = pytest.mark.slow

G = 1.5


def _tfim_gap(g, p):
    """Exact single-particle dispersion of the TFIM (J=1, field g):
    E(p) = 2 sqrt(g^2 - 2 g cos p + 1)."""
    return 2.0 * np.sqrt(g * g - 2 * g * np.cos(p) + 1.0)


def test_dispersion_split_matches_complex_native_and_exact():
    H = transverse_field_ising_lattice(g=G, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 16,
                             dtype=jnp.float64)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-12,
                                                        maxiter=300))
    p = 0.7  # p not a multiple of pi: unreachable for the real-dtype path
    alg = QuasiparticleAnsatz(tol=1e-10, krylovdim=24, maxrestarts=40)

    # complex-native reference
    psic = InfiniteMPS(psi.AL.astype(jnp.complex128),
                       psi.AR.astype(jnp.complex128),
                       psi.AC.astype(jnp.complex128),
                       psi.C.astype(jnp.complex128))
    from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
    envs_c = hamiltonian_environments(psic, H, tol=1e-12)
    es_c, _ = excitations_infinite(H, alg, [p], psic, envs=envs_c)
    e_c = float(jnp.real(es_c[0, 0]))

    # split path on the REAL state
    e_s, X, resid = dispersion_split(H, psi, envs, p, alg=alg)
    e_s = float(e_s)

    assert abs(e_s - e_c) < 1e-6, (e_s, e_c)
    assert abs(e_s - _tfim_gap(G, p)) < 1e-3, (e_s, _tfim_gap(G, p))
    assert float(resid) < 1e-6


def test_dispersion_split_momentum_dependence():
    """E(p) follows the exact TFIM dispersion shape across the zone."""
    H = transverse_field_ising_lattice(g=G, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, 12,
                             dtype=jnp.float64)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-11,
                                                        maxiter=300))
    alg = QuasiparticleAnsatz(tol=1e-8, krylovdim=20, maxrestarts=30)
    for p in (0.3, 1.2, 2.4):
        e, _, _ = dispersion_split(H, psi, envs, p, alg=alg)
        assert abs(float(e) - _tfim_gap(G, p)) < 5e-3, (p, float(e))
