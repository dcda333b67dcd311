"""Finite-temperature purification workflow: thermal TFIM energies against
the dense Gibbs-state oracle E(beta) = Tr(H e^{-beta H}) / Tr(e^{-beta H}).
(The reference ships the ingredients — infinite_temperature,
make_time_mpo — but no thermal driver; see mpskit_tpu/algorithms/thermal.)
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.algorithms.thermal import (
    purification_mps, lift_hamiltonian, thermal_state, thermal_expectation,
)
from mpskit_tpu.algorithms.expval import expectation_value

pytestmark = pytest.mark.slow

L, G = 6, 1.2


def exact_thermal_energy(Hd, beta):
    w, V = np.linalg.eigh(Hd)
    z = np.exp(-beta * (w - w.min()))
    return float((w * z).sum() / z.sum())


def test_infinite_temperature_limit():
    # beta = 0: the purification is |vec 1>, <H> = Tr(H)/2^L = 0 for TFIM
    H = transverse_field_ising(g=G, dtype=np.complex128)
    psi = purification_mps(2, L, D=8)
    e0 = float(thermal_expectation(psi, H))
    assert abs(e0) < 1e-10


def test_thermal_energy_vs_dense():
    H = transverse_field_ising(g=G, dtype=np.complex128)
    Hd = np.asarray(H.to_matrix(L))
    for beta in (0.4, 1.2):
        psi = thermal_state(H, L, beta, dbeta=0.025, Dmax=24)
        e = float(thermal_expectation(psi, H))
        e_ref = exact_thermal_energy(Hd, beta)
        # O(dbeta^2)-per-step MPO error + D=24 truncation
        assert abs(e - e_ref) < 5e-3 * max(1.0, abs(e_ref)), (beta, e, e_ref)


def test_thermal_to_groundstate_crossover():
    # large beta approaches the ground-state energy from above
    H = transverse_field_ising(g=G, dtype=np.complex128)
    Hd = np.asarray(H.to_matrix(L))
    e_gs = float(np.linalg.eigvalsh(Hd)[0])
    psi = thermal_state(H, L, beta=8.0, dbeta=0.05, Dmax=24)
    e = float(thermal_expectation(psi, H))
    assert e > e_gs - 1e-6
    assert abs(e - e_gs) < 5e-2
