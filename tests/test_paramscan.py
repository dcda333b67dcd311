"""Vmapped parameter scans (TPU-native batch ground-state searches).

No direct reference counterpart — the reference runs one
find_groundstate per coupling in a host loop; here the whole batch
shares one compiled VUMPS iteration (mpskit_tpu/algorithms/paramscan.py).
Oracle: the exact TFIM ground-state energy integral per coupling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXZ
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS
from mpskit_tpu.algorithms.paramscan import (
    scan_groundstate_vumps, stack_hamiltonians,
)


def tfim_exact_density(g):
    from scipy.integrate import quad

    f = lambda k: np.sqrt(1 + g**2 - 2 * g * np.cos(k))
    return -quad(f, 0, np.pi)[0] / np.pi


@pytest.mark.slow
def test_scan_vumps_tfim():
    gs = [0.5, 1.4, 2.0]
    Hs = [transverse_field_ising(g=g) for g in gs]
    psis = [InfiniteMPS.random(jax.random.PRNGKey(i), 1, 2, 10)
            for i in range(len(gs))]
    res = scan_groundstate_vumps(psis, Hs, VUMPS(tol=1e-8, maxiter=150))
    es = np.asarray(res.energies).real
    for g, e in zip(gs, es):
        assert abs(e - tfim_exact_density(g)) < 1e-6
    assert np.all(np.asarray(res.eps) < 1e-8)


def test_stack_rejects_mixed_structure():
    H1 = transverse_field_ising(g=1.0)
    H2 = heisenberg_XXZ(delta=0.5)
    with pytest.raises(ValueError):
        stack_hamiltonians([H1, H2])
