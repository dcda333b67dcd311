import numpy as np
import jax
import pytest

from mpskit_tpu.models.statmech import sixvertex, classical_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
from mpskit_tpu.algorithms.excitations_statmech import excitations_boundary


def test_sixvertex_dispersion():
    # reference oracle (test/algorithms.jl:212-219): |E(0)| > |E(pi/2)|
    O = sixvertex()
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 2, 2, 10)
    psi, envs, eps = leading_boundary(
        psi, O, VUMPS_Boundary(tol=1e-8, maxiter=200))
    lams, _ = excitations_boundary(O, [0.0, np.pi / 2], psi, envs=envs,
                                   tol=1e-5)
    l0, l1 = complex(lams[0]), complex(lams[1])
    assert np.isfinite(l0.real) and np.isfinite(l1.real)
    assert abs(l0) > abs(l1), (abs(l0), abs(l1))
