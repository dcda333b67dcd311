import numpy as np
import jax
import pytest

from mpskit_tpu.models.statmech import classical_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.states.multiline import MPSMultiline
from mpskit_tpu.operators.multiline import MPOMultiline
from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
from mpskit_tpu.algorithms.expval import expectation_value

pytestmark = pytest.mark.slow


def test_two_row_classical_ising():
    # two identical rows must reproduce the single-row boundary physics
    O = classical_ising()
    Om = MPOMultiline.from_mpo(O, nrows=2)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 8)
    psim, envs, eps = leading_boundary(
        psi, Om, VUMPS_Boundary(tol=1e-6, maxiter=60, krylovdim=20))
    assert isinstance(psim, MPSMultiline) and psim.nrows == 2
    # per-row eigenvalue: <psi_{r+1}| T_r |psi_r> channel; the product over
    # rows gives the 2-row transfer eigenvalue = lambda_1row^2
    lam_rows = [complex(e.lambda_cell) for e in envs]
    lam_prod = np.prod(lam_rows)
    assert abs(abs(lam_prod) ** 0.5 - 2.5337) < 5e-3
