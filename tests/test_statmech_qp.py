import numpy as np
import jax
import pytest

from mpskit_tpu.models.statmech import sixvertex, classical_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
from mpskit_tpu.algorithms.excitations_statmech import excitations_boundary


@pytest.mark.slow
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


@pytest.mark.slow
def test_multiline_qp_matches_single_row():
    """nrows=2 multiline QP (reference qpenv.jl:171-303): with identical
    rows the coupled row-shifted operator is a cyclic permutation of
    identical blocks, so its dominant |lambda| equals the single-row
    value."""
    from mpskit_tpu.states.multiline import MPSMultiline
    from mpskit_tpu.operators.multiline import MPOMultiline
    from mpskit_tpu.algorithms.excitations_statmech import (
        excitations_boundary_multiline,
    )

    O = classical_ising(beta=1.2)   # off-critical: gapped, clean dominance
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, 8)
    psi, envs, _ = leading_boundary(
        psi, O, VUMPS_Boundary(tol=1e-9, maxiter=200))

    p = 0.7
    lam1, _ = excitations_boundary(O, [p], psi, envs=envs, tol=1e-7)
    psi2 = MPSMultiline.from_mps(psi, 2)
    O2 = MPOMultiline.from_mpo(O, 2)
    lam2, qps = excitations_boundary_multiline(O2, [p], psi2, tol=1e-7)

    assert np.isfinite(complex(lam2[0]).real)
    # the coupled R=2 spectrum comes in +-mu pairs (cyclic permutation of
    # identical blocks), which slows Arnoldi; 1% agreement on |lambda| is
    # the solver floor here (measured 0.26%)
    np.testing.assert_allclose(abs(complex(lam2[0])),
                               abs(complex(lam1[0])), rtol=1e-2)
    assert len(qps[0]) == 2
