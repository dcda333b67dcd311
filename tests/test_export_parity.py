"""Export parity with the reference (src/MPSKit.jl:16-55): every live
reference export is importable from mpskit_tpu under its reference name
(docs/parity.md), and the compat pieces behave (PeriodicArray indexing,
the eight mixed-gauge fixed points, TransferMatrix application,
environments dispatcher, add_util_leg / virtualspace accessors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# reference export list minus the N/A rows of docs/parity.md (mutating !
# variants, poison!/recalculate!/Cache — functional design; splitham —
# dead export in the reference; ∂-symbols — not valid Python names,
# mapped to c_apply/ac_apply/ac2_apply)
REFERENCE_EXPORTS = """
InfiniteMPS FiniteMPS WindowMPS MPSMultiline PeriodicArray Window
MPSTensor QP LeftGaugedQP RightGaugedQP leftorth rightorth
uniform_leftorth uniform_rightorth add_util_leg max_Ds
left_virtualspace right_virtualspace physicalspace entanglementplot
transferplot SparseMPO MPOHamiltonian DenseMPO MPOMultiline
UntimedOperator TimedOperator MultipliedOperator LazySum environments
expectation_value effective_excitation_hamiltonian leftenv rightenv
find_groundstate leading_boundary VUMPS VOMPS DMRG DMRG2 IDMRG1 IDMRG2
GradientGrassmann excitations FiniteExcited QuasiparticleAnsatz
marek_gap correlation_length correlator time_evolve timestep TDVP TDVP2
make_time_mpo WI WII TaylorCluster infinite_temperature
entanglement_spectrum transfer_spectrum variance changebonds VUMPSSvdCut
OptimalExpand SvdCut RandExpand entropy propagator NaiveInvert
Jeckelmann DynamicalDMRG fidelity_susceptibility approximate
periodic_boundary_conditions exact_diagonalization TransferMatrix
transfer_left transfer_right
""".split()


def test_reference_exports_importable():
    import mpskit_tpu as m

    missing = [n for n in REFERENCE_EXPORTS if not hasattr(m, n)]
    assert not missing, missing
    # the eight fixed points live as InfiniteMPS methods
    from mpskit_tpu import InfiniteMPS

    for n in ("l_LL", "l_RR", "l_RL", "l_LR",
              "r_LL", "r_RR", "r_RL", "r_LR"):
        assert hasattr(InfiniteMPS, n), n


def test_periodic_array():
    from mpskit_tpu import PeriodicArray

    p = PeriodicArray([10, 11, 12])
    assert len(p) == 3
    assert p[0] == 10 and p[3] == 10 and p[-1] == 12 and p[7] == 11
    assert p[0:5] == [10, 11, 12, 10, 11]
    p[4] = 99
    assert p[1] == 99
    assert len(p.repeat(2)) == 6


def test_mixed_gauge_fixed_points():
    """All eight l_*/r_* are exact fixed points of their unit-cell
    transfer matrices (reference src/states/infinitemps.jl:300-358)."""
    from mpskit_tpu import InfiniteMPS, TransferMatrix

    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 3, 2, 6,
                             dtype=jnp.complex128)
    cases = {
        "l_LL": (psi.AL, psi.AL, False), "l_RR": (psi.AR, psi.AR, False),
        "l_RL": (psi.AR, psi.AL, False), "l_LR": (psi.AL, psi.AR, False),
        "r_LL": (psi.AL, psi.AL, True), "r_RR": (psi.AR, psi.AR, True),
        "r_RL": (psi.AR, psi.AL, True), "r_LR": (psi.AL, psi.AR, True),
    }
    for name, (ket, bra, flipped) in cases.items():
        T = TransferMatrix(ket, bra, flipped=flipped)
        v = getattr(psi, name)()
        np.testing.assert_allclose(np.asarray(T(v)), np.asarray(v),
                                   atol=1e-12, err_msg=name)


def test_transfermatrix_mpo_and_product():
    """TransferMatrix with an MPO middle reproduces the raw kernel, and
    the product form stacks sites."""
    from mpskit_tpu import TransferMatrix
    from mpskit_tpu.transfermatrix.transfer import transfer_left_mpo

    key = jax.random.PRNGKey(0)
    D, d, w = 5, 2, 3
    ks = jax.random.split(key, 4)
    A = jax.random.normal(ks[0], (D, d, D))
    B = jax.random.normal(ks[1], (D, d, D))
    W = jax.random.normal(ks[2], (w, w, d, d))
    GL = jax.random.normal(ks[3], (w, D, D))
    T = TransferMatrix(A, B, W=W)
    np.testing.assert_allclose(np.asarray(T(GL)),
                               np.asarray(transfer_left_mpo(GL, W, A, B)),
                               rtol=1e-12)
    T2 = T * T
    np.testing.assert_allclose(np.asarray(T2(GL)), np.asarray(T(T(GL))),
                               rtol=1e-10)


def test_environments_dispatch_and_accessors():
    from mpskit_tpu import (
        FiniteMPS, environments, leftenv, rightenv, expectation_value,
        add_util_leg, max_Ds, left_virtualspace, right_virtualspace,
        physicalspace,
    )
    from mpskit_tpu.models.hamiltonians import transverse_field_ising

    H = transverse_field_ising(g=1.2)
    L, d, D = 6, 2, 8
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D,
                           dtype=jnp.float64)
    envs = environments(psi, H)
    assert leftenv(envs, 2, psi).shape == rightenv(envs, 2, psi).shape
    E = float(expectation_value(psi, H, envs=envs))
    assert np.isfinite(E)
    # accessors: supported ranks of the padded bonds
    ds = max_Ds(psi)
    assert list(ds[:3]) == [1, 2, 4]
    assert left_virtualspace(psi, 0) == 1
    assert right_virtualspace(psi, L - 1) == 1
    assert physicalspace(psi, 0) == d
    W = add_util_leg(jnp.eye(2))
    assert W.shape == (1, 1, 2, 2)


def test_environments_dispatch_infinite():
    from mpskit_tpu import InfiniteMPS, environments
    from mpskit_tpu.models.hamiltonians import transverse_field_ising

    H = transverse_field_ising(g=1.5)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 8,
                             dtype=jnp.float64)
    envs = environments(psi, H)
    assert envs.GLs.shape[0] == 1


def test_effective_excitation_hamiltonian_matches_eigsolve():
    """H_eff applied through the compat wrapper is the same operator the
    QP eigensolve iterates: <qp, H_eff qp> equals the Ritz value at an
    eigenvector."""
    from mpskit_tpu import (
        InfiniteMPS, VUMPS, find_groundstate, QuasiparticleAnsatz,
        effective_excitation_hamiltonian,
    )
    from mpskit_tpu.algorithms.excitations import excitations_infinite
    from mpskit_tpu.models.hamiltonians import transverse_field_ising

    H = transverse_field_ising(g=1.5)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 12,
                             dtype=jnp.complex128)
    psi, envs, _ = find_groundstate(psi, H, VUMPS(tol=1e-10, maxiter=60,
                                                  verbosity=0))
    es, qps = excitations_infinite(
        H, QuasiparticleAnsatz(tol=1e-10), [0.3], psi, envs=envs)
    qp = qps[0][0]
    out = effective_excitation_hamiltonian(H, qp, envs=envs)
    num = float(np.real(jnp.vdot(qp.Xs, out.Xs)))
    den = float(np.real(jnp.vdot(qp.Xs, qp.Xs)))
    assert abs(num / den - float(es[0][0])) < 1e-6
