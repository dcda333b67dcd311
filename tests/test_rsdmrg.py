"""Real-space (segment-parallel) DMRG oracles.

Block-Jacobi segment sweeps (mpskit_tpu/algorithms/rsdmrg.py) must reach
the same ground state as serial DMRG — the physics oracle is exact
diagonalization, matching the reference's test style
(/root/reference/test/algorithms.jl:14-93) — and the mesh-sharded round
must equal the unsharded one bit-for-bit up to collective reduction order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.models.hamiltonians import heisenberg_XXX
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.parallel.mesh import make_mesh
from mpskit_tpu.algorithms import (
    RealSpaceParallelDMRG, find_groundstate_rsdmrg, find_groundstate,
    expectation_value,
)


def test_rsdmrg_matches_ed_tfim():
    L, D, g = 12, 16, 1.4
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D,
                            dtype=jnp.float64)
    alg = RealSpaceParallelDMRG(nseg=4, tol=1e-10, maxiter=50, verbosity=0)
    psi, envs, eps = find_groundstate(psi0, H, alg)
    E = float(expectation_value(psi, H, envs=envs))
    E_ed = float(np.linalg.eigvalsh(H.to_matrix(L))[0])
    assert abs(E - E_ed) < 1e-8
    assert eps < 1e-9


def test_rsdmrg_sharded_equals_unsharded():
    L, D, g = 16, 12, 1.1
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D,
                            dtype=jnp.float64)
    alg = RealSpaceParallelDMRG(nseg=8, tol=1e-10, maxiter=40, verbosity=0)
    mesh = make_mesh(site=8, bond=1)
    psi_m, envs_m, _ = find_groundstate_rsdmrg(psi0, H, alg, mesh=mesh)
    psi_u, envs_u, _ = find_groundstate_rsdmrg(psi0, H, alg)
    E_m = float(expectation_value(psi_m, H, envs=envs_m))
    E_u = float(expectation_value(psi_u, H, envs=envs_u))
    assert abs(E_m - E_u) < 1e-11


def test_rsdmrg_heisenberg_matches_serial():
    # spin-1/2 Heisenberg: harder interfaces (gapless); segment-parallel
    # rounds must still agree with serial DMRG at the same tolerance
    from mpskit_tpu.algorithms import DMRG

    L, D = 12, 24
    H = heisenberg_XXX(spin=0.5, dtype=np.float64)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(2), L, 2, D,
                            dtype=jnp.float64)
    psi_s, envs_s, _ = find_groundstate(
        psi0, H, DMRG(tol=1e-10, maxiter=40, verbosity=0))
    E_s = float(expectation_value(psi_s, H, envs=envs_s))
    alg = RealSpaceParallelDMRG(nseg=3, tol=1e-10, maxiter=60, verbosity=0)
    psi_p, envs_p, _ = find_groundstate_rsdmrg(psi0, H, alg)
    E_p = float(expectation_value(psi_p, H, envs=envs_p))
    assert abs(E_p - E_s) < 1e-8


def test_rsdmrg_f32_rounds_stay_stable():
    # float32 regression: the stitch once diverged at rank-padded bonds
    # (TPU/XLA Householder QR mishandles underflowing or exactly-zero
    # columns in the dead Schmidt directions; fixed by the sanitize +
    # diagonal-floor treatment in _rs_round). Rounds must hold the energy
    # at the f32 floor instead of drifting.
    L, D, g = 12, 32, 1.5
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(3), L, 2, D,
                            dtype=jnp.float32)
    alg = RealSpaceParallelDMRG(nseg=4, tol=1e-12, maxiter=12, warmup=2,
                                verbosity=0)
    psi, envs, eps = find_groundstate_rsdmrg(psi0, H, alg)
    E = float(expectation_value(psi, H, envs=envs))
    E_ed = float(np.linalg.eigvalsh(H.to_matrix(L))[0])
    assert np.isfinite(E)
    assert abs(E - E_ed) < 5e-3 * abs(E_ed)


def test_rsdmrg2_matches_ed_tfim():
    # RS-DMRG2: two-site mini-sweeps inside every segment; same ED oracle
    # as the one-site variant, and it must converge from a WORSE seed
    # (warmup=1) since the in-segment re-splits repair the Schmidt bases
    L, D, g = 12, 16, 1.4
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(4), L, 2, D,
                            dtype=jnp.float64)
    alg = RealSpaceParallelDMRG(nseg=4, two_site=True, tol=1e-10,
                                maxiter=50, warmup=1, verbosity=0)
    psi, envs, eps = find_groundstate(psi0, H, alg)
    E = float(expectation_value(psi, H, envs=envs))
    E_ed = float(np.linalg.eigvalsh(H.to_matrix(L))[0])
    assert abs(E - E_ed) < 1e-8


def test_rsdmrg2_sharded_equals_unsharded():
    L, D, g = 12, 12, 1.1
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(5), L, 2, D,
                            dtype=jnp.float64)
    alg = RealSpaceParallelDMRG(nseg=4, two_site=True, tol=1e-10,
                                maxiter=30, verbosity=0)
    mesh = make_mesh(site=4, bond=1)
    psi_m, envs_m, _ = find_groundstate_rsdmrg(psi0, H, alg, mesh=mesh)
    psi_u, envs_u, _ = find_groundstate_rsdmrg(psi0, H, alg)
    E_m = float(expectation_value(psi_m, H, envs=envs_m))
    E_u = float(expectation_value(psi_u, H, envs=envs_u))
    assert abs(E_m - E_u) < 1e-11


def test_rsdmrg_validates_segmentation():
    H = transverse_field_ising(g=1.0, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), 10, 2, 8,
                           dtype=jnp.float64)
    with pytest.raises(ValueError):
        find_groundstate_rsdmrg(psi, H, RealSpaceParallelDMRG(nseg=3))
    with pytest.raises(ValueError):
        find_groundstate_rsdmrg(psi, H, RealSpaceParallelDMRG(nseg=1))
    with pytest.raises(ValueError):
        find_groundstate_rsdmrg(psi, H, RealSpaceParallelDMRG(nseg=10))
