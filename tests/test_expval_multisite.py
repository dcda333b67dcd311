"""Multi-site local operator strings and ranged-window expectation values
(reference src/algorithms/expval.jl:42-61 and :127-152)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS, InfiniteMPS
from mpskit_tpu.algorithms import expectation_value
from mpskit_tpu.algorithms.dmrg import find_groundstate_dmrg, DMRG
from mpskit_tpu.algorithms.vumps import find_groundstate_vumps, VUMPS

Z = np.diag([1.0, -1.0])
X = np.array([[0.0, 1.0], [1.0, 0.0]])
G = 1.3


def _zz():
    return np.einsum("ac,bd->abcd", Z, Z)  # [s1 s2, t1 t2] tensor form


def test_multisite_string_finite():
    """TFIM energy decomposes into 2-site ZZ strings + 1-site X terms:
    cross-checks the string path against the MPO-Hamiltonian path."""
    L, D = 10, 16
    H = transverse_field_ising(g=G, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=jnp.float64)
    psi, _, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=40))

    # model convention: H = -sum_bonds [ZZ + g/2 (X 1 + 1 X)] (half field
    # on the edge sites of a finite chain)
    E_mpo = float(expectation_value(psi, H).real.sum())
    E_sum = 0.0
    for i in range(L - 1):
        E_sum += -float(np.real(expectation_value(psi, (i, _zz()))))
    xs = [float(np.real(expectation_value(psi, (i, X)))) for i in range(L)]
    E_sum += -G * sum(xs) + (G / 2) * (xs[0] + xs[-1])
    assert abs(E_mpo - E_sum) < 1e-9, (E_mpo, E_sum)

    # matrix form (d^2, d^2) must agree with tensor form
    zz_mat = np.kron(Z, Z)
    v_t = float(np.real(expectation_value(psi, (3, _zz()))))
    v_m = float(np.real(expectation_value(psi, (3, zz_mat))))
    assert abs(v_t - v_m) < 1e-12

    # 3-site string: Z 1 Z = product of two correlated measurements
    z1z = np.einsum("ad,be,cf->abcdef", Z, np.eye(2), Z)
    v3 = float(np.real(expectation_value(psi, (2, z1z))))
    assert abs(v3) <= 1.0 + 1e-9


@pytest.mark.slow
def test_multisite_string_infinite():
    D = 16
    H = transverse_field_ising(g=G, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D,
                             dtype=jnp.float64)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-10,
                                                        maxiter=200))
    e_density = float(envs.e_density)
    zz = float(np.real(expectation_value(psi, (0, _zz()))))
    x = float(np.real(expectation_value(psi, (0, X))))
    assert abs(e_density - (-zz - G * x)) < 1e-8, (e_density, -zz - G * x)


def test_ranged_window_infinite():
    """expectation_value(psi, H, range) = f + n*e_density: the n-derivative
    must equal the energy density (reference expval.jl:125-152)."""
    D = 16
    H = transverse_field_ising(g=G, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, D,
                             dtype=jnp.float64)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-10,
                                                        maxiter=200))
    e = float(envs.e_density)
    vals = [float(np.real(expectation_value(psi, H, range(0, n),
                                            envs=envs)))
            for n in (2, 4, 6)]
    assert abs((vals[1] - vals[0]) - 2 * e) < 1e-8
    assert abs((vals[2] - vals[1]) - 2 * e) < 1e-8
