import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value
from mpskit_tpu.algorithms.propagator import (
    DynamicalDMRG, NaiveInvert, Jeckelmann, propagator,
)


def test_propagator_groundstate_pole():
    # on the ground state: G(z) = 1/(z - E0)
    # (reference test/algorithms.jl:342-366 oracle 1/(v + eta - E0))
    L, g, D = 8, 1.4, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    E0 = float(expectation_value(psi, H, envs=envs))
    z = E0 + 0.5 + 0.3j
    G, _ = propagator(psi, z, H, DynamicalDMRG(tol=1e-10, maxiter=50))
    expected = 1.0 / (0.5 + 0.3j)
    assert abs(complex(G) - expected) < 1e-6


def test_propagator_vs_dense():
    L, g, D = 6, 1.1, 8
    H = transverse_field_ising(g=g)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D)
    z = 0.7 + 0.4j

    # dense oracle
    Hd = H.to_matrix(L)
    # build the dense state vector from the MPS
    p = psi0.move_center(0)
    vec = None
    tensors = [p.AC] + [p.ARs[i] for i in range(1, L)]
    v = jnp.zeros((p.D,), p.dtype).at[0].set(1.0)[None]  # (1, D)
    acc = v
    for i, A in enumerate(tensors):
        acc = jnp.einsum("xl,lpr->xpr", acc, A).reshape(-1, p.D)
    vec = np.asarray(acc[:, 0])
    G_exact = np.vdot(vec, np.linalg.solve(z * np.eye(2**L) - Hd, vec))

    G, _ = propagator(psi0, z, H, DynamicalDMRG(tol=1e-9, maxiter=60))
    assert abs(complex(G) - G_exact) < 1e-5

    Gj, _ = propagator(psi0, z, H,
                       DynamicalDMRG(flavour=Jeckelmann(), tol=1e-9,
                                     maxiter=60, linsolve_tol=1e-11))
    assert abs(complex(Gj) - G_exact) < 1e-4
