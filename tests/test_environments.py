"""Infinite Hamiltonian environment walkers.

The direction-batched paired walker (`calc_envs_paired`, the TPU-native
closure of the reference's two-thread left/right environment concurrency,
reference src/environments/mpohaminfenv.jl:65-68) must agree with the
sequential `calc_lw`/`calc_rw` walkers to solver precision.
"""

import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXZ
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.environments.infinite_ham import (
    calc_lw, calc_rw, calc_envs_paired, hamiltonian_environments,
)


@pytest.mark.parametrize(
    "model,L",
    [("tfim", 1), ("tfim", 2), ("xxz", 3)],
)
def test_paired_matches_sequential(model, L):
    if model == "tfim":
        H = transverse_field_ising(g=1.3)
    else:
        H = heisenberg_XXZ(delta=0.5)
    if L > 1 and H.period == 1:
        H = H.repeat(L)
    key = jax.random.PRNGKey(0)
    D, d = 16, H.physicaldim
    psi = InfiniteMPS.random(key, L=L, d=d, D=D, dtype=jnp.float64)

    GLs, eL, rL = calc_lw(psi, H, tol=1e-12)
    GRs, eR, rR = calc_rw(psi, H, tol=1e-12)
    GLp, GRp, eP, rP = calc_envs_paired(psi, H, tol=1e-12)

    assert float(jnp.max(jnp.abs(GLs - GLp))) < 1e-9
    assert float(jnp.max(jnp.abs(GRs - GRp))) < 1e-9
    assert float(jnp.abs(eL - eP)) < 1e-10
    assert float(rP) < 1e-9


def test_paired_warm_start_consistent():
    """Warm-starting from a previous env must not change the fixed point."""
    H = transverse_field_ising(g=0.8)
    psi = InfiniteMPS.random(jax.random.PRNGKey(3), L=1, d=2, D=12,
                             dtype=jnp.float64)
    cold = hamiltonian_environments(psi, H, tol=1e-12)
    warm = hamiltonian_environments(psi, H, tol=1e-12, env_init=cold)
    assert float(jnp.max(jnp.abs(cold.GLs - warm.GLs))) < 1e-9
    assert float(jnp.max(jnp.abs(cold.GRs - warm.GRs))) < 1e-9
    assert float(jnp.abs(cold.e_density - warm.e_density)) < 1e-11
