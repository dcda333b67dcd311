"""Charged-sector quasiparticle excitations (reference
src/states/quasiparticle_state.jl:30-56 `sector` kwarg;
docs/src/man/algorithms.md:196-211 Z2-charged TFIM demo — the
"TFIM charged excitation (Z2 sector 1) = 2(g-1)" row of BASELINE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models.hamiltonians import (
    transverse_field_ising_parity, xx_chain_with_field,
)
from mpskit_tpu.symmetry.charges import (
    SymmetricFiniteMPS, find_groundstate_symmetric,
)
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations, excitations_finite,
)
from mpskit_tpu.algorithms.dmrg import DMRG


def test_tfim_z2_charged_gap():
    """The BASELINE.md row: finite TFIM at g=10, the Z2 sector-1 QP gap is
    the single-spin-flip band minimum 2 sqrt(1 + g^2 - 2 g cos k1)
    (~ 2(g-1)), while the sector-0 gap is a two-flip state (~ twice
    that)."""
    L, D, g = 16, 32, 10.0
    H = transverse_field_ising_parity(g=g, dtype=np.float64)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(0), L, (0, 1), D,
                                     total=0, dtype=jnp.float64, modulus=2)
    spsi, envs, eps = find_groundstate_symmetric(
        spsi, H, DMRG(tol=1e-10, maxiter=30))
    # paramagnetic ground state: E0 ~ -L g with a small XX correction
    # charged (parity-odd) excitation via the dispatcher
    es1, qps1 = excitations(H, QuasiparticleAnsatz(tol=1e-8), spsi,
                            sector=1, num=1)
    gap1 = float(jnp.real(es1[0]))
    k1 = np.pi / (L + 1)
    exact = 2 * np.sqrt(1 + g * g - 2 * g * np.cos(k1))
    assert abs(gap1 - 2 * (g - 1)) / (2 * (g - 1)) < 1e-2  # the docs oracle
    assert abs(gap1 - exact) / exact < 2e-3                # the OBC band edge

    # neutral (parity-even) sector: lowest excitation is a two-flip state
    es0, _ = excitations_finite(H, QuasiparticleAnsatz(tol=1e-8), spsi,
                                sector=0, num=1)
    gap0 = float(jnp.real(es0[0]))
    assert gap0 > 1.8 * gap1


def test_charged_qp_conserves_flux():
    """The optimized charged B tensors stay exactly on the flux mask."""
    L, D, g = 12, 16, 4.0
    H = transverse_field_ising_parity(g=g, dtype=np.float64)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(1), L, (0, 1), D,
                                     total=0, dtype=jnp.float64, modulus=2)
    spsi, _, _ = find_groundstate_symmetric(spsi, H, DMRG(tol=1e-9,
                                                          maxiter=25))
    es, qps = excitations_finite(H, QuasiparticleAnsatz(tol=1e-7), spsi,
                                 sector=1, num=1)
    B = np.asarray(qps[0].bs())
    off = B * ~spsi.flux_masks(1)
    assert np.abs(off).max() < 1e-10 * np.abs(B).max()


def test_xx_u1_charged_single_particle():
    """U(1) example: hopping chain with a strong field — the vacuum is the
    exact N=0 ground state and the sector-(+1) QP energies are the exact
    OBC single-particle modes h - 2 cos(k_n), k_n = n pi / (L+1)."""
    L, D, h = 10, 8, 4.0
    H = xx_chain_with_field(h=h, dtype=np.float64)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(2), L, (0, 1), D,
                                     total=0, dtype=jnp.float64)
    spsi, _, _ = find_groundstate_symmetric(spsi, H, DMRG(tol=1e-11,
                                                          maxiter=20))
    es, _ = excitations_finite(H, QuasiparticleAnsatz(tol=1e-10), spsi,
                               sector=1, num=3)
    got = np.sort(np.real(np.asarray(es)))
    ks = np.pi * np.arange(1, L + 1) / (L + 1)
    exact = np.sort(h - 2 * np.cos(ks))[:3]
    np.testing.assert_allclose(got, exact, atol=1e-7)


def test_sector_requires_symmetric_state():
    from mpskit_tpu.states import FiniteMPS

    H = transverse_field_ising_parity(g=2.0, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(3), 8, 2, 8,
                           dtype=jnp.float64)
    with pytest.raises(TypeError):
        excitations_finite(H, QuasiparticleAnsatz(), psi, sector=1)
