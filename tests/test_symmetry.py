import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import heisenberg_XXX
from mpskit_tpu.models.spins import spinmatrices
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value
from mpskit_tpu.symmetry.charges import (
    SymmetricFiniteMPS, find_groundstate_symmetric,
    sector_entanglement_spectrum,
)


def _sz_total(psi):
    Sz = np.diag([0.5, -0.5])
    return sum(float(np.real(complex(expectation_value(psi, (i, Sz)))))
               for i in range(psi.length))


def _ed_sector_energy(H, L, sz2_total):
    """Lowest eigenvalue in the sector sum(2 Sz_i) = sz2_total."""
    M = H.to_matrix(L)
    # basis state k: bit i set -> charge +1 else -1 (matching kron order:
    # site 0 is the most significant factor)
    charges = np.zeros(2**L, int)
    for k in range(2**L):
        c = 0
        for i in range(L):
            bit = (k >> (L - 1 - i)) & 1
            c += 1 if bit == 0 else -1  # basis index 0 = spin up
        charges[k] = c
    idx = np.where(charges == sz2_total)[0]
    sub = M[np.ix_(idx, idx)]
    return float(np.linalg.eigvalsh(sub)[0])


def test_u1_groundstate_matches_dense():
    L, D = 8, 16
    H = heisenberg_XXX(spin=0.5)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(0), L, [1, -1], D,
                                     total=0)
    spsi, envs, eps = find_groundstate_symmetric(
        spsi, H, DMRG(tol=1e-9, maxiter=60))
    E_sym = float(expectation_value(spsi.state, H, envs=envs))
    E_ed = _ed_sector_energy(H, L, 0)
    assert abs(E_sym - E_ed) < 1e-7
    # exact charge conservation
    assert abs(_sz_total(spsi.state)) < 1e-9


def test_u1_charged_sector():
    # lowest state with Sz_tot = 1 (magnon sector)
    L, D = 8, 16
    H = heisenberg_XXX(spin=0.5)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(1), L, [1, -1], D,
                                     total=2)
    spsi, envs, eps = find_groundstate_symmetric(
        spsi, H, DMRG(tol=1e-9, maxiter=60))
    E_sym = float(expectation_value(spsi.state, H, envs=envs))
    E_ed = _ed_sector_energy(H, L, 2)
    assert abs(E_sym - E_ed) < 1e-7
    assert abs(_sz_total(spsi.state) - 1.0) < 1e-9


def test_sector_entanglement():
    L, D = 8, 16
    H = heisenberg_XXX(spin=0.5)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(2), L, [1, -1], D,
                                     total=0)
    spsi, envs, _ = find_groundstate_symmetric(
        spsi, H, DMRG(tol=1e-9, maxiter=50))
    spec = sector_entanglement_spectrum(spsi, L // 2)
    allvals = np.concatenate(list(spec.values()))
    total = float(np.sum(allvals**2))
    np.testing.assert_allclose(total, 1.0, atol=1e-8)
    # singlet ground state: the q=0 sector dominates the middle bond
    assert max(spec, key=lambda q: np.max(spec[q])) == 0


@pytest.mark.slow
def test_u1_infinite_vumps():
    # sector-constrained VUMPS on the infinite XXZ chain conserves Sz and
    # matches the dense ground energy density
    from mpskit_tpu.symmetry.charges import (
        SymmetricInfiniteMPS, find_groundstate_symmetric_infinite,
    )
    from mpskit_tpu.states.infinitemps import InfiniteMPS
    from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps

    H = heisenberg_XXX(spin=0.5)  # 4 * S.S ; e0 = 1 - 4 ln 2
    D = 16
    # odd physical charges alternate bond parity: 2-site unit cell
    spsi = SymmetricInfiniteMPS.random(jax.random.PRNGKey(0), 2, [1, -1], D)
    spsi, envs, eps = find_groundstate_symmetric_infinite(
        spsi, H, VUMPS(tol=1e-8, maxiter=200))
    e_sym = float(np.mean(np.asarray(
        expectation_value(spsi.state, H, envs=envs))))

    # exact Bethe-ansatz density for H = 4 sum S.S: e0 = 1 - 4 ln 2
    e_exact = 1 - 4 * np.log(2)
    assert abs(e_sym - e_exact) < 2e-3
    # block structure of C is exact (per-bond masks)
    Amask, Cmask = spsi.masks
    for i in range(2):
        off = np.asarray(spsi.state.C[i]) * (~Cmask[i])
        assert float(np.max(np.abs(off))) < 1e-12
    # cell-averaged magnetization vanishes (per-site values may show a
    # small staggered component at finite D)
    Sz = np.diag([0.5, -0.5])
    from mpskit_tpu.algorithms.expval_infinite import expval_infinite_local

    mz = np.mean([complex(expval_infinite_local(spsi.state, Sz, i)).real
                  for i in range(2)])
    assert abs(mz) < 1e-6


def test_u1_dmrg2_dynamic_sectors():
    """Sector-resolved two-site DMRG discovers the sector allocation
    dynamically (reference dmrg.jl:80-137 tsvd! over symmetric tensors)
    and matches the sector-restricted ED energy."""
    from mpskit_tpu.symmetry.charges import find_groundstate_symmetric_dmrg2
    from mpskit_tpu.algorithms.dmrg2 import DMRG2

    L, D = 10, 24
    H = heisenberg_XXX(spin=0.5)
    e_ref = _ed_sector_energy(H, L, 0)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(0), L, (1, -1), D,
                                     total=0, dtype=jnp.float64)
    spsi, envs, eps = find_groundstate_symmetric_dmrg2(
        spsi, H, DMRG2(tol=1e-11, maxiter=20, verbosity=0))
    E = float(np.real(np.asarray(expectation_value(spsi.state, H)).sum()))
    assert abs(E - e_ref) < 1e-8
    assert abs(_sz_total(spsi.state)) < 1e-9
    # dynamic allocation: the singlet state splits the mid bond evenly
    # between the +-1 sectors (odd bond of a spin-1/2 chain), with exactly
    # sector-block-diagonal Schmidt matrices
    lab = np.asarray(spsi.bond_charges[L // 2])
    alloc = {int(q): int((lab == q).sum())
             for q in sorted(set(lab.tolist())) if abs(q) < 10**5}
    assert alloc[1] == alloc[-1] and alloc[1] >= 6
    spec = sector_entanglement_spectrum(spsi, L // 2)
    w1 = float(np.sum(spec[1] ** 2))
    wm1 = float(np.sum(spec[-1] ** 2))
    np.testing.assert_allclose(w1, wm1, rtol=1e-6)


def test_u1_dmrg2_charged_sector():
    """Two-site sector DMRG in the Sz_tot = 1 magnon sector."""
    from mpskit_tpu.symmetry.charges import find_groundstate_symmetric_dmrg2
    from mpskit_tpu.algorithms.dmrg2 import DMRG2

    L, D = 8, 20
    H = heisenberg_XXX(spin=0.5)
    e_ref = _ed_sector_energy(H, L, 2)
    spsi = SymmetricFiniteMPS.random(jax.random.PRNGKey(1), L, (1, -1), D,
                                     total=2, dtype=jnp.float64)
    spsi, envs, eps = find_groundstate_symmetric_dmrg2(
        spsi, H, DMRG2(tol=1e-11, maxiter=20, verbosity=0))
    E = float(np.real(np.asarray(expectation_value(spsi.state, H)).sum()))
    assert abs(E - e_ref) < 1e-8
    assert abs(_sz_total(spsi.state) - 1.0) < 1e-9
