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


def test_sector_resolved_transfer_spectrum():
    """transfer_spectrum(psi, sector=q) restricts the transfer eigenvectors
    to charge flux q (reference toolbox.jl:43-56 `sector` kwarg) — checked
    against the dense unit-cell transfer matrix restricted to the same
    flux subspace."""
    from mpskit_tpu.symmetry.charges import SymmetricInfiniteMPS
    from mpskit_tpu.algorithms.toolbox import transfer_spectrum

    D = 12
    spsi = SymmetricInfiniteMPS.random(jax.random.PRNGKey(2), 2, [1, -1], D,
                                       dtype=jnp.float64)
    AL = np.asarray(spsi.state.AL)
    # dense unit-cell transfer matrix M[(m n), (x y)]
    T = np.eye(D * D)
    for i in range(2):
        Ti = np.einsum("xpm,ypn->mnxy", AL[i].conj(), AL[i]).reshape(
            D * D, D * D)
        T = Ti @ T
    labels = spsi.bond_charges[-1]
    for q in (0, 2, -2):
        flux = (labels[:, None] - labels[None, :]) == q
        idx = np.where(flux.reshape(-1))[0]
        sub = T[np.ix_(idx, idx)]
        dense = np.sort(np.abs(np.linalg.eigvals(sub)))[::-1]
        lams = np.asarray(transfer_spectrum(spsi, num=3, krylovdim=40,
                                            sector=q))
        np.testing.assert_allclose(np.abs(lams)[:2], dense[:2], atol=1e-8)
    # the untwisted channel carries the dominant (=1) eigenvalue
    lam0 = transfer_spectrum(spsi, num=1, sector=0)
    assert abs(abs(complex(lam0[0])) - 1.0) < 1e-10


def test_sector_resolved_entanglement_plot():
    """Sector-labeled entanglementplot data (reference
    utility/plotting.jl:15-126): per-charge Schmidt values union-match the
    plain spectrum, and the rendering smoke-tests headless."""
    import matplotlib
    matplotlib.use("Agg")
    from mpskit_tpu.symmetry.charges import SymmetricInfiniteMPS
    from mpskit_tpu.utils.plotting import (entanglement_plot_data_sectors,
                                           entanglement_plot_sectors)

    spsi = SymmetricInfiniteMPS.random(jax.random.PRNGKey(3), 2, [1, -1], 10,
                                       dtype=jnp.float64)
    data = entanglement_plot_data_sectors(spsi)
    assert len(data) >= 2                    # several charge sectors present
    allv = np.sort(np.concatenate([np.asarray(v) for v in data.values()]))
    C = np.asarray(spsi.state.C[-1])
    s_full = np.linalg.svd(C, compute_uv=False)
    s_full = np.sort(s_full[s_full > 1e-14])
    np.testing.assert_allclose(allv, s_full, atol=1e-10)
    ax = entanglement_plot_sectors(spsi)
    assert len(ax.lines) == len(data)
