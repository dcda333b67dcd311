import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.models.spins import pauli
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.toolbox import (
    variance, correlation_length, transfer_spectrum, exact_diagonalization,
    periodic_boundary_conditions, calc_galerkin,
)
from mpskit_tpu.algorithms.correlators import correlator
from mpskit_tpu.algorithms.find_groundstate import find_groundstate
from mpskit_tpu.algorithms.grassmann import (
    GradientGrassmann, find_groundstate_grassmann,
)


def test_variance_finite():
    L, g, D = 8, 1.5, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    v = float(variance(psi, H))
    assert abs(v) < 1e-7


def test_variance_qp_and_lazysum():
    """FiniteQP variance embeds into a FiniteMPS (reference
    toolbox.jl:154-156); LazySum/Timed operators materialize (reference
    toolbox.jl:175-180). At L=8, D=16 the MPS manifold is full-rank, so
    the QP excited state is an exact eigenstate: variance ~ 0."""
    from mpskit_tpu.algorithms import QuasiparticleAnsatz, excitations
    from mpskit_tpu.operators.lazysum import LazySum, UntimedOperator

    L, g, D = 8, 1.3, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, envs, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    es, qps = excitations(H, QuasiparticleAnsatz(tol=1e-8), psi, envs=envs)
    assert abs(float(variance(qps[0], H))) < 1e-9

    HL = LazySum([H, UntimedOperator(H, 0.5)])
    v_lazy = float(variance(psi, HL))
    v_direct = float(variance(psi, 1.5 * H))
    assert abs(v_lazy - v_direct) < 1e-8


def test_variance_window():
    """WindowMPS variance (reference toolbox.jl:147-153): the two-site
    tangent variance over the window with infinite-side boundary
    environments. A stationary window carved from a converged infinite
    ground state has variance ~ 0; perturbing the window raises it."""
    from mpskit_tpu.states import WindowMPS
    import dataclasses

    g, D, L = 1.4, 12, 8
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H,
                                          VUMPS(tol=1e-9, maxiter=150))
    win = WindowMPS.from_infinite(psi, L=L)
    v0 = float(variance(win, H))
    assert v0 < 1e-8

    AC = win.window.AC + 0.05 * jax.random.normal(
        jax.random.PRNGKey(2), win.window.AC.shape, win.window.dtype)
    AC = AC / jnp.linalg.norm(AC)
    win2 = dataclasses.replace(win, window=dataclasses.replace(
        win.window, AC=AC))
    assert float(variance(win2, H)) > 1e-4


def test_variance_infinite():
    g, D = 1.5, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=150))
    v = float(variance(psi, H, envs))
    assert v < 1e-6


def test_correlator_and_correlation_length():
    g, D = 1.2, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=200))
    X, _, Z, _ = pauli()
    js = list(range(2, 12))
    cc = np.asarray(correlator(psi, Z, Z, 1, js))
    m2 = abs(complex(correlator(psi, Z, Z, 1, 200)))
    conn = np.abs(cc) - m2
    # connected correlations decay with the correlation length
    xi = float(correlation_length(psi))
    assert xi > 0
    ratio = conn[6] / conn[2]
    xi_est = 4 / -np.log(ratio)
    assert abs(xi_est - xi) / xi < 0.35

    lams = np.asarray(transfer_spectrum(psi, num=3))
    np.testing.assert_allclose(abs(lams[0]), 1.0, atol=1e-8)


def test_exact_diagonalization():
    L, g = 8, 1.3
    H = transverse_field_ising(g=g)
    es, states = exact_diagonalization(H, L, num=2)
    w = np.linalg.eigvalsh(H.to_matrix(L))
    np.testing.assert_allclose(np.asarray(es), w[:2], atol=1e-8)


def test_pbc_vs_ed():
    L, g = 6, 1.1
    H = transverse_field_ising(g=g)
    Hp = periodic_boundary_conditions(H, L)
    # dense ring Hamiltonian
    X = np.array([[0, 1], [1, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    I = np.eye(2)

    def kronN(ops):
        out = np.array([[1.0]])
        for o in ops:
            out = np.kron(out, o)
        return out

    Hd = np.zeros((2**L, 2**L), complex)
    for i in range(L):
        j = (i + 1) % L
        ops = [I] * L
        ops[i], ops[j] = Z, Z
        Hd -= kronN(ops)
        for s in (i, j):
            ops = [I] * L
            ops[s] = X
            Hd -= (g / 2) * kronN(ops)
    M = Hp.to_matrix(L)
    np.testing.assert_allclose(M, Hd, atol=1e-12)


@pytest.mark.slow
def test_find_groundstate_dispatch_and_grassmann():
    g, D = 2.0, 8
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, D)
    psi, envs, eps = find_groundstate(psi, H, tol=1e-8, maxiter=100)
    from scipy.integrate import quad

    exact = -quad(lambda k: np.sqrt(1 + g**2 - 2 * g * np.cos(k)),
                  0, np.pi)[0] / np.pi
    e = float(expectation_value(psi, H, envs=envs)[0])
    assert abs(e - exact) < 1e-6

    # pure gradient descent also reaches the ground state
    psi2 = InfiniteMPS.random(jax.random.PRNGKey(4), 1, 2, D)
    psi2, envs2, gn = find_groundstate_grassmann(
        psi2, H, GradientGrassmann(tol=1e-6, maxiter=400))
    e2 = float(expectation_value(psi2, H, envs=envs2)[0])
    assert abs(e2 - exact) < 1e-4


def _ring_matrix_from_local(h_local, n, d, L):
    """ED oracle: sum of an n-site local term over all ring windows."""
    Hd = np.zeros((d ** L, d ** L), complex)
    hmat = np.asarray(h_local).reshape(d ** n, d ** n)
    for s in range(L):
        sites = [(s + k) % L for k in range(n)]
        rest = [x for x in range(L) if x not in sites]
        order = sites + rest
        P = np.zeros((d ** L, d ** L))
        for idx in range(d ** L):
            digits = [(idx // d ** (L - 1 - j)) % d for j in range(L)]
            new_digits = [digits[order[j]] for j in range(L)]
            nidx = sum(nd * d ** (L - 1 - j)
                       for j, nd in enumerate(new_digits))
            P[nidx, idx] = 1.0
        op = np.kron(hmat, np.eye(d ** (L - n)))
        Hd += P.T @ op @ P
    return Hd


def test_pbc_three_site_term():
    """General PBC (reference toolbox.jl:186-306): a 3-site ZXZ cluster
    term wrapped on a ring matches ring ED exactly."""
    from mpskit_tpu.models.hamiltonians import pauli
    from mpskit_tpu.operators.mpo import MPOHamiltonian

    X, _, Z, I = pauli(np.complex128)
    h3 = -np.einsum("ad,be,cf->abcdef", Z, X, Z)
    H3 = MPOHamiltonian.from_local(h3)
    L = 6
    Hring = periodic_boundary_conditions(H3, L)
    M = Hring.to_matrix(L)
    M_ed = _ring_matrix_from_local(h3, 3, 2, L)
    assert np.abs(M - M_ed).max() < 1e-12


def test_pbc_multisite_cell():
    """PBC with a 2-site unit cell (spin-1/2 Heisenberg) matches ring ED."""
    from mpskit_tpu.models import heisenberg_XXX
    from mpskit_tpu.models.hamiltonians import spinmatrices

    Hh = heisenberg_XXX(spin=0.5, period=2)
    L = 6
    Hring = periodic_boundary_conditions(Hh, L)
    M = Hring.to_matrix(L)
    Sx, Sy, Sz, _ = spinmatrices(0.5)
    hh = 4 * sum(np.einsum("ad,be->abde", S, S) for S in (Sx, Sy, Sz))
    M_ed = _ring_matrix_from_local(hh, 2, 2, L)
    assert np.abs(M - M_ed).max() < 1e-12


def test_pbc_densempo_ring_trace():
    """DenseMPO PBC (reference toolbox.jl:309-341): the wrapped open-chain
    MPO equals the ring trace of the transfer tensors."""
    from mpskit_tpu.models.statmech import classical_ising
    from mpskit_tpu.algorithms.toolbox import (
        periodic_boundary_conditions_densempo,
    )

    O = classical_ising(beta=0.6)
    L = 6
    Or = periodic_boundary_conditions_densempo(O, L)
    W = np.asarray(O.site(0))
    w, _, d, _ = W.shape
    acc = W.transpose(0, 2, 3, 1)
    for i in range(1, L):
        acc = np.einsum("aSTb,bstc->aSsTtc", acc,
                        W.transpose(0, 2, 3, 1)).reshape(
            w, acc.shape[1] * d, acc.shape[2] * d, w)
    M_ring = np.einsum("aSTa->ST", acc)
    E = np.ones((1, 1, 1))
    for i in range(L):
        Oi = np.asarray(Or.site(i))
        E = np.einsum("aST,abst->bSsTt", E, Oi).reshape(
            Oi.shape[1], E.shape[1] * d, E.shape[2] * d)
    assert np.abs(E[0] - M_ring).max() < 1e-10 * max(np.abs(M_ring).max(), 1)


def test_remove_orphans_roundtrip():
    """remove_orphans (reference sparsempo.jl:310-349): injecting a dead
    FSM level leaves the physics unchanged and is removed again."""
    from mpskit_tpu.operators.mpo import MPOHamiltonian

    H = transverse_field_ising(g=1.1, dtype=np.float64)
    w, d = H.odim, H.physicaldim
    W = np.asarray(H.W)
    # insert a dead level between the mids and the end
    Wb = np.zeros((W.shape[0], w + 1, w + 1, d, d), W.dtype)
    keep = list(range(w - 1)) + [w]
    Wb[np.ix_(range(W.shape[0]), keep, keep)] = W
    Hb = MPOHamiltonian.from_dense_W(Wb)
    Hc = Hb.remove_orphans()
    assert Hc.odim == w
    assert np.abs(Hc.to_matrix(6) - H.to_matrix(6)).max() < 1e-13


def test_add_physical_charge_bookkeeping():
    """add_physical_charge (reference sparsempo.jl:353-379): aux charges
    shift the conservation rule; masks built with a uniform aux shift are
    equivalent to shifting the bond charge labels."""
    from mpskit_tpu.symmetry.charges import (
        assign_bond_charges, charge_masks_finite,
    )

    L, D = 6, 8
    phys = (1, -1)
    H = transverse_field_ising(g=1.0, dtype=np.float64)
    H2 = H.add_physical_charge([1])
    assert H2.aux_charges == (1,)
    bonds_plain = assign_bond_charges(L, phys, D, total=0)
    bonds_aux = assign_bond_charges(L, phys, D, total=L,
                                    aux_charges=H2.aux_charges)
    m_aux = charge_masks_finite(bonds_aux, phys,
                                aux_charges=H2.aux_charges)
    # relabeling equivalence: bond i's labels differ by exactly +i
    for i in range(L + 1):
        valid = bonds_plain[i] < 10 ** 6
        np.testing.assert_array_equal(
            np.sort(bonds_aux[i][valid] - i),
            np.sort(bonds_plain[i][valid]))
    m_plain = charge_masks_finite(bonds_plain, phys)
    # identical sparsity structure after sorting labels within bonds
    assert m_aux.sum() == m_plain.sum()
