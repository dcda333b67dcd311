"""New model families (models/hamiltonians.py round-2 additions) against
independent dense oracles: explicit kron-sum Hamiltonians, Jordan-Wigner
spectrum mappings, and model-coincidence identities."""

import numpy as np

from mpskit_tpu.models import (
    transverse_field_ising_lattice,
    heisenberg_XYZ,
    heisenberg_XXX,
    xy_model,
    quantum_potts,
    quantum_clock,
    bose_hubbard,
)
from mpskit_tpu.models.fermions import kitaev_chain
from mpskit_tpu.models.spins import pauli, spinmatrices


def _dense_chain(H2, H1, L, d):
    """sum_i H2_{i,i+1} + sum_i H1_i on an open chain, explicit krons."""
    dim = d ** L
    M = np.zeros((dim, dim), complex)
    for i in range(L - 1):
        M += np.kron(np.kron(np.eye(d ** i), H2),
                     np.eye(d ** (L - i - 2)))
    if H1 is not None:
        for i in range(L):
            M += np.kron(np.kron(np.eye(d ** i), H1),
                         np.eye(d ** (L - i - 1)))
    return M


def test_heisenberg_xyz_dense_oracle():
    Jx, Jy, Jz, L = 0.7, -0.3, 1.1, 5
    H = heisenberg_XYZ(Jx=Jx, Jy=Jy, Jz=Jz, spin=0.5)
    Sx, Sy, Sz, _ = spinmatrices(0.5)
    H2 = (Jx * np.kron(Sx, Sx) + Jy * np.kron(Sy, Sy)
          + Jz * np.kron(Sz, Sz))
    M_ref = _dense_chain(H2, None, L, 2)
    assert np.allclose(H.to_matrix(L), M_ref, atol=1e-12)


def test_heisenberg_xyz_isotropic_matches_xxx():
    """Jx=Jy=Jz=4 reproduces heisenberg_XXX (which carries the reference's
    factor-4 normalization, test/setup.jl:46-65)."""
    L = 4
    A = heisenberg_XYZ(Jx=4, Jy=4, Jz=4, spin=1).to_matrix(L)
    B = heisenberg_XXX(spin=1).to_matrix(L)
    assert np.allclose(A, B, atol=1e-12)


def test_xy_model_gamma1_is_tfim():
    L = 5
    A = xy_model(gamma=1.0, g=0.8).to_matrix(L)
    B = transverse_field_ising_lattice(g=0.8).to_matrix(L)
    # gamma=1: -(XX) - g Z vs TFIM -(ZZ) - g X — related by the global
    # Hadamard rotation X<->Z, so the spectra must coincide exactly.
    ea = np.linalg.eigvalsh(np.real(A))
    eb = np.linalg.eigvalsh(np.real(B))
    assert np.allclose(ea, eb, atol=1e-10)


def test_xy_model_jordan_wigner_spectrum():
    """xy_model(gamma, g) = JW image of kitaev_chain(t=1, delta=-gamma,
    mu=-2g) minus the constant g*L: full spectra must match."""
    L, gamma, g = 5, 0.6, 0.9
    Hs = np.real(xy_model(gamma=gamma, g=g).to_matrix(L))
    Hf = np.real(kitaev_chain(t=1.0, mu=-2 * g, delta=-gamma).to_matrix(L))
    es = np.sort(np.linalg.eigvalsh(Hs))
    ef = np.sort(np.linalg.eigvalsh(Hf)) - g * L
    assert np.allclose(es, ef, atol=1e-9)


def test_potts_q2_is_tfim():
    L = 5
    A = np.real(quantum_potts(q=2, g=1.3).to_matrix(L))
    B = np.real(transverse_field_ising_lattice(g=1.3).to_matrix(L))
    assert np.allclose(A, B, atol=1e-12)


def test_potts_q3_dense_oracle():
    L, q, g = 4, 3, 0.7
    w = np.exp(2j * np.pi / q)
    Z = np.diag(w ** np.arange(q))
    X = np.roll(np.eye(q), 1, axis=0)
    H2 = np.zeros((q * q, q * q), complex)
    H1 = np.zeros((q, q), complex)
    for k in range(1, q):
        Zk = np.linalg.matrix_power(Z, k)
        H2 -= np.kron(Zk, Zk.conj().T)
        H1 -= g * np.linalg.matrix_power(X, k)
    M_ref = _dense_chain(H2, H1, L, q)
    assert np.allclose(np.linalg.norm(M_ref.imag), 0, atol=1e-12)
    assert np.allclose(quantum_potts(q=q, g=g).to_matrix(L),
                       np.real(M_ref), atol=1e-12)


def test_clock_q3_equals_potts_q3():
    """For q=3, Z^2 = Z^dag and X^2 = X^dag, so clock == Potts exactly."""
    L = 4
    A = quantum_clock(q=3, g=0.9).to_matrix(L)
    B = quantum_potts(q=3, g=0.9).to_matrix(L)
    assert np.allclose(A, B, atol=1e-12)


def test_clock_q5_hermitian_and_symmetric():
    """q=5 clock: Hermitian, and commutes with the global Z_5 shift
    prod_i X_i (the clock symmetry)."""
    L, q = 3, 5
    M = quantum_clock(q=q, g=1.1).to_matrix(L)
    assert np.allclose(M, M.conj().T, atol=1e-12)
    X = np.roll(np.eye(q), 1, axis=0)
    S = np.kron(np.kron(X, X), X)
    assert np.allclose(M @ S, S @ M, atol=1e-12)


def test_bose_hubbard_dense_oracle():
    L, n_max, t, U, mu = 3, 2, 0.8, 1.7, 0.4
    d = n_max + 1
    n = np.arange(d, dtype=float)
    b = np.zeros((d, d))
    b[np.arange(d - 1), np.arange(1, d)] = np.sqrt(n[1:])
    bd = b.T
    N = np.diag(n)
    H2 = -t * (np.kron(bd, b) + np.kron(b, bd))
    H1 = U / 2 * N @ (N - np.eye(d)) - mu * N
    M_ref = _dense_chain(H2, H1, L, d)
    H = bose_hubbard(t=t, U=U, mu=mu, n_max=n_max)
    assert np.allclose(H.to_matrix(L), np.real(M_ref), atol=1e-12)


def test_bose_hubbard_atomic_limit():
    """t=0: ground energy is L * min_n [U/2 n(n-1) - mu n]."""
    L, n_max, U, mu = 3, 3, 1.0, 1.6
    H = bose_hubbard(t=0.0, U=U, mu=mu, n_max=n_max)
    e0 = np.linalg.eigvalsh(np.real(H.to_matrix(L)))[0]
    n = np.arange(n_max + 1)
    e_site = np.min(U / 2 * n * (n - 1) - mu * n)
    assert np.allclose(e0, L * e_site, atol=1e-10)
