"""Fermionic lattice models — the masked-dense counterpart of the
reference's graded (super) vector spaces (TensorKit `Vect[fℤ₂]`, used by
MPSKitModels' fermionic Hamiltonians).

Design: the reference tracks fermion parity in the space types and lets
`@plansor` insert braiding signs; in the TPU-first dense design the
Jordan-Wigner transformation is applied once, AT OPERATOR CONSTRUCTION
(all models below are finite-range after JW, so no operator strings
survive), and fermion-parity / particle-number structure is carried by the
abelian sector machinery (symmetry/charges.py: `phys_charges` = occupation
numbers gives U(1) particle-number masks; mod-2 charges give parity).
Contractions stay sign-free dense MXU matmuls — the graded braiding data
lives entirely inside the MPO tensors.

Conventions: site basis |0>, |1> (occupation) for spinless fermions;
|0>, |up>, |down>, |updown> for spinful. JW: c_i = (prod_{j<i} Z_j) s^-_i
with Z = diag(1, -1) in the occupation basis, s^- |1> = |0>.
"""

from __future__ import annotations

import numpy as np

from ..operators.mpo import MPOHamiltonian
from .hamiltonians import _two_site


def _spinless_ops(dtype=np.float64):
    """Single-site operators in the occupation basis (n = c^dag c)."""
    c = np.zeros((2, 2), dtype)
    c[0, 1] = 1.0                      # annihilate: |1> -> |0>
    cdag = c.T.copy()
    n = cdag @ c
    Z = np.eye(2, dtype=dtype) - 2 * n  # JW string factor (-1)^n
    return c, cdag, n, Z


def kitaev_chain(t: float = 1.0, mu: float = 0.0, delta: float = 0.0,
                 period: int = 1, dtype=np.float64) -> MPOHamiltonian:
    """Spinless fermions with p-wave pairing (the Kitaev chain):

        H = sum_i [ -t (c_i^dag c_{i+1} + h.c.)
                    + delta (c_i c_{i+1} + h.c.) - mu n_i ].

    After JW every term is nearest-neighbor (the strings cancel between
    adjacent sites), so the dense MPO needs no string bookkeeping. The
    finite-chain convention is the plain lattice sum (chemical potential on
    every site). Validated against exact Bogoliubov-de-Gennes
    single-particle diagonalization (tests/test_fermions.py)."""
    c, cdag, n, Z = _spinless_ops(dtype)
    # JW: c_i^dag c_{i+1} -> cdag_i Z_i? — with c_i = Z_{<i} s^-_i:
    # c_i^dag c_{i+1} = s^+_i Z_i s^-_{i+1}; and Z s^- = s^-, s^+ Z = -s^+
    # gives the standard sign-free quadratic form below.
    hop = _two_site(cdag @ Z, c) + _two_site(Z @ c, cdag)  # c^dag_i c_j + h.c.
    pair = _two_site(cdag @ Z, cdag) + _two_site(Z @ c, c)
    H2 = -t * hop + delta * pair
    Hbond = MPOHamiltonian.from_local(H2, period=period, dtype=dtype)
    Hmu = MPOHamiltonian.from_local(-mu * n, period=period, dtype=dtype)
    return Hbond + Hmu


def free_fermions(t: float = 1.0, mu: float = 0.0, period: int = 1,
                  dtype=np.float64) -> MPOHamiltonian:
    """Tight-binding chain H = -t sum (c^dag c + h.c.) - mu sum n."""
    return kitaev_chain(t=t, mu=mu, delta=0.0, period=period, dtype=dtype)


def kitaev_bdg_energy(L: int, t: float, mu: float, delta: float) -> float:
    """Exact open-chain ground energy via Bogoliubov-de-Gennes
    diagonalization — the free-fermion oracle for kitaev_chain."""
    A = np.zeros((L, L))
    B = np.zeros((L, L))
    for i in range(L):
        A[i, i] = -mu
    for i in range(L - 1):
        A[i, i + 1] = A[i + 1, i] = -t
        B[i, i + 1] = delta
        B[i + 1, i] = -delta
    M = np.block([[A, B], [-B, -A]])
    ev = np.linalg.eigvalsh(M)
    # H = (1/2) sum_k E_k (2 gamma^dag gamma - 1) + (1/2) tr A
    return -0.5 * np.sum(ev[ev > 0]) + 0.5 * np.trace(A)


def _spinful_ops(dtype=np.float64):
    """Operators on the 4-dim site (ordering |0>, |up>, |dn>, |updn>),
    with the INTERNAL JW ordering up-before-down: c_up = s^-_up,
    c_dn = Z_up s^-_dn on the fused basis."""
    c1, c1d, n1, Z1 = _spinless_ops(dtype)
    I2 = np.eye(2, dtype=dtype)
    c_up = np.kron(c1, I2)
    c_dn = np.kron(Z1, c1)
    n_up = np.kron(n1, I2)
    n_dn = np.kron(I2, n1)
    P = np.kron(Z1, Z1)  # site parity (-1)^(n_up + n_dn)
    return c_up, c_dn, n_up, n_dn, P


def hubbard(t: float = 1.0, U: float = 0.0, mu: float = 0.0,
            period: int = 1, dtype=np.float64) -> MPOHamiltonian:
    """Spinful Hubbard chain

        H = -t sum_{i,s} (c_{i,s}^dag c_{i+1,s} + h.c.)
            + U sum_i n_up n_dn - mu sum_i (n_up + n_dn).

    JW over the global ordering (1up, 1dn, 2up, 2dn, ...): the spin-up hop
    crosses the i-dn mode, contributing the site-parity factors absorbed
    below. Validated against the exact two-site Hubbard dimer spectrum and
    U=0 tight-binding (tests/test_fermions.py)."""
    c_up, c_dn, n_up, n_dn, P = _spinful_ops(dtype)
    # JW on the fused chain: c_{i,s}^dag c_{i+1,s} = (c_s^dag P)_i (c_s)_{i+1}
    # (the string across site i covers both of its modes)
    hop = (_two_site(c_up.T @ P, c_up) + _two_site(P @ c_up, c_up.T) +
           _two_site(c_dn.T @ P, c_dn) + _two_site(P @ c_dn, c_dn.T))
    Hbond = MPOHamiltonian.from_local(-t * hop, period=period, dtype=dtype)
    Hloc = MPOHamiltonian.from_local(
        U * (n_up @ n_dn) - mu * (n_up + n_dn), period=period, dtype=dtype)
    return Hbond + Hloc
