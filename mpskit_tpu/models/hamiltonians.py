"""Toy-model Hamiltonians, matching the conventions of the reference's test
fixtures (reference test/setup.jl:38-76) so the same physics oracles apply.
"""

from __future__ import annotations

import numpy as np

from ..operators.mpo import MPOHamiltonian
from .spins import pauli, spinmatrices


def _two_site(A, B):
    """A ⊗ B as a (d, d, d, d) array ordered [s1, s2, t1, t2]."""
    d = A.shape[0]
    return np.einsum("st,uv->sutv", A, B).reshape(d, d, d, d)


def transverse_field_ising(g: float = 1.0, period: int = 1,
                           dtype=np.complex128) -> MPOHamiltonian:
    """H = -sum_bonds [Z Z + g/2 (X 1 + 1 X)] (reference test/setup.jl:38-44).

    On an infinite/periodic chain this is -sum_i [Z_i Z_{i+1} + g X_i]."""
    X, _, Z, I = pauli(dtype)
    H2 = _two_site(Z, Z) + (g / 2) * (_two_site(X, I) + _two_site(I, X))
    return MPOHamiltonian.from_local(-H2, period=period, dtype=dtype)


def transverse_field_ising_lattice(g: float = 1.0, period: int = 1,
                                   dtype=np.complex128) -> MPOHamiltonian:
    """H = -sum_bonds Z Z - g sum_sites X (uniform field, the MPSKitModels
    convention used by the reference docs oracles,
    docs/src/man/algorithms.md:150-165). Identical to
    `transverse_field_ising` in the bulk, but with full field on the edge
    sites of finite chains."""
    X, _, Z, I = pauli(dtype)
    Hzz = MPOHamiltonian.from_local(-_two_site(Z, Z), period=period,
                                    dtype=dtype)
    Hx = MPOHamiltonian.from_local(-g * X, period=period, dtype=dtype)
    return Hzz + Hx


def heisenberg_XXX(spin: float = 1, period: int = 1,
                   dtype=np.complex128) -> MPOHamiltonian:
    """H = 4 * sum_bonds S_i . S_{i+1} (reference test/setup.jl:46-65: the
    SU(2) block values S(S+1)/2 - s(s+1) equal S_i.S_j, scaled by 4)."""
    Sx, Sy, Sz, _ = spinmatrices(spin)
    H2 = _two_site(Sx, Sx) + _two_site(Sy, Sy) + _two_site(Sz, Sz)
    # S.S is real in the Sz basis (the two imaginary factors cancel)
    return MPOHamiltonian.from_local(4 * H2, period=period, dtype=dtype)


def heisenberg_XXZ(spin: float = 1, delta: float = 1.0, period: int = 1,
                   dtype=np.complex128) -> MPOHamiltonian:
    Sx, Sy, Sz, _ = spinmatrices(spin, dtype)
    H2 = _two_site(Sx, Sx) + _two_site(Sy, Sy) + delta * _two_site(Sz, Sz)
    return MPOHamiltonian.from_local(4 * H2, period=period, dtype=dtype)


def bilinear_biquadratic_model(theta: float = np.arctan(1 / 3), period: int = 1,
                               dtype=np.complex128) -> MPOHamiltonian:
    """H = sum_bonds [cos(theta) (S.S) + sin(theta) (S.S)^2], spin 1
    (reference test/setup.jl:67-76)."""
    Sx, Sy, Sz, _ = spinmatrices(1)
    h1 = (np.kron(Sx, Sx) + np.kron(Sy, Sy) + np.kron(Sz, Sz))
    h2 = h1 @ h1
    H = np.cos(theta) * h1 + np.sin(theta) * h2
    return MPOHamiltonian.from_local(H.reshape(3, 3, 3, 3), period=period,
                                     dtype=dtype)
