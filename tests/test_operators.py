import numpy as np
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.operators import MPOHamiltonian
from mpskit_tpu.operators.mpo import DIAG_IDENTITY, DIAG_ZERO


def _ed_tfim(L, g):
    """Dense TFIM H = -sum_bonds [ZZ + g/2 (XI + IX)] built directly."""
    X = np.array([[0, 1], [1, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    I = np.eye(2)

    def kronN(ops):
        out = np.array([[1.0]])
        for o in ops:
            out = np.kron(out, o)
        return out

    H = np.zeros((2**L, 2**L), complex)
    for i in range(L - 1):
        ops = [I] * L
        ops[i], ops[i + 1] = Z, Z
        H -= kronN(ops)
        for j in (i, i + 1):
            ops = [I] * L
            ops[j] = X
            H -= (g / 2) * kronN(ops)
    return H


def test_tfim_mpo_matches_ed():
    L, g = 6, 1.3
    H = transverse_field_ising(g=g)
    M = H.to_matrix(L)
    np.testing.assert_allclose(M, _ed_tfim(L, g), atol=1e-12)


def test_fsm_structure():
    H = transverse_field_ising(g=0.7)
    w = H.odim
    assert H.diag_class[0] == DIAG_IDENTITY
    assert H.diag_class[w - 1] == DIAG_IDENTITY
    for a in range(1, w - 1):
        assert H.diag_class[a] == DIAG_ZERO
    # upper triangular
    nz = np.array(H.nonzero_mask)
    assert not np.any(np.tril(nz, -1))


def test_mpoham_algebra():
    L = 5
    H1 = transverse_field_ising(g=0.5)
    H2 = heisenberg_XXX(spin=0.5)
    M1, M2 = H1.to_matrix(L), H2.to_matrix(L)

    np.testing.assert_allclose((H1 + H2).to_matrix(L), M1 + M2, atol=1e-11)
    np.testing.assert_allclose((2.5 * H1).to_matrix(L), 2.5 * M1, atol=1e-11)
    np.testing.assert_allclose((H1 @ H1).to_matrix(L), M1 @ M1, atol=1e-10)
    # scalar shift adds c per site
    np.testing.assert_allclose((H1 + 0.7).to_matrix(L),
                               M1 + 0.7 * L * np.eye(2**L), atol=1e-11)


def test_heisenberg_mpo_dims():
    H = heisenberg_XXX(spin=1)
    assert H.physicaldim == 3
    assert H.odim == 5  # 2 + rank-3 interior (Sx, Sy, Sz channels)
