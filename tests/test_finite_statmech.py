import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models.statmech import finite_classical_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import expectation_value
from mpskit_tpu.algorithms.approximate import approximate, FitDMRG
from mpskit_tpu.operators.apply import apply_densempo_finite

pytestmark = pytest.mark.slow


def _row_to_matrix(O, N):
    """Dense matrix of the finite row-transfer MPO (2^N x 2^N)."""
    Os = [np.asarray(O.site(i)) for i in range(N)]
    E = np.ones((1, 1, 1))
    for i in range(N):
        w_l, w_r, d, _ = Os[i].shape
        dim = E.shape[1]
        E = np.einsum("aST,abst->bSsTt", E, Os[i]).reshape(
            w_r, dim * d, dim * d)
    return E[0]


def test_finite_classical_ising_row():
    # the row-MPO contracted into a dense matrix must be symmetric positive
    # with the 2D Ising Boltzmann weights; check against a brute-force
    # transfer matrix
    N = 4
    beta = np.log(1 + np.sqrt(2)) / 2
    O = finite_classical_ising(N)
    T = _row_to_matrix(O, N)
    # brute force row transfer matrix: T[s', s] = product of bond weights
    def energy_row(s, sp):
        e = 0.0
        for i in range(N):
            e += s[i] * sp[i]                  # vertical bonds
        for i in range(N - 1):
            e += 0.5 * (s[i] * s[i + 1] + sp[i] * sp[i + 1])  # horizontal
        return e

    states = [[1 if (k >> i) & 1 else -1 for i in range(N)]
              for k in range(2**N)]
    T_exact = np.zeros((2**N, 2**N))
    for a, s in enumerate(states):
        for b, sp in enumerate(states):
            T_exact[a, b] = np.exp(beta * energy_row(s, sp))
    # same spectrum up to basis ordering: compare sorted eigenvalues
    ev1 = np.sort(np.linalg.eigvalsh((T + T.conj().T).real / 2))
    ev2 = np.sort(np.linalg.eigvalsh(T_exact))
    np.testing.assert_allclose(ev1, ev2, rtol=1e-8)


def test_finite_densempo_expectation():
    # <psi|O|psi> against dense contraction for a random MPS
    N = 5
    O = finite_classical_ising(N)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), N, 2, 8)
    val = complex(expectation_value(psi, O))

    T = _row_to_matrix(O, N)
    p = psi.move_center(0)
    acc = jnp.zeros((p.D,), p.dtype).at[0].set(1.0)[None]
    tensors = [p.AC] + [p.ARs[i] for i in range(1, N)]
    for A in tensors:
        acc = jnp.einsum("xl,lpr->xpr", acc, A).reshape(-1, p.D)
    vec = np.asarray(acc[:, 0])
    expected = np.vdot(vec, T @ vec)
    np.testing.assert_allclose(val, expected, rtol=1e-9)


def test_approximate_mpo_application():
    # approximate(psi, (O, phi)) ~ apply-and-truncate
    N, D = 6, 12
    O = finite_classical_ising(N)
    phi = FiniteMPS.random(jax.random.PRNGKey(1), N, 2, D)
    target = apply_densempo_finite(O, phi, Dmax=D)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(2), N, 2, D)
    psi, _, eps = approximate(psi0, (O, phi), FitDMRG(tol=1e-10, maxiter=40))
    # overlap of the two approximations should be ~1 in magnitude
    ov = complex(psi.dot(target))
    n1 = complex(psi.dot(psi)) ** 0.5
    n2 = complex(target.dot(target)) ** 0.5
    assert abs(abs(ov / (n1 * n2)) - 1) < 1e-6


def test_fitdmrg2():
    from mpskit_tpu.algorithms.approximate import FitDMRG2

    N, D = 6, 12
    O = finite_classical_ising(N)
    phi = FiniteMPS.random(jax.random.PRNGKey(3), N, 2, D)
    target = apply_densempo_finite(O, phi, Dmax=D)
    psi0 = FiniteMPS.random(jax.random.PRNGKey(4), N, 2, D)
    psi, _, eps = approximate(psi0, (O, phi),
                              FitDMRG2(tol=1e-10, maxiter=40))
    ov = complex(psi.dot(target))
    n1 = complex(psi.dot(psi)) ** 0.5
    n2 = complex(target.dot(target)) ** 0.5
    assert abs(abs(ov / (n1 * n2)) - 1) < 1e-6
