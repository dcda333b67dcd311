import jax
import jax.numpy as jnp
import numpy as np

from mpskit_tpu.linalg import (
    eigsh_smallest, dominant_eigs, linsolve, expm_multiply,
    expm_multiply_arnoldi,
)
from mpskit_tpu.linalg.arnoldi import spectrum_arnoldi


def _herm(key, n):
    M = jax.random.normal(key, (n, n)) + 1j * jax.random.normal(
        jax.random.fold_in(key, 1), (n, n))
    return ((M + M.conj().T) / 2).astype(jnp.complex128)


def test_eigsh_smallest_dense():
    n = 50
    H = _herm(jax.random.PRNGKey(0), n)
    v0 = jnp.ones((n,), jnp.complex128)
    res = eigsh_smallest(lambda x: H @ x, v0, m=20, maxrestarts=200, tol=1e-10)
    w = np.linalg.eigvalsh(np.asarray(H))
    np.testing.assert_allclose(res.eigenvalue, w[0], atol=1e-8)
    # eigenvector check
    np.testing.assert_allclose(
        np.asarray(H @ res.eigenvector),
        np.asarray(res.eigenvalue * res.eigenvector), atol=1e-7)


def test_eigsh_pytree():
    n = 30
    H = _herm(jax.random.PRNGKey(1), 2 * n)

    def mv(tree):
        x = jnp.concatenate([tree["a"], tree["b"]])
        y = H @ x
        return {"a": y[:n], "b": y[n:]}

    v0 = {"a": jnp.ones((n,), jnp.complex128), "b": jnp.zeros((n,), jnp.complex128)}
    res = eigsh_smallest(mv, v0, m=25, maxrestarts=200, tol=1e-10)
    w = np.linalg.eigvalsh(np.asarray(H))
    np.testing.assert_allclose(res.eigenvalue, w[0], atol=1e-8)


def test_dominant_eigs():
    n = 40
    key = jax.random.PRNGKey(2)
    M = (jax.random.normal(key, (n, n))
         + 1j * jax.random.normal(jax.random.fold_in(key, 3), (n, n))).astype(jnp.complex128)
    # make it transfer-like: positive dominant eigenvalue
    M = M @ M.conj().T + 0.1 * M
    v0 = jnp.ones((n,), jnp.complex128)
    res = dominant_eigs(lambda x: M @ x, v0, m=25, maxrestarts=100, tol=1e-10)
    w = np.linalg.eigvals(np.asarray(M))
    lam = w[np.argmax(np.abs(w))]
    np.testing.assert_allclose(res.eigenvalue, lam, rtol=1e-7)


def test_linsolve():
    n = 40
    A = _herm(jax.random.PRNGKey(4), n) + 5.0 * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(5), (n,)).astype(jnp.complex128)
    # solve (1 + 1*(A - 1)) x = A x = b
    x = linsolve(lambda v: (A - jnp.eye(n)) @ v, b, a0=1.0, a1=1.0, tol=1e-12)
    np.testing.assert_allclose(A @ x, b, atol=1e-8)


def test_expm_multiply():
    n = 40
    H = _herm(jax.random.PRNGKey(6), n)
    v = jax.random.normal(jax.random.PRNGKey(7), (n,)).astype(jnp.complex128)
    tau = -0.05j
    y = expm_multiply(lambda x: H @ x, v, tau, m=30)
    import scipy.linalg as sla
    y_ref = sla.expm(np.asarray(tau * H)) @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-9)


def test_expm_multiply_arnoldi():
    n = 30
    key = jax.random.PRNGKey(8)
    M = (jax.random.normal(key, (n, n))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1), (n, n))).astype(jnp.complex128)
    M = 0.2 * M
    v = jnp.ones((n,), jnp.complex128)
    y = expm_multiply_arnoldi(lambda x: M @ x, v, 1.0, m=29)
    import scipy.linalg as sla
    y_ref = sla.expm(np.asarray(M)) @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-8)


def test_spectrum_arnoldi():
    n = 60
    key = jax.random.PRNGKey(9)
    M = (jax.random.normal(key, (n, n))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1), (n, n))).astype(jnp.complex128)
    M = M @ M.conj().T + 0.3 * M  # well-separated top spectrum
    v0 = jnp.ones((n,), jnp.complex128)
    w, nvalid = spectrum_arnoldi(lambda x: M @ x, v0, m=50, nev=3)
    w_ref = np.linalg.eigvals(np.asarray(M))
    w_ref = w_ref[np.argsort(-np.abs(w_ref))][:3]
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4)


def test_tridiag_smallest_vs_eigh():
    """The Sturm-bisection + inverse-iteration tridiagonal solver that
    replaced jnp.linalg.eigh in the hot restarts matches LAPACK on random
    tridiagonals, including breakdown-masked (nvalid < m) ones."""
    import numpy as np
    from mpskit_tpu.linalg.lanczos import tridiag_smallest

    rng = np.random.default_rng(0)
    m = 10
    for trial in range(20):
        alpha = jnp.asarray(rng.standard_normal(m))
        beta = jnp.asarray(np.abs(rng.standard_normal(m)) + 1e-3)
        nvalid = int(rng.integers(1, m + 1))
        lam, s = tridiag_smallest(alpha, beta, nvalid, m)
        a = np.asarray(alpha)[:nvalid]
        b = np.asarray(beta)[:nvalid - 1] if nvalid > 1 else np.zeros(0)
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        evals, evecs = np.linalg.eigh(T)
        assert abs(float(lam) - evals[0]) < 1e-10, (trial, nvalid)
        s_np = np.asarray(s)
        if nvalid < m:
            assert np.max(np.abs(s_np[nvalid:])) < 1e-12
        ov = abs(np.dot(s_np[:nvalid], evecs[:, 0]))
        # eigenvector overlap (up to degeneracy: check residual instead)
        resid = np.linalg.norm(T @ s_np[:nvalid] - float(lam) * s_np[:nvalid])
        assert resid < 1e-8, (trial, nvalid, resid, ov)
