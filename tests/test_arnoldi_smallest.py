"""Smallest-real-part restarted Arnoldi (linalg/arnoldi.py) — the
Hermiticity-robust QP eigensolver (reference quasiparticleexcitation.jl
relies on KrylovKit eigsolve's automatic Lanczos/Arnoldi selection).

Oracles: dense LAPACK eig for the unit solver; the exact TFIM dispersion
2*sqrt(1 + g^2 - 2 g cos p) for the end-to-end QP path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpskit_tpu.linalg.arnoldi import smallest_eigs_arnoldi


def test_smallest_real_gapped():
    """A non-Hermitian matrix with a well-separated smallest-real mode."""
    key = jax.random.PRNGKey(1)
    n = 50
    A = jax.random.normal(key, (n, n), jnp.float64) * 0.05
    A = A + jnp.diag(jnp.concatenate([jnp.array([-2.0]),
                                      jnp.linspace(0.0, 1.0, n - 1)]))
    w = np.linalg.eigvals(np.asarray(A))
    target = w[np.argmin(w.real)]
    res = smallest_eigs_arnoldi(lambda x: A @ x, jnp.ones(n), m=20,
                                maxrestarts=200, tol=1e-10)
    assert bool(res.converged)
    assert abs(complex(res.eigenvalue) - complex(target)) < 1e-8


@pytest.mark.slow
def test_qp_arnoldi_matches_lanczos():
    from mpskit_tpu.models import transverse_field_ising
    from mpskit_tpu.states.infinitemps import InfiniteMPS
    from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
    from mpskit_tpu.algorithms.excitations import (
        QuasiparticleAnsatz, excitations_infinite,
    )

    g = 1.5
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 16)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-10,
                                                        maxiter=200))
    for p in (0.0, np.pi / 2):
        exact = 2 * np.sqrt(1 + g * g - 2 * g * np.cos(p))
        eA, _ = excitations_infinite(
            H, QuasiparticleAnsatz(tol=1e-8, solver="arnoldi"), [p], psi,
            envs=envs)
        assert abs(float(jnp.real(eA[0, 0])) - exact) < 1e-7
