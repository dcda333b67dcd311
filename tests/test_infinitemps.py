import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.transfermatrix.transfer import transfer_left, transfer_right


@pytest.mark.parametrize("L,d,D", [(1, 2, 8), (2, 2, 6), (3, 3, 5)])
def test_gauge_invariants(L, d, D):
    psi = InfiniteMPS.random(jax.random.PRNGKey(L * 10 + d), L, d, D)
    for i in range(L):
        # isometries
        gl = jnp.einsum("lpm,lpr->mr", psi.AL[i].conj(), psi.AL[i])
        np.testing.assert_allclose(gl, np.eye(D), atol=1e-10)
        gr = jnp.einsum("lpr,mpr->lm", psi.AR[i], psi.AR[i].conj())
        np.testing.assert_allclose(gr, np.eye(D), atol=1e-10)
        # AC = AL C = C_prev AR  (reference test/states.jl:25-28)
        ALC = jnp.einsum("lpm,mr->lpr", psi.AL[i], psi.C[i])
        CAR = jnp.einsum("lm,mpr->lpr", psi.C[(i - 1) % L], psi.AR[i])
        np.testing.assert_allclose(ALC, psi.AC[i], atol=1e-9)
        np.testing.assert_allclose(CAR, psi.AC[i], atol=1e-9)
        # normalization
        np.testing.assert_allclose(float(jnp.linalg.norm(psi.C[i])), 1.0,
                                   atol=1e-9)


@pytest.mark.parametrize("L,d,D", [(1, 2, 8), (2, 2, 6)])
def test_transfer_fixed_points(L, d, D):
    # the 8 mixed-gauge fixed-point relations (reference test/states.jl:62-70)
    psi = InfiniteMPS.random(jax.random.PRNGKey(7 * L + D), L, d, D)
    eye = jnp.eye(D, dtype=psi.dtype)
    # left fixed point of AL transfer is the identity
    v = eye
    for i in range(L):
        v = transfer_left(v, psi.AL[i], psi.AL[i])
    np.testing.assert_allclose(v, eye, atol=1e-9)
    # right fixed point of AR transfer is the identity
    v = eye
    for i in reversed(range(L)):
        v = transfer_right(v, psi.AR[i], psi.AR[i])
    np.testing.assert_allclose(v, eye, atol=1e-9)
    # right fixed point of AL transfer is rho_right
    v = psi.rho_right(L - 1)
    for i in reversed(range(L)):
        v = transfer_right(v, psi.AL[i], psi.AL[i])
    np.testing.assert_allclose(v, psi.rho_right(L - 1), atol=1e-9)
    # left fixed point of AR transfer is rho_left
    v = psi.rho_left(L - 1)
    for i in range(L):
        v = transfer_left(v, psi.AR[i], psi.AR[i])
    np.testing.assert_allclose(v, psi.rho_left(L - 1), atol=1e-9)
