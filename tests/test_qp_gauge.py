"""Left <-> right QP gauge conversion (reference
src/states/quasiparticle_state.jl convert methods; test strategy mirrors
test/states.jl gauge-invariance checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import (FiniteMPS, InfiniteMPS, LeftGaugedQP, FiniteQP,
                               left_to_right_gauge, right_to_left_gauge,
                               finite_left_to_right_gauge,
                               finite_right_to_left_gauge)
from mpskit_tpu.states.quasiparticle import qp_to_finitemps
from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg


def _overlap(a, b):
    na = complex(a.dot(a)) ** 0.5
    nb = complex(b.dot(b)) ** 0.5
    return abs(complex(a.dot(b)) / (na * nb))


@pytest.mark.slow
def test_finite_gauge_conversion_preserves_state():
    L, D = 7, 8
    H = transverse_field_ising(g=1.3)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, _, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=40))

    qp = FiniteQP.random(jax.random.PRNGKey(1), psi)
    qpr = finite_left_to_right_gauge(qp)

    # right gauge condition at every site, within the supported bond
    # blocks (padded gauge tensors carry orthonormal junk rows outside)
    from mpskit_tpu.states.qp_gauge import _bond_masks
    bm = _bond_masks(L, 2, D, jnp.float64)
    res = jnp.einsum("nlpr,nmpr->nlm", qpr.bs(), jnp.conj(qp.ARs))
    assert float(jnp.max(jnp.abs(res * bm[:L]))) < 1e-10

    # same physical state: embed both and compare
    ml = qp_to_finitemps(qp)
    mr = qp_to_finitemps(qpr)
    assert abs(1 - _overlap(ml, mr)) < 1e-10
    # equal norms (gauge transformations are isometric on the state)
    nl = abs(complex(ml.dot(ml))) ** 0.5
    nr = abs(complex(mr.dot(mr))) ** 0.5
    assert abs(nl - nr) / nl < 1e-8

    # round trip reproduces B exactly
    qp2 = finite_right_to_left_gauge(qpr)
    assert float(jnp.max(jnp.abs(qp2.bs() - qp.bs()))) < 1e-10


@pytest.mark.slow
@pytest.mark.parametrize("p", [0.0, 0.7])
def test_infinite_gauge_conversion_roundtrip(p):
    from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps

    H = transverse_field_ising(g=1.5)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 8,
                             dtype=jnp.complex128)
    psi, _, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-10, maxiter=60))

    qp = LeftGaugedQP.random(jax.random.PRNGKey(1), psi, momentum=p)
    qpr = left_to_right_gauge(qp)

    # right gauge condition
    res = jnp.einsum("nlpr,nmpr->nlm", qpr.bs(), jnp.conj(psi.AR))
    assert float(jnp.max(jnp.abs(res))) < 1e-9

    # round trip: physical B tensors identical (gauge fixing is unique)
    qp2 = right_to_left_gauge(qpr)
    assert float(jnp.max(jnp.abs(qp2.bs() - qp.bs()))) < 1e-8
    # and left gauge condition holds for the reconverted B
    res2 = jnp.einsum("nlpm,nlpr->nmr", jnp.conj(psi.AL), qp2.bs())
    assert float(jnp.max(jnp.abs(res2))) < 1e-9
