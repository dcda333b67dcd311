"""Solver non-convergence and fixed-point-uniqueness warnings.

The reference warns on every unconverged Krylov solve
(src/algorithms/fixedpoint.jl:12-14, src/environments/mpohaminfenv.jl:97-98,
permpoinfenv.jl:179-185) and detects non-unique dominant fixed points
(fixedpoint.jl:26-28). Here deliberately under-resourced runs must emit a
visible warning through the `mpskit_tpu` logger (VERDICT r2 item 5)."""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models.statmech import classical_ising
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.states.finitemps import FiniteMPS


@pytest.fixture
def capwarn(caplog):
    caplog.set_level(logging.WARNING, logger="mpskit_tpu")
    return caplog


def test_tdvp_finite_exp_warning(capwarn):
    """TDVP with a far-too-small Krylov dimension must warn about the
    exponential truncation estimate."""
    from mpskit_tpu.algorithms.tdvp import timestep, TDVP

    H = transverse_field_ising(g=1.2)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), 8, 2, 8,
                           dtype=jnp.complex128)
    timestep(psi, H, 0.0, 2.0, TDVP(expalg_m=3, verbosity=1))
    assert any("Krylov exponential truncation" in r.message
               for r in capwarn.records)


def test_tdvp_infinite_exp_warning(capwarn):
    from mpskit_tpu.algorithms.tdvp import timestep, TDVP

    H = transverse_field_ising(g=1.2)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, 12,
                             dtype=jnp.complex128)
    timestep(psi, H, 0.0, 2.0, TDVP(expalg_m=3, verbosity=1))
    assert any("Krylov exponential truncation" in r.message
               for r in capwarn.records)


def test_statmech_unconverged_warning(capwarn):
    """Under-iterated leading_boundary (tiny Krylov dimension on the
    critical Ising transfer MPO) must surface unconverged inner solves."""
    from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary

    O = classical_ising()  # critical: slow transfer spectrum
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, 10)
    leading_boundary(psi, O, VUMPS_Boundary(tol=1e-12, maxiter=4,
                                            krylovdim=2, verbosity=1))
    msgs = [r.message for r in capwarn.records]
    assert any(("inner solve" in m) or ("fixed-point residual" in m)
               or ("not converged" in m) for m in msgs), msgs


def test_fixedpoint_uniqueness_warning(capwarn):
    """A doubly-degenerate dominant eigenvalue must trigger the non-unique
    fixed-point warning (reference fixedpoint.jl:26-28)."""
    from mpskit_tpu.linalg.fixedpoint import uniqueness_warning

    d = jnp.concatenate([jnp.asarray([2.0, 2.0]),
                         jnp.linspace(0.1, 1.0, 18)])
    A = jnp.diag(d)
    key = jax.random.PRNGKey(3)
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (20, 20)))
    A = Q @ A @ Q.T

    flagged = uniqueness_warning(lambda x: A @ x,
                                 jax.random.normal(jax.random.PRNGKey(4),
                                                   (20,)),
                                 m=12, name="testfp")
    assert flagged
    assert any("non-unique fixed point" in r.message
               for r in capwarn.records)


def test_fixedpoint_unique_no_warning(capwarn):
    """A well-gapped dominant eigenvalue must NOT trigger the warning."""
    from mpskit_tpu.linalg.fixedpoint import uniqueness_warning

    d = jnp.concatenate([jnp.asarray([3.0]), jnp.linspace(0.1, 1.0, 19)])
    A = jnp.diag(d)
    flagged = uniqueness_warning(lambda x: A @ x,
                                 jnp.ones((20,)), m=12, name="testfp")
    assert not flagged
    assert not any("non-unique" in r.message for r in capwarn.records)


def test_symmetry_broken_boundary_uniqueness(capwarn):
    """Low-temperature (symmetry-broken) classical Ising: a CAT-state
    boundary (block direct sum of the broken state and its spin flip) has a
    two-fold degenerate channel-transfer fixed point — the uniqueness check
    must fire. (A random-start VUMPS run itself breaks the symmetry and has
    a unique channel fixed point, which correctly does NOT warn — that is
    asserted too.)"""
    from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
    from mpskit_tpu.linalg.fixedpoint import transfer_uniqueness_warning

    O = classical_ising(beta=1.0)  # well below criticality
    psi = InfiniteMPS.random(jax.random.PRNGKey(5), 1, 2, 4)
    psi, envs, eps = leading_boundary(
        psi, O, VUMPS_Boundary(tol=1e-10, maxiter=60, verbosity=1))
    Os = jnp.stack([O.site(0)])
    # the broken state itself: unique fixed point, no warning
    assert not transfer_uniqueness_warning(psi, Os, name="broken")

    # cat state: block direct sum of psi and its spin flip (sigma_x on the
    # physical leg is the Z2 symmetry of the Ising weights)
    def blockdiag(a, b):
        D = a.shape[0]
        out = jnp.zeros((2 * D, a.shape[1], 2 * D), a.dtype)
        return out.at[:D, :, :D].set(a).at[D:, :, D:].set(b)

    flip = lambda A: A[:, ::-1, :]
    AL = blockdiag(psi.AL[0], flip(psi.AL[0]))[None]
    AR = blockdiag(psi.AR[0], flip(psi.AR[0]))[None]
    D = psi.D
    C = jnp.zeros((2 * D, 2 * D), psi.dtype)
    C = C.at[:D, :D].set(psi.C[0]).at[D:, D:].set(psi.C[0]) / jnp.sqrt(2.0)
    AC = jnp.einsum("lpm,mr->lpr", AL[0], C)[None]
    cat = InfiniteMPS(AL, AR, AC, C[None])
    assert transfer_uniqueness_warning(cat, Os, name="cat")
    assert any("non-unique fixed point" in r.message
               for r in capwarn.records)


def test_idmrg_warning_plumbing(capwarn):
    """IDMRG1 with a starved inner solver surfaces unconverged site solves."""
    from mpskit_tpu.algorithms.idmrg import find_groundstate_idmrg1, IDMRG1

    H = transverse_field_ising(g=1.5)
    psi = InfiniteMPS.random(jax.random.PRNGKey(6), 1, 2, 12)
    find_groundstate_idmrg1(psi, H, IDMRG1(tol=1e-14, maxiter=3,
                                           krylovdim=2, eig_maxrestarts=1,
                                           verbosity=1))
    assert any("inner solve" in r.message for r in capwarn.records)
