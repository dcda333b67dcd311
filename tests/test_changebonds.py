import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms import (
    DMRG, find_groundstate_dmrg, expectation_value, changebonds,
    SvdCut, RandExpand, OptimalExpand, VUMPSSvdCut,
)
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.tensors.ops import truncbelow, truncdim


def tfim_exact_density(g):
    from scipy.integrate import quad

    return -quad(lambda k: np.sqrt(1 + g**2 - 2 * g * np.cos(k)),
                 0, np.pi)[0] / np.pi


def test_svdcut_finite_overlap():
    # cutting nothing must leave the state invariant (reference
    # test/algorithms.jl:251-340 changebonds invariance)
    L, g, D = 8, 1.3, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    psi, _, _ = find_groundstate_dmrg(psi, H, DMRG(tol=1e-9, maxiter=40))
    cut = changebonds(psi, SvdCut(truncbelow(1e-12)))
    ov = complex(psi.dot(cut))
    assert abs(abs(ov) - 1.0) < 1e-8


def test_svdcut_infinite():
    g, D = 1.5, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=150))
    cut = changebonds(psi, SvdCut(truncbelow(1e-10)))
    e = float(expectation_value(cut, H)[0])
    assert abs(e - tfim_exact_density(g)) < 1e-6


def test_expand_infinite():
    g = 1.5
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, 6)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-8, maxiter=120))
    e_small = float(expectation_value(psi, H)[0])
    grown = changebonds(psi, H, OptimalExpand(dims=6))
    assert grown.D == 12
    # energy preserved by the expansion (same state in a bigger space)
    e_grown = float(expectation_value(grown, H)[0])
    assert abs(e_grown - e_small) < 1e-5
    # re-optimizing in the larger space improves the energy
    grown, envs2, _ = find_groundstate_vumps(
        grown, H, VUMPS(tol=1e-9, maxiter=120))
    e_big = float(expectation_value(grown, H, envs=envs2)[0])
    assert e_big < e_small + 1e-10
    assert abs(e_big - tfim_exact_density(g)) < abs(e_small - tfim_exact_density(g))


def test_vumpssvdcut():
    g, D = 1.2, 12
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-9, maxiter=150))
    cut = changebonds(psi, H, VUMPSSvdCut(truncbelow(1e-8)))
    assert cut.period == 2  # unit cell doubled for the two-site update
    e = float(np.mean(np.asarray(expectation_value(cut, H))))
    assert abs(e - tfim_exact_density(g)) < 1e-5
