"""Algorithm chaining with `&` (reference src/algorithms/unionalg.jl:4-26,
used by find_groundstate.jl:19-41 and the changebonds drivers)."""

import numpy as np
import jax

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import (
    DMRG, DMRG2, ChainedAlg, UnionAlg, find_groundstate, changebonds,
    RandExpand, SvdCut, expectation_value,
)
from mpskit_tpu.tensors.ops import truncdim


def _ed_groundenergy(H, L):
    M = H.to_matrix(L)
    return float(np.linalg.eigvalsh(M)[0])


def test_and_builds_chain():
    a, b, c = DMRG2(), DMRG(), SvdCut()
    chain = a & b
    assert isinstance(chain, ChainedAlg) and chain.algs == (a, b)
    assert (chain & c).algs == (a, b, c)
    assert (a & (b & c)).algs == (a, b, c)
    assert UnionAlg is ChainedAlg


def test_chained_groundstate_matches_ed():
    L, g, D = 8, 1.2, 16
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D)
    alg = (DMRG2(tol=1e-6, maxiter=10, trscheme=truncdim(D))
           & DMRG(tol=1e-10, maxiter=50))
    psi, envs, eps = find_groundstate(psi, H, alg)
    E = float(expectation_value(psi, H, envs=envs))
    assert abs(E - _ed_groundenergy(H, L)) < 1e-8


def test_chained_changebonds():
    L, D = 6, 4
    H = transverse_field_ising(g=1.0)
    psi = FiniteMPS.random(jax.random.PRNGKey(1), L, 2, D)
    chain = RandExpand(dims=2) & SvdCut(trscheme=truncdim(D + 2))
    out = changebonds(psi, chain)
    # expansion is isometric on the original state; the chained result is a
    # valid normalized MPS that still overlaps the input
    ov = abs(complex(out.dot(psi)))
    assert ov > 0.99
