"""Sharded-vs-unsharded equivalence on the 8-device virtual CPU mesh.

The bond axis of MPS / environment stacks is sharded over the mesh (the
tensor-network analogue of tensor parallelism, SURVEY.md §2.7 "bond-dimension
sharding"); XLA's GSPMD inserts the collectives. The jitted sweeps must
produce numerically identical results (same program, different layout), so
these tests compare full sharded runs against unsharded ones.

Reference parallelism being replaced: threads in
/root/reference/src/algorithms/groundstate/vumps.jl:39-49 (P1) and
/root/reference/src/algorithms/derivatives.jl:79-92 (P2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.parallel.mesh import (
    make_mesh, replicate, shard_finite_mps, shard_infinite_mps, shard_env,
)
from mpskit_tpu.environments.finite import (
    compute_right_envs, right_boundary, stack_W,
)
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.algorithms.vumps import _vumps_iteration


def _dmrg_setup(L=8, D=16, g=1.3, dtype=jnp.float64):
    H = transverse_field_ising(g=g, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dtype)
    Ws = stack_W(H, L).astype(dtype)
    w = Ws.shape[1]
    GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dtype))
    tol = jnp.asarray(1e-8)
    return psi, Ws, GRs, tol


def _run_sweep(psi, Ws, GRs, tol):
    step = jax.jit(lambda a, b, c, d, e, f: _dmrg_sweep(a, b, c, d, e, f, 10, 2))
    return step(psi.ALs, psi.ARs, psi.AC, Ws, GRs, tol)


def _assert_tree_close(a, b, atol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def _assert_sweeps_equivalent(psi, ref, out):
    """Sharded vs unsharded sweeps agree on physics: eigenvalue, Galerkin
    residual, and state fidelity |<ref|sharded>| = 1. Raw tensors are NOT
    compared: QR junk columns outside the supported bond blocks and the
    Lanczos eigenvector's global sign are layout-dependent noise."""
    ALs_r, ARs_r, AC_r, _, lam_r, eps_r, _diag_r = ref
    ALs_o, ARs_o, AC_o, _, lam_o, eps_o, _diag_o = out
    np.testing.assert_allclose(float(lam_r), float(lam_o), rtol=1e-10)
    # the Galerkin residual of a *random* start state is dominated by the
    # inner eigensolve's stopping point, which layout-dependent rounding can
    # shift by O(inner_tol * |H|); compare at that scale.
    np.testing.assert_allclose(float(eps_r), float(eps_o), atol=1e-5)
    psi_r = FiniteMPS(ALs_r, ARs_r, AC_r, psi.center)
    # pull sharded outputs back to a single device for the overlap
    gather = lambda x: jnp.asarray(np.asarray(x))
    psi_o = FiniteMPS(gather(ALs_o), gather(ARs_o), gather(AC_o), psi.center)
    fid = abs(complex(psi_r.dot(psi_o)))
    np.testing.assert_allclose(fid, 1.0, atol=1e-9)


def test_sharded_dmrg_sweep_bond_mesh():
    """Full DMRG sweep on P(bond=8) mesh == unsharded sweep."""
    psi, Ws, GRs, tol = _dmrg_setup()
    ref = _run_sweep(psi, Ws, GRs, tol)

    mesh = make_mesh(bond=8)
    psi_s = shard_finite_mps(psi, mesh)
    out = _run_sweep(psi_s, replicate(Ws, mesh), shard_env(GRs, mesh), tol)
    _assert_sweeps_equivalent(psi, ref, out)


def test_sharded_dmrg_sweep_site_bond_mesh():
    """Full DMRG sweep on P(site=2, bond=4) mesh == unsharded sweep."""
    psi, Ws, GRs, tol = _dmrg_setup()
    ref = _run_sweep(psi, Ws, GRs, tol)

    mesh = make_mesh(site=2, bond=4)
    psi_s = shard_finite_mps(psi, mesh)
    out = _run_sweep(psi_s, replicate(Ws, mesh), shard_env(GRs, mesh), tol)
    _assert_sweeps_equivalent(psi, ref, out)


def _vumps_setup(period=2, D=8, g=1.4, dtype=jnp.float64):
    H = transverse_field_ising(g=g, period=period, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), period, 2, D, dtype=dtype)
    return psi, H


@pytest.mark.slow
def test_sharded_vumps_iteration_bond_mesh():
    """One VUMPS iteration with bond-sharded state == unsharded."""
    psi, H = _vumps_setup()
    psi_ref, eps_ref, env_ref, _d = _vumps_iteration(
        psi, H, 10, 2, 1e-10, 1e-10, jnp.asarray(1e-8))

    mesh = make_mesh(bond=8)
    psi_s = shard_infinite_mps(psi, mesh)
    psi_out, eps_out, env_out, _d = _vumps_iteration(
        psi_s, H, 10, 2, 1e-10, 1e-10, jnp.asarray(1e-8))

    np.testing.assert_allclose(float(eps_ref), float(eps_out), atol=1e-9)
    _assert_tree_close(
        (psi_ref.AL, psi_ref.AR, psi_ref.AC, psi_ref.C),
        (psi_out.AL, psi_out.AR, psi_out.AC, psi_out.C), atol=1e-8)


def test_sharded_vumps_iteration_site_bond_mesh():
    """VUMPS with the unit cell sharded over 'site' and bonds over 'bond'."""
    psi, H = _vumps_setup(period=2, D=8)
    psi_ref, eps_ref, _, _d = _vumps_iteration(
        psi, H, 10, 2, 1e-10, 1e-10, jnp.asarray(1e-8))

    mesh = make_mesh(site=2, bond=4)
    psi_s = shard_infinite_mps(psi, mesh, shard_sites=True)
    psi_out, eps_out, _, _d = _vumps_iteration(
        psi_s, H, 10, 2, 1e-10, 1e-10, jnp.asarray(1e-8))

    np.testing.assert_allclose(float(eps_ref), float(eps_out), atol=1e-9)
    _assert_tree_close(
        (psi_ref.AL, psi_ref.AR, psi_ref.AC, psi_ref.C),
        (psi_out.AL, psi_out.AR, psi_out.AC, psi_out.C), atol=1e-8)


def test_sharded_tdvp_step_bond_mesh():
    """One finite TDVP timestep on the P(bond=8) mesh equals the
    unsharded step: same evolved state up to global phase (physics:
    time evolution is layout-independent)."""
    from mpskit_tpu.algorithms.tdvp import _timestep_finite

    L, D, g, dt = 8, 16, 1.3, 0.05
    H = transverse_field_ising(g=g)
    psi = FiniteMPS.random(jax.random.PRNGKey(3), L, 2, D,
                           dtype=jnp.complex128)
    Ws = stack_W(H, L).astype(psi.dtype)
    GRs = compute_right_envs(psi.ARs, Ws,
                             right_boundary(Ws.shape[1], D, psi.dtype))

    def run(p, Wr, Gr):
        out = _timestep_finite(p.ALs, p.ARs, p.AC, Wr, Gr, 20, dt)
        ALs, ARs, AC = out[0], out[1], out[2]
        gather = lambda x: jnp.asarray(np.asarray(x))
        return FiniteMPS(gather(ALs), gather(ARs), gather(AC), 0)

    ref = run(psi, Ws, GRs)
    mesh = make_mesh(bond=8)
    out = run(shard_finite_mps(psi, mesh), replicate(Ws, mesh),
              shard_env(GRs, mesh))
    fid = abs(complex(ref.dot(out))) / (float(ref.norm()) *
                                        float(out.norm()))
    np.testing.assert_allclose(fid, 1.0, atol=1e-10)


def test_sharded_dmrg_full_convergence():
    """Full sharded DMRG groundstate run hits the same energy as ED."""
    from mpskit_tpu.algorithms import DMRG, find_groundstate_dmrg, expectation_value

    L, g, D = 8, 1.2, 16
    H = transverse_field_ising(g=g)
    mesh = make_mesh(bond=8)
    psi = shard_finite_mps(
        FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D), mesh)
    psi, envs, eps = find_groundstate_dmrg(psi, H, DMRG(tol=1e-10, maxiter=50))
    E = float(expectation_value(psi, H, envs=envs))
    E_exact = float(np.linalg.eigvalsh(H.to_matrix(L))[0])
    assert abs(E - E_exact) < 1e-8
