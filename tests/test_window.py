import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.models.spins import pauli
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.states.windowmps import WindowMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
from mpskit_tpu.algorithms.tdvp import TDVP, timestep
from mpskit_tpu.algorithms.expval import expectation_value


@pytest.mark.slow
def test_window_dmrg_matches_infinite():
    # a window cut from the VUMPS ground state, re-optimized with DMRG,
    # keeps the infinite bulk magnetization in its center
    g, D = 1.8, 12
    H = transverse_field_ising(g=g)
    psi_inf = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D)
    psi_inf, envs, _ = find_groundstate_vumps(
        psi_inf, H, VUMPS(tol=1e-10, maxiter=150))
    X, _, Z, _ = pauli()
    from mpskit_tpu.algorithms.expval_infinite import expval_infinite_local

    mx_inf = complex(expval_infinite_local(psi_inf, X, 0)).real

    win = WindowMPS.from_infinite(psi_inf, L=10)
    win, _, eps = find_groundstate_dmrg(win, H, DMRG(tol=1e-8, maxiter=20))
    mx_win = complex(expectation_value(win.window, (5, X))).real
    assert abs(mx_win - mx_inf) < 1e-6


@pytest.mark.slow
def test_window_tdvp_local_quench():
    # evolving the unperturbed window keeps it (close to) stationary
    g, D = 1.5, 10
    H = transverse_field_ising(g=g)
    psi_inf = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D)
    psi_inf, _, _ = find_groundstate_vumps(
        psi_inf, H, VUMPS(tol=1e-9, maxiter=150))
    win = WindowMPS.from_infinite(psi_inf, L=8)
    X, _, Z, _ = pauli()
    mx0 = complex(expectation_value(win.window, (4, X))).real
    for _ in range(3):
        win, _ = timestep(win, H, 0.0, 0.05, TDVP())
    mx1 = complex(expectation_value(win.window, (4, X))).real
    assert abs(mx1 - mx0) < 1e-5


@pytest.mark.slow
def test_window_grow():
    # growing the window absorbs exact ground-state cells: the physical
    # state is unchanged and the enlarged window remains stationary
    g, D = 1.5, 10
    H = transverse_field_ising(g=g)
    psi_inf = InfiniteMPS.random(jax.random.PRNGKey(2), 1, 2, D)
    psi_inf, _, _ = find_groundstate_vumps(
        psi_inf, H, VUMPS(tol=1e-9, maxiter=150))
    X, _, Z, _ = pauli()
    win = WindowMPS.from_infinite(psi_inf, L=6)
    mx0 = complex(expectation_value(win.window, (3, X))).real

    big = win.grow(n_left=2, n_right=1)
    assert big.length == 9
    # old bulk site is now shifted by the absorbed cells
    mx1 = complex(expectation_value(big.window, (5, X))).real
    assert abs(mx1 - mx0) < 1e-9
    # every site of the grown window carries the infinite magnetization
    for i in range(9):
        mxi = complex(expectation_value(big.window, (i, X))).real
        assert abs(mxi - mx0) < 1e-7

    # and the grown window is still stationary under TDVP
    big2, _ = timestep(big, H, 0.0, 0.05, TDVP())
    mx2 = complex(expectation_value(big2.window, (5, X))).real
    assert abs(mx2 - mx1) < 1e-5


def test_window_grow_shrink_roundtrip():
    # grow absorbs exact gs cells, so shrinking them back is exact and the
    # reported deviation is ~0; the state equals the original window
    g, D = 1.5, 10
    H = transverse_field_ising(g=g)
    psi_inf = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, D)
    psi_inf, _, _ = find_groundstate_vumps(
        psi_inf, H, VUMPS(tol=1e-9, maxiter=150))
    X, _, Z, _ = pauli()
    win = WindowMPS.from_infinite(psi_inf, L=6)
    mx0 = complex(expectation_value(win.window, (3, X))).real

    big = win.grow(n_left=2, n_right=1)
    small, dev = big.shrink(n_left=2, n_right=1)
    assert small.length == 6
    assert float(dev) < 1e-12
    mx1 = complex(expectation_value(small.window, (3, X))).real
    assert abs(mx1 - mx0) < 1e-10

    # co-moving step: grow right, shrink left (window slides one cell)
    moved, dev2 = win.grow(n_right=1).shrink(n_left=1)
    assert moved.length == 6
    assert float(dev2) < 1e-8  # trailing edge is the unperturbed gs
    mx2 = complex(expectation_value(moved.window, (2, X))).real
    assert abs(mx2 - mx0) < 1e-7


@pytest.mark.slow
def test_window_global_quench_coevolving_boundaries():
    """Global quench g0 -> g1 with Window(H1): the boundary states evolve
    too, so the window CENTER must track the translation-invariant pure
    infinite-TDVP evolution. The frozen-boundary evolution (plain H) has
    no such guarantee — check the co-evolving error is both small and
    not larger than the frozen one."""
    from mpskit_tpu.operators import Window

    g0, g1, D, L = 1.5, 1.2, 12, 10
    H0 = transverse_field_ising(g=g0, dtype=np.complex128)
    H1 = transverse_field_ising(g=g1, dtype=np.complex128)
    psi = InfiniteMPS.random(jax.random.PRNGKey(5), 1, 2, D,
                             dtype=jnp.complex128)
    psi, _, _ = find_groundstate_vumps(psi, H0, VUMPS(tol=1e-10, maxiter=200))
    X, _, Z, _ = pauli()
    from mpskit_tpu.algorithms.expval_infinite import expval_infinite_local

    dt, nsteps = 0.05, 8
    # oracle: translation-invariant quench dynamics
    psi_t, ienvs = psi, None
    for _ in range(nsteps):
        psi_t, ienvs = timestep(psi_t, H1, 0.0, dt, TDVP(), envs=ienvs)
    mx_exact = complex(expval_infinite_local(psi_t, X, 0)).real

    win0 = WindowMPS.from_infinite(psi, L=L)
    win, wenvs = win0, None
    for _ in range(nsteps):
        win, wenvs = timestep(win, Window(H1), 0.0, dt, TDVP(), envs=wenvs)
    mx_co = complex(expectation_value(win.window, (L // 2, X))).real

    frozen = win0
    for _ in range(nsteps):
        frozen, _ = timestep(frozen, H1, 0.0, dt, TDVP())
    mx_frozen = complex(expectation_value(frozen.window, (L // 2, X))).real

    err_co = abs(mx_co - mx_exact)
    err_frozen = abs(mx_frozen - mx_exact)
    assert err_co < 2e-3, (mx_co, mx_exact)
    assert err_co <= err_frozen + 1e-6, (err_co, err_frozen)
