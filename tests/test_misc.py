import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising, heisenberg_XXX
from mpskit_tpu.states import FiniteMPS, InfiniteMPS
from mpskit_tpu.operators import LazySum, UntimedOperator, TimedOperator
from mpskit_tpu.algorithms import expectation_value, find_groundstate
from mpskit_tpu.utils.serialize import save_state, load_state


def test_mps_addition():
    L, d, D = 6, 2, 6
    a = FiniteMPS.random(jax.random.PRNGKey(0), L, d, D)
    b = FiniteMPS.random(jax.random.PRNGKey(1), L, d, D)
    s = a + b
    # <s|a> = <a|a> + <b|a> etc.
    ov_sa = complex(s.dot(a) if False else a.dot(s))
    expected = complex(a.dot(a)) + complex(a.dot(b))
    # careful with norm conventions: from_tensors(normalize=False) keeps
    # the raw sum, but dot() uses AC as stored
    np.testing.assert_allclose(ov_sa, expected, atol=1e-9)
    nrm2 = complex(s.dot(s))
    expected_n = (complex(a.dot(a)) + complex(b.dot(b))
                  + 2 * complex(a.dot(b)).real)
    np.testing.assert_allclose(nrm2.real, expected_n.real, atol=1e-9)


def test_lazysum_expectation():
    L, D = 6, 8
    H1 = transverse_field_ising(g=1.1)
    H2 = heisenberg_XXX(spin=0.5)
    psi = FiniteMPS.random(jax.random.PRNGKey(2), L, 2, D)
    Hs = LazySum([H1, UntimedOperator(H2, 2.5)])
    e = float(expectation_value(psi, Hs))
    e1 = float(expectation_value(psi, H1))
    e2 = float(expectation_value(psi, H2))
    np.testing.assert_allclose(e, e1 + 2.5 * e2, atol=1e-9)
    # materialized sum agrees (derivative-consistency analogue of
    # reference test/operators.jl:173-280)
    e_sum = float(expectation_value(psi, Hs.sum_materialized()))
    np.testing.assert_allclose(e, e_sum, atol=1e-9)

    # timed operator evaluation
    Ht = LazySum([H1, TimedOperator(H2, lambda t: np.cos(t))])
    e_t = float(expectation_value(psi, Ht(0.5).sum_materialized()))
    np.testing.assert_allclose(e_t, e1 + np.cos(0.5) * e2, atol=1e-9)


def test_lazysum_groundstate():
    H1 = transverse_field_ising(g=0.6)
    H2 = transverse_field_ising(g=0.4) * 0.5
    Hs = LazySum([H1, H2])
    psi = FiniteMPS.random(jax.random.PRNGKey(3), 8, 2, 12)
    psi, envs, _ = find_groundstate(Hs and psi, Hs, tol=1e-8, maxiter=40) \
        if False else find_groundstate(psi, Hs, tol=1e-8, maxiter=40)
    Hm = Hs.sum_materialized()
    E = float(expectation_value(psi, Hm))
    E_ed = float(np.linalg.eigvalsh(Hm.to_matrix(8))[0])
    assert abs(E - E_ed) < 1e-7


def test_serialize_roundtrip(tmp_path):
    psi = FiniteMPS.random(jax.random.PRNGKey(4), 5, 2, 6)
    p = str(tmp_path / "state.npz")
    save_state(p, psi)
    psi2 = load_state(p)
    assert complex(abs(psi.dot(psi2))) == pytest.approx(1.0, abs=1e-10)

    ipsi = InfiniteMPS.random(jax.random.PRNGKey(5), 2, 2, 6)
    p2 = str(tmp_path / "istate.npz")
    save_state(p2, ipsi)
    ipsi2 = load_state(p2)
    np.testing.assert_allclose(np.asarray(ipsi.AL), np.asarray(ipsi2.AL))


def test_serialize_all_containers(tmp_path):
    """Checkpoint roundtrips for every supported container: WindowMPS,
    MPSMultiline, LeftGaugedQP, Symmetric{Finite,Infinite}MPS, and
    AnyonicInfiniteMPS (category rebuilt by name)."""
    import mpskit_tpu as mk
    from mpskit_tpu.states.quasiparticle import LeftGaugedQP, null_spaces
    from mpskit_tpu.symmetry import SymmetricInfiniteMPS, AnyonicInfiniteMPS
    from mpskit_tpu.symmetry.category import ising_category

    ipsi = InfiniteMPS.random(jax.random.PRNGKey(0), 2, 2, 6)

    def roundtrip(name, psi):
        p = str(tmp_path / f"{name}.npz")
        save_state(p, psi)
        out = load_state(p)
        assert type(out).__name__ == type(psi).__name__
        la, _ = jax.tree_util.tree_flatten(getattr(psi, "state", psi))
        lb, _ = jax.tree_util.tree_flatten(getattr(out, "state", out))
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        return out

    roundtrip("win", mk.WindowMPS.from_infinite(ipsi, L=4))
    roundtrip("ml", mk.MPSMultiline((ipsi, ipsi)))

    VLs = null_spaces(ipsi.AL)
    qp = LeftGaugedQP(jnp.zeros((2, VLs.shape[-1], 6), ipsi.dtype), VLs,
                      ipsi, ipsi, jnp.asarray(0.5), True)
    qp2 = roundtrip("qp", qp)
    assert float(qp2.momentum) == 0.5 and qp2.trivial is True

    s = mk.SymmetricFiniteMPS.random(jax.random.PRNGKey(2), 6, (1, -1), 8)
    s2 = roundtrip("symf", s)
    assert s2.phys_charges == s.phys_charges
    for a, b in zip(s.bond_charges, s2.bond_charges):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    roundtrip("symi",
              SymmetricInfiniteMPS.random(jax.random.PRNGKey(3), 2,
                                          (1, -1), 8))

    an = AnyonicInfiniteMPS.random(jax.random.PRNGKey(4), ising_category(),
                                   1, D=8, L=2, seed=(1,))
    an2 = roundtrip("anyon", an)
    assert an2.labels == an.labels and an2.cat.name == "Ising"
    assert an2.anyon == 1


def test_unconverged_solver_warning(caplog):
    """A deliberately under-iterated DMRG (tiny Krylov space, one restart)
    must surface the inner eigensolves' non-convergence as a warning —
    the reference warns on every unconverged solve
    (src/algorithms/fixedpoint.jl:12-14)."""
    import logging
    from mpskit_tpu.models import transverse_field_ising
    from mpskit_tpu.algorithms.dmrg import find_groundstate_dmrg, DMRG

    H = transverse_field_ising(g=1.5, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(7), 8, 2, 8, dtype=jnp.float64)
    with caplog.at_level(logging.WARNING, logger="mpskit_tpu"):
        find_groundstate_dmrg(
            psi, H, DMRG(tol=1e-14, maxiter=1, krylovdim=3,
                         eig_maxrestarts=1, verbosity=1))
    assert any("not converged" in r.message for r in caplog.records)


def test_converged_solver_no_warning(caplog):
    """A normally-converged run must NOT emit solver warnings."""
    import logging
    from mpskit_tpu.models import transverse_field_ising
    from mpskit_tpu.algorithms.dmrg import find_groundstate_dmrg, DMRG

    H = transverse_field_ising(g=1.5, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(8), 8, 2, 8, dtype=jnp.float64)
    with caplog.at_level(logging.WARNING, logger="mpskit_tpu"):
        find_groundstate_dmrg(psi, H, DMRG(tol=1e-9, maxiter=30, verbosity=1))
    assert not any("inner solve" in r.message for r in caplog.records)


def test_finitemps_from_dense():
    """FiniteMPS.from_dense (the reference's decompose_localmps path,
    utility.jl:57-68): the ED ground state embeds exactly and energies
    match the ED value."""
    import numpy as np
    import jax.numpy as jnp
    from mpskit_tpu.models import transverse_field_ising
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.expval import expectation_value

    L, g, D = 6, 1.2, 8
    H = transverse_field_ising(g=g, dtype=np.complex128)
    M = H.to_matrix(L)
    w, V = np.linalg.eigh(M)
    psi = FiniteMPS.from_dense(V[:, 0], d=2, D=D)
    e = float(np.real(expectation_value(psi, H)))
    np.testing.assert_allclose(e, w[0], atol=1e-10)
    # truncated case still normalized and close
    psi8 = FiniteMPS.from_dense(V[:, 0], d=2, D=4)
    e8 = float(np.real(expectation_value(psi8, H)))
    assert abs(e8 - w[0]) < 0.1


def test_string_correlator_vs_ed():
    """string_correlator against a dense kron construction on a finite
    chain (the den Nijs-Rommelse string order building block)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mpskit_tpu.models import heisenberg_XXX
    from mpskit_tpu.models.spins import spinmatrices
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.find_groundstate import find_groundstate
    from mpskit_tpu.algorithms.dmrg import DMRG
    from mpskit_tpu.algorithms.correlators import string_correlator

    L, D = 6, 32
    H = heisenberg_XXX(spin=1, dtype=np.complex128)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 3, D,
                           dtype=jnp.complex128)
    psi, _, _ = find_groundstate(psi, H, DMRG(tol=1e-10, maxiter=40,
                                              verbosity=0))
    _, _, Sz, _ = spinmatrices(1)
    Sz = np.real(Sz)
    expZ = np.diag(np.exp(1j * np.pi * np.diag(Sz))).real
    i, j = 1, 4
    val = complex(string_correlator(psi, Sz, expZ, Sz, i, j))

    # dense oracle from the ED ground state
    M = H.to_matrix(L)
    w, V = np.linalg.eigh(M)
    v0 = V[:, 0]
    ops = [np.eye(3)] * L
    ops[i] = Sz
    ops[j] = Sz
    for k in range(i + 1, j):
        ops[k] = expZ
    O = np.array([[1.0]])
    for o in ops:
        O = np.kron(O, o)
    ref = v0.conj() @ O @ v0
    np.testing.assert_allclose(val, ref, atol=1e-8)


def test_plot_smoke(tmp_path):
    """Plot recipes render (counterpart of reference test/other.jl:15-19
    plot tests): data functions return finite arrays; matplotlib
    renderers produce axes on the Agg backend."""
    import matplotlib
    matplotlib.use("Agg")
    from mpskit_tpu.utils.plotting import (
        entanglement_plot, transfer_plot, entanglement_plot_data,
        transfer_plot_data,
    )

    psi = InfiniteMPS.random(jax.random.PRNGKey(11), 1, 2, 6)
    S = entanglement_plot_data(psi)
    assert S.ndim == 1 and np.all(np.isfinite(S)) and np.all(S[:-1] >= S[1:])
    theta, r = transfer_plot_data(psi, num=4)
    assert np.all(np.isfinite(theta)) and np.all(r <= 1.0 + 1e-9)

    ax1 = entanglement_plot(psi)
    ax2 = transfer_plot(psi, num=4)
    assert ax1 is not None and ax2 is not None

    fpsi = FiniteMPS.random(jax.random.PRNGKey(12), 6, 2, 8)
    assert entanglement_plot_data(fpsi, 3).ndim == 1
