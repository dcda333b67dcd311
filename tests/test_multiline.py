import numpy as np
import jax
import pytest

from mpskit_tpu.models.statmech import classical_ising
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.states.multiline import MPSMultiline
from mpskit_tpu.operators.multiline import MPOMultiline
from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
from mpskit_tpu.algorithms.expval import expectation_value

pytestmark = pytest.mark.slow


def test_two_row_classical_ising():
    # two identical rows must reproduce the single-row boundary physics
    O = classical_ising()
    Om = MPOMultiline.from_mpo(O, nrows=2)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, 8)
    psim, envs, eps = leading_boundary(
        psi, Om, VUMPS_Boundary(tol=1e-6, maxiter=60, krylovdim=20))
    assert isinstance(psim, MPSMultiline) and psim.nrows == 2
    # per-row eigenvalue: <psi_{r+1}| T_r |psi_r> channel; the product over
    # rows gives the 2-row transfer eigenvalue = lambda_1row^2
    lam_rows = [complex(e.lambda_cell) for e in envs]
    lam_prod = np.prod(lam_rows)
    assert abs(abs(lam_prod) ** 0.5 - 2.5337) < 5e-3


def test_multiline_changebonds_workflow():
    """Multirow classical-Ising boundary that expands and truncates its
    bonds (reference svdcut.jl:32-33, randexpand.jl:36-37,
    optimalexpand.jl:39-45)."""
    import jax.numpy as jnp
    from mpskit_tpu.algorithms.changebonds import (
        changebonds, SvdCut, RandExpand, OptimalExpand)
    from mpskit_tpu.tensors.ops import truncdim

    O = classical_ising()
    Om = MPOMultiline.from_mpo(O, nrows=2)
    psi = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, 6)
    psim, envs, eps = leading_boundary(
        psi, Om, VUMPS_Boundary(tol=1e-6, maxiter=30, krylovdim=12,
                                verbosity=0))

    # OptimalExpand: rows grow by 4 directions seeded from the row-shifted
    # two-site derivative; re-converging must not lose the eigenvalue
    grown = changebonds(psim, Om, OptimalExpand(dims=4))
    assert isinstance(grown, MPSMultiline) and grown.rows[0].D == 10
    grown2, envs2, _ = leading_boundary(
        grown, Om, VUMPS_Boundary(tol=1e-6, maxiter=20, krylovdim=12,
                                  verbosity=0))
    lam = abs(np.prod([complex(e.lambda_cell) for e in envs2])) ** 0.5
    assert abs(lam - 2.5337) < 5e-3

    # RandExpand per-row
    grown_r = changebonds(psim, RandExpand(dims=2))
    assert grown_r.rows[0].D == 8

    # SvdCut back down: spectra are masked in place (static shapes)
    cut = changebonds(grown2, SvdCut(trscheme=truncdim(6)))
    assert isinstance(cut, MPSMultiline)
    for row in cut.rows:
        s = np.sort(np.abs(np.asarray(
            jnp.linalg.svd(row.C[0], compute_uv=False))))[::-1]
        assert (s[6:] < 1e-10).all()


def test_multiline_mpo_svdcut():
    """changebonds on DenseMPO / MPOMultiline via the InfiniteMPS
    conversion (reference svdcut.jl:25-31)."""
    from mpskit_tpu.algorithms.changebonds import changebonds, SvdCut
    from mpskit_tpu.operators.mpo import mpo_to_mps, mps_to_mpo, DenseMPO
    from mpskit_tpu.tensors.ops import notrunc
    import jax.numpy as jnp

    O = classical_ising()
    cut = changebonds(O, SvdCut(trscheme=notrunc()))
    assert isinstance(cut, DenseMPO)
    # notrunc: the MPO still encodes the same 2-site transfer matrix up to
    # an overall normalization (the MPS conversion normalizes the state)
    def t2(mpo):
        W = np.asarray(mpo.site(0))
        T = np.einsum("abst,bauv->sutv", W, W).reshape(4, 4)
        return T / np.linalg.norm(T)
    assert np.allclose(t2(cut), t2(O), atol=1e-6) or \
        np.allclose(t2(cut), -t2(O), atol=1e-6)

    Om = MPOMultiline.from_mpo(O, nrows=2)
    cutm = changebonds(Om, SvdCut(trscheme=notrunc()))
    assert isinstance(cutm, MPOMultiline) and cutm.nrows == 2


def test_multiline_fit_idmrg():
    """approximate() IDMRG1/2-fit on MPSMultiline targets (reference
    approximate/idmrg.jl:1-145): psi row r+1 fits O_r . phi_r."""
    import jax.numpy as jnp
    from mpskit_tpu.algorithms.approximate import (
        approximate, FitIDMRG, FitIDMRG2)

    O = classical_ising()
    Om = MPOMultiline.from_mpo(O, nrows=2)
    phi = MPSMultiline.from_mps(
        InfiniteMPS.random(jax.random.PRNGKey(2), 2, 2, 8), 2)
    psi0 = MPSMultiline.from_mps(
        InfiniteMPS.random(jax.random.PRNGKey(3), 2, 2, 8), 2)

    out1, envs1, eps1 = approximate(psi0, (Om, phi), FitIDMRG(maxiter=200))
    assert isinstance(out1, MPSMultiline) and out1.nrows == 2
    assert eps1 < 1e-6

    out2, envs2, eps2 = approximate(psi0, (Om, phi), FitIDMRG2(maxiter=200))
    assert isinstance(out2, MPSMultiline)
    assert eps2 < 1e-6
