"""Non-abelian SU(2) backend tests (reference test/setup.jl:46-65,
docs/src/man/algorithms.md:180-186: Rep[SU₂] spin-1 Heisenberg fixtures).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import heisenberg_XXX
from mpskit_tpu.algorithms.vumps import VUMPS
from mpskit_tpu.symmetry.su2 import (
    SU2Bond, SU2InfiniteMPS, find_groundstate_su2_vumps,
    su2_schmidt_spectrum, su2_dense_schmidt_degeneracies,
    clebsch_gordan2, build_A_projector, build_C_projector,
)

# Only the dense-projector VUMPS integrations are slow; the structural
# tests (and the whole reduced-coordinate suite, test_su2_reduced.py) run
# in the fast gate.

# spin-1 Heisenberg energy density (fixture H = 4 * S.S)
E_EXACT = 4 * -1.401484038971


def test_clebsch_gordan_orthogonality():
    for tj1, tj2 in ((1, 1), (2, 2), (2, 1), (3, 2)):
        for tJ in range(abs(tj1 - tj2), tj1 + tj2 + 1, 2):
            for tJp in range(abs(tj1 - tj2), tj1 + tj2 + 1, 2):
                for tM in range(-min(tJ, tJp), min(tJ, tJp) + 1, 2):
                    s = sum(
                        clebsch_gordan2(tj1, tm1, tj2, tM - tm1, tJ, tM)
                        * clebsch_gordan2(tj1, tm1, tj2, tM - tm1, tJp, tM)
                        for tm1 in range(-tj1, tj1 + 1, 2))
                    assert abs(s - (1.0 if tJ == tJp else 0.0)) < 1e-12


def test_projector_orthonormality():
    bond = SU2Bond(((1, 2), (3, 1)))
    Q = build_A_projector(bond, 2, bond)
    np.testing.assert_allclose(Q.T @ Q, np.eye(Q.shape[1]), atol=1e-12)
    QC = build_C_projector(bond)
    np.testing.assert_allclose(QC.T @ QC, np.eye(QC.shape[1]), atol=1e-12)


@pytest.mark.slow
def test_su2_vumps_spin1_heisenberg():
    """SU(2)-symmetric VUMPS on the spin-1 Heisenberg chain: the Schmidt
    spectrum must carry HALF-INTEGER spin sectors (Haldane phase edge
    spins) with EXACTLY degenerate (2j+1)-multiplets, and the energy must
    match the known density at this bond content."""
    H = heisenberg_XXX(spin=1.0, dtype=np.float64)
    bond = SU2Bond(((1, 4), (3, 2), (5, 1)))   # dense D = 22
    spsi = SU2InfiniteMPS.random(jax.random.PRNGKey(0), bond, 2,
                                 dtype=jnp.float64)
    spsi, envs, eps = find_groundstate_su2_vumps(
        spsi, H, VUMPS(tol=1e-9, maxiter=300))
    assert eps < 1e-8
    e = float(envs.e_density)
    assert abs(e - E_EXACT) < 5e-4, e          # truncation-limited at D=22

    ok, s_dense = su2_dense_schmidt_degeneracies(spsi, atol=1e-9)
    assert ok, "dense Schmidt spectrum is not exactly multiplet-degenerate"
    spec = su2_schmidt_spectrum(spsi)
    assert set(spec) == {1, 3, 5}              # only half-integer sectors
    # dominant Schmidt multiplet is the j=1/2 edge-spin doublet
    assert spec[1][0] == max(v[0] for v in spec.values())


@pytest.mark.slow
def test_su2_haldane_gap():
    """Flagship SU(2) oracle: Haldane gap 0.41047925 at p=pi from the
    quasiparticle ansatz on the SU(2)-symmetric ground state, with
    explicit multiplet structure at D=48-equivalent (reference
    docs/src/man/algorithms.md:180-186; measured err ~9e-7)."""
    from mpskit_tpu.algorithms.excitations import (
        QuasiparticleAnsatz, excitations_infinite,
    )

    H = heisenberg_XXX(spin=1.0, dtype=np.float64)
    bond = SU2Bond(((1, 8), (3, 5), (5, 2)))   # dense D = 48
    spsi = SU2InfiniteMPS.random(jax.random.PRNGKey(0), bond, 2,
                                 dtype=jnp.float64)
    spsi, envs, _ = find_groundstate_su2_vumps(
        spsi, H, VUMPS(tol=1e-9, maxiter=400))
    ok, _ = su2_dense_schmidt_degeneracies(spsi, atol=1e-9)
    assert ok

    es, _ = excitations_infinite(
        H, QuasiparticleAnsatz(tol=1e-6), np.pi, spsi.state, envs=envs,
        num=1)
    gap = float(es[0, 0]) / 4
    assert abs(gap - 0.41047925) < 1e-4, gap
