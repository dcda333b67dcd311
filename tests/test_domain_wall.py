import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.models.spins import pauli
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.excitations import (
    QuasiparticleAnsatz, excitations_infinite,
)

pytestmark = pytest.mark.slow


def _spin_flip(psi: InfiniteMPS) -> InfiniteMPS:
    """Apply the global Z2 symmetry (X on every site): maps one broken
    ground state onto the other while preserving the mixed gauge."""
    X = jnp.asarray(pauli()[0], psi.dtype)

    def op(A):
        return jnp.einsum("st,ltr->lsr", X, A)

    return InfiniteMPS(jax.vmap(op)(psi.AL), jax.vmap(op)(psi.AR),
                       jax.vmap(op)(psi.AC), psi.C)


def test_domain_wall_dispersion():
    # ferromagnetic TFIM (g < 1): elementary excitations are topological
    # domain walls between the two broken ground states; the kink gap at
    # k = 0 is 2(1 - g) (dispersion 2 sqrt(1 + g^2 - 2 g cos k))
    g, D = 0.5, 8
    H = transverse_field_ising(g=g)
    psi = InfiniteMPS.random(jax.random.PRNGKey(3), 1, 2, D)
    psi, envs, _ = find_groundstate_vumps(psi, H, VUMPS(tol=1e-10, maxiter=150))
    # check symmetry breaking: nonzero magnetization
    _, _, Z, _ = pauli()
    from mpskit_tpu.algorithms.expval_infinite import expval_infinite_local

    mz = complex(expval_infinite_local(psi, Z, 0)).real
    assert abs(mz) > 0.9  # deep in the ordered phase

    flipped = _spin_flip(psi)
    es, _ = excitations_infinite(
        H, QuasiparticleAnsatz(tol=1e-6), 0.0, psi, envs=envs,
        right_gs=flipped, num=1)
    gap = float(es[0, 0])
    assert abs(gap - 2 * (1 - g)) < 5e-3, gap
