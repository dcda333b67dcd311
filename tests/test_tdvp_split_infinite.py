"""Split-complex INFINITE TDVP: environment and evolution parity against
the complex-native path (c128, CPU) plus energy conservation — the on-chip
infinite time-evolution path for the TPU's no-complex runtime (reference
src/algorithms/timestep/tdvp.jl:21-59)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import InfiniteMPS
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
from mpskit_tpu.algorithms.derivatives import ac_apply, c_apply
from mpskit_tpu.linalg.expm import expm_multiply_err
from mpskit_tpu.tensors.splitc import to_complex, from_complex
from mpskit_tpu.algorithms.tdvp_split_infinite import (
    hamiltonian_environments_split, _timestep_infinite_split,
    split_state_from_infinite, split_state_to_complex,
)

pytestmark = pytest.mark.slow


def _quench_state(D=12, g0=1.2):
    """Ground state of TFIM(g0) — then evolved under TFIM(g1 != g0)."""
    H0 = transverse_field_ising_lattice(g=g0, dtype=np.float64)
    psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D,
                             dtype=jnp.float64)
    psi, envs, _ = find_groundstate_vumps(psi, H0, VUMPS(tol=1e-11,
                                                         maxiter=300))
    return psi


def test_env_parity_split_vs_complex():
    psi = _quench_state()
    H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
    # make the state genuinely complex: multiply AC/C by a phase texture
    phase = np.exp(0.3j)
    psic = InfiniteMPS(psi.AL.astype(jnp.complex128) * phase,
                       psi.AR.astype(jnp.complex128) * phase,
                       psi.AC.astype(jnp.complex128) * phase ** 2,
                       psi.C.astype(jnp.complex128) * phase)
    envs_c = hamiltonian_environments(psic, H, tol=1e-12)
    ps = tuple(from_complex(x) for x in (psic.AL, psic.AR, psic.AC,
                                         psic.C))
    GLs, GRs, e, resid = hamiltonian_environments_split(ps, H, tol=1e-12)
    np.testing.assert_allclose(np.asarray(to_complex(GLs)),
                               np.asarray(envs_c.GLs), atol=1e-8)
    np.testing.assert_allclose(np.asarray(to_complex(GRs)),
                               np.asarray(envs_c.GRs), atol=1e-8)
    assert abs(complex(to_complex(e)).real
               - float(jnp.real(envs_c.e_density))) < 1e-8


def test_one_step_parity_vs_complex_native():
    psi = _quench_state()
    H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
    dt = 0.05
    psic = InfiniteMPS(*(x.astype(jnp.complex128)
                         for x in (psi.AL, psi.AR, psi.AC, psi.C)))
    envs_c = hamiltonian_environments(psic, H, tol=1e-12)
    Ws = jnp.stack([H.site(0)]).astype(jnp.complex128)
    tau = -1j * dt
    AC_c, _ = expm_multiply_err(
        lambda x: ac_apply(envs_c.GLs[0], Ws[0], envs_c.GRs[0], x),
        psic.AC[0], tau, 30)
    C_c, _ = expm_multiply_err(
        lambda x: c_apply(envs_c.GLs[0], envs_c.GRs[0], x),
        psic.C[0], tau, 30)

    ps = split_state_from_infinite(psic)
    out, envs_s, err, drift = _timestep_infinite_split(ps, H, 30, dt, 1e-12)
    assert float(drift) < 1e-9
    AC_s = np.asarray(to_complex(out[2]))[0]
    C_s = np.asarray(to_complex(out[3]))[0]
    np.testing.assert_allclose(AC_s, np.asarray(AC_c), atol=1e-9)
    np.testing.assert_allclose(C_s, np.asarray(C_c), atol=1e-9)
    assert float(err) < 1e-8


def test_split_quench_conserves_energy():
    psi = _quench_state()
    H = transverse_field_ising_lattice(g=1.5, dtype=np.float64)
    ps = split_state_from_infinite(psi)
    es = []
    env = None
    for _ in range(6):
        ps, envs, err, _drift = _timestep_infinite_split(
            ps, H, 30, 0.02, 1e-12,
            env_guess=(envs[0], envs[1]) if env is not None else None)
        env = envs
        es.append(complex(to_complex(envs[2])).real)
    es = np.asarray(es)
    # e_density is measured on the PRE-step state; conservation across the
    # quench flow: drift stays at integrator order
    assert np.max(np.abs(es - es[0])) < 5e-4, es
    # the evolved state remains a consistent mixed-gauge triple
    out = split_state_to_complex(ps)
    ALC = jnp.einsum("ilpm,imr->ilpr", out.AL, out.C)
    assert float(jnp.linalg.norm(ALC - out.AC)) < 1e-5
