"""Dynamical quantum phase transitions in the quenched TFIM.

Counterpart of the reference's examples/quantum1d/3.ising-dqpt (after
Heyl-Polkovnikov-Kehrein, arXiv:1206.2505): prepare the ground state at
g0 = 0.5, quench to g1 = 2.0, and track the Loschmidt rate function

    lambda(t) = -(2/N) log |<psi(0)|psi(t)>|,

which develops non-analytic kinks at t_n = t* (n + 1/2) with
t* = pi / e(g1, k*), cos(k*) = (1 + g0 g1)/(g0 + g1) -> t* ~ 2.35 for
this quench. Two-site TDVP grows the bond dimension on the fly.

Run: JAX_PLATFORMS=cpu python examples/09_ising_dqpt.py
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms.find_groundstate import find_groundstate
from mpskit_tpu.algorithms.dmrg import DMRG
from mpskit_tpu.algorithms.tdvp import timestep, TDVP, TDVP2
from mpskit_tpu.tensors.ops import truncdim


def echo(psi0, psit):
    return -2.0 * float(jnp.log(jnp.abs(psi0.dot(psit)))) / psi0.length


if __name__ == "__main__":
    L, D0, D = 20, 10, 24
    g0, g1 = 0.5, 2.0
    H0 = transverse_field_ising(g=g0, dtype=np.complex128)
    H1 = transverse_field_ising(g=g1, dtype=np.complex128)

    psi0 = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D0,
                            dtype=jnp.complex128)
    psi0, _, _ = find_groundstate(psi0, H0, DMRG(tol=1e-10, maxiter=40,
                                                 verbosity=0))
    assert abs(echo(psi0, psi0)) < 1e-10

    # grow the bond dimension with TDVP2 for a few steps, then switch to
    # the faster one-site scheme (the reference does exactly this)
    dt, t_final = 0.05, 5.0
    psit = psi0
    rates = []
    t = 0.0
    n2 = 6
    for k in range(int(round(t_final / dt))):
        alg = TDVP2(trscheme=truncdim(D)) if k < n2 else TDVP()
        psit, _ = timestep(psit, H1, t, dt, alg)
        t += dt
        rates.append((t, echo(psi0, psit)))
        if len(rates) % 20 == 0:
            print(f"t={t:.2f}  lambda={rates[-1][1]:.4f}")

    ts = np.array([r[0] for r in rates])
    lam = np.array([r[1] for r in rates])
    # first DQPT: maximum of the rate function in the first window
    kstar = np.arccos((1 + g0 * g1) / (g0 + g1))
    tstar = np.pi / np.sqrt((g1 - np.cos(kstar)) ** 2 + np.sin(kstar) ** 2)
    win = (ts > 0.5) & (ts < 3.0)
    t1 = ts[win][np.argmax(lam[win])]
    print(f"first DQPT peak at t ~ {t1:.2f}  (thermodynamic t* (n+1/2) "
          f"-> first kink at {tstar / 2:.2f}; finite L=20 rounds and "
          "shifts it)")
