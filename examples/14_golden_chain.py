"""The golden chain: interacting Fibonacci anyons (Feiguin et al., PRL 98,
160409 (2007)), built from the general fusion-category layer.

Counterpart of the reference ecosystem's anyonic-spin-chain workloads
(TensorKit `Vect[FibonacciAnyon]`; cf. the hard-hexagon example,
reference examples/classic2d/1.hard-hexagon). A chain of τ anyons with
antiferromagnetic fusion projection H = -Σ P^(1) is critical, described by
the tricritical Ising CFT with central charge c = 7/10; the ferromagnetic
chain H = -Σ P^(τ) flows to the 3-state-Potts class, c = 4/5.

The MPO lives in the fusion-path (height) basis — physical dimension 2 —
so finite DMRG runs completely unmodified.

Part 1 (correctness): the pinned open chain (`anyon_chain_finite`, both
boundary heights fixed — the tensor-basis counterpart of fixing the
fusion-tree boundary sectors; without pins the open chain's ground state
is exactly degenerate across boundary-height sectors, the topological
Verlinde-line symmetry) reproduces the admissible-path ED energy to
machine precision.

Part 2 (central charge): DMRG2 on the *periodic* chain, wrapped by the
general-FSM `periodic_boundary_conditions` (reference toolbox.jl:186-306).
The ring has no boundary sectors (unique ground state, no pins needed)
and no open-boundary oscillations, so the Calabrese-Cardy fit

    S(x) = (c/3) log[(N/π) sin(π x/N)] + const

is clean already at N = 18.

Run: JAX_PLATFORMS=cpu python examples/14_golden_chain.py
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import mpskit_tpu as mk
from mpskit_tpu.models import golden_chain, anyon_chain_finite
from mpskit_tpu.symmetry.category import fibonacci_category
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms import DMRG2, find_groundstate_dmrg2
from mpskit_tpu.algorithms.toolbox import (periodic_boundary_conditions,
                                           entropy_profile)


def finite_check(L=14, D=32):
    cat = fibonacci_category()
    H, (pl, pr) = anyon_chain_finite(cat, 1, L, channel=0,
                                     pin_left=1, pin_right=1)
    Hd, paths = cat.chain_hamiltonian_dense(1, 0, L, left=None, right=pr)
    keep = [i for i, p in enumerate(paths) if p[0] == pl]
    e_ref = float(np.linalg.eigvalsh(Hd[np.ix_(keep, keep)])[0])
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=jnp.float64)
    psi, envs, eps = find_groundstate_dmrg2(
        psi, H, DMRG2(tol=1e-10, maxiter=24, verbosity=0))
    E = float(mk.expectation_value(psi, H).sum())
    print(f"finite AFM golden chain L={L}: E = {E:.12f}  "
          f"(path ED {e_ref:.12f}, diff {abs(E - e_ref):.1e})")


def ring_central_charge(antiferro, c_exact, label, N=18, D=48):
    H = golden_chain(antiferro=antiferro)
    Hr = periodic_boundary_conditions(H, N)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), N, 2, D, dtype=jnp.float64)
    psi, envs, eps = find_groundstate_dmrg2(
        psi, Hr, DMRG2(tol=1e-9, maxiter=24, verbosity=0))
    S = np.array(entropy_profile(psi))
    x = np.arange(1, N)
    ell = np.log((N / np.pi) * np.sin(np.pi * x / N))
    keep = slice(N // 4, -(N // 4))
    A = np.vstack([ell[keep] / 3.0, np.ones_like(ell[keep])]).T
    (c, _), *_ = np.linalg.lstsq(A, S[keep], rcond=None)
    print(f"golden chain ring {label}: N={N} D={D} eps={float(eps):.1e}  "
          f"c_fit = {c:.3f}  (exact {c_exact})")


if __name__ == "__main__":
    finite_check()
    ring_central_charge(True, 0.7, "AFM (tricritical Ising)")
    ring_central_charge(False, 0.8, "FM (3-state Potts)")
