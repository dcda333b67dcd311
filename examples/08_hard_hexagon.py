"""Central charge of the hard-hexagon model (Fibonacci anyons).

The TPU-native counterpart of the reference's
examples/classic2d/1.hard-hexagon/main.jl: extract the central charge
c = 4/5 of Baxter's hard-hexagon lattice gas at criticality from the
entanglement scaling S ~ (c/6) log(xi) of the leading boundary MPS.

The reference builds the transfer MPO over `Vect[FibonacciAnyon]`; here the
same operator lives in the orthonormal fusion-path (height) basis
(`hard_hexagon_fibonacci`, derived from the Temperley-Lieb element with
loop weight phi — see models/statmech.py) and the boundary MPS uses a
3-site unit cell: the triangular lattice's 3-sublattice rotation, which
the anyonic tensors quotient out, survives in the height basis as a Z3
triple of transfer channels.

Run: JAX_PLATFORMS=cpu python examples/08_hard_hexagon.py
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpskit_tpu.models import hard_hexagon_fibonacci
from mpskit_tpu.algorithms.statmech import leading_boundary, VUMPS_Boundary
from mpskit_tpu.algorithms.changebonds import changebonds, RandExpand
from mpskit_tpu.algorithms.toolbox import correlation_length, entropy
from mpskit_tpu.states.infinitemps import InfiniteMPS


def scaling_simulations(O, Ds, tol=1e-9, maxiter=250, attempts=3, seed=2):
    """Boundary states of increasing bond dimension (grow + reconverge,
    with random restarts if a VUMPS run stalls — the critical transfer has
    competing local fixed points)."""
    entropies, correlations = [], []
    psi = InfiniteMPS.random(jax.random.PRNGKey(seed), 3, 2, Ds[0],
                             dtype=jnp.float64)
    for D in Ds:
        if psi.D < D:
            psi = changebonds(psi, RandExpand(dims=D - psi.D))
        best = None
        for attempt in range(attempts):
            cand, envs, eps = leading_boundary(
                psi, O, VUMPS_Boundary(tol=tol, maxiter=maxiter, verbosity=0))
            if best is None or eps < best[1]:
                best = (cand, eps)
            if eps < 10 * tol:
                break
            psi = InfiniteMPS.random(jax.random.PRNGKey(97 * D + attempt),
                                     3, 2, D, dtype=jnp.float64)
        psi, eps = best
        entropies.append(float(entropy(psi)))
        correlations.append(float(correlation_length(psi)))
        print(f"D={D}: eps={eps:.2e}  S={entropies[-1]:.5f}  "
              f"xi={correlations[-1]:.2f}")
    return entropies, correlations


if __name__ == "__main__":
    O = hard_hexagon_fibonacci()
    Ds = (8, 12, 16, 20, 24)
    Ss, xis = scaling_simulations(O, Ds)
    c = np.polyfit(np.log(xis), 6.0 * np.asarray(Ss), 1)[0]
    print(f"central charge estimate: {c:.3f}  (exact: 0.8)")
