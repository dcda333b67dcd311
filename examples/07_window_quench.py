"""Local quench in an infinite system: WindowMPS dynamics with a growing
window (reference windowmps.jl use case).

A finite window is cut out of the infinite TFIM ground state, the window
is locally perturbed, evolved with TDVP against the frozen infinite
boundary environments, and grown mid-evolution so the light cone never
reaches the edges.
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import mpskit_tpu as mk
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.models.spins import pauli
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.algorithms.tdvp import TDVP, timestep
from mpskit_tpu.algorithms.expval import expectation_value

g, D, L0 = 1.5, 16, 8
H = transverse_field_ising(g=g)

psi_inf = mk.InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, D)
psi_inf, _, _ = find_groundstate_vumps(psi_inf, H, VUMPS(tol=1e-10))
psi_inf = mk.InfiniteMPS(psi_inf.AL.astype(jnp.complex128),
                         psi_inf.AR.astype(jnp.complex128),
                         psi_inf.AC.astype(jnp.complex128),
                         psi_inf.C.astype(jnp.complex128))

win = mk.WindowMPS.from_infinite(psi_inf, L=L0)

# local quench: act with sigma_z on the window center
X, _, Z, _ = pauli()
mid = L0 // 2
w = win.window.move_center(mid)
AC = jnp.einsum("st,ltr->lsr", jnp.asarray(Z, w.AC.dtype), w.AC)
win = mk.WindowMPS(win.left_gs, mk.FiniteMPS(w.ALs, w.ARs, AC, mid),
                   win.right_gs)

dt, nsteps = 0.05, 8
for step in range(nsteps):
    if step == nsteps // 2:
        win = win.grow(n_left=2, n_right=2)   # outrun the light cone
        mid += 2
    win, _ = timestep(win, H, step * dt, dt, TDVP())
    mx = [complex(expectation_value(win.window, (i, X))).real
          for i in range(win.length)]
    print(f"t={step * dt + dt:.2f} L={win.length} "
          + " ".join(f"{v:+.3f}" for v in mx))
