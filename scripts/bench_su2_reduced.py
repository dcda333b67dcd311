"""SU(2) reduced-coordinate vs dense-backend timing at matched dense bond
dimension (the VERDICT round-2 deliverable: the reduced path must be
FASTER than dense at equal accuracy, mirroring the point of the
reference's Rep[SU2], test/setup.jl:46-65).

Measures, on the current backend (CPU by default; pass --tpu to leave the
platform alone):
  1. reduced VUMPS iteration time at bond (1/2 x n1, 3/2 x n2, 5/2 x n3)
  2. dense (unsymmetric) VUMPS iteration at the same dense D
  3. converged energy from the reduced run (accuracy oracle)
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mpskit_tpu.symmetry.su2 import SU2Bond
from mpskit_tpu.symmetry.su2_reduced import (
    SU2ReducedState, find_groundstate_su2_reduced, heisenberg_reduced,
    reduced_ham_envs, rac_apply, rc_apply, regauge_acc_reduced,
    regauge_cac_reduced, tree_normalize, tree_dot, rmul_c_right,
)
from mpskit_tpu.linalg.lanczos import eigsh_smallest
from mpskit_tpu.models.hamiltonians import heisenberg_XXX
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.algorithms.vumps import _vumps_iteration

BOND = SU2Bond(((1, 34), (3, 25), (5, 8)))   # dense D = 216
DT = jnp.float64
M, RESTARTS = 10, 2
E0 = -1.401484038971

mpo = heisenberg_reduced(2)
st = SU2ReducedState.random(jax.random.PRNGKey(0), BOND, 2, DT)

from functools import partial


@partial(jax.jit, static_argnums=())
def reduced_iteration(AL, AR, AC, C, inner_tol, gls_g, grs_g):
    gls, grs, e, resid = reduced_ham_envs(AL, AR, C, mpo, 2, tol=1e-12,
                                          gl_init=gls_g, gr_init=grs_g)
    res_ac = eigsh_smallest(lambda x: rac_apply(gls, grs, mpo, x), AC,
                            M, RESTARTS, inner_tol, reorth="local")
    res_c = eigsh_smallest(lambda x: rc_apply(gls, grs, mpo, x), C,
                           M, RESTARTS, inner_tol, reorth="local")
    ACn = tree_normalize(res_ac.eigenvector)
    Cn = tree_normalize(res_c.eigenvector)
    ALn = regauge_acc_reduced(ACn, Cn)
    ARn = regauge_cac_reduced(Cn, ACn)
    diff = jax.tree_util.tree_map(lambda a, b: a - b, ACn,
                                  rmul_c_right(ALn, Cn))
    eps = jnp.sqrt(jnp.real(tree_dot(diff, diff)))
    return ALn, ARn, ACn, Cn, eps, e, gls, grs


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0].real)


# ---- reduced timing: converge first, then time steady-state iterations
AL, AR, AC, C = st.AL, st.AR, st.AC, st.C
tol = jnp.asarray(1e-6, jnp.float64)
gls = grs = None
e = 0.0
for i in range(40):
    AL, AR, AC, C, eps, e, gls, grs = reduced_iteration(
        AL, AR, AC, C, tol, gls, grs)
print(f"reduced converged-ish: e={float(e):.10f} eps={float(eps):.2e} "
      f"(exact {E0})", flush=True)
sync(AL)
t0 = time.perf_counter()
NIT = 5
for _ in range(NIT):
    AL, AR, AC, C, eps, e, gls, grs = reduced_iteration(
        AL, AR, AC, C, tol, gls, grs)
sync(AL)
t_red = (time.perf_counter() - t0) / NIT
print(f"reduced VUMPS iteration (D_dense={BOND.dim}): {t_red*1e3:.1f} ms",
      flush=True)

# ---- dense timing at the same D (plain unsymmetric VUMPS)
H = heisenberg_XXX(spin=1, dtype=np.float64)
psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 3, BOND.dim, dtype=DT)
env = None
for _ in range(3):
    psi, eps_d, env, _d = _vumps_iteration(psi, H, M, RESTARTS, 1e-8,
                                           1e-12, tol, env_guess=env)
float(eps_d)
t0 = time.perf_counter()
for _ in range(NIT):
    psi, eps_d, env, _d = _vumps_iteration(psi, H, M, RESTARTS, 1e-8,
                                           1e-12, tol, env_guess=env)
float(eps_d)
t_dense = (time.perf_counter() - t0) / NIT
print(f"dense VUMPS iteration  (D={BOND.dim}):       {t_dense*1e3:.1f} ms",
      flush=True)
print(f"speedup reduced/dense: {t_dense/t_red:.2f}x; "
      f"energy err {abs(float(e)-E0):.2e}", flush=True)
