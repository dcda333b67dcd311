import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax

import jax.numpy as jnp, numpy as np
from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states.finitemps import FiniteMPS, support_mask
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, stack_W
from mpskit_tpu.algorithms.dmrg import _dmrg_sweep
from mpskit_tpu.algorithms.rsdmrg import _rs_round, _bond_support_masks
from mpskit_tpu.config import matmul_precision

L, D, G, DT = 32, 512, 1.5, jnp.float32
H = transverse_field_ising_lattice(g=G, dtype=np.float64)
psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=DT)
Ws = stack_W(H, L).astype(DT)
w = Ws.shape[1]
masks = jnp.asarray(support_mask(L, 2, D))
bmasks = jnp.asarray(_bond_support_masks(L, 2, D))
tol = jnp.asarray(1e-6, jnp.float32)
lam_reg = jnp.asarray((3e-4)**2, jnp.float32)

with matmul_precision(DT):
    ALs, ARs, AC = (jnp.array(x, copy=True) for x in (psi.ALs, psi.ARs, psi.AC))
    GRs = compute_right_envs(ARs, Ws, right_boundary(w, D, DT))
    for it in range(4):
        ALs, ARs, AC, GRs, lam, eps, diag = _dmrg_sweep(ALs, ARs, AC, Ws, GRs, tol, 10, 2, masks=masks)
    print("warmup E", float(lam), "eps", float(eps))
    for r in range(10):
        ARs, AC, lam, eps, d = _rs_round(ARs, AC, Ws, masks, bmasks, 4, 10, 2, tol, lam_reg)
        print(f"round {r}: E {float(lam):.6f} eps {float(eps):.3e}")
    # timing
    float(eps)
    t0 = time.perf_counter(); n = 3
    for _ in range(n):
        ARs, AC, lam, eps, d = _rs_round(ARs, AC, Ws, masks, bmasks, 4, 10, 2, tol, lam_reg)
    float(eps)
    print("round time:", round((time.perf_counter()-t0)/n, 4), "s")
