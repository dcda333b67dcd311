import jax, jax.numpy as jnp, numpy as np
from mpskit_tpu.models import transverse_field_ising
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.states.finitemps import support_mask
from mpskit_tpu.linalg.lanczos import eigsh_smallest, lanczos_factorize
from mpskit_tpu.tensors.ops import leftorth
from mpskit_tpu.transfermatrix.transfer import transfer_left_mpo
from mpskit_tpu.environments.finite import compute_right_envs, right_boundary, left_boundary, stack_W
from mpskit_tpu.algorithms.derivatives import ac_apply

dt = jnp.float32
L, D = 32, 64
H = transverse_field_ising(g=1.5, dtype=np.float64)
Ws = stack_W(H, L).astype(dt)
w = Ws.shape[1]
psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dt)
GRs = compute_right_envs(psi.ARs, Ws, right_boundary(w, D, dt))
masks = jnp.asarray(support_mask(L, 2, D)).astype(dt)
GL = left_boundary(w, D, dt)
AC = psi.AC

@jax.jit
def solve(GL, W, GR, AC):
    res = eigsh_smallest(lambda x: ac_apply(GL, W, GR, x), AC, 10, 2, 1e-6)
    return res.eigenvalue, res.eigenvector, res.residual

@jax.jit
def facto(GL, W, GR, AC):
    V, alpha, beta, nv = lanczos_factorize(lambda x: ac_apply(GL, W, GR, x), AC, 10)
    return alpha, beta, nv

def nn(x): return bool(jnp.any(~jnp.isfinite(x)))

for i in range(L - 1):
    W = Ws[i]; GR = GRs[i + 1]
    alpha, beta, nv = facto(GL, W, GR, AC)
    lam, ACp, resid = solve(GL, W, GR, AC)
    ACp = ACp * masks[i]
    n = float(jnp.linalg.norm(ACp))
    AL, C = leftorth(ACp / max(n, 1e-30))
    AL = AL * masks[i]
    GLn = transfer_left_mpo(GL, W, AL, AL)
    flags = dict(alpha=nn(alpha), beta=nn(beta), AC=nn(ACp), AL=nn(AL), C=nn(C), GL=nn(GLn))
    print(f"site {i}: lam={float(lam):+.4f} resid={float(resid):.2e} nv={int(nv)} "
          f"|AC|={n:.3e} |GLn|={float(jnp.linalg.norm(GLn)):.3e} "
          f"alpha={np.asarray(alpha)[:4].round(3)} beta={np.asarray(beta)[:4].round(4)} "
          + ("NANFLAGS:" + str(flags) if any(flags.values()) else ""), flush=True)
    if any(flags.values()):
        break
    GL = GLn
    AC = jnp.einsum("lm,mpr->lpr", C / max(float(jnp.linalg.norm(C)), 1e-30), psi.ARs[i + 1])
