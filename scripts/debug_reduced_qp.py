"""Stage-by-stage comparison of the reduced QP machinery against the
dense QP machinery on the embedded state (debugging aid)."""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses
import numpy as np
import jax.numpy as jnp

from mpskit_tpu.symmetry.su2 import SU2Bond
from mpskit_tpu.symmetry.su2_reduced import (
    SU2ReducedState, heisenberg_reduced, embed_site, embed_env, embed_c,
    find_groundstate_su2_reduced, reduced_ham_envs, rac_apply, tree_dot,
    tree_normalize, _bond_sectors_from_blocks,
)
from mpskit_tpu.symmetry.su2_reduced_qp import (
    left_null_reduced, random_x, vl_x, vl_pullback, embed_csite,
    embed_cenv, qp_envs_reduced, qp_matvec_reduced,
)
from mpskit_tpu.operators.mpo import MPOHamiltonian
from mpskit_tpu.states.infinitemps import InfiniteMPS
from mpskit_tpu.states.quasiparticle import LeftGaugedQP
from mpskit_tpu.environments.qp import qp_left_envs, qp_right_envs
from mpskit_tpu.algorithms.derivatives import ac_apply

TJP, TKE = 2, 2
BOND = SU2Bond(((1, 2), (3, 1)))
P = np.pi

st = SU2ReducedState.random(jax.random.PRNGKey(0), BOND, TJP)
mpo = heisenberg_reduced(TJP)
st, e, eps = find_groundstate_su2_reduced(st, mpo, tol=1e-10, maxiter=200)
print("gs e:", e, "eps:", eps)

secs = _bond_sectors_from_blocks(st.AL)
gls, grs, _, _ = reduced_ham_envs(st.AL, st.AR, st.C, mpo, TJP, tol=1e-13)
E0 = float(jnp.real(tree_dot(st.AC, rac_apply(gls, grs, mpo, st.AC)))
           / jnp.real(tree_dot(st.AC, st.AC)))
print("E0 reduced:", E0)

VL = left_null_reduced(st.AL, TJP)
X = tree_normalize(random_x(jax.random.PRNGKey(3), VL, secs, TKE,
                            jnp.float64))
B = vl_x(VL, X, TJP, TKE)
phase = jnp.asarray(-1.0)
lBs, rBs = qp_envs_reduced(B, st.AL, st.AR, gls, grs, mpo, TKE, phase,
                           tol=1e-13)
Xp = qp_matvec_reduced(X, VL, st, mpo, TKE, gls, grs, E0, phase,
                       env_tol=1e-13)

# ---- dense side -----------------------------------------------------------
ALd = jnp.asarray(embed_site(st.AL, BOND, TJP, BOND))
ARd = jnp.asarray(embed_site(st.AR, BOND, TJP, BOND))
Cd = jnp.asarray(embed_c(st.C, BOND))
ACd = jnp.einsum("lpm,mr->lpr", ALd, Cd)
psi = InfiniteMPS(ALd[None], ARd[None], ACd[None], Cd[None])
Wd = np.asarray(mpo.dense_fsm())
H = MPOHamiltonian._analyze(Wd[None])
dims = [tk + 1 for tk in mpo.channels]
offs = np.concatenate([[0], np.cumsum(dims)]).astype(int)
wD = int(offs[-1])
D = BOND.dim

GLd = np.zeros((wD, D, D))
GRd = np.zeros((wD, D, D))
for lvl in range(mpo.odim):
    tk = mpo.channels[lvl]
    GLd[offs[lvl]:offs[lvl + 1]] = embed_env(gls[lvl], BOND, tk).transpose(
        1, 0, 2)
    GRd[offs[lvl]:offs[lvl + 1]] = embed_env(grs[lvl], BOND, tk).transpose(
        1, 0, 2)
GLd = jnp.asarray(GLd)[None]
GRd = jnp.asarray(GRd)[None]

Bd = jnp.asarray(embed_csite(B, secs, TJP, TKE))      # [l, s, qe, r]
lBd = np.zeros((wD, D, TKE + 1, D))
rBd = np.zeros((wD, D, TKE + 1, D))
for lvl in range(mpo.odim):
    tk = mpo.channels[lvl]
    lBd[offs[lvl]:offs[lvl + 1]] = embed_cenv(
        lBs[lvl], secs, tk, TKE, twist=True).transpose(1, 0, 2, 3)
    rBd[offs[lvl]:offs[lvl + 1]] = embed_cenv(
        rBs[lvl], secs, tk, TKE).transpose(1, 0, 2, 3)

qp0 = LeftGaugedQP.random(jax.random.PRNGKey(1), psi, momentum=P)
Ws = jnp.stack([H.site(0)])

E0_dense = float(jnp.real(jnp.vdot(ACd, ac_apply(GLd[0], Ws[0], GRd[0],
                                                 ACd)))
                 / jnp.real(jnp.vdot(ACd, ACd)))
print("E0 dense (same envs):", E0_dense)

for q in range(TKE + 1):
    Bq = Bd[:, :, q, :]
    Xq = jnp.einsum("lpk,lpr->kr", qp0.VLs[0].conj(), Bq)
    # check Bq is in the VL image
    Bq_rec = jnp.einsum("lpk,kr->lpr", qp0.VLs[0], Xq)
    print(f"q={q}: |Bq|={float(jnp.linalg.norm(Bq)):.6f} "
          f"recon err {float(jnp.linalg.norm(Bq - Bq_rec)):.2e}")
    qpq = dataclasses.replace(qp0, Xs=Xq[None])
    lB_dense = qp_left_envs(qpq, GLd, H, tol=1e-13)
    rB_dense = qp_right_envs(qpq, GRd, H, tol=1e-13)
    dl = float(jnp.linalg.norm(lB_dense[0] - lBd[:, :, q, :]))
    dr = float(jnp.linalg.norm(rB_dense[0] - rBd[:, :, q, :]))
    print(f"   lB diff {dl:.3e} (|lB_dense|={float(jnp.linalg.norm(lB_dense)):.3e}, "
          f"|lB_red|={float(jnp.linalg.norm(lBd[:, :, q, :])):.3e})")
    print(f"   rB diff {dr:.3e} (|rB_dense|={float(jnp.linalg.norm(rB_dense)):.3e}, "
          f"|rB_red|={float(jnp.linalg.norm(rBd[:, :, q, :])):.3e})")

    y = ac_apply(GLd[0], Ws[0], GRd[0], Bq)
    y = y + ac_apply(lB_dense[0], Ws[0], GRd[0], ARd)
    y = y + ac_apply(GLd[0], Ws[0], rB_dense[0], ALd)
    y = y - E0_dense * Bq
    Xq_out = jnp.einsum("lpk,lpr->kr", qp0.VLs[0].conj(), y)
    # embed reduced output Xp the same way: Bp = VL . Xp
    Bp = vl_x(VL, Xp, TJP, TKE)
    Bpd = jnp.asarray(embed_csite(Bp, secs, TJP, TKE))[:, :, q, :]
    Xq_red = jnp.einsum("lpk,lpr->kr", qp0.VLs[0].conj(), Bpd)
    print(f"   matvec diff {float(jnp.linalg.norm(Xq_out - Xq_red)):.3e} "
          f"(|dense|={float(jnp.linalg.norm(Xq_out)):.3e}, "
          f"|red|={float(jnp.linalg.norm(Xq_red)):.3e})")

# ---- per-level left-walk bisect -------------------------------------------
print("\nper-level lB comparison (q=1):")
q = 1
Bq = Bd[:, :, q, :]
Xq = jnp.einsum("lpk,lpr->kr", qp0.VLs[0].conj(), Bq)
qpq = dataclasses.replace(qp0, Xs=Xq[None])
lB_dense = qp_left_envs(qpq, GLd, H, tol=1e-13)[0]   # (w_dense, D, D)
for lvl in range(mpo.odim):
    sl = slice(offs[lvl], offs[lvl + 1])
    dl = float(jnp.linalg.norm(lB_dense[sl] - lBd[sl, :, q, :]))
    print(f"  level {lvl} (k={mpo.channels[lvl]//1}): diff {dl:.3e} "
          f"|dense|={float(jnp.linalg.norm(lB_dense[sl])):.3e} "
          f"|red|={float(jnp.linalg.norm(lBd[sl, :, q, :])):.3e}")

# dense F for level 0 by hand: phase * src(GL, W[:,0], B)
from mpskit_tpu.environments.qp import _src_col_left
F0_dense = -1.0 * _src_col_left(GLd[0], Ws[0][:, 0], Bq, ALd)
# reduced F for level 0
from mpskit_tpu.symmetry.su2_reduced_qp import _cenv_zero, csrc_left
F0_red = csrc_left(gls[0], (0, 0, 0, 1.0, True), mpo, TKE, st.AL, B,
                   _cenv_zero(secs, 0, TKE, st.AL))
F0_red = jax.tree_util.tree_map(lambda v: -1.0 * v, F0_red)
F0_red_d = jnp.asarray(embed_cenv(F0_red, secs, 0, TKE,
                                  twist=True))[:, 0, q, :]
print("F0 diff:", float(jnp.linalg.norm(F0_dense - F0_red_d)),
      "|dense|", float(jnp.linalg.norm(F0_dense)),
      "|red|", float(jnp.linalg.norm(F0_red_d)))

# ---- isolate the level-1 source -------------------------------------------
print("\nlevel-1 source isolation:")
e01 = mpo.entries[0] + (False,)
F1_red = csrc_left(gls[0], e01, mpo, TKE, st.AL, B,
                   _cenv_zero(secs, mpo.channels[1], TKE, st.AL))
F1_red_d = jnp.asarray(embed_cenv(F1_red, secs, mpo.channels[1], TKE,
                                  twist=True))
# dense: src for levels 1:4 = sum_a GL[a] W[a, beta] B (full charged B)
src_dense = jnp.einsum("xsm,axy,abst,yteN->bmeN",
                       ALd, GLd[0], Ws[0][:, offs[1]:offs[2]], Bd)
F1_red_cmp = F1_red_d.transpose(1, 0, 2, 3)           # [qa, m, e, n]
print("  csrc vs dense:", float(jnp.linalg.norm(src_dense - F1_red_cmp)),
      "| |dense|", float(jnp.linalg.norm(src_dense)),
      "|red|", float(jnp.linalg.norm(F1_red_cmp)))
# and vs restrict:
from mpskit_tpu.symmetry.su2_reduced_qp import restrict_cenv as _rc
exp = _rc(np.asarray(src_dense.transpose(1, 0, 2, 3)), secs,
          mpo.channels[1], TKE, twist=True)
for k in F1_red.keys:
    d = float(jnp.linalg.norm(F1_red[k] - exp[k]))
    print(f"  key {k}: diff {d:.3e} |red| "
          f"{float(jnp.linalg.norm(F1_red[k])):.3e} |restr| "
          f"{float(jnp.linalg.norm(exp[k])):.3e}")
