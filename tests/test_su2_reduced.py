"""SU(2) reduced-coordinate backend: embed/restrict oracles, reduced-vs-
dense kernel equality, gauge identities, and the spin-1 Heisenberg VUMPS
energy (reference relies on TensorKit Rep[SU2] for the same physics,
test/setup.jl:46-65)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.symmetry.su2 import SU2Bond
from mpskit_tpu.symmetry.su2_reduced import (
    RBlocks, random_site, embed_site, restrict_site, embed_env,
    restrict_env, embed_c, identity_c, rho_from_c, tree_dot,
    heisenberg_reduced, bilinear_biquadratic_reduced, ReducedMPO,
    left_qr_reduced, right_lq_reduced, rmul_c_right, rmul_c_left,
    uniform_gauge_reduced, regauge_acc_reduced, regauge_cac_reduced,
    rtransfer_left_plain, rtransfer_right_plain, rtransfer_left_entry,
    rtransfer_right_entry, rac_apply, rc_apply, _env_zero,
    _bond_sectors_from_blocks, reduced_ham_envs, SU2ReducedState,
    find_groundstate_su2_reduced, schmidt_spectrum_reduced, env_keys,
)

BOND = SU2Bond(((1, 3), (3, 2), (5, 1)))   # j=1/2 x3, 3/2 x2, 5/2 x1 -> D=20
TJP = 2                                    # spin-1 physical leg
KEY = jax.random.PRNGKey(7)


def _rand_env(key, bond, tk, dtype=jnp.float64):
    from mpskit_tpu.symmetry.su2_reduced import _bond_sectors
    secs = dict(_bond_sectors(bond))
    keys = env_keys(bond, tk)
    vals = []
    for i, (tb, tn) in enumerate(keys):
        k = jax.random.fold_in(key, i)
        vals.append(jax.random.normal(k, (secs[tb], secs[tn]), dtype))
    return RBlocks(keys, tuple(vals))


def test_embed_restrict_roundtrip():
    B = random_site(KEY, BOND, TJP)
    A = embed_site(B, BOND, TJP, BOND)
    B2 = restrict_site(A, BOND, TJP, BOND)
    for k in B.keys:
        np.testing.assert_allclose(B[k], B2[k], atol=1e-12)
    # isometric embedding: dense norm == block norm
    n_dense = np.linalg.norm(A)
    n_red = float(jnp.sqrt(tree_dot(B, B)))
    assert abs(n_dense - n_red) < 1e-12


def test_env_embed_roundtrip():
    for tk in (0, 2):
        G = _rand_env(KEY, BOND, tk)
        E = embed_env(G, BOND, tk)
        G2 = restrict_env(E, BOND, tk)
        for k in G.keys:
            np.testing.assert_allclose(G[k], G2[k], atol=1e-12)
        assert abs(np.linalg.norm(E) -
                   float(jnp.sqrt(tree_dot(G, G)))) < 1e-12


def test_identity_and_rho():
    Id = identity_c(BOND)
    dense = embed_c(Id, BOND)
    np.testing.assert_allclose(dense, np.eye(BOND.dim), atol=1e-12)


def test_heisenberg_reduced_two_site():
    """The embedded dense FSM of the reduced Heisenberg MPO reproduces
    S.S on two sites."""
    mpo = heisenberg_reduced(TJP)
    W = mpo.dense_fsm()                     # (5, 5, 3, 3)
    d = TJP + 1
    # build S.S directly
    j = TJP / 2.0
    mz = np.array([j - n for n in range(d)])
    sp = np.zeros((d, d))
    for n in range(1, d):
        m = mz[n]
        sp[n - 1, n] = np.sqrt(j * (j + 1) - m * (m + 1))
    sx, syi = (sp + sp.T) / 2, (sp - sp.T) / 2
    ss = (np.kron(sx, sx) - np.kron(syi, syi)
          + np.kron(np.diag(mz), np.diag(mz)))
    # FSM two-site matrix element: boundary (0| ... |end)
    H2 = np.einsum("bst,buv->sutv", W[0], W[:, -1]).reshape(d * d, d * d)
    # remove the pure-identity path (level 0 -> 0 -> end is absent since
    # W[0, -1] = 0 for pure Heisenberg; the identity diagonals contribute
    # I x (W[0,-1]) = 0 and (W[0,-1]) x I = 0)
    np.testing.assert_allclose(H2, ss, atol=1e-10)


def test_plain_transfer_matches_dense():
    B = random_site(KEY, BOND, TJP)
    A = embed_site(B, BOND, TJP, BOND)
    v = _rand_env(jax.random.PRNGKey(3), BOND, 0)
    V = embed_env(v, BOND, 0)[:, 0]
    out_red = rtransfer_left_plain(v, B, B, TJP)
    dense = np.einsum("xsm,xy,ysn->mn", A, V, A)
    out_dense = restrict_env(dense[:, None, :], BOND, 0)
    for k in out_red.keys:
        np.testing.assert_allclose(out_red[k], out_dense[k], atol=1e-10)

    out_red_r = rtransfer_right_plain(v, B, B, TJP)
    dense_r = np.einsum("xsm,mn,ysn->xy", A, V, A)
    out_dense_r = restrict_env(dense_r[:, None, :], BOND, 0)
    for k in out_red_r.keys:
        np.testing.assert_allclose(out_red_r[k], out_dense_r[k], atol=1e-10)


def _dense_mpo_pieces(mpo: ReducedMPO):
    """Dense FSM W and the channel-level offsets."""
    W = mpo.dense_fsm()
    dims = [tk + 1 for tk in mpo.channels]
    offs = np.concatenate([[0], np.cumsum(dims)]).astype(int)
    return W, offs


def test_entry_transfer_matches_dense():
    mpo = heisenberg_reduced(TJP)
    W, offs = _dense_mpo_pieces(mpo)
    B = random_site(KEY, BOND, TJP)
    A = embed_site(B, BOND, TJP, BOND)
    secs = _bond_sectors_from_blocks(B)

    entry = mpo.entries[0]                  # (0, 1, k=1, w)
    a, b = entry[0], entry[1]
    gl = _rand_env(jax.random.PRNGKey(5), BOND, mpo.channels[a])
    GL = embed_env(gl, BOND, mpo.channels[a])
    out = _env_zero(secs, mpo.channels[b], B)
    out = rtransfer_left_entry(gl, entry, mpo, B, out)
    Wblk = W[offs[a]:offs[a + 1], offs[b]:offs[b + 1]]
    dense = np.einsum("xsm,xqy,qrst,ytn->mrn", A, GL, Wblk, A)
    expect = restrict_env(dense, BOND, mpo.channels[b])
    for k in out.keys:
        np.testing.assert_allclose(out[k], expect[k], atol=1e-10)

    entry2 = mpo.entries[1]                 # (1, 2, k=1, 1.0)
    a2, b2 = entry2[0], entry2[1]
    gr = _rand_env(jax.random.PRNGKey(6), BOND, mpo.channels[b2])
    GR = embed_env(gr, BOND, mpo.channels[b2])
    out2 = _env_zero(secs, mpo.channels[a2], B)
    out2 = rtransfer_right_entry(gr, entry2, mpo, B, out2)
    Wblk2 = W[offs[a2]:offs[a2 + 1], offs[b2]:offs[b2 + 1]]
    dense2 = np.einsum("xsm,mrn,qrst,ytn->xqy", A, GR, Wblk2, A)
    expect2 = restrict_env(dense2, BOND, mpo.channels[a2])
    for k in out2.keys:
        np.testing.assert_allclose(out2[k], expect2[k], atol=1e-10)


def test_rac_apply_matches_dense():
    mpo = heisenberg_reduced(TJP)
    W, offs = _dense_mpo_pieces(mpo)
    wD = offs[-1]
    B = random_site(KEY, BOND, TJP)
    A = embed_site(B, BOND, TJP, BOND)
    D = BOND.dim

    gls, grs, GLd, GRd = [], [], np.zeros((wD, D, D)), np.zeros((wD, D, D))
    for lvl in range(mpo.odim):
        tk = mpo.channels[lvl]
        g = _rand_env(jax.random.fold_in(KEY, 100 + lvl), BOND, tk)
        h = _rand_env(jax.random.fold_in(KEY, 200 + lvl), BOND, tk)
        gls.append(g)
        grs.append(h)
        GLd[offs[lvl]:offs[lvl + 1]] = embed_env(g, BOND, tk).transpose(
            1, 0, 2)
        GRd[offs[lvl]:offs[lvl + 1]] = embed_env(h, BOND, tk).transpose(
            1, 0, 2)

    out = rac_apply(gls, grs, mpo, B)
    dense = np.einsum("axy,abst,ytn,brn->xsr", GLd, W, A, GRd)
    expect = restrict_site(dense, BOND, TJP, BOND)
    for k in out.keys:
        np.testing.assert_allclose(out[k], expect[k], atol=1e-9)

    # zero-site derivative
    Cr = rho_from_c(identity_c(BOND), "right")  # any diagonal blocks
    Cd = embed_c(Cr, BOND)
    outc = rc_apply(gls, grs, mpo, Cr)
    densec = np.einsum("axy,yn,arn->xr", GLd, Cd, GRd)
    expectc = restrict_env(densec[:, None, :], BOND, 0)
    for k in outc.keys:
        np.testing.assert_allclose(outc[k], expectc[k], atol=1e-9)


def test_gauge_identities():
    B = random_site(KEY, BOND, TJP)
    AL, C = left_qr_reduced(B)
    # dense isometry
    ALd = embed_site(AL, BOND, TJP, BOND)
    D = BOND.dim
    np.testing.assert_allclose(
        np.einsum("lpm,lpn->mn", ALd, ALd), np.eye(D), atol=1e-10)
    # AL C == B
    prod = rmul_c_right(AL, C)
    for k in B.keys:
        np.testing.assert_allclose(prod[k], B[k], atol=1e-10)

    C2, AR = right_lq_reduced(B)
    ARd = embed_site(AR, BOND, TJP, BOND)
    np.testing.assert_allclose(
        np.einsum("mpr,npr->mn", ARd, ARd), np.eye(D), atol=1e-10)
    prod2 = rmul_c_left(C2, AR)
    for k in B.keys:
        np.testing.assert_allclose(prod2[k], B[k], atol=1e-10)


def test_uniform_gauge_and_regauge():
    A = random_site(jax.random.PRNGKey(11), BOND, TJP)
    AL, AR, AC, C = uniform_gauge_reduced(A, TJP)
    # AC == AL C and AC == C AR (mixed-gauge consistency)
    lhs = rmul_c_right(AL, C)
    for k in AC.keys:
        np.testing.assert_allclose(lhs[k], AC[k], atol=1e-8)
    rhs = rmul_c_left(C, AR)
    for k in AC.keys:
        np.testing.assert_allclose(rhs[k], AC[k], atol=1e-8)
    AL2 = regauge_acc_reduced(AC, C)
    ALd = embed_site(AL2, BOND, TJP, BOND)
    np.testing.assert_allclose(
        np.einsum("lpm,lpn->mn", ALd, ALd), np.eye(BOND.dim), atol=1e-9)
    AR2 = regauge_cac_reduced(C, AC)
    ARd = embed_site(AR2, BOND, TJP, BOND)
    np.testing.assert_allclose(
        np.einsum("mpr,npr->mn", ARd, ARd), np.eye(BOND.dim), atol=1e-9)


E0_HEISENBERG_S1 = -1.401484038971


def test_spin1_heisenberg_vumps_reduced():
    """Flagship: spin-1 Heisenberg ground-state energy density in reduced
    coordinates (Haldane phase; reference docs/src/man/algorithms.md
    uses the same model for Rep[SU2])."""
    bond = SU2Bond(((1, 8), (3, 5), (5, 1)))   # D_dense = 42
    st = SU2ReducedState.random(jax.random.PRNGKey(0), bond, 2)
    st, e, eps = find_groundstate_su2_reduced(st, heisenberg_reduced(2),
                                              tol=1e-9, maxiter=120)
    assert eps < 1e-7
    assert abs(e - E0_HEISENBERG_S1) < 5e-5
    # Schmidt multiplets: half-integer spins only, largest in j=1/2
    spec = schmidt_spectrum_reduced(st)
    assert set(spec) == {1, 3, 5}
    assert spec[1][0] == max(v[0] for v in spec.values())


def test_reduced_energy_matches_dense_su2_vumps():
    """Cross-check against the dense projector backend at small D."""
    from mpskit_tpu.symmetry.su2 import (
        SU2InfiniteMPS, find_groundstate_su2_vumps)
    from mpskit_tpu.models.hamiltonians import heisenberg_XXX
    bond = SU2Bond(((1, 2), (3, 1)))           # D_dense = 8
    st = SU2ReducedState.random(jax.random.PRNGKey(1), bond, 2)
    st, e_red, _ = find_groundstate_su2_reduced(
        st, heisenberg_reduced(2), tol=1e-9, maxiter=150)
    sp = SU2InfiniteMPS.random(jax.random.PRNGKey(1), bond, 2)
    H = heisenberg_XXX(spin=1)              # reference convention: 4 S.S
    _, envs, _ = find_groundstate_su2_vumps(sp, H)
    e_dense = float(jnp.real(envs.e_density)) / 4.0
    assert abs(e_red - e_dense) < 1e-5
