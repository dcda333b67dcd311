"""SU(2)-reduced quasiparticle excitations: charged-basis roundtrips,
kernel-vs-dense oracles, an end-to-end equality against the dense
(unsymmetric) QP solver on the embedded state, and the flagship Haldane
gap through the reduced path (reference docs/src/man/algorithms.md:180-186
runs the same physics on Rep[SU2] spaces)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpskit_tpu.symmetry.su2 import SU2Bond
from mpskit_tpu.symmetry.su2_reduced import (
    RBlocks, SU2ReducedState, heisenberg_reduced, embed_site, embed_env,
    embed_c, find_groundstate_su2_reduced, reduced_ham_envs, rac_apply,
    tree_dot, tree_normalize, _bond_sectors_from_blocks,
)
from mpskit_tpu.symmetry.su2_reduced_qp import (
    ReducedQP, left_null_reduced, null_sectors, random_x, vl_x,
    vl_pullback, embed_csite, restrict_csite, embed_cenv, restrict_cenv,
    csite_keys, cenv_keys, _cenv_zero, cpush_left, csrc_left, cpush_right,
    csrc_right, cac_apply, qp_envs_reduced, excitations_su2_reduced,
    _xbond_basis, _offsets,
)

TJP = 2           # spin-1 physical leg
TKE = 2           # spin-1 excitation (adjoint sector)
BOND = SU2Bond(((1, 2), (3, 1)))     # D_dense = 8
KEY = jax.random.PRNGKey(3)


def _gs(bond=BOND, tol=1e-10, maxiter=200):
    st = SU2ReducedState.random(jax.random.PRNGKey(0), bond, TJP)
    st, e, eps = find_groundstate_su2_reduced(
        st, heisenberg_reduced(TJP), tol=tol, maxiter=maxiter)
    assert eps < 1e-7
    return st, e


@pytest.fixture(scope="module")
def gs_small():
    return _gs()


def _rand_csite(key, secs, tjp, tke, dtype=jnp.float64):
    d = dict(secs)
    keys = csite_keys(secs, tjp, tke, secs)
    vals = [jax.random.normal(jax.random.fold_in(key, i),
                              (d[kl], d[kr]), dtype)
            for i, (kl, km, kr) in enumerate(keys)]
    return RBlocks(keys, tuple(vals))


def _rand_cenv(key, secs, tka, tke, dtype=jnp.float64):
    d = dict(secs)
    keys = cenv_keys(secs, tka, tke)
    vals = [jax.random.normal(jax.random.fold_in(key, i),
                              (d[kb], d[kk]), dtype)
            for i, (kb, kK, kk) in enumerate(keys)]
    return RBlocks(keys, tuple(vals))


def _rand_env(key, secs, tk, dtype=jnp.float64):
    from mpskit_tpu.symmetry.su2_reduced import env_keys
    bond = SU2Bond(tuple(secs))
    d = dict(secs)
    keys = env_keys(bond, tk)
    vals = [jax.random.normal(jax.random.fold_in(key, i),
                              (d[kb], d[kk]), dtype)
            for i, (kb, kk) in enumerate(keys)]
    return RBlocks(keys, tuple(vals))


def test_charged_roundtrips():
    secs = ((1, 2), (3, 1))
    B = _rand_csite(KEY, secs, TJP, TKE)
    A = embed_csite(B, secs, TJP, TKE)
    B2 = restrict_csite(A, secs, TJP, TKE)
    for k in B.keys:
        np.testing.assert_allclose(B[k], B2[k], atol=1e-12)
    # isometric embedding: dense norm == block norm
    assert abs(np.linalg.norm(A) -
               float(jnp.sqrt(tree_dot(B, B)))) < 1e-12

    for tka in (0, 2):
        for twist in (False, True):
            G = _rand_cenv(jax.random.PRNGKey(5), secs, tka, TKE)
            E = embed_cenv(G, secs, tka, TKE, twist)
            G2 = restrict_cenv(E, secs, tka, TKE, twist)
            for k in G.keys:
                np.testing.assert_allclose(G[k], G2[k], atol=1e-12)
            assert abs(np.linalg.norm(E) -
                       float(jnp.sqrt(tree_dot(G, G)))) < 1e-12


def _embed_x(X, VL, secs, tke):
    """Dense charged bond matrix [null_bond, qe, r] of an X block set."""
    nsec = null_sectors(VL)
    offn, Dn = _offsets(nsec)
    offr, Dr = _offsets(tuple(secs))
    out = np.zeros((Dn, tke + 1, Dr))
    for (tjm, tjr), blk in X.items():
        (m0, nm), (r0, nr) = offn[tjm], offr[tjr]
        dm, dr = tjm + 1, tjr + 1
        T = _xbond_basis(tjm, tke, tjr)
        blkT = np.einsum("ab,mqr->amqbr", np.asarray(blk), T)
        out[m0:m0 + nm * dm, :, r0:r0 + nr * dr] += blkT.reshape(
            nm * dm, tke + 1, nr * dr)
    return out


def test_nullspace_and_vlx(gs_small):
    st, _ = gs_small
    secs = _bond_sectors_from_blocks(st.AL)
    VL = left_null_reduced(st.AL, TJP)
    nbond = SU2Bond(null_sectors(VL))
    ALd = embed_site(st.AL, BOND, TJP, BOND)
    VLd = embed_site(VL, BOND, TJP, nbond)
    # dense isometry + orthogonality to AL
    np.testing.assert_allclose(
        np.einsum("lpm,lpn->mn", VLd, VLd), np.eye(nbond.dim), atol=1e-10)
    np.testing.assert_allclose(
        np.einsum("lpm,lpn->mn", VLd, ALd), 0.0, atol=1e-10)

    X = random_x(KEY, VL, secs, TKE, jnp.float64)
    B = vl_x(VL, X, TJP, TKE)
    Bd = embed_csite(B, secs, TJP, TKE)
    Xd = _embed_x(X, VL, secs, TKE)
    np.testing.assert_allclose(
        Bd, np.einsum("lpm,mqr->lpqr", VLd, Xd), atol=1e-10)
    # pullback is the exact left inverse on the VL image
    X2 = vl_pullback(VL, B, X, TJP, TKE)
    for k in X.keys:
        np.testing.assert_allclose(X2[k], X[k], atol=1e-10)


def test_charged_kernels_match_dense(gs_small):
    st, _ = gs_small
    mpo = heisenberg_reduced(TJP)
    secs = _bond_sectors_from_blocks(st.AL)
    W, offs = mpo.dense_fsm(), None
    dims = [tk + 1 for tk in mpo.channels]
    offs = np.concatenate([[0], np.cumsum(dims)]).astype(int)
    ALd = embed_site(st.AL, BOND, TJP, BOND)
    ARd = embed_site(st.AR, BOND, TJP, BOND)
    B = _rand_csite(jax.random.PRNGKey(9), secs, TJP, TKE)
    Bd = embed_csite(B, secs, TJP, TKE)

    entry = mpo.entries[0] + (False,)          # (0, 1, k=1, w, ident)
    a, b = entry[0], entry[1]
    tka, tkb = mpo.channels[a], mpo.channels[b]
    Wblk = W[offs[a]:offs[a + 1], offs[b]:offs[b + 1]]

    # charged left push (left envs live in the twisted basis)
    lB = _rand_cenv(jax.random.PRNGKey(11), secs, tka, TKE)
    lBd = embed_cenv(lB, secs, tka, TKE, twist=True)
    out = cpush_left(lB, entry, mpo, TKE, st.AL, st.AR,
                     _cenv_zero(secs, tkb, TKE, st.AL))
    dense = np.einsum("xsm,xaey,abst,ytn->mben", ALd, lBd, Wblk, ARd)
    exp = restrict_cenv(dense, secs, tkb, TKE, twist=True)
    for k in out.keys:
        np.testing.assert_allclose(out[k], exp[k], atol=1e-9)

    # left source from B
    gl = _rand_env(jax.random.PRNGKey(12), secs, tka)
    gld = embed_env(gl, BOND, tka)
    out2 = csrc_left(gl, entry, mpo, TKE, st.AL, B,
                     _cenv_zero(secs, tkb, TKE, st.AL))
    dense2 = np.einsum("xsm,xay,abst,yten->mben", ALd, gld, Wblk, Bd)
    exp2 = restrict_cenv(dense2, secs, tkb, TKE, twist=True)
    for k in out2.keys:
        np.testing.assert_allclose(out2[k], exp2[k], atol=1e-9)

    # charged right push
    rB = _rand_cenv(jax.random.PRNGKey(13), secs, tkb, TKE)
    rBd = embed_cenv(rB, secs, tkb, TKE)
    out3 = cpush_right(rB, entry, mpo, TKE, st.AR, st.AL,
                       _cenv_zero(secs, tka, TKE, st.AR))
    dense3 = np.einsum("xsm,mben,abst,ytn->xaey", ARd, rBd, Wblk, ALd)
    exp3 = restrict_cenv(dense3, secs, tka, TKE)
    for k in out3.keys:
        np.testing.assert_allclose(out3[k], exp3[k], atol=1e-9)

    # right source from B
    gr = _rand_env(jax.random.PRNGKey(14), secs, tkb)
    grd = embed_env(gr, BOND, tkb)
    out4 = csrc_right(gr, entry, mpo, TKE, st.AR, B,
                      _cenv_zero(secs, tka, TKE, st.AR))
    dense4 = np.einsum("xsm,mbn,abst,yten->xaey", ARd, grd, Wblk, Bd)
    exp4 = restrict_cenv(dense4, secs, tka, TKE)
    for k in out4.keys:
        np.testing.assert_allclose(out4[k], exp4[k], atol=1e-9)


def test_cac_apply_matches_dense(gs_small):
    st, _ = gs_small
    mpo = heisenberg_reduced(TJP)
    secs = _bond_sectors_from_blocks(st.AL)
    W = mpo.dense_fsm()
    dims = [tk + 1 for tk in mpo.channels]
    offs = np.concatenate([[0], np.cumsum(dims)]).astype(int)
    wD = int(offs[-1])
    D = BOND.dim
    ALd = embed_site(st.AL, BOND, TJP, BOND)
    ARd = embed_site(st.AR, BOND, TJP, BOND)
    B = _rand_csite(jax.random.PRNGKey(21), secs, TJP, TKE)
    Bd = embed_csite(B, secs, TJP, TKE)

    gls, grs, lBs, rBs = [], [], [], []
    GLd = np.zeros((wD, D, D))
    GRd = np.zeros((wD, D, D))
    lBd = np.zeros((wD, D, TKE + 1, D))
    rBd = np.zeros((wD, D, TKE + 1, D))
    for lvl in range(mpo.odim):
        tk = mpo.channels[lvl]
        g = _rand_env(jax.random.fold_in(KEY, 50 + lvl), secs, tk)
        h = _rand_env(jax.random.fold_in(KEY, 60 + lvl), secs, tk)
        lb = _rand_cenv(jax.random.fold_in(KEY, 70 + lvl), secs, tk, TKE)
        rb = _rand_cenv(jax.random.fold_in(KEY, 80 + lvl), secs, tk, TKE)
        gls.append(g)
        grs.append(h)
        lBs.append(lb)
        rBs.append(rb)
        sl = slice(offs[lvl], offs[lvl + 1])
        GLd[sl] = embed_env(g, BOND, tk).transpose(1, 0, 2)
        GRd[sl] = embed_env(h, BOND, tk).transpose(1, 0, 2)
        lBd[sl] = embed_cenv(lb, secs, tk, TKE,
                             twist=True).transpose(1, 0, 2, 3)
        rBd[sl] = embed_cenv(rb, secs, tk, TKE).transpose(1, 0, 2, 3)

    out = cac_apply(gls, grs, lBs, rBs, mpo, TKE, st.AL, st.AR, B)
    dense = (np.einsum("axy,abst,yten,brn->xser", GLd, W, Bd, GRd)
             + np.einsum("axey,abst,ytn,brn->xser", lBd, W, ARd, GRd)
             + np.einsum("axy,abst,ytn,bren->xser", GLd, W, ALd, rBd))
    exp = restrict_csite(dense, secs, TJP, TKE)
    for k in out.keys:
        np.testing.assert_allclose(out[k], exp[k], atol=1e-8)


def test_qp_env_fixed_point(gs_small):
    """The solved charged tails satisfy their dense fixed-point relation
    on the identity levels: lB = phase (T lB + sources)."""
    st, _ = gs_small
    mpo = heisenberg_reduced(TJP)
    tjp = st.tjp
    secs = _bond_sectors_from_blocks(st.AL)
    gls, grs, _, _ = reduced_ham_envs(st.AL, st.AR, st.C, mpo, tjp,
                                      tol=1e-12)
    VL = left_null_reduced(st.AL, TJP)
    X = tree_normalize(random_x(KEY, VL, secs, TKE, jnp.float64))
    B = vl_x(VL, X, tjp, TKE)
    phase = jnp.asarray(-1.0)                  # p = pi
    lBs, rBs = qp_envs_reduced(B, st.AL, st.AR, gls, grs, mpo, TKE, phase,
                               tol=1e-12)
    w = mpo.odim
    for b in (0, w - 1):
        ident = (b, b, 0, 1.0, True)
        zero = _cenv_zero(secs, mpo.channels[b], TKE, st.AL)
        rhs = cpush_left(lBs[b], ident, mpo, TKE, st.AL, st.AR, zero)
        for e in [en + (False,) for en in mpo.entries if en[1] == b]:
            if e[0] != b:
                rhs = cpush_left(lBs[e[0]], e, mpo, TKE, st.AL, st.AR, rhs)
            rhs = csrc_left(gls[e[0]], e, mpo, TKE, st.AL, B, rhs)
        rhs = csrc_left(gls[b], ident, mpo, TKE, st.AL, B, rhs)
        diff = jax.tree_util.tree_map(lambda a, c: a - phase * c,
                                      lBs[b], rhs)
        assert float(jnp.sqrt(tree_dot(diff, diff))) < 1e-9


E_HALDANE = 0.41047925


def test_reduced_qp_matches_dense_embedded(gs_small):
    """Gold oracle: the reduced spin-1 QP energy at p = pi equals the
    dense (unsymmetric) quasiparticle solver run on the embedded state —
    the lowest excitation of the spin-1 chain is the adjoint magnon, so
    the sector-blind dense solve lands on the same eigenvalue."""
    from mpskit_tpu.operators.mpo import MPOHamiltonian
    from mpskit_tpu.states.infinitemps import InfiniteMPS
    from mpskit_tpu.algorithms.excitations import (
        QuasiparticleAnsatz, excitations_infinite)

    st, _ = gs_small
    mpo = heisenberg_reduced(TJP)
    es_red, qps = excitations_su2_reduced(mpo, st, np.pi, tke=TKE,
                                          tol=1e-9)
    e_red = float(es_red[0, 0])

    ALd = embed_site(st.AL, BOND, TJP, BOND)[None]
    ARd = embed_site(st.AR, BOND, TJP, BOND)[None]
    Cd = embed_c(st.C, BOND)[None]
    ACd = jnp.einsum("ilpm,imr->ilpr", jnp.asarray(ALd), jnp.asarray(Cd))
    psi = InfiniteMPS(jnp.asarray(ALd), jnp.asarray(ARd), ACd,
                      jnp.asarray(Cd))
    H = MPOHamiltonian._analyze(np.asarray(mpo.dense_fsm())[None])
    es_dense, _ = excitations_infinite(
        H, QuasiparticleAnsatz(tol=1e-9), np.pi, psi, num=1)
    e_dense = float(es_dense[0, 0])
    assert abs(e_red - e_dense) < 1e-6
    assert isinstance(qps[0][0], ReducedQP)


@pytest.mark.slow
def test_haldane_gap_reduced():
    """Flagship: the Haldane gap through the reduced path. The reference
    computes the same number on Rep[SU2] spaces
    (docs/src/man/algorithms.md:180-186, test/algorithms.jl:205-210)."""
    bond = SU2Bond(((1, 8), (3, 5), (5, 1)))   # D_dense = 42
    st, e = _gs(bond=bond, tol=1e-9, maxiter=150)
    es, _ = excitations_su2_reduced(heisenberg_reduced(TJP), st, np.pi,
                                    tke=TKE, tol=1e-7)
    gap = float(es[0, 0])
    assert abs(gap - E_HALDANE) < 1e-3
