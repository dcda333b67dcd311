"""Expectation values (reference src/algorithms/expval.jl).

Dispatches over (state, operator) pairs. For finite states the value is
<psi|O|psi> / <psi|psi>; for infinite states the energy *density* per site,
matching the reference's conventions.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from ..states.finitemps import FiniteMPS
from ..operators.mpo import MPOHamiltonian, DenseMPO
from ..operators.lazysum import LazySum, MultipliedOperator
from ..environments.finite import (
    finite_environments, stack_W, left_boundary, right_boundary,
    compute_left_envs,
)
from ..transfermatrix.transfer import transfer_left
from .derivatives import ac_apply


def _expval_finite_mpoham(psi: FiniteMPS, H: MPOHamiltonian, envs=None):
    if envs is None:
        envs = finite_environments(psi, H)
    c = psi.center
    W = stack_W(H, psi.length)[c].astype(psi.AC.dtype)
    num = jnp.vdot(psi.AC, ac_apply(envs.leftenv(c), W, envs.rightenv(c), psi.AC))
    den = jnp.vdot(psi.AC, psi.AC)
    return jnp.real(num / den)


def _expval_finite_local(psi: FiniteMPS, O, site: int):
    """Single-site operator O (d, d) at `site`."""
    p = psi.move_center(site)
    num = jnp.einsum("lsr,st,ltr->", p.AC.conj(), jnp.asarray(O, p.dtype), p.AC)
    den = jnp.vdot(p.AC, p.AC)
    return num / den


def _expval_finite_densempo(psi: FiniteMPS, O: DenseMPO):
    """<psi|O|psi> for a finite transfer MPO with (possibly ragged) edge
    virtual legs of size 1 (reference src/operators/densempo.jl:46-71).
    Host loop over sites: per-site shapes may differ."""
    p = psi.move_center(0)
    L = p.length
    tensors = [p.AC] + [p.ARs[i] for i in range(1, L)]
    D = p.D
    w0 = O.site(0).shape[0]
    env = jnp.zeros((D, w0, D), jnp.result_type(p.dtype, O.site(0).dtype))
    env = env.at[0, 0, 0].set(1.0)
    for i in range(L):
        A = tensors[i]
        Oi = O.site(i).astype(env.dtype)
        env = jnp.einsum("xay,xsm,abst,ytn->mbn", env, A.conj(), Oi, A)
    val = env[0, 0, 0]
    den = jnp.vdot(p.AC, p.AC)
    return val / den


def _w_ac(GL, W, GR, AC):
    return ac_apply(GL, W, GR, AC)


def _string_step(v, A_ket, O, A_bra):
    """v (x_bra, k, y_ket) -> through one site of an MPO string
    O (k, s, t, k') (decompose_localmpo convention)."""
    t = jnp.einsum("xky,ytn->xktn", v, A_ket)
    t = jnp.einsum("xktn,kstK->xsKn", t, O.astype(t.dtype))
    return jnp.einsum("xsm,xsKn->mKn", A_bra.conj(), t)


def _expval_local_string(psi, O_nbody, at: int):
    """<psi| O_{at..at+n-1} |psi> for an n-site local operator
    (reference src/algorithms/expval.jl:42-61): decompose into an MPO
    string, transfer through the mixed gauge, close at the center."""
    from ..operators.mpo import decompose_localmpo
    from ..states.infinitemps import InfiniteMPS

    O_nbody = np.asarray(O_nbody)
    if O_nbody.ndim == 2 and O_nbody.shape[0] > psi.physicaldim:
        d = psi.physicaldim
        n = int(round(np.log(O_nbody.shape[0]) / np.log(d)))
        O_nbody = O_nbody.reshape((d,) * (2 * n))
    Os = decompose_localmpo(O_nbody)
    n = len(Os)

    if isinstance(psi, InfiniteMPS):
        L = psi.period
        D = psi.D
        v = jnp.eye(D, dtype=psi.dtype)[:, None, :]
        for j in range(n):
            A = psi.AL[(at + j) % L]
            v = _string_step(v, A, jnp.asarray(Os[j]), A)
        C = psi.C[(at + n - 1) % L]
        return jnp.einsum("xky,yc,xc->", v, C, C.conj())[()]

    # finite / window: AL up to the last site, close with AC there
    from ..states.windowmps import WindowMPS

    if isinstance(psi, WindowMPS):
        psi = psi.window
    assert at + n <= psi.length, "operator string exceeds the chain"
    p = psi.move_center(at + n - 1)
    D = p.D
    v = jnp.eye(D, dtype=p.dtype)[:, None, :]
    for j in range(n - 1):
        A = p.ALs[at + j]
        v = _string_step(v, A, jnp.asarray(Os[j]), A)
    # last site: ket/bra = AC, then the AR gauge to the right closes to a
    # trace over the final bond
    v = _string_step(v, p.AC, jnp.asarray(Os[n - 1]), p.AC)
    den = jnp.vdot(p.AC, p.AC)
    return jnp.einsum("mkm->k", v)[0] / den


def infinite_temperature(H) -> DenseMPO:
    """Identity density matrix as a DenseMPO (reference
    src/algorithms/toolbox.jl:7-10)."""
    d = H.physicaldim
    eye = jnp.eye(d, dtype=H.dtype)[None, None]
    return DenseMPO.from_array(eye, period=H.period)


def expectation_value(psi, O, *args, envs=None):
    """expectation_value(psi, H) for MPO Hamiltonians;
    expectation_value(psi, (site, O)) for a local operator at a site;
    expectation_value(psi, O_dense_mpo) for transfer MPOs."""
    from ..operators.projection import LinearCombination, ProjectionOperator

    if isinstance(O, LazySum):
        return sum(expectation_value(psi, o, envs=None) for o in O)
    if isinstance(O, MultipliedOperator):
        t = args[0] if args else 0.0
        return O.coeff(t) * expectation_value(psi, O.op)
    if isinstance(O, LinearCombination):
        return sum(c * expectation_value(psi, o)
                   for c, o in zip(O.coeffs, O.opps))
    if isinstance(O, ProjectionOperator):
        ov = O.ket.dot(psi)
        return jnp.abs(ov) ** 2 / jnp.real(psi.dot(psi))

    if isinstance(psi, FiniteMPS):
        if isinstance(O, MPOHamiltonian):
            return _expval_finite_mpoham(psi, O, envs)
        if isinstance(O, DenseMPO):
            return _expval_finite_densempo(psi, O)
        if isinstance(O, tuple) and len(O) == 2:
            site, op = O
            op_arr = np.asarray(op)
            if op_arr.ndim > 2 or op_arr.shape[0] > psi.physicaldim:
                return _expval_local_string(psi, op_arr, site)
            return _expval_finite_local(psi, op, site)
        raise TypeError(f"unsupported operator type {type(O)} for FiniteMPS")

    from ..states.windowmps import WindowMPS

    if isinstance(psi, WindowMPS):
        if isinstance(O, tuple) and len(O) == 2:
            return expectation_value(psi.window, O)
        if isinstance(O, MPOHamiltonian):
            # window energy against the infinite boundary environments
            from ..environments.finite import compute_right_envs, stack_W

            win = psi.window.move_center(0)
            L, D = win.length, win.D
            Ws = stack_W(O, L).astype(win.dtype)
            GL0, GRL = psi.boundary_envs(O)
            GRs = compute_right_envs(win.ARs, Ws, GRL)
            num = jnp.vdot(win.AC, _w_ac(GL0, Ws[0], GRs[1], win.AC))
            den = jnp.vdot(win.AC, win.AC)
            return jnp.real(num / den)
        raise TypeError(f"unsupported operator type {type(O)} for WindowMPS")

    from ..states.infinitemps import InfiniteMPS

    if isinstance(psi, InfiniteMPS):
        from .expval_infinite import (
            expval_infinite_mpoham, expval_infinite_densempo,
            expval_infinite_local,
        )
        if isinstance(O, MPOHamiltonian):
            if args and isinstance(args[0], (range, int)):
                from .expval_infinite import expval_infinite_ranged
                return expval_infinite_ranged(psi, O, args[0], envs)
            return expval_infinite_mpoham(psi, O, envs)
        if isinstance(O, DenseMPO):
            return expval_infinite_densempo(psi, O, envs)
        if isinstance(O, tuple) and len(O) == 2:
            site, op = O
            op_arr = np.asarray(op)
            if op_arr.ndim > 2 or op_arr.shape[0] > psi.physicaldim:
                return _expval_local_string(psi, op_arr, site)
            return expval_infinite_local(psi, op, site)
        raise TypeError(f"unsupported operator type {type(O)} for InfiniteMPS")

    raise TypeError(f"unsupported state type {type(psi)}")
