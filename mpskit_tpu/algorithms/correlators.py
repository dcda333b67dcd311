"""Two-point correlators (reference src/algorithms/correlators.jl:10-43):
correlator(psi, O1, O2, i, js) = <psi| O1_i O2_j |psi> for j in js, walking
the gauged tensors with plain transfer applications."""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..states.finitemps import FiniteMPS
from ..states.infinitemps import InfiniteMPS
from ..transfermatrix.transfer import transfer_left


def correlator(psi, O1, O2, i: int, js):
    """<O1_i O2_j> for j in js (all j > i). O1/O2 are (d, d) operators."""
    scalar = np.isscalar(js)
    if scalar:
        js = [js]
    js = list(js)
    assert all(j > i for j in js), "correlator requires j > i"
    O1 = jnp.asarray(O1, psi.dtype if hasattr(psi, "dtype") else None)
    O2 = jnp.asarray(O2, psi.dtype if hasattr(psi, "dtype") else None)

    if isinstance(psi, FiniteMPS):
        p = psi.move_center(i)
        AC = p.AC
        den = jnp.vdot(AC, AC)
        # v[l_bra, l_ket] after applying O1 at site i
        v = jnp.einsum("lsr,st,ltm->rm", AC.conj(), O1, AC)

        def site_tensor(j):
            return p.ARs[j]

        out = []
        jmax = max(js)
        vals = {}
        for j in range(i + 1, jmax + 1):
            A = site_tensor(j)
            if j in js:
                val = jnp.einsum("xy,xsr,st,ytr->", v, A.conj(), O2, A)
                vals[j] = val / den
            v = transfer_left(v, A, A)
        return vals[js[0]] if scalar else jnp.stack([vals[j] for j in js])

    if isinstance(psi, InfiniteMPS):
        L = psi.period
        AC = psi.AC[i % L]
        den = jnp.vdot(AC, AC)
        v = jnp.einsum("lsr,st,ltm->rm", AC.conj(), O1, AC)
        out = {}
        jmax = max(js)
        for j in range(i + 1, jmax + 1):
            A = psi.AR[j % L]
            if j in js:
                out[j] = jnp.einsum("xy,xsr,st,ytr->", v, A.conj(), O2, A) / den
            v = transfer_left(v, A, A)
        return out[js[0]] if scalar else jnp.stack([out[j] for j in js])

    raise TypeError(type(psi))


def string_correlator(psi, O1, Omid, O2, i: int, js):
    """String order parameter <O1_i (prod_{i<k<j} Omid_k) O2_j> for j in js
    (all j > i) — e.g. the den Nijs-Rommelse string order of the Haldane
    phase with O1 = O2 = S^z, Omid = exp(i pi S^z). Same walking scheme as
    `correlator` but every intermediate transfer carries the string
    operator (the reference computes these through its generic multi-site
    expectation_value path, expval.jl:42-61)."""
    scalar = np.isscalar(js)
    if scalar:
        js = [js]
    js = list(js)
    assert all(j > i for j in js), "string_correlator requires j > i"
    dt = psi.dtype if hasattr(psi, "dtype") else None
    O1 = jnp.asarray(O1, dt)
    Om = jnp.asarray(Omid, dt)
    O2 = jnp.asarray(O2, dt)

    def step_string(v, A):
        # v[x_bra, y_ket] -> through one site carrying Omid
        t = jnp.einsum("xy,ytn->xtn", v, A)
        t = jnp.einsum("xtn,st->xsn", t, Om)
        return jnp.einsum("xsm,xsn->mn", A.conj(), t)

    if isinstance(psi, FiniteMPS):
        p = psi.move_center(i)
        AC = p.AC
        den = jnp.vdot(AC, AC)
        v = jnp.einsum("lsr,st,ltm->rm", AC.conj(), O1, AC)
        vals = {}
        for j in range(i + 1, max(js) + 1):
            A = p.ARs[j]
            if j in js:
                vals[j] = jnp.einsum("xy,xsr,st,ytr->", v, A.conj(), O2,
                                     A) / den
            v = step_string(v, A)
        return vals[js[0]] if scalar else jnp.stack([vals[j] for j in js])

    if isinstance(psi, InfiniteMPS):
        L = psi.period
        AC = psi.AC[i % L]
        den = jnp.vdot(AC, AC)
        v = jnp.einsum("lsr,st,ltm->rm", AC.conj(), O1, AC)
        out = {}
        for j in range(i + 1, max(js) + 1):
            A = psi.AR[j % L]
            if j in js:
                out[j] = jnp.einsum("xy,xsr,st,ytr->", v, A.conj(), O2,
                                    A) / den
            v = step_string(v, A)
        return out[js[0]] if scalar else jnp.stack([out[j] for j in js])

    raise TypeError(type(psi))
