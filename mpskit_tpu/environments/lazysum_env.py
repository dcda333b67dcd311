"""Per-summand environments for LazySum operators — the counterpart of the
reference's `MultipleEnvironments` (reference src/environments/
multipleenv.jl) and `LazyLincoCache` (lazylincocache.jl).

The default product path materializes a LazySum into one merged FSM (a
single wide MPO is the MXU-friendly representation), but time-dependent
sums whose coefficients change every step can instead keep one environment
per summand and recombine effective-Hamiltonian applications termwise:

    H_eff(t) x = sum_k c_k(t) * H_eff^{(k)} x

Each summand's environments are warm-started independently across calls
(`recalculate`), which is the reference's per-summand `recalculate!` in
functional form.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..operators.lazysum import LazySum, MultipliedOperator
from ..operators.mpo import MPOHamiltonian


def _term_and_coeff(op, t):
    if isinstance(op, MultipliedOperator):
        return op.op, op.coeff(t)
    return op, 1.0


@dataclasses.dataclass(frozen=True)
class MultipleEnvironments:
    """One environment object per LazySum summand, plus the summand
    Hamiltonians (coefficients are NOT baked in: they are evaluated at
    application time, so the same environments serve every t)."""

    terms: Tuple[MPOHamiltonian, ...]
    envs: Tuple[object, ...]

    def coeffs(self, H: LazySum, t=0.0):
        return tuple(_term_and_coeff(op, t)[1] for op in H)


def lazysum_environments(psi, H: LazySum, t=0.0, prev: MultipleEnvironments
                         = None) -> MultipleEnvironments:
    """Per-summand environments of <psi| H_k |psi>. For InfiniteMPS each
    summand's geometric-series solves warm-start from `prev`
    (reference multipleenv.jl:48-53 recursive recalculate!)."""
    from ..states.infinitemps import InfiniteMPS
    from ..states.finitemps import FiniteMPS
    from .infinite_ham import hamiltonian_environments
    from .finite import finite_environments

    terms = tuple(_term_and_coeff(op, t)[0] for op in H)
    envs = []
    for k, Hk in enumerate(terms):
        if isinstance(psi, InfiniteMPS):
            guess = None if prev is None else prev.envs[k]
            envs.append(hamiltonian_environments(psi, Hk, env_init=guess))
        elif isinstance(psi, FiniteMPS):
            envs.append(finite_environments(psi, Hk))
        else:
            raise TypeError(type(psi))
    return MultipleEnvironments(terms, tuple(envs))


def lazysum_ac_apply(menvs: MultipleEnvironments, H: LazySum, t, i, x,
                     psi=None):
    """H_eff^{AC}(t) x = sum_k c_k(t) GL_k W_k GR_k x — the termwise
    derivative application (reference derivatives.jl:284-323 LazySum
    wrappers; consistency oracle: test/operators.jl:173-280
    ∂∂AC(sum H) == sum ∂∂AC(H))."""
    from ..algorithms.derivatives import ac_apply

    out = None
    for op, Hk, env in zip(H, menvs.terms, menvs.envs):
        c = _term_and_coeff(op, t)[1]
        W = Hk.site(i).astype(x.dtype)
        y = c * ac_apply(env.leftenv(i), W, env.rightenv(i), x)
        out = y if out is None else out + y
    return out


def lazysum_c_apply(menvs: MultipleEnvironments, H: LazySum, t, i, x):
    """Zero-site termwise derivative at bond i (GLs[i+1], GRs[i])."""
    from ..algorithms.derivatives import c_apply

    out = None
    for op, Hk, env in zip(H, menvs.terms, menvs.envs):
        c = _term_and_coeff(op, t)[1]
        GL = env.GLs[(i + 1) % env.GLs.shape[0]] \
            if hasattr(env, "GLs") else env.leftenv(i + 1)
        y = c * c_apply(GL, env.rightenv(i), x)
        out = y if out is None else out + y
    return out
