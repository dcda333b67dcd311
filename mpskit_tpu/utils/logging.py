"""Iteration logging.

The functional analogue of the reference's `IterLog` state machine
(reference src/utility/logging.jl:10-144): INIT / ITER / CONV / CANCEL lines
with iteration count, objective and error, gated by a verbosity level.

Because algorithm loops are jit-compiled, per-iteration logging uses
`jax.debug.print` (async, does not force host sync); init/final messages are
plain prints on the host.
"""

from __future__ import annotations

import logging

import jax

from ..config import VERBOSE_CONV, VERBOSE_ITER

logger = logging.getLogger("mpskit_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class IterLog:
    def __init__(self, name: str, verbosity: int):
        self.name = name
        self.verbosity = verbosity

    def init(self, msg: str = ""):
        if self.verbosity >= VERBOSE_ITER:
            logger.info(f"{self.name}: init {msg}")

    def iter(self, it, objective, error):
        if self.verbosity >= VERBOSE_ITER:
            jax.debug.print(
                self.name + ": iteration {it}: obj = {obj:.12e}, err = {err:.4e}",
                it=it, obj=objective, err=error,
            )

    def conv(self, it, objective, error):
        if self.verbosity >= VERBOSE_CONV:
            logger.info(
                f"{self.name}: converged after {it} iterations: "
                f"obj = {objective}, err = {error}"
            )

    def solver_warn(self, it, diag, tol):
        """Warn about unconverged inner solves (the reference warns per
        solve, src/algorithms/fixedpoint.jl:12-14; here the jitted sweep
        aggregates (n_unconverged, worst_residual) and the driver reports
        once per outer iteration). Gated at verbosity >= WARN (1)."""
        if self.verbosity < 1:
            return
        n, resid = diag
        n = int(n)
        if n > 0:
            logger.warning(
                f"{self.name}: iteration {it}: {n} inner solve(s) not "
                f"converged to tol {tol:.2e} (worst residual "
                f"{float(resid):.4e})"
            )

    def cancel(self, it, objective, error):
        if self.verbosity >= 1:
            logger.warning(
                f"{self.name}: not converged after {it} iterations: "
                f"obj = {objective}, err = {error}"
            )
