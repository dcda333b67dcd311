"""Global defaults and configuration.

Mirrors the role of the reference's `Defaults` module
(reference src/utility/defaults.jl:6-84): numeric defaults, default solver
parameters, verbosity levels, and parallelization preferences — except that
parallelization here is expressed as a JAX device-mesh configuration rather
than thread-count preferences.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# verbosity levels (reference src/utility/defaults.jl:12-16)
# ----------------------------------------------------------------------------
VERBOSE_NONE = 0
VERBOSE_WARN = 1
VERBOSE_CONV = 2
VERBOSE_ITER = 3
VERBOSE_ALL = 4


class Defaults:
    """Numeric and solver defaults (reference src/utility/defaults.jl:18-57)."""

    eltype = jnp.complex128
    real_eltype = jnp.float64

    maxiter: int = 100
    miniter: int = 5
    tol: float = 1e-12
    tolgauge: float = 1e-13
    verbosity: int = VERBOSE_WARN

    # Krylov defaults
    krylovdim: int = 30
    eig_maxiter: int = 100
    linsolve_maxiter: int = 60
    gauge_maxiter: int = 500

    # dynamic tolerance scaling (reference src/utility/defaults.jl:38-57)
    tol_factor: float = 1e-4
    tol_min: float = 1e-14
    tol_max: float = 1e-4
    eig_miniter: int = 10

    # f32 matmul precision for hot paths (see matmul_precision())
    matmul_precision_f32: str = "BF16_BF16_F32_X3"

    @staticmethod
    def to_real(dtype) -> jnp.dtype:
        return jnp.zeros((), dtype=dtype).real.dtype


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh configuration for sharded contractions.

    The TPU analogue of the reference's parallelization preferences
    (reference src/utility/defaults.jl:62-82): instead of thread counts we
    carry a `jax.sharding.Mesh` and the axis names over which the virtual
    (bond) dimension and the unit-cell/site axis are sharded.
    """

    mesh: Optional[jax.sharding.Mesh] = None
    bond_axis: Optional[str] = "bond"
    site_axis: Optional[str] = None

    @staticmethod
    def single_device() -> "MeshConfig":
        return MeshConfig(mesh=None)


def matmul_precision(dtype=None):
    """Context manager pinning the f32 matmul precision for the hot sweeps.

    On TPU the *default* float32 matmul precision is one-pass bfloat16
    (measured rel. error ~2e-3), which destabilizes Lanczos/QR-based
    sweeps; BF16_BF16_F32_X3 (three-pass) restores ~1e-5 accuracy at ~45%
    cost. float64 paths are unaffected by this setting.
    """
    import contextlib

    if dtype is not None and jnp.finfo(
            jnp.zeros((), dtype).real.dtype).bits == 64:
        return contextlib.nullcontext()
    try:
        if jax.default_backend() == "cpu":
            # the CPU emitter rejects ALG_DOT_BF16_BF16_F32_X3 at runtime
            # (f32 matmuls are exact there anyway)
            return contextlib.nullcontext()
        return jax.default_matmul_precision(Defaults.matmul_precision_f32)
    except Exception:  # pragma: no cover - older jax fallback
        return contextlib.nullcontext()


_GLOBAL_MESH: MeshConfig = MeshConfig.single_device()


def set_mesh(cfg: MeshConfig) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = cfg


def get_mesh() -> MeshConfig:
    return _GLOBAL_MESH
