"""mpskit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) tensor-network framework.

A from-scratch rebuild of the capabilities of MPSKit.jl (reference:
/root/reference, v0.10.2) designed TPU-first: states and environments are
immutable pytrees, sweeps are jit-compiled scans, effective-Hamiltonian
eigensolves / geometric-series environment solves run as on-device
Lanczos/Arnoldi/GMRES, and bond dimension shards over ICI via
jax.sharding/pjit.

Default element type follows the reference (ComplexF64,
cf. reference src/utility/defaults.jl:18-28): float64/complex128 is enabled
at import unless MPSKIT_TPU_NO_X64 is set (use float32/complex64 dtypes
explicitly for maximum MXU throughput).
"""

import os as _os

import jax as _jax

if not _os.environ.get("MPSKIT_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

from . import config
from .config import Defaults

# tensor core
from .tensors.ops import (
    qr_pos,
    lq_pos,
    leftorth,
    rightorth,
    leftnull,
    rightnull,
    svd_truncated,
    TruncationScheme,
    truncdim,
    truncerr,
    truncbelow,
    notrunc,
)

# linear algebra core
from .linalg import (
    lanczos_groundstate,
    eigsh_smallest,
    dominant_eigs,
    linsolve,
    expm_multiply,
)

__version__ = "0.1.0"
