"""mpskit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) tensor-network framework.

A from-scratch rebuild of the capabilities of MPSKit.jl (reference:
/root/reference, v0.10.2) designed TPU-first: states and environments are
immutable pytrees of stacked uniform-shape arrays, sweeps are jit-compiled
scans, effective-Hamiltonian eigensolves / geometric-series environment
solves run as on-device Lanczos/Arnoldi/GMRES, and bond dimension shards
over ICI via jax.sharding/pjit (see mpskit_tpu.parallel).

Default element type follows the reference (ComplexF64,
cf. reference src/utility/defaults.jl:18-28): float64/complex128 is enabled
at import unless MPSKIT_TPU_NO_X64 is set. On TPU hardware complex128 is
unavailable — use real float64 (exact for real Hamiltonians) or
complex64/float32 for maximum MXU throughput.
"""

import os as _os

import jax as _jax

if not _os.environ.get("MPSKIT_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

from . import config
from .config import Defaults, MeshConfig

# tensor core
from .tensors.ops import (
    qr_pos, lq_pos, leftorth, rightorth, leftnull, rightnull,
    svd_truncated, TruncationScheme, truncdim, truncerr, truncbelow, notrunc,
)

# linear algebra core
from .linalg import (
    lanczos_groundstate, eigsh_smallest, dominant_eigs, linsolve,
    expm_multiply,
)

# states
from .states import (
    FiniteMPS, InfiniteMPS, WindowMPS, MPSMultiline, LeftGaugedQP,
    RightGaugedQP, FiniteQP, FiniteQPRight,
    left_to_right_gauge, right_to_left_gauge,
    finite_left_to_right_gauge, finite_right_to_left_gauge,
)

# operators
from .operators import (
    MPOHamiltonian, DenseMPO, MPOMultiline, LazySum, MultipliedOperator,
    TimedOperator, UntimedOperator, ProjectionOperator, LinearCombination,
    Window,
)
from .operators.apply import apply_densempo_finite, apply_densempo_infinite

# algorithms
from .algorithms import (
    DMRG, DMRG2, IDMRG1, IDMRG2, VUMPS, VOMPS, VUMPS_Boundary,
    RealSpaceParallelDMRG,
    GradientGrassmann, TDVP, TDVP2, QuasiparticleAnsatz, FiniteExcited,
    SvdCut, OptimalExpand, RandExpand, VUMPSSvdCut, NaiveInvert, Jeckelmann,
    DynamicalDMRG, WI, WII, TaylorCluster, FitDMRG, FitDMRG2,
    FitIDMRG, FitIDMRG2,
    find_groundstate, leading_boundary, timestep, time_evolve, excitations,
    changebonds, approximate, propagator, expectation_value, correlator,
    entropy, entanglement_spectrum, transfer_spectrum, correlation_length,
    marek_gap, variance, calc_galerkin, fidelity_susceptibility,
    exact_diagonalization, periodic_boundary_conditions, make_time_mpo,
    infinite_temperature, ChainedAlg, UnionAlg,
)
from .algorithms.paramscan import (
    scan_groundstate_vumps, stack_hamiltonians, ScanResult,
)

# plotting recipes (reference utility/plotting.jl entanglementplot /
# transferplot)
from .utils.plotting import (
    entanglement_plot, transfer_plot, entanglement_plot_data,
    transfer_plot_data,
)

# reference-name compatibility surface (docs/parity.md maps every
# reference export, src/MPSKit.jl:16-55, to its home here)
from .compat import (
    MPSTensor, MPSBondTensor, MPOTensor, TransferMatrix, PeriodicArray,
    PeriodicVector, transfer_left, transfer_right, environments, leftenv,
    rightenv, add_util_leg, max_Ds, left_virtualspace, right_virtualspace,
    physicalspace, uniform_leftorth, uniform_rightorth,
    effective_excitation_hamiltonian,
)

# reference-name aliases: the reference exports these under one-word
# names; the idiomatic names here differ
entanglementplot = entanglement_plot
transferplot = transfer_plot

# abelian symmetry (charge-sector states)
from .symmetry import (
    SymmetricFiniteMPS,
    sector_entanglement_spectrum,
)
from .symmetry.charges import (
    SymmetricInfiniteMPS,
    find_groundstate_symmetric,
    find_groundstate_symmetric_infinite,
)

# SparseMPO: the reference's sparse FSM container role is played by
# MPOHamiltonian's dense-stacked FSM + static structure metadata
# (operators/mpo.py; reference src/operators/sparsempo/sparsempo.jl)
SparseMPO = MPOHamiltonian
# QP: union of the quasiparticle containers (reference
# states/quasiparticle_state.jl:170), usable with isinstance()
QP = (LeftGaugedQP, RightGaugedQP, FiniteQP, FiniteQPRight)

# models (fixtures / model zoo)
from . import models

__version__ = "0.1.0"
