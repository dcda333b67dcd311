from .dmrg import DMRG, find_groundstate_dmrg
from .rsdmrg import RealSpaceParallelDMRG, find_groundstate_rsdmrg
from .dmrg2 import DMRG2, find_groundstate_dmrg2
from .vumps import VUMPS, find_groundstate_vumps
from .idmrg import (
    IDMRG1, IDMRG2, find_groundstate_idmrg1, find_groundstate_idmrg2,
)
from .grassmann import GradientGrassmann, find_groundstate_grassmann
from .paramscan import (
    scan_groundstate_vumps, stack_hamiltonians, stack_states, unstack_states,
    ScanResult,
)
from .find_groundstate import find_groundstate
from .unionalg import ChainedAlg, UnionAlg
from .statmech import leading_boundary, VUMPS_Boundary, VOMPS
from .tdvp import TDVP, TDVP2, timestep
from .time_evolve import time_evolve
from .timeevmpo import make_time_mpo, WI, WII, TaylorCluster
from .excitations import QuasiparticleAnsatz, excitations
from .dmrgexcitation import FiniteExcited
from .changebonds import (
    changebonds, SvdCut, RandExpand, OptimalExpand, VUMPSSvdCut,
)
from .approximate import approximate, FitDMRG, FitDMRG2, FitIDMRG, FitIDMRG2
from .propagator import propagator, DynamicalDMRG, NaiveInvert, Jeckelmann
from .expval import expectation_value, infinite_temperature
from .correlators import correlator
from .toolbox import (
    entropy,
    entropy_profile,
    entanglement_spectrum,
    calc_galerkin,
    transfer_spectrum,
    marek_gap,
    correlation_length,
    variance,
    exact_diagonalization,
    periodic_boundary_conditions,
    fidelity_susceptibility,
)
