from .spins import pauli, spinmatrices
from .hamiltonians import (
    transverse_field_ising,
    transverse_field_ising_lattice,
    heisenberg_XXX,
    heisenberg_XXZ,
    heisenberg_XYZ,
    bilinear_biquadratic_model,
    xy_model,
    quantum_potts,
    quantum_clock,
    bose_hubbard,
)
from .fermions import kitaev_chain, free_fermions, hubbard
from .statmech import (classical_ising, finite_classical_ising, sixvertex,
                       hard_hexagon, hard_hexagon_fibonacci)
from .anyons import (golden_chain, ising_anyon_chain, anyon_chain,
                     anyon_chain_finite, rsos_chain)
