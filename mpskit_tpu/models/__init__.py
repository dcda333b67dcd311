from .spins import pauli, spinmatrices
from .hamiltonians import (
    transverse_field_ising,
    heisenberg_XXX,
    heisenberg_XXZ,
    bilinear_biquadratic_model,
)
from .fermions import kitaev_chain, free_fermions, hubbard
from .statmech import (classical_ising, finite_classical_ising, sixvertex,
                       hard_hexagon, hard_hexagon_fibonacci)
