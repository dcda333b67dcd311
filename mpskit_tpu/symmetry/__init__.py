from .charges import (
    assign_bond_charges,
    charge_masks_finite,
    SymmetricFiniteMPS,
    sector_entanglement_spectrum,
)
from .fibonacci import (
    FibonacciInfiniteMPS,
    leading_boundary_fibonacci,
    anyonic_entropy,
    fibonacci_bond_labels,
)
