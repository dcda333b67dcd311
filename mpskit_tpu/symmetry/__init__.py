from .charges import (
    assign_bond_charges,
    charge_masks_finite,
    SymmetricFiniteMPS,
    sector_entanglement_spectrum,
)
