from .finitemps import FiniteMPS, physical_bond_dims
