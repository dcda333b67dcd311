from .finitemps import FiniteMPS, physical_bond_dims
from .infinitemps import InfiniteMPS
from .windowmps import WindowMPS
from .multiline import MPSMultiline
from .quasiparticle import LeftGaugedQP, FiniteQP
