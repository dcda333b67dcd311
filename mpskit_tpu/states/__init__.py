from .finitemps import FiniteMPS, physical_bond_dims
from .infinitemps import InfiniteMPS
from .windowmps import WindowMPS
from .multiline import MPSMultiline
from .quasiparticle import (LeftGaugedQP, RightGaugedQP, FiniteQP,
                             FiniteQPRight)
from .qp_gauge import (left_to_right_gauge, right_to_left_gauge,
                       finite_left_to_right_gauge, finite_right_to_left_gauge)
