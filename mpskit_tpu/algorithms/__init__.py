from .dmrg import DMRG, find_groundstate_dmrg
from .expval import expectation_value
