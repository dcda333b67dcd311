from .mpo import MPOHamiltonian, DenseMPO, decompose_localmpo
from .lazysum import LazySum, MultipliedOperator, TimedOperator, UntimedOperator
from .projection import ProjectionOperator, LinearCombination
from .multiline import MPOMultiline
from .window import Window
