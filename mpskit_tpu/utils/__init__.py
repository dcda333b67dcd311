from .tree import tree_inner, tree_norm, tree_scale, tree_add, tree_conj, tree_real_if
from .dynamictols import updatetol
from .logging import IterLog
