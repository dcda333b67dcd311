from .basis import (
    basis_zeros,
    basis_get,
    basis_set,
    basis_inner_all,
    basis_combine,
)
from .lanczos import lanczos_groundstate, eigsh_smallest, lanczos_factorize
from .arnoldi import arnoldi_factorize, dominant_eigs, small_eig_dominant
from .gmres import linsolve
from .expm import expm_multiply, expm_multiply_arnoldi
