from .transfer import (
    transfer_left,
    transfer_right,
    transfer_left_mpo,
    transfer_right_mpo,
    mps_transfer_matvec_left,
    mps_transfer_matvec_right,
)
