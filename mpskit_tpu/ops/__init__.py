from .fsm_kernels import ac_apply_pallas, pallas_available
