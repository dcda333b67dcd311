from .finite import (
    FiniteEnv,
    finite_environments,
    left_boundary,
    right_boundary,
    compute_left_envs,
    compute_right_envs,
)
