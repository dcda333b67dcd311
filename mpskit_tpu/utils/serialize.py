"""Checkpoint / resume for states and environments.

The reference has no built-in serialization (SURVEY.md §5: its extension
point is the `finalize` hook); here pytree states checkpoint to .npz
directly, and every iterative algorithm accepts a `finalize(iter, psi, H)`
hook where `save_state` can be called.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


_STATE_TYPES = {}


def _register(cls):
    _STATE_TYPES[cls.__name__] = cls
    return cls


def save_state(path: str, psi) -> None:
    """Save any registered pytree state (FiniteMPS, InfiniteMPS, ...) to
    .npz with its static aux data."""
    leaves, treedef = jax.tree_util.tree_flatten(psi)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__type__"] = np.array(type(psi).__name__)
    # FiniteMPS carries a static center
    if hasattr(psi, "center"):
        arrays["__center__"] = np.array(psi.center)
    np.savez(path, **arrays)


def load_state(path: str):
    from ..states.finitemps import FiniteMPS
    from ..states.infinitemps import InfiniteMPS

    data = np.load(path, allow_pickle=False)
    tname = str(data["__type__"])
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    if tname == "FiniteMPS":
        return FiniteMPS(leaves[0], leaves[1], leaves[2],
                         int(data["__center__"]))
    if tname == "InfiniteMPS":
        return InfiniteMPS(*leaves)
    raise TypeError(f"unknown state type {tname}")
