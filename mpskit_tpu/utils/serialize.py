"""Checkpoint / resume for states and environments.

The reference has no built-in serialization (SURVEY.md §5: its extension
point is the `finalize` hook); here pytree states checkpoint to .npz
directly, and every iterative algorithm accepts a `finalize(iter, psi, H)`
hook where `save_state` can be called.

Covered containers: FiniteMPS, InfiniteMPS, WindowMPS, MPSMultiline,
LeftGaugedQP, SymmetricFiniteMPS, SymmetricInfiniteMPS,
AnyonicInfiniteMPS (categories are reconstructed by name from the
built-in registry: Fibonacci / Ising / Zn / su2_k).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _category_by_name(name: str):
    from ..symmetry.category import (
        fibonacci_category, ising_category, zn_category, su2k_category,
    )

    if name == "Fibonacci":
        return fibonacci_category()
    if name == "Ising":
        return ising_category()
    if name.startswith("Z") and name[1:].isdigit():
        return zn_category(int(name[1:]))
    if name.startswith("su2_"):
        return su2k_category(int(name[4:]))
    raise TypeError(f"cannot reconstruct category {name!r} by name; "
                    "checkpoint custom categories yourself")


def save_state(path: str, psi) -> None:
    """Save any supported state container to .npz with its static aux
    data. Leaves are stored in pytree order."""
    tname = type(psi).__name__
    arrays = {"__type__": np.array(tname)}
    # wrapper dataclasses (not pytrees themselves): flatten their state
    if tname in ("SymmetricFiniteMPS", "SymmetricInfiniteMPS",
                 "AnyonicInfiniteMPS"):
        leaves, _ = jax.tree_util.tree_flatten(psi.state)
    else:
        leaves, _ = jax.tree_util.tree_flatten(psi)
    arrays.update({f"leaf_{i}": np.asarray(l)
                   for i, l in enumerate(leaves)})
    if tname == "FiniteMPS":
        arrays["__center__"] = np.array(psi.center)
    elif tname == "WindowMPS":
        arrays["__center__"] = np.array(psi.window.center)
    elif tname == "MPSMultiline":
        arrays["__nrows__"] = np.array(len(psi.rows))
    elif tname == "LeftGaugedQP":
        arrays["__momentum__"] = np.asarray(psi.momentum)
        arrays["__trivial__"] = np.array(bool(psi.trivial))
    elif tname in ("SymmetricFiniteMPS", "SymmetricInfiniteMPS"):
        arrays["__bond_charges__"] = np.stack(
            [np.asarray(c) for c in psi.bond_charges])
        arrays["__phys_charges__"] = np.asarray(psi.phys_charges, int)
        if tname == "SymmetricFiniteMPS":
            arrays["__center__"] = np.array(psi.state.center)
    elif tname == "AnyonicInfiniteMPS":
        arrays["__labels__"] = np.asarray(psi.labels, int)
        arrays["__anyon__"] = np.array(psi.anyon)
        arrays["__cat__"] = np.array(psi.cat.name)
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
    if tname == "WindowMPS":
        from ..states.windowmps import WindowMPS

        return WindowMPS(InfiniteMPS(*leaves[0:4]),
                         FiniteMPS(leaves[4], leaves[5], leaves[6],
                                   int(data["__center__"])),
                         InfiniteMPS(*leaves[7:11]))
    if tname == "MPSMultiline":
        from ..states.multiline import MPSMultiline

        nrows = int(data["__nrows__"])
        rows = tuple(InfiniteMPS(*leaves[4 * r: 4 * r + 4])
                     for r in range(nrows))
        return MPSMultiline(rows)
    if tname == "LeftGaugedQP":
        from ..states.quasiparticle import LeftGaugedQP

        # leaf order: Xs, VLs, left_gs (4), right_gs (4)
        return LeftGaugedQP(leaves[0], leaves[1],
                            InfiniteMPS(*leaves[2:6]),
                            InfiniteMPS(*leaves[6:10]),
                            jnp.asarray(data["__momentum__"]),
                            bool(data["__trivial__"]))
    if tname in ("SymmetricFiniteMPS", "SymmetricInfiniteMPS"):
        from ..symmetry.charges import (
            SymmetricFiniteMPS, SymmetricInfiniteMPS,
        )

        charges = tuple(np.asarray(row)
                        for row in data["__bond_charges__"])
        phys = tuple(int(q) for q in data["__phys_charges__"])
        if tname == "SymmetricFiniteMPS":
            st = FiniteMPS(leaves[0], leaves[1], leaves[2],
                           int(data["__center__"]))
            return SymmetricFiniteMPS(st, charges, phys)
        return SymmetricInfiniteMPS(InfiniteMPS(*leaves), charges, phys)
    if tname == "AnyonicInfiniteMPS":
        from ..symmetry.anyonic import AnyonicInfiniteMPS

        return AnyonicInfiniteMPS(
            InfiniteMPS(*leaves), _category_by_name(str(data["__cat__"])),
            int(data["__anyon__"]),
            tuple(tuple(int(x) for x in row) for row in data["__labels__"]))
    raise TypeError(f"unknown state type {tname}")
