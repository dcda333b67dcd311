"""Device-mesh sharding for tensor-network states and environments.

The reference's parallelism is shared-memory threads (SURVEY.md §2.7);
the TPU-native equivalents are:

- P1 site parallelism  -> the unit-cell axis is a batch axis (vmap),
  optionally sharded over a 'site' mesh axis.
- P2/P3 FSM-block parallelism -> the stacked dense FSM einsums batch all
  blocks onto the MXU in one shot.
- bond-dimension "tensor parallelism" -> the D x D virtual axes shard over
  the 'bond' mesh axis: every D^3 contraction in the Krylov matvecs spans
  the mesh and XLA inserts the psum/all-gather collectives over ICI.

Usage:
    mesh = make_mesh(bond=8)             # or make_mesh(site=2, bond=4)
    psi = shard_finite_mps(psi, mesh)
    envs GRs etc. via shard_env
Jitted sweeps then run sharded end-to-end; nothing else changes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(bond: Optional[int] = None, site: Optional[int] = None) -> Mesh:
    """Create a mesh over the available devices with 'bond' (and optional
    'site') axes. bond defaults to all devices."""
    devices = np.array(jax.devices())
    n = devices.size
    if bond is None and site is None:
        bond, site = n, 1
    elif bond is None:
        bond = n // site
    elif site is None:
        site = n // bond
    assert bond * site <= n, f"need {bond * site} devices, have {n}"
    devs = devices[: bond * site].reshape(site, bond)
    return Mesh(devs, ("site", "bond"))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_finite_mps(psi, mesh: Mesh):
    """Shard the right virtual-bond axis of the stacked tensors."""
    from ..states.finitemps import FiniteMPS

    s3 = NamedSharding(mesh, P(None, None, None, "bond"))
    sc = NamedSharding(mesh, P(None, None, "bond"))
    return FiniteMPS(
        jax.device_put(psi.ALs, s3),
        jax.device_put(psi.ARs, s3),
        jax.device_put(psi.AC, sc),
        psi.center,
    )


def shard_infinite_mps(psi, mesh: Mesh, shard_sites: bool = False):
    """Shard bond axes (and optionally the unit-cell axis) of an
    InfiniteMPS."""
    from ..states.infinitemps import InfiniteMPS

    site_ax = "site" if shard_sites else None
    s3 = NamedSharding(mesh, P(site_ax, None, None, "bond"))
    sc = NamedSharding(mesh, P(site_ax, None, "bond"))
    return InfiniteMPS(
        jax.device_put(psi.AL, s3),
        jax.device_put(psi.AR, s3),
        jax.device_put(psi.AC, s3),
        jax.device_put(psi.C, sc),
    )


def shard_env(G, mesh: Mesh):
    """Shard a stacked environment array (..., w, D, D) over its last axis."""
    spec = [None] * (G.ndim - 1) + ["bond"]
    return jax.device_put(G, NamedSharding(mesh, P(*spec)))
