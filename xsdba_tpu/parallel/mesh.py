"""Device-mesh scaling for bias adjustment.

The reference parallelizes with dask blocks over spatial dims
(``base.py:563-726``, SURVEY §2.10): bias adjustment is embarrassingly
parallel over sites, with time kept whole per site (the reference enforces a
single chunk along the adjusted dim, ``adjustment.py:102-103`` — the same
invariant as "time fits on-device").

TPU-native equivalent: a 1-D (or 2-D site×var) ``jax.sharding.Mesh``; inputs
carry ``NamedSharding`` partitions over the site axis and the jitted cores are
compiled under the mesh — XLA partitions every op site-wise with zero
collectives on the adjustment path.  Collectives only appear in spatial
diagnostics (all-gather of site vectors; see ``properties``).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["site_mesh", "shard_sites", "site_sharding", "SITE_AXIS", "VAR_AXIS"]

SITE_AXIS = "site"
VAR_AXIS = "var"


def site_mesh(devices=None, n_var: int = 1) -> Mesh:
    """Build a mesh over the site axis (optionally site x var).

    ``n_var > 1`` reserves a second axis for multivariate methods whose
    rotation matmuls contract over variables (MBCn/NpdfTransform) — those
    ride ICI with psum; everything else is pure data parallelism.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_var > 1:
        if devices.size % n_var:
            raise ValueError(f"{devices.size} devices not divisible by n_var={n_var}")
        return Mesh(devices.reshape(devices.size // n_var, n_var), (SITE_AXIS, VAR_AXIS))
    return Mesh(devices.reshape(-1), (SITE_AXIS,))


def site_sharding(mesh: Mesh, ndim: int, site_axis: int = 0) -> NamedSharding:
    """NamedSharding that partitions axis ``site_axis`` over the site mesh
    axis and replicates the rest (time stays whole per shard)."""
    spec = [None] * ndim
    spec[site_axis] = SITE_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_sites(arr, mesh: Mesh, site_axis: int = 0):
    """Place ``arr`` on the mesh, partitioned along its site axis."""
    return jax.device_put(arr, site_sharding(mesh, np.ndim(arr), site_axis))
