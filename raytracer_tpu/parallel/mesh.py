"""Device-mesh construction for multi-chip / multi-host rendering.

The parallel decomposition of the pixel domain generalizes the
reference's progressive row cursor (reference: raytracer/mod.rs:87-115 —
the embarrassingly parallel seam identified in SURVEY §2): image tiles /
ray batches shard over a 1-D `rays` mesh axis; the scene is replicated
(small scenes) with scene-sharding reserved for a future `scene` axis.

On a real pod slice, call `initialize_distributed()` first on every
host; the mesh then spans all hosts with collectives riding ICI within
a slice and DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def initialize_distributed(**kwargs):
    """Multi-host bring-up (jax.distributed.initialize passthrough).

    Returns True when the distributed runtime is live after the call
    (newly initialized or already initialized), False for an explicit
    single-process run (no coordinator configured).  A real bring-up
    failure — coordinator unreachable, bad process ids — RAISES so a
    multi-host launch never degrades silently into N independent
    single-process renders."""
    import logging
    log = logging.getLogger(__name__)
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            log.info("jax.distributed already initialized")
            return True
        raise
    except ValueError as e:
        # jax raises ValueError when no coordinator address can be
        # derived (plain single-process environment): that is the one
        # benign case
        if kwargs.get("coordinator_address") is None:
            log.info("single-process run (no coordinator): %s", e)
            return False
        raise


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ray batches."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
