"""Device-mesh construction.

The reference's parallel substrate is an OpenMP thread team over CSV rows and
MC paths (PredictionGen.cpp:542-546, BranchingProcessPricer.cpp:52-54) with
no distributed backend at all (SURVEY.md section 2).  The TPU equivalent is a
1-D `jax.sharding.Mesh` over all chips with two interchangeable uses:

  * `paths` sharding — one big option, MC paths split across chips, payoff
    means and regression moments reduced with psum over ICI
    (parallel.sharded);
  * `rows` sharding — many options, whole rows split across chips, no
    cross-chip reduction (pipeline.driver).

Multi-host: call `init_distributed()` (jax.distributed) before `make_mesh`;
collectives then ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available")
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading axis over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(**kwargs) -> None:
    """Multi-host initialization (jax.distributed.initialize passthrough).

    Only double-initialization is tolerated (a no-op); genuine failures —
    bad coordinator address, port conflicts, timeouts — re-raise, because
    silently continuing single-host would make every psum cover a fraction
    of the intended paths and return wrong results."""
    import logging

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return
        logging.getLogger(__name__).error(
            "jax.distributed.initialize failed: %s", e)
        raise
