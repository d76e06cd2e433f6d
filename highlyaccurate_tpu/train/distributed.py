"""Multi-host initialization and per-host data feeding.

The reference has no distributed path at all (SURVEY.md §2.2 P9 / §5.8); this
is the new TPU-native layer.  Recipe (scaling-book style): initialize the
runtime, build one global mesh over all chips, keep params replicated, shard
the batch, and let XLA place the gradient psum on ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.
    """
    import jax
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def global_batch_from_host_shards(mesh, host_batch: dict):
    """Assemble a globally-sharded batch from this host's local shard.

    Each host loads ``global_batch_size / process_count`` samples;
    ``make_array_from_process_local_data`` stitches them into one global
    jax.Array sharded along the mesh 'data' axis.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in host_batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.make_array_from_process_local_data(s, v)
        else:
            out[k] = v
    return out


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (no-op single-process).

    Needed between a checkpoint save (process 0 writes — see
    checkpoint.save_params's multi-host contract) and a restore on any
    other process reading the same path off the shared filesystem.
    """
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def local_batch_slice(global_batch_size: int) -> int:
    """Per-host batch size for the current process."""
    import jax
    n = jax.process_count()
    assert global_batch_size % n == 0, \
        f"global batch {global_batch_size} not divisible by {n} hosts"
    return global_batch_size // n
