"""Multi-host (pod) utilities.

The reference coordinates hosts by polling the shared filesystem for npz files
(cld_jax/run_lib.py:511-513,560-617). Here cross-host coordination uses real
collectives over DCN via jax.experimental.multihost_utils, and process
identity comes from `jax.process_index()` (replacing `jax.host_id`).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Initialize JAX distributed (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "sync"):
    """Block until all hosts arrive (replaces filesystem polling)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def allgather_metrics(local: dict) -> dict:
    """Mean-reduce scalar metrics across hosts."""
    if jax.process_count() == 1:
        return dict(local)
    from jax.experimental import multihost_utils

    keys = sorted(local)
    vec = np.asarray([float(local[k]) for k in keys], dtype=np.float32)
    gathered = multihost_utils.process_allgather(vec)
    mean = np.asarray(gathered).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
