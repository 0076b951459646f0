"""Multi-host (pod) orchestration helpers.

Single-controller JAX over DCN (SURVEY.md §5): each host process runs the same
program, `jax.distributed.initialize()` wires the runtime, the global mesh
spans all chips, and host-side data loading is sharded per process.  The
reference has no distributed backend at all; these helpers are the TPU-native
equivalent for multi-host pods.

Usage in a pod launcher:

    from mixstage_tpu.parallel import multihost
    multihost.setup()                      # no-op on single host
    intervals = multihost.shard_for_process(all_intervals)
"""

from __future__ import annotations

import os
from typing import List, Sequence, TypeVar

T = TypeVar("T")


def setup(coordinator_address: str | None = None,
          num_processes: int | None = None,
          process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    With no arguments, relies on the TPU pod environment auto-detection; the
    explicit arguments are for DCN clusters.
    """
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def shard_for_process(items: Sequence[T]) -> List[T]:
    """Round-robin shard of a host-side work list (e.g. interval ids) for this
    process — each host loads only its slice of the data."""
    return list(items)[process_index()::process_count()]
