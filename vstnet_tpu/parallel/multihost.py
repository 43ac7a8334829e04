"""Multi-host (pod / multi-slice) scaffolding.

The reference is strictly single-device (SURVEY §5); the single-host
multi-chip layer (mesh.py/sharding.py) covers the v5e-8 north star. This
module adds the pod story so a multi-host run is a matter of environment
variables, not code changes:

  * `init_distributed()` — env-gated `jax.distributed.initialize`. On TPU
    pods the runtime autodetects coordinator/process topology from the TPU
    metadata; elsewhere (or to force values) set:
        VSTNET_COORDINATOR   host:port of process 0
        VSTNET_NUM_PROCESSES total process count
        VSTNET_PROCESS_ID    this process's index
    Unset -> single-host mode, returns False, nothing happens.
  * `global_mesh()` — a Mesh over jax.devices(), which after distributed
    init enumerates EVERY chip in the job (mesh.py's make_mesh semantics,
    now spanning hosts; ICI/DCN collective routing is XLA's job once the
    sharding is declared).
  * `process_batch_bounds()` — which rows of the global batch this process
    must produce (loaders are per-host; each host feeds only its slice).
  * `host_local_to_global()` — assemble a global sharded array from this
    process's local rows (`jax.make_array_from_process_local_data`), the
    multi-host replacement for `shard_batch`'s single-host device_put.

Single-process behavior is identical to the existing helpers (tested);
multi-process execution cannot run in this environment, so the logic is
pure/deterministic and unit-tested at the structure level, mirroring how
the 8-virtual-device dryrun stands in for 8 real chips.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when configured; no-op
    otherwise. Idempotent. Returns True iff the runtime is (now) live.

    Call this FIRST — before any jax.devices()/backend use — in every
    process of a pod job (the trainer and video CLI do)."""
    coordinator = coordinator or os.environ.get("VSTNET_COORDINATOR")
    if num_processes is None:
        n = os.environ.get("VSTNET_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("VSTNET_PROCESS_ID")
        process_id = int(p) if p else None

    from jax._src import distributed as _dist  # no public is-initialized API

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # idempotent: already initialized
    if coordinator is None and num_processes is None and process_id is None:
        # On real TPU pod slices jax can autodetect everything, but a
        # silent network wait on a workstation is worse than an explicit
        # opt-in: require at least the coordinator env var.
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axes: Sequence[str] = ("data",), spatial: int = 1) -> Mesh:
    """Mesh over every device in the job (all processes). Equals
    make_mesh() on a single host; spans hosts after init_distributed."""
    from vstnet_tpu.parallel.mesh import make_mesh

    return make_mesh(len(jax.devices()), axes=axes, spatial=spatial)


def process_batch_bounds(global_batch: int,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None
                         ) -> Tuple[int, int]:
    """[start, stop) rows of the global batch this process feeds.

    Pure arithmetic (testable without multi-process execution): equal
    contiguous slices, matching how GSPMD lays a batch-sharded array over
    processes in device order."""
    n = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    if not 0 <= pid < n:
        raise ValueError(f"process_id {pid} outside [0, {n})")
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes")
    per = global_batch // n
    return pid * per, (pid + 1) * per


def host_local_to_global(mesh: Mesh, local_rows, axis: str = "data"):
    """This process's local batch rows -> one global array sharded over
    `axis`. On a single process this equals shard_batch(mesh, x)."""
    spec = P(axis, *([None] * (local_rows.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_rows)
