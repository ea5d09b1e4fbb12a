"""Multi-host (multi-process) runtime glue.

The reference has no distributed runtime at all (SURVEY §2.4: zero hits for
torch.distributed/NCCL/MPI). On TPU pods the runtime contract is:

1. every host process calls :func:`initialize` once before touching devices;
2. a single global :class:`jax.sharding.Mesh` spans all hosts' devices
   (:func:`global_mesh`), laid out so the trailing mesh axes stay within a
   host/slice (ICI) and only the leading data axis crosses DCN;
3. each host feeds only its local batch shard
   (:func:`host_local_batch_slice` /
   ``jax.make_array_from_process_local_data``), and XLA's GSPMD inserts the
   cross-host collectives — including the quant-stat psums from
   ``core/stats.py stats_reduce_mesh_axis``.

Single-process (CPU tests, one chip) degenerates gracefully: ``initialize``
is a no-op and the "global" mesh is just the local one.
"""

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "global_mesh", "host_local_batch_slice",
           "process_count", "process_index", "global_batch_array"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (jax.distributed.initialize).

    On Cloud TPU the arguments auto-detect from the metadata server; on other
    clusters pass coordinator/process info (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). Safe to call in single-process runs:
    with one process and no coordinator it is a no-op."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid else None
    if coordinator_address is None and (num_processes or 1) <= 1:
        return  # single process — nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(axis_sizes: Sequence[Tuple[str, int]]) -> Mesh:
    """Mesh over ALL processes' devices.

    Axis sizes multiply to the global device count; a size of -1 on one axis
    infers it. Axes are laid out major-to-minor over the device list, so put
    the cross-host (DCN) axis FIRST — jax orders ``jax.devices()`` by
    process — and model/ICI axes after it."""
    devices = np.asarray(jax.devices())
    names = [n for n, _ in axis_sizes]
    sizes = [s for _, s in axis_sizes]
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"{known}")
        sizes[sizes.index(-1)] = len(devices) // known
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != "
                         f"{len(devices)} devices")
    return Mesh(devices.reshape(sizes), tuple(names))


def host_local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this process feeds."""
    n, i = jax.process_count(), jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)


def global_batch_array(local_data: np.ndarray, mesh: Mesh,
                       pspec: P = P("data")) -> jax.Array:
    """Assemble a global (sharded) array from each process's local shard —
    the multi-host input-feeding step
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_data)
