"""Data-parallel step construction + multi-host eval batching.

The scaling capabilities the reference lacks (SURVEY §2.4): a jitted train
step whose batch shards over the mesh data axis (XLA inserts the gradient
all-reduce), and an eval batcher that feeds per-host shards of a global batch
(the BASELINE north-star's "continuous batching of eval/inference across
hosts").
"""

from functools import partial
from typing import Callable, Iterator, Optional, Tuple

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a (global) batch with its leading dim sharded over the data
    axis; other dims replicated."""
    def put(x):
        spec = P(data_axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def make_data_parallel_step(loss_fn: Callable, mesh: Mesh,
                            data_axis: str = "data"):
    """Build a jitted DP train step: params replicated (or pre-sharded by
    rules), batch sharded over ``data_axis``; GSPMD emits the psum for the
    gradient reduction. ``loss_fn(model, batch) -> scalar``."""

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(loss_fn)(model, batch)
        optimizer.update(model, grads)
        return loss

    def run(model, optimizer, batch):
        with jax.set_mesh(mesh):
            return step(model, optimizer, shard_batch(batch, mesh, data_axis))

    return run


def host_eval_batches(x: np.ndarray, y: np.ndarray, global_batch: int,
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield this host's shard of each global eval batch. On a multi-host
    pod each process feeds its slice; jax.make_array_from_process_local_data
    assembles the global array (single-host: yields full batches)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(
            f"global_batch {global_batch} must divide evenly across "
            f"{pc} processes (a remainder would silently drop examples)")
    per_host = global_batch // pc
    # the dataset tail beyond the last full global batch is dropped — pad the
    # dataset or pick a dividing batch size to evaluate every example
    n = (len(x) // global_batch) * global_batch
    for i in range(0, n, global_batch):
        lo = i + pi * per_host
        yield x[lo:lo + per_host], y[lo:lo + per_host]
