"""Sequence parallelism: shard ACTIVATIONS along the sequence axis.

Unlike DP/TP/PP (which shard batch, weights, and layers), sequence
parallelism splits the token axis of (batch, seq, dim) activations across a
mesh axis. Everything token-local — LayerNorm, MLPs, per-tensor fake-quant,
routers — then runs on 1/N of the tokens per device with zero communication;
XLA inserts the (all-)gathers only where an op genuinely mixes tokens
(attention scores, global stats). Activation-quantizer state (scales, EMA
buffers, counters) is per-tensor or per-feature, never per-token, so it
replicates untouched; pair with ``stats_reduce_mesh_axis`` on the quant
config if calibration stats must see all tokens.

This is a constraint-based helper (GSPMD does the partitioning) rather than
a shard_map: quant models freely mix token-local and token-mixing ops, and
the compiler's placement is what you want.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

Array = jnp.ndarray


def sequence_sharding(mesh: Mesh, seq_axis: str = "seq",
                      batch_axis: Optional[str] = None) -> NamedSharding:
    """NamedSharding for (batch, seq, dim) activations with the sequence
    dimension split over ``seq_axis`` (and optionally batch over
    ``batch_axis``)."""
    return NamedSharding(mesh, P(batch_axis, seq_axis, None))


def shard_sequence(x: Array, mesh: Mesh, seq_axis: str = "seq",
                   batch_axis: Optional[str] = None) -> Array:
    """Constrain a (batch, seq, dim) activation to be sequence-sharded.

    Insert at layer boundaries inside a jitted forward; XLA propagates the
    layout through token-local ops and gathers only at token-mixing ones.
    The mesh axis size must divide the sequence length.
    """
    return jax.lax.with_sharding_constraint(
        x, sequence_sharding(mesh, seq_axis, batch_axis))
