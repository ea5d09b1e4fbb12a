"""Mesh/sharding utilities — the parallelism layer the reference lacks
(SURVEY §2.4: no DP/TP/PP anywhere in Brevitas).

Design: one `jax.sharding.Mesh` with named axes (data, model); parameters get
PartitionSpecs by path-pattern rules; XLA GSPMD inserts the collectives.
Per-channel quantizer scales shard with their channel axis; per-tensor scales
and counters replicate; activation-stats reductions become global via the
mesh-axis hooks already built into brevitas_tpu.core.stats.
"""

from brevitas_tpu.parallel.mesh import (
    make_mesh,
    replicate_model,
    shard_model_by_rules,
)
from brevitas_tpu.parallel.multihost import (
    global_batch_array,
    global_mesh,
    host_local_batch_slice,
    initialize,
)
from brevitas_tpu.parallel.pipeline import (
    onef1b_schedule,
    pipeline_apply,
    pipeline_train_step,
    stack_stage_params,
    stack_stage_params_padded,
)
from brevitas_tpu.parallel.sequence import sequence_sharding, shard_sequence

__all__ = ["make_mesh", "shard_model_by_rules", "replicate_model",
           "pipeline_apply", "pipeline_train_step", "onef1b_schedule",
           "stack_stage_params", "stack_stage_params_padded",
           "sequence_sharding", "shard_sequence",
           "initialize", "global_mesh", "host_local_batch_slice",
           "global_batch_array"]
