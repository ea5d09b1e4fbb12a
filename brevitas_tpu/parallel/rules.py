"""Canonical sharding rule sets for quant models.

The key quantization-specific constraint: per-channel scale/zero-point state
must shard WITH its channel axis (a weight sharded over output channels needs
its (1, ..., O) scale sharded the same way), while per-tensor scales, EMA
buffers, and counters replicate. Channels-last layouts make the rule regular:
the output channel is always the LAST kernel axis.
"""

from typing import List, Sequence, Tuple

from jax.sharding import PartitionSpec as P


def fsdp_rules(data_axis: str = "data") -> List[Tuple[str, P]]:
    """Fully-replicated parameters (pure data parallel): no rules — all
    state replicates; the batch shards over ``data_axis`` at the step level."""
    return []


def tensor_parallel_linear_rules(model_axis: str = "model",
                                 prefix: str = "") -> List[Tuple[str, P]]:
    """Column-parallel QuantLinear kernels: (in, out) shards over out;
    per-channel weight-scale params (1, out) and bias (out,) follow."""
    p = prefix
    return [
        (rf"{p}.*weight_quant/scaling/value", P(None, model_axis)),
        (rf"{p}.*weight$", P(None, model_axis)),
        (rf"{p}.*bias$", P(model_axis)),
    ]


def tensor_parallel_conv_rules(model_axis: str = "model",
                               prefix: str = "") -> List[Tuple[str, P]]:
    """Conv HWIO kernels shard over O (last axis); per-channel scales
    (1,...,1,O) follow."""
    p = prefix
    return [
        (rf"{p}.*weight_quant/scaling/value", P(None, None, None, model_axis)),
        (rf"{p}.*conv.*weight$", P(None, None, None, model_axis)),
    ]


def tensor_parallel_int_serving_rules(model_axis: str = "model",
                                      prefix: str = "") -> List[Tuple[str, P]]:
    """Column-parallel INTEGER-SERVING twins (``graph/convert_int.py``):
    the cached int8 kernel shards over output channels, and everything
    per-output-channel follows — the dequant ``w_scale``, the folded
    ``bias`` (which absorbs the zero-point colsum correction), and the
    packed-int4 bytes. The per-tensor input scale / clip bounds replicate.
    GSPMD inserts the all-gather (or converts to a row-parallel psum) where
    a following layer consumes the feature-sharded output — integer
    accumulation stays per-shard, only the fp32 epilogue crosses the mesh."""
    p = prefix
    return [
        (rf"{p}.*w_int$", P(None, model_axis)),              # linear (in, O)
        (rf"{p}.*w_int$", P(None, None, None, model_axis)),  # conv HWIO
        (rf"{p}.*w_packed$", P(None, model_axis)),
        (rf"{p}.*w_scale$", P(model_axis)),
        (rf"{p}.*bias$", P(model_axis)),
    ]


def tensor_parallel_attention_serving_rules(
        model_axis: str = "model", prefix: str = "") -> List[Tuple[str, P]]:
    """Head-parallel Int8InferenceAttention (Megatron layout): q/k/v
    projection int8 kernels shard column-parallel over output features —
    head-major, so whole heads land per shard — and out_proj shards
    row-parallel over its input features. The int32 out_proj accumulation
    is psum'd by GSPMD BEFORE the fp32 dequant epilogue, so the result is
    bit-equal to single-device serving. out_proj's per-output scale/bias
    and the per-tensor q/k/v/probs scales replicate."""
    p = prefix
    return [
        (rf"{p}.*(q|k|v)_proj/w_int$", P(None, model_axis)),
        (rf"{p}.*(q|k|v)_proj/w_packed$", P(None, model_axis)),
        (rf"{p}.*(q|k|v)_proj/w_scale$", P(model_axis)),
        (rf"{p}.*(q|k|v)_proj/bias$", P(model_axis)),
        (rf"{p}.*out_proj/w_int$", P(model_axis, None)),
    ]


def expert_parallel_rules(expert_axis: str = "expert",
                          prefix: str = "") -> List[Tuple[str, P]]:
    """QuantMoE expert parallelism: the stacked expert weights (E, D, H) /
    (E, H, D), their per-(expert, channel) scale folds (1, E*B) — whose
    blocks are expert-major, so sharding the fold's last axis over
    ``expert_axis`` keeps each expert's scales with its weights — and the
    stacked biases all shard over the expert axis. The router replicates."""
    p = prefix
    return [
        (rf"{p}.*w1_quant/scaling/value", P(None, expert_axis)),
        (rf"{p}.*w2_quant/scaling/value", P(None, expert_axis)),
        (rf"{p}.*\bw1$", P(expert_axis, None, None)),
        (rf"{p}.*\bw2$", P(expert_axis, None, None)),
        (rf"{p}.*\bb1$", P(expert_axis, None, None)),
        (rf"{p}.*\bb2$", P(expert_axis, None, None)),
    ]
