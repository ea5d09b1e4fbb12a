"""Graph transforms: PTQ calibration/bias-correction, equalization,
auto-quantization, BN fusion, integer-serving conversion
(reference layer 5, ``src/brevitas/graph/``)."""

from brevitas_tpu.graph.base import (
    find_modules,
    get_module,
    named_modules,
    replace_modules_by_class,
    set_module,
)
from brevitas_tpu.graph.calibrate import (
    bias_correction_mode,
    cache_inference_quant_weights,
    calibration_mode,
    clear_inference_quant_weight_cache,
    clip_float_weights,
    finalize_collect_stats,
)
from brevitas_tpu.graph.convert_int import (
    DynamicInt8InferenceLinear,
    WeightOnlyInt4InferenceLinear,
    Fp8InferenceLinear,
    Int8InferenceAttention,
    Int8InferenceConv,
    Int8InferenceLinear,
    convert_integer_inference,
)
from brevitas_tpu.graph.equalize import (
    absorb_bias_by_batch_norm,
    apply_act_equalization,
    cross_layer_equalization,
    equalize,
    sequential_regions,
    split_batch_norm,
)
from brevitas_tpu.graph.autograph import (
    extract_act_equalization_regions,
    extract_regions,
    find_bn_pairs,
    trace_module_graph,
)
from brevitas_tpu.graph.flexml import preprocess_flexml, quantize_flexml
from brevitas_tpu.graph.gpfq import apply_gpfq, eligible_for_gpfq
from brevitas_tpu.graph.awq import apply_awq
from brevitas_tpu.graph.gptq import apply_gptq, eligible_for_gptq
from brevitas_tpu.graph.learned_round import (
    apply_learned_round,
    eligible_for_learned_round,
)
from brevitas_tpu.graph.per_input import (
    adaptive_avgpool_to_avgpool,
    avgpool_to_depthwise_conv,
    bn_to_quant_scale_bias,
)
from brevitas_tpu.graph.quantize import (
    discover_bn_pairs,
    merge_batchnorms,
    quantize,
    refresh_weight_quantizers,
)
from brevitas_tpu.graph.rotate import (
    apply_rotation,
    hadamard_matrix,
    random_hadamard,
    transformer_rotation_pairs,
)
from brevitas_tpu.graph.standardize import (
    disable_last_return_quant_tensor,
    duplicate_shared_stateless_modules,
)

__all__ = [
    "named_modules", "get_module", "set_module", "find_modules",
    "replace_modules_by_class",
    "calibration_mode", "bias_correction_mode", "finalize_collect_stats",
    "clip_float_weights",
    "cache_inference_quant_weights", "clear_inference_quant_weight_cache",
    "equalize", "cross_layer_equalization", "sequential_regions",
    "absorb_bias_by_batch_norm", "split_batch_norm", "apply_act_equalization",
    "apply_gptq", "eligible_for_gptq", "apply_awq",
    "apply_gpfq", "eligible_for_gpfq",
    "apply_learned_round", "eligible_for_learned_round",
    "discover_bn_pairs",
    "apply_rotation", "random_hadamard", "hadamard_matrix",
    "transformer_rotation_pairs",
    "quantize", "merge_batchnorms", "refresh_weight_quantizers",
    "preprocess_flexml", "quantize_flexml",
    "trace_module_graph", "find_bn_pairs", "extract_regions",
    "extract_act_equalization_regions",
    "adaptive_avgpool_to_avgpool", "avgpool_to_depthwise_conv",
    "bn_to_quant_scale_bias",
    "convert_integer_inference", "Int8InferenceLinear", "Int8InferenceConv",
    "Int8InferenceAttention", "Fp8InferenceLinear",
    "DynamicInt8InferenceLinear", "WeightOnlyInt4InferenceLinear",
    "duplicate_shared_stateless_modules", "disable_last_return_quant_tensor",
]
