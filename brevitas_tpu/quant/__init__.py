"""Quantizer config DSL + NNX quantizer modules (reference layers 2-3)."""

from brevitas_tpu.quant import presets
from brevitas_tpu.quant.config import (
    BitWidthImplType,
    QuantConfig,
    QuantType,
    ScalingImplType,
    ZeroPointImplType,
)
from brevitas_tpu.quant.quantizers import (
    ActQuantizer,
    convert_runtime_stats_to_parameter,
    BiasQuantizer,
    ClampQuantizer,
    ParameterQuantizer,
    TruncQuantizer,
    WeightQuantizer,
)

__all__ = [
    "QuantConfig",
    "QuantType",
    "ScalingImplType",
    "BitWidthImplType",
    "ZeroPointImplType",
    "presets",
    "WeightQuantizer",
    "ParameterQuantizer",
    "ActQuantizer",
    "BiasQuantizer",
    "TruncQuantizer",
    "ClampQuantizer",
    "convert_runtime_stats_to_parameter",
]
