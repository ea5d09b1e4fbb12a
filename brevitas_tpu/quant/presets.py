"""Predefined quantizer configs — the user-facing catalog.

Name-for-name parity with the reference's predefined injectors:
``src/brevitas/quant/scaled_int.py`` (Int8WeightPerTensorFloat:144, ...),
``fixed_point.py`` (power-of-two variants), ``shifted_scaled_int.py``
(asymmetric), ``binary.py``/``ternary.py``, ``none.py`` (disabled stubs).
Each is a frozen QuantConfig; compose variants with ``.let(...)`` — e.g.
``Int8WeightPerTensorFloat.let(bit_width=4)`` is the 4-bit version, replacing
the reference's injector-subclassing idiom.
"""

from brevitas_tpu.core.quant import minifloat_max_val
from brevitas_tpu.core.restrict import FloatToIntImpl, RestrictType
from brevitas_tpu.core.stats import StatsOp
from brevitas_tpu.quant.config import (
    BitWidthImplType,
    QuantConfig,
    QuantType,
    ScalingImplType,
    ZeroPointImplType,
)

# ---------------------------------------------------------------------------
# building-block fragments (reference quant/base.py)
# ---------------------------------------------------------------------------

_INT = QuantConfig(quant_type=QuantType.INT, signed=True, narrow_range=False)
_NARROW_INT = _INT.let(narrow_range=True)
_UINT = _INT.let(signed=False)

_MAX_STATS = dict(scaling_impl=ScalingImplType.STATS,
                  scaling_stats_op=StatsOp.MAX, scaling_min_val=1e-10)
_MIN_MAX_STATS = dict(scaling_impl=ScalingImplType.STATS,
                      scaling_stats_op=StatsOp.MIN_MAX, scaling_min_val=1e-10)
_PARAM_FROM_PERCENTILE = dict(
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
    scaling_stats_op=StatsOp.PERCENTILE, high_percentile_q=99.999,
    collect_stats_steps=300, scaling_min_val=1e-10)
_PARAM_FROM_MIN_MAX = dict(
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
    scaling_stats_op=StatsOp.MIN_MAX, collect_stats_steps=300,
    scaling_min_val=1e-10)
_PARAM_FROM_PERCENTILE_INTERVAL = dict(
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
    scaling_stats_op=StatsOp.PERCENTILE_INTERVAL,
    high_percentile_q=99.999, low_percentile_q=0.001,
    collect_stats_steps=300, scaling_min_val=1e-10)
_PO2 = dict(restrict_scaling=RestrictType.POWER_OF_TWO,
            restrict_scaling_float_to_int=FloatToIntImpl.CEIL)

# ---------------------------------------------------------------------------
# weights (reference quant/scaled_int.py:144-168, fixed_point.py:23,
# shifted_scaled_int.py:35-69)
# ---------------------------------------------------------------------------

Int8WeightPerTensorFloat = _NARROW_INT.let(bit_width=8, **_MAX_STATS)
Int8WeightPerChannelFloat = Int8WeightPerTensorFloat.let(
    scaling_per_output_channel=True)
Int4WeightPerTensorFloat = Int8WeightPerTensorFloat.let(bit_width=4)
Int4WeightPerChannelFloat = Int8WeightPerChannelFloat.let(bit_width=4)

Int8WeightPerTensorFixedPoint = Int8WeightPerTensorFloat.let(**_PO2)
Int8WeightPerChannelFixedPoint = Int8WeightPerChannelFloat.let(**_PO2)

# MSE-searched clipping thresholds (later-Brevitas MSE stats-op family)
Int8WeightPerTensorFloatMSE = Int8WeightPerTensorFloat.let(
    scaling_stats_op=StatsOp.MSE)
Int8WeightPerChannelFloatMSE = Int8WeightPerChannelFloat.let(
    scaling_stats_op=StatsOp.MSE)
Int4WeightPerChannelFloatMSE = Int8WeightPerChannelFloatMSE.let(bit_width=4)

ShiftedUint8WeightPerTensorFloat = _UINT.let(
    bit_width=8, **_MIN_MAX_STATS,
    zero_point_impl=ZeroPointImplType.STATS,
    zero_point_stats_op=StatsOp.MIN, quantize_zero_point=True)
ShiftedUint8WeightPerChannelFloat = ShiftedUint8WeightPerTensorFloat.let(
    scaling_per_output_channel=True)

# decoupled (weight-normalization-flavoured) quantizers
# (reference quant/base.py:219-279, scaled_int.py:207)
Int8WeightPerChannelFloatDecoupled = _NARROW_INT.let(
    bit_width=8, decoupled=True, clamp_ste=True,
    scaling_per_output_channel=True,
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
    scaling_stats_op=StatsOp.MAX, pre_scaling_stats_op=StatsOp.MAX)
Int4WeightPerTensorFloatDecoupled = _NARROW_INT.let(
    bit_width=4, decoupled=True, clamp_ste=True,
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
    scaling_stats_op=StatsOp.MAX_L2, pre_scaling_stats_op=StatsOp.MAX_L2)
Int4WeightPerTensorFixedPointDecoupled = Int4WeightPerTensorFloatDecoupled.let(
    **_PO2)

# ---------------------------------------------------------------------------
# activations (reference scaled_int.py:170-194, fixed_point.py:37-76,
# shifted_scaled_int.py:18)
# ---------------------------------------------------------------------------

Int8ActPerTensorFloat = _INT.let(bit_width=8, **_PARAM_FROM_PERCENTILE)
Uint8ActPerTensorFloat = _UINT.let(bit_width=8, **_PARAM_FROM_PERCENTILE)
Int8ActPerTensorFixedPoint = Int8ActPerTensorFloat.let(**_PO2)
Uint8ActPerTensorFixedPoint = Uint8ActPerTensorFloat.let(**_PO2)

Int8ActPerTensorFloatMSE = Int8ActPerTensorFloat.let(
    scaling_stats_op=StatsOp.MSE)
Uint8ActPerTensorFloatMSE = Uint8ActPerTensorFloat.let(
    scaling_stats_op=StatsOp.MSE)

Int8ActPerTensorFloatMinMaxInit = _INT.let(
    bit_width=8, **_PARAM_FROM_MIN_MAX)
Uint8ActPerTensorFloatMaxInit = _UINT.let(
    bit_width=8, **_PARAM_FROM_MIN_MAX)
Uint8ActPerTensorFixedPointMaxInit = _UINT.let(
    bit_width=8, scaling_impl=ScalingImplType.PARAMETER, **_PO2)

ShiftedUint8ActPerTensorFloat = _UINT.let(
    bit_width=8, **_PARAM_FROM_PERCENTILE_INTERVAL,
    zero_point_impl=ZeroPointImplType.PARAMETER_FROM_STATS,
    zero_point_stats_op=StatsOp.PERCENTILE_LOW, quantize_zero_point=True)

# ---------------------------------------------------------------------------
# biases (reference scaled_int.py:64-130)
# ---------------------------------------------------------------------------

IntBias = _INT.let(requires_input_scale=True, requires_input_bit_width=True)
Int8Bias = IntBias.let(bit_width=8, requires_input_bit_width=False)
Int16Bias = IntBias.let(bit_width=16, requires_input_bit_width=False)
Int24Bias = IntBias.let(bit_width=24, requires_input_bit_width=False)
Int32Bias = IntBias.let(bit_width=32, requires_input_bit_width=False)
Int8BiasPerTensorFloatInternalScaling = _INT.let(bit_width=8, **_MAX_STATS)
Int8BiasPerTensorFixedPointInternalScaling = \
    Int8BiasPerTensorFloatInternalScaling.let(**_PO2)

# ---------------------------------------------------------------------------
# truncation / clamping (reference scaled_int.py:196)
# ---------------------------------------------------------------------------

TruncTo8bit = QuantConfig(quant_type=QuantType.INT, bit_width=8,
                          float_to_int=FloatToIntImpl.FLOOR)

# ---------------------------------------------------------------------------
# binary / ternary (reference quant/binary.py, quant/ternary.py)
# ---------------------------------------------------------------------------

SignedBinaryWeightPerTensorConst = QuantConfig(
    quant_type=QuantType.BINARY, signed=True, narrow_range=True,
    scaling_impl=ScalingImplType.CONST, scaling_const=0.1)
SignedBinaryActPerTensorConst = SignedBinaryWeightPerTensorConst
SignedTernaryWeightPerTensorConst = QuantConfig(
    quant_type=QuantType.TERNARY, signed=True, narrow_range=True,
    scaling_impl=ScalingImplType.CONST, scaling_const=0.1,
    ternary_threshold=0.5)
SignedTernaryActPerTensorConst = SignedTernaryWeightPerTensorConst

# ---------------------------------------------------------------------------
# disabled stubs (reference quant/none.py)
# ---------------------------------------------------------------------------

NoneWeightQuant = QuantConfig(quant_type=QuantType.NONE)
NoneActQuant = QuantConfig(quant_type=QuantType.NONE)
NoneBiasQuant = QuantConfig(quant_type=QuantType.NONE)
NoneTruncQuant = QuantConfig(quant_type=QuantType.NONE)
NoneClampQuant = QuantConfig(quant_type=QuantType.NONE)

# learned bit-width variants (reference core/bit_width/parameter.py usage)
Int8WeightPerTensorFloatLearnedBitWidth = Int8WeightPerTensorFloat.let(
    bit_width_impl=BitWidthImplType.PARAMETER)
Int8ActPerTensorFloatLearnedBitWidth = Int8ActPerTensorFloat.let(
    bit_width_impl=BitWidthImplType.PARAMETER)

# ---------------------------------------------------------------------------
# minifloat (FP8) quantizers — beyond the reference snapshot (integer-only);
# later Brevitas adds FloatQuant. e4m3fn follows the OCP convention
# (max 448), e5m2 the IEEE one (max 57344); both bit-exact against
# jnp.float8_* casts (tests/test_float_quant.py).
# ---------------------------------------------------------------------------

_FP8E4M3 = QuantConfig(
    quant_type=QuantType.FLOAT, signed=True, bit_width=8,
    exponent_bit_width=4, mantissa_bit_width=3, exponent_bias=7,
    nan_reserved=True)
_FP8E5M2 = _FP8E4M3.let(exponent_bit_width=5, mantissa_bit_width=2,
                        exponent_bias=15, nan_reserved=False)

Fp8e4m3WeightPerTensorFloat = _FP8E4M3.let(**_MAX_STATS)
Fp8e4m3WeightPerChannelFloat = Fp8e4m3WeightPerTensorFloat.let(
    scaling_per_output_channel=True)
Fp8e5m2WeightPerTensorFloat = _FP8E5M2.let(**_MAX_STATS)
Fp8e5m2WeightPerChannelFloat = Fp8e5m2WeightPerTensorFloat.let(
    scaling_per_output_channel=True)

Fp8e4m3ActPerTensorFloat = _FP8E4M3.let(**_PARAM_FROM_PERCENTILE)
Fp8e5m2ActPerTensorFloat = _FP8E5M2.let(**_PARAM_FROM_PERCENTILE)

# scale fixed at 1: values quantize to the raw format grid (what a direct
# cast-to-float8 serving path consumes)
Fp8e4m3WeightPerTensorConst = _FP8E4M3.let(
    scaling_impl=ScalingImplType.CONST,
    scaling_const=minifloat_max_val(4, 3, 7, nan_reserved=True))
Fp8e5m2WeightPerTensorConst = _FP8E5M2.let(
    scaling_impl=ScalingImplType.CONST,
    scaling_const=minifloat_max_val(5, 2, 15, nan_reserved=False))

# ---------------------------------------------------------------------------
# A2Q accumulator-aware weight quantizers (arXiv:2308.13504) — beyond the
# reference snapshot; later Brevitas ships AccumulatorAwareWeightQuant.
# Pick the budget with .let(accumulator_bit_width=N); requires the layer to
# have a quantized input (the bound is per-dot-product).
# ---------------------------------------------------------------------------

Int8AccumulatorAwareWeightPerChannelFloat = _NARROW_INT.let(
    bit_width=8, scaling_per_output_channel=True,
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
    scaling_stats_op=StatsOp.MAX, scaling_min_val=1e-10,
    accumulator_bit_width=32)
Int4AccumulatorAwareWeightPerChannelFloat = \
    Int8AccumulatorAwareWeightPerChannelFloat.let(bit_width=4)

# ---------------------------------------------------------------------------
# dynamic activation quantizers (stateless per-call scales; the LLM-serving
# pattern) — beyond the reference snapshot; later Brevitas adds dynamic act
# quant in its LLM entry point.
# ---------------------------------------------------------------------------

Int8DynamicActPerTensorFloat = _INT.let(
    bit_width=8, scaling_impl=ScalingImplType.DYNAMIC,
    scaling_stats_op=StatsOp.MAX, scaling_min_val=1e-10)
Int8DynamicActPerTokenFloat = Int8DynamicActPerTensorFloat.let(
    scaling_per_token=True)
Fp8e4m3DynamicActPerTensorFloat = _FP8E4M3.let(
    scaling_impl=ScalingImplType.DYNAMIC,
    scaling_stats_op=StatsOp.MAX, scaling_min_val=1e-10)
Fp8e4m3DynamicActPerTokenFloat = Fp8e4m3DynamicActPerTensorFloat.let(
    scaling_per_token=True)

# ---------------------------------------------------------------------------
# groupwise / OCP microscaling (MX) weight quantizers — beyond the reference
# snapshot; later Brevitas ships GroupwiseInt/GroupwiseFloat (MX) quantizers.
# MX = 32-element blocks sharing a power-of-two (E8M0-style) scale.
# ---------------------------------------------------------------------------

MXInt8Weight = _NARROW_INT.let(bit_width=8, scaling_per_group=32,
                               **_MAX_STATS, **_PO2)
MXInt4Weight = MXInt8Weight.let(bit_width=4)
MXFp8e4m3Weight = _FP8E4M3.let(scaling_per_group=32, **_MAX_STATS, **_PO2)
MXFp4Weight = MXFp8e4m3Weight.let(
    bit_width=4, exponent_bit_width=2, mantissa_bit_width=1, exponent_bias=1)
# non-MX groupwise with float scales (GPTQ-community "g32/g128" style)
Int8WeightPerGroupFloat = _NARROW_INT.let(bit_width=8, scaling_per_group=32,
                                          **_MAX_STATS)
Int4WeightPerGroupFloat = Int8WeightPerGroupFloat.let(bit_width=4)
