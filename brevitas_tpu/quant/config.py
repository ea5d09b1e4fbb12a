"""Declarative quantizer configuration.

TPU-native replacement for the reference's dependency-injection DSL
(``src/brevitas/inject/__init__.py:30-174`` ExtendedInjector metaclass +
``src/brevitas/quant/solver/*`` enum solvers). A quantizer is a frozen
dataclass of hyperparameters; :mod:`brevitas_tpu.quant.quantizers` resolves it
once, at layer construction, into an NNX module holding exactly the state the
config implies (learned scale params, EMA buffers, step counters).

Enum fields mirror ``src/brevitas/inject/enum.py``:
QuantType:18, BitWidthImplType:10, ScalingImplType:49, RestrictValueType:28,
FloatToIntImplType:38, StatsOp:61.
"""

import dataclasses
import enum
from typing import Optional

from brevitas_tpu.core.restrict import FloatToIntImpl, RestrictType
from brevitas_tpu.core.stats import DEFAULT_MOMENTUM, StatsOp


class QuantType(str, enum.Enum):
    NONE = "none"
    BINARY = "binary"
    TERNARY = "ternary"
    INT = "int"
    FLOAT = "float"  # minifloat (FP8/FP6/FP4); no reference analogue


class BitWidthImplType(str, enum.Enum):
    CONST = "const"
    PARAMETER = "parameter"  # learned bit-width (BitWidthParameter)


class ScalingImplType(str, enum.Enum):
    """Reference ScalingImplType (inject/enum.py:49). HE initializes a
    parameter from He-init statistics; AFFINE_STATS adds a learned affine on
    top of runtime stats."""
    CONST = "const"
    PARAMETER = "parameter"
    PARAMETER_FROM_STATS = "parameter_from_stats"
    STATS = "stats"
    AFFINE_STATS = "affine_stats"
    HE = "he"
    DYNAMIC = "dynamic"  # stateless per-call stats (LLM-style dynamic quant)


class ZeroPointImplType(str, enum.Enum):
    """The reference has no enum here — solvers pick the class directly
    (quant/base.py: ZeroZeroPoint / StatsFromParameterZeroPoint /
    ParameterFromRuntimeZeroPoint / ParameterZeroPoint)."""
    ZERO = "zero"
    STATS = "stats"                    # from the quantized parameter itself
    PARAMETER_FROM_STATS = "parameter_from_stats"  # runtime, two-phase
    PARAMETER = "parameter"


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """One declarative quantizer. ``None``-valued optionals mean
    "not applicable for the chosen impl types"."""

    quant_type: QuantType = QuantType.INT
    bit_width: float = 8.0
    signed: bool = True
    narrow_range: bool = False

    # bit-width impl
    bit_width_impl: BitWidthImplType = BitWidthImplType.CONST
    min_bit_width: float = 2.0  # lower bound for learned bit-width

    # minifloat format (QuantType.FLOAT): 1 + exponent + mantissa bits;
    # nan_reserved selects the OCP "fn" convention (e4m3fn) vs IEEE inf/NaN
    exponent_bit_width: Optional[float] = None
    mantissa_bit_width: Optional[float] = None
    exponent_bias: Optional[float] = None
    nan_reserved: bool = True

    # A2Q accumulator-aware weight quant (arXiv:2308.13504): constrain the
    # per-channel l1 norm of the integer weights so a dot product with
    # quantized inputs provably fits this accumulator width
    accumulator_bit_width: Optional[float] = None

    # per-token activation scaling (one scale per leading position, reduced
    # over the channel axis); requires scaling_impl=DYNAMIC
    scaling_per_token: bool = False

    # groupwise (microscaling/MX) weight quantization: one scale per
    # ``scaling_per_group`` consecutive reduction-dim elements per output
    # channel (OCP MX = group 32 + power-of-two scale + int8/fp8/fp4 element)
    scaling_per_group: Optional[int] = None

    # float->int rounding & clamping gradient behaviour
    float_to_int: FloatToIntImpl = FloatToIntImpl.ROUND
    clamp_ste: bool = False  # True → straight-through grads at the clip boundary

    # scaling
    scaling_impl: ScalingImplType = ScalingImplType.STATS
    scaling_stats_op: StatsOp = StatsOp.MAX
    scaling_per_output_channel: bool = False
    restrict_scaling: RestrictType = RestrictType.FP
    restrict_scaling_float_to_int: FloatToIntImpl = FloatToIntImpl.ROUND
    scaling_min_val: Optional[float] = None
    scaling_const: Optional[float] = None     # CONST / PARAMETER init value
    scaling_stats_momentum: Optional[float] = DEFAULT_MOMENTUM
    collect_stats_steps: int = 300
    high_percentile_q: Optional[float] = None
    low_percentile_q: Optional[float] = None
    scaling_stats_sigma: Optional[float] = None
    scaling_affine: bool = False  # AFFINE_STATS learned affine on stats
    # StatsOp.MSE grid resolution (None → core.stats.DEFAULT_MSE_CANDIDATES)
    mse_search_candidates: Optional[int] = None

    # decoupled (pre-scale/scale split) weight quantization
    decoupled: bool = False
    pre_scaling_stats_op: StatsOp = StatsOp.MAX

    # zero-point
    zero_point_impl: ZeroPointImplType = ZeroPointImplType.ZERO
    quantize_zero_point: bool = False
    zero_point_stats_op: StatsOp = StatsOp.MIN

    # ternary
    ternary_threshold: float = 0.5

    # delayed quantization (return FP for the first N steps)
    quant_delay_steps: int = 0

    # bias-specific: take scale (= input_scale * weight_scale) and/or
    # bit-width from the surrounding layer's accumulator
    requires_input_scale: bool = False
    requires_input_bit_width: bool = False

    # distributed statistics: when set and the quantizer runs inside
    # shard_map/pjit with this named mesh axis, activation statistics reduce
    # GLOBALLY across data shards (psum/pmax) so every replica agrees on
    # scales — a design point the single-device reference never faces
    # (SURVEY §2.4)
    stats_reduce_mesh_axis: Optional[str] = None

    def let(self, **overrides) -> "QuantConfig":
        """Functional update — the analogue of injector ``.let()``
        (reference inject/__init__.py, proxy/quant_proxy.py:89-95)."""
        return dataclasses.replace(self, **overrides)

    @property
    def po2_int_scale(self) -> bool:
        """Power-of-two restricted scales use 2**bits as the integer
        threshold so the scale stays an exact power of two (reference
        SolveIntScalingImplFromEnum, quant/solver/common.py:134)."""
        return RestrictType(self.restrict_scaling) == RestrictType.POWER_OF_TWO
