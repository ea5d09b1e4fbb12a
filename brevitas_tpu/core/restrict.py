"""Scale/bit-width domain restrictions.

Reference: ``src/brevitas/core/restrict_val.py:80-173`` (FloatRestrictValue,
LogFloatRestrictValue, IntRestrictValue, PowerOfTwoRestrictValue).

A restriction is a pair of pure maps:
- ``preprocess``: applied once at init to move a raw value into the stored
  (parameter) domain — e.g. log2 for power-of-two scales;
- ``forward``: applied every step to map the stored value to the effective
  value — e.g. 2**round_ste(p) for power-of-two scales.

Learned power-of-two scales therefore train in log2 space with a ceil/round
STE, which is exactly the reference's LogTwo/PowerOfTwo + RoundSte composition.
"""

import enum
import math
from typing import Union

import jax.numpy as jnp

from brevitas_tpu.ops import ceil_ste, floor_ste, round_ste, round_to_zero_ste

Array = jnp.ndarray


class RestrictType(str, enum.Enum):
    """Reference enum RestrictValueType (src/brevitas/inject/enum.py:28)."""
    FP = "fp"
    LOG_FP = "log_fp"
    INT = "int"
    POWER_OF_TWO = "power_of_two"


class FloatToIntImpl(str, enum.Enum):
    """Reference enum FloatToIntImplType (src/brevitas/inject/enum.py:38)."""
    ROUND = "round"
    FLOOR = "floor"
    CEIL = "ceil"
    ROUND_TO_ZERO = "round_to_zero"
    DPU_ROUND = "dpu_round"
    STOCHASTIC_ROUND = "stochastic_round"


def float_to_int_fn(impl: FloatToIntImpl):
    from brevitas_tpu.ops import dpu_round_ste  # local to avoid cycle noise
    return {
        FloatToIntImpl.ROUND: round_ste,
        FloatToIntImpl.FLOOR: floor_ste,
        FloatToIntImpl.CEIL: ceil_ste,
        FloatToIntImpl.ROUND_TO_ZERO: round_to_zero_ste,
        FloatToIntImpl.DPU_ROUND: dpu_round_ste,
    }[FloatToIntImpl(impl)]


def preprocess(restrict: RestrictType, value: Union[float, Array]):
    """Move a raw (linear-domain) init value into the stored domain."""
    restrict = RestrictType(restrict)
    if restrict in (RestrictType.LOG_FP, RestrictType.POWER_OF_TWO):
        if isinstance(value, (float, int)):
            return math.log2(value)
        return jnp.log2(value)
    return value


def forward(restrict: RestrictType, value: Array,
            float_to_int: FloatToIntImpl = FloatToIntImpl.ROUND) -> Array:
    """Map a stored value to its effective (linear-domain) value."""
    restrict = RestrictType(restrict)
    if restrict == RestrictType.FP:
        return value
    if restrict == RestrictType.LOG_FP:
        return 2.0**value
    if restrict == RestrictType.INT:
        return float_to_int_fn(float_to_int)(value)
    if restrict == RestrictType.POWER_OF_TWO:
        return 2.0 ** float_to_int_fn(float_to_int)(value)
    raise ValueError(f"unknown restrict type {restrict}")
