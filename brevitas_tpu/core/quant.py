"""Functional fake-quant primitives.

Parity targets (reference file:line):
- ``int_quant`` / ``int_quant_to_int``: IntQuant,
  ``src/brevitas/core/quant/int_base.py:15-97`` (div scale, add zp, round,
  clamp to [min_int, max_int], sub zp, mul scale).
- ``rescaling_scale``: RescalingIntQuant scale law
  ``scale = threshold / int_threshold``, ``src/brevitas/core/quant/int.py:156-163``.
- ``int_scaling`` / ``po2_int_scaling``: IntScaling / PowerOfTwoIntScaling,
  ``src/brevitas/core/scaling/int_scaling.py:11-36``.
- ``binary_quant`` / ``clamped_binary_quant``: ``src/brevitas/core/quant/binary.py:19,67``.
- ``ternary_quant``: ``src/brevitas/core/quant/ternary.py:18``.
- ``trunc_int_quant``: TruncIntQuant, ``src/brevitas/core/quant/int.py:199-229``.

All functions are pure jnp + custom_vjp STE ops; they fuse into a handful of
VPU ops under XLA. A hand-fused Pallas variant for the big-tensor cases lives
in :mod:`brevitas_tpu.kernels.fake_quant`.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from brevitas_tpu import config
from brevitas_tpu.ops import (
    binary_sign_ste,
    max_int,
    min_int,
    round_ste,
    tensor_clamp,
    tensor_clamp_ste,
    ternary_sign_ste,
)

Array = jnp.ndarray
FloatToInt = Callable[[Array], Array]
ClampFn = Callable[[Array, Array, Array], Array]


def int_quant_to_int(
    x: Array,
    scale: Array,
    zero_point: Array,
    bit_width: Array,
    *,
    signed: bool,
    narrow_range: bool,
    float_to_int: FloatToInt = round_ste,
    clamp_fn: ClampFn = tensor_clamp,
) -> Array:
    """Map ``x`` to (float-valued) integers in the representable range.

    ``clamp_fn`` selects gradient behaviour at the clipping boundary:
    ``tensor_clamp`` zeroes out-of-range grads (reference default for
    activations), ``tensor_clamp_ste`` passes them through (weights).
    """
    y = x / scale + zero_point
    y = float_to_int(y)
    y = clamp_fn(
        y,
        min_int(signed, narrow_range, bit_width),
        max_int(signed, narrow_range, bit_width),
    )
    return y


def int_quant(
    x: Array,
    scale: Array,
    zero_point: Array,
    bit_width: Array,
    *,
    signed: bool,
    narrow_range: bool,
    float_to_int: FloatToInt = round_ste,
    clamp_fn: ClampFn = tensor_clamp,
) -> Array:
    """Scale/shift uniform affine fake-quantization (quantize + dequantize).

    NOT rematerialized by default: wrapping this chain in ``jax.checkpoint``
    was measured SLOWER than letting XLA keep the residuals (CNV QAT
    interleaved A/B, ``parity/cnv_qat_ab.py``; PERF.md round-4 CNV
    section) — the checkpoint's optimization barrier breaks the elementwise
    fusion that makes fake-quant nearly free. The negative result stays
    reproducible via ``config.REMAT_FAKE_QUANT`` (read at trace time), which
    the A/B harness flips between builds.
    """

    def _fq(x, scale, zero_point, bit_width):
        y_int = int_quant_to_int(
            x, scale, zero_point, bit_width,
            signed=signed, narrow_range=narrow_range,
            float_to_int=float_to_int, clamp_fn=clamp_fn)
        return (y_int - zero_point) * scale

    if config.REMAT_FAKE_QUANT:
        return jax.checkpoint(_fq, prevent_cse=True)(
            x, scale, zero_point, bit_width)
    return _fq(x, scale, zero_point, bit_width)


def decoupled_int_quant(
    x: Array,
    pre_scale: Array,
    pre_zero_point: Array,
    scale: Array,
    zero_point: Array,
    bit_width: Array,
    *,
    signed: bool,
    narrow_range: bool,
    float_to_int: FloatToInt = round_ste,
    clamp_fn: ClampFn = tensor_clamp,
) -> Array:
    """Quantize against (pre_scale, pre_zero_point) but dequantize against
    (scale, zero_point) — used for weight-normalization-style decoupled weight
    quantizers (reference DecoupledIntQuant, core/quant/int_base.py:100)."""

    y_int = int_quant_to_int(
        x, pre_scale, pre_zero_point, bit_width,
        signed=signed, narrow_range=narrow_range,
        float_to_int=float_to_int, clamp_fn=clamp_fn)
    return (y_int - zero_point) * scale


def int_scaling(bit_width: Array, *, signed: bool, narrow_range: bool) -> Array:
    """Integer-range threshold: the divisor turning a float threshold into a
    scale. Signed ranges use |min_int| so that -threshold maps exactly to
    min_int (reference IntScaling, core/scaling/int_scaling.py:11)."""
    if signed:
        return -min_int(signed, narrow_range, bit_width)
    return max_int(signed, narrow_range, bit_width)


def po2_int_scaling(bit_width: Array, *, signed: bool) -> Array:
    """Power-of-two integer threshold: 2**bits (signed) keeps scales exact
    powers of two (reference PowerOfTwoIntScaling, core/scaling/int_scaling.py:27)."""
    return max_int(signed, False, bit_width) + 1.0


def rescaling_scale(
    threshold: Array, bit_width: Array, *, signed: bool, narrow_range: bool,
    po2_int_scale: bool = False,
) -> Array:
    """scale = float-threshold / integer-threshold
    (reference RescalingIntQuant.forward, core/quant/int.py:156-163)."""
    if po2_int_scale:
        int_threshold = po2_int_scaling(bit_width, signed=signed)
    else:
        int_threshold = int_scaling(bit_width, signed=signed, narrow_range=narrow_range)
    return threshold / int_threshold


def binary_quant(x: Array, scale: Array) -> Tuple[Array, Array]:
    """Scaled binarization: sign(x) * scale, STE gradient everywhere
    (reference BinaryQuant, core/quant/binary.py:19). Returns (y, bit_width=1)."""
    return binary_sign_ste(x) * scale, jnp.asarray(1.0)


def clamped_binary_quant(x: Array, scale: Array) -> Tuple[Array, Array]:
    """Binarization with input pre-clamped to [-scale, scale] so out-of-range
    gradients are zeroed — the activation-side variant
    (reference ClampedBinaryQuant, core/quant/binary.py:67)."""
    y = tensor_clamp(x, -scale, scale)
    return binary_sign_ste(y) * scale, jnp.asarray(1.0)


def ternary_quant(x: Array, scale: Array, threshold: float) -> Tuple[Array, Array]:
    """Scaled ternarization: 0 where |x| <= threshold*scale else sign(x)*scale
    (reference TernaryQuant, core/quant/ternary.py:18). Returns (y, bit_width=2)."""
    mask = jnp.abs(x) > (threshold * scale)
    y = mask.astype(x.dtype) * ternary_sign_ste(x) * scale
    return y, jnp.asarray(2.0)


def trunc_int_quant(
    x: Array,
    scale: Array,
    zero_point: Array,
    input_bit_width: Array,
    output_bit_width: Array,
    *,
    float_to_int: FloatToInt = round_ste,
) -> Array:
    """Accumulator truncation: drop LSBs to shrink ``input_bit_width`` down to
    ``output_bit_width`` (reference TruncIntQuant, core/quant/int.py:199-229).
    Used by QuantAvgPool to renormalize the accumulated sum."""
    y = x / scale + zero_point
    y = round_ste(y)  # clean up floating-point error
    trunc_scale = 2.0 ** (input_bit_width - output_bit_width)
    y = y / trunc_scale
    y = float_to_int(y)
    return (y - zero_point) * scale


def minifloat_max_val(exponent_bits: int, mantissa_bits: int,
                      exponent_bias: int, *, nan_reserved: bool = True) -> float:
    """Largest finite magnitude of a minifloat format.

    ``nan_reserved`` picks the OCP "fn" convention (the all-ones exponent is
    usable for finite values, only its top mantissa code is NaN — e4m3fn max
    448); otherwise IEEE-style (all-ones exponent reserved for inf/NaN —
    e5m2 max 57344). No reference analogue: the reference snapshot is
    integer-only; later Brevitas adds FloatQuant."""
    emax = 2 ** exponent_bits - 1 - exponent_bias
    if nan_reserved:
        mant_max = 2.0 - 2.0 ** (1 - mantissa_bits) if mantissa_bits > 0 \
            else 1.0  # e8m0-style: top code would be NaN
    else:
        emax -= 1
        mant_max = 2.0 - 2.0 ** (-mantissa_bits)
    return mant_max * 2.0 ** emax


def float_quant(
    x: Array,
    scale: Array,
    *,
    exponent_bits: int,
    mantissa_bits: int,
    exponent_bias: int,
    max_val: float,
    float_to_int: FloatToInt = round_ste,
    clamp_fn: ClampFn = tensor_clamp,
) -> Array:
    """Minifloat (FP8/FP6/FP4...) fake-quantization with saturation.

    ``x/scale`` is rounded to the nearest representable value of the
    (1, exponent_bits, mantissa_bits) format with the given bias — including
    subnormals — then clamped to ±max_val and rescaled. Rounding uses
    ``float_to_int`` on the mantissa grid (``round_ste`` = IEEE
    round-to-nearest-even, matching hardware casts); the exponent selection
    is non-differentiable and runs under ``stop_gradient``."""
    import jax

    xs = x / scale
    # power-of-two spacing of the format at each magnitude: 2^(e - m), with
    # e floored at the subnormal exponent (1 - bias)
    ax = jax.lax.stop_gradient(jnp.abs(xs))
    e = jnp.floor(jnp.log2(jnp.where(ax > 0, ax, 1.0)))
    e = jnp.maximum(e, 1.0 - exponent_bias)
    # exact power of two via the exponent field — jnp.exp2 routes through
    # exp(x·ln2) on some backends and returns e.g. exp2(13) = 8192.004
    step = jnp.ldexp(jnp.ones_like(xs),
                     (e - mantissa_bits).astype(jnp.int32)).astype(xs.dtype)
    y = float_to_int(xs / step) * step
    y = clamp_fn(y, jnp.asarray(-max_val, x.dtype), jnp.asarray(max_val, x.dtype))
    return y * scale
