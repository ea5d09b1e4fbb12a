"""Differentiable numeric primitives used across quantization.

Functional parity with reference ``src/brevitas/function/ops.py``:
``binary_sign:17``, ``round_to_zero:38``, ``dpu_round:57``, ``tensor_clamp:76``,
``max_int:133``, ``min_int:164``. All ops are pure jnp and trace/shard cleanly;
bit-widths are float-valued arrays so learned bit-widths stay differentiable
(reference keeps them float for the same reason,
``src/brevitas/core/bit_width/parameter.py:23``).
"""

from typing import Union

import jax.numpy as jnp

Array = jnp.ndarray
ArrayLike = Union[Array, float, int]


def binary_sign(x: Array) -> Array:
    """Two-valued sign: +1 for x >= 0, -1 for x < 0 (sign(0) := +1)."""
    return jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))


def round_to_zero(x: Array) -> Array:
    """Round towards zero (truncate)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x))


def dpu_round(x: Array) -> Array:
    """DPU rounding: round-half-away-from-zero for negative .5 ties.

    dpu_round([-1.5, -0.5, 0.5, 1.5]) == [-1., -0., 0., 2.]
    i.e. ties round towards +inf (ceil for negative ties, round-half-to-even
    elsewhere matches torch.round which is half-to-even; the reference composes
    torch.where((x < 0) & (frac == 0.5), ceil, round)).
    """
    frac = x - jnp.floor(x)
    return jnp.where((x < 0.0) & (frac == 0.5), jnp.ceil(x), jnp.round(x))


def tensor_clamp(x: Array, min_val: ArrayLike, max_val: ArrayLike) -> Array:
    """Clamp with tensor-valued (broadcastable) bounds, differentiable in all args."""
    out = jnp.where(x > max_val, max_val, x)
    out = jnp.where(out < min_val, min_val, out)
    return out


def identity(x: Array) -> Array:
    return x


def max_int(signed: bool, narrow_range: bool, bit_width: ArrayLike) -> Array:
    """Largest representable integer for the given signedness/range.

    max_int(True, *, 8) == 127 ; max_int(False, False, 8) == 255 ;
    max_int(False, True, 8) == 254.
    """
    bit_width = jnp.asarray(bit_width, dtype=jnp.float32)
    if not signed and not narrow_range:
        return 2.0**bit_width - 1.0
    elif not signed and narrow_range:
        return 2.0**bit_width - 2.0
    else:
        return 2.0 ** (bit_width - 1.0) - 1.0


def min_int(signed: bool, narrow_range: bool, bit_width: ArrayLike) -> Array:
    """Smallest representable integer for the given signedness/range.

    min_int(True, True, 8) == -127 ; min_int(True, False, 8) == -128 ;
    unsigned == 0.
    """
    bit_width = jnp.asarray(bit_width, dtype=jnp.float32)
    if signed and narrow_range:
        return -(2.0 ** (bit_width - 1.0)) + 1.0
    elif signed and not narrow_range:
        return -(2.0 ** (bit_width - 1.0))
    else:
        return jnp.zeros_like(bit_width)
