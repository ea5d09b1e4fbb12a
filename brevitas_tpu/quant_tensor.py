"""QuantTensor — a pytree-registered quantized tensor with metadata.

Re-design of reference ``src/brevitas/quant_tensor/__init__.py:51-430``: a
NamedTuple of ``(value, scale, zero_point, bit_width, signed, training)`` with
arithmetic that propagates quantization metadata. Here it is a
``flax.struct`` dataclass: array leaves (value/scale/zero_point/bit_width)
flow through jit/grad/vmap/pjit, while ``signed``/``training`` are static aux
data so branching on them never creates traced control flow.

Metadata algebra (matching the reference):
- add: requires same scale; output bit-width = ceil(log2(range_a + range_b))
  (reference ``__add__:315``);
- mul: scales multiply, bit-widths add, zero-points must be zero
  (reference ``__mul__:347``);
- cat: requires matching scale/zero-point/bit-width/sign (reference ``cat:262``);
- neg of unsigned grows one bit and becomes signed (reference ``__neg__:296``);
- abs of signed drops one bit and becomes unsigned (reference ``__abs__:398``).
"""

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import struct

from brevitas_tpu.ops import ceil_ste, max_int, min_int, round_ste

Array = jnp.ndarray

IS_VALID_ATOL = 2e-1
BFLOAT16_IS_VALID_ATOL = 0.5


def _concrete(x):
    """The value if ``x`` is a concrete array, else None (traced)."""
    if x is None or isinstance(x, jax.core.Tracer):
        return None
    return x


@struct.dataclass
class QuantTensor:
    value: Array
    scale: Optional[Array] = None
    zero_point: Optional[Array] = None
    bit_width: Optional[Array] = None
    signed: Optional[bool] = struct.field(pytree_node=False, default=None)
    training: bool = struct.field(pytree_node=False, default=False)

    # ---- basic properties -------------------------------------------------

    @property
    def shape(self):
        return self.value.shape

    @property
    def dtype(self):
        return self.value.dtype

    @property
    def ndim(self):
        return self.value.ndim

    @property
    def is_not_none(self) -> bool:
        return (self.scale is not None and self.zero_point is not None
                and self.bit_width is not None and self.signed is not None)

    def set(self, **kwargs) -> "QuantTensor":
        return self.replace(**kwargs)

    # ---- integer view -----------------------------------------------------

    @property
    def _pre_round_int_value(self) -> Array:
        return self.value / self.scale + self.zero_point

    def is_valid(self, atol: float = IS_VALID_ATOL) -> bool:
        """Host-side integer-consistency check (reference ``is_valid:112``).
        Not jittable — pulls values to host; use in tests/debugging."""
        if not self.is_not_none:
            return False
        pre = self._pre_round_int_value
        rounded = jnp.round(pre)
        is_int = bool(jnp.all(jnp.isclose(pre, rounded, atol=atol)))
        bw = float(jnp.max(self.bit_width))
        if bw >= 2:
            if self.signed:
                ok_hi = bool(jnp.all(rounded <= 2.0 ** (bw - 1) - 1))
                ok_lo = bool(jnp.all(rounded >= -(2.0 ** (bw - 1))))
            else:
                ok_hi = bool(jnp.all(rounded <= 2.0**bw - 1))
                ok_lo = bool(jnp.all(rounded >= 0.0))
            return is_int and ok_hi and ok_lo
        # binary case
        uniq = jnp.unique(rounded)
        is_binary = int(uniq.size) == 2
        has_neg = bool(jnp.any(uniq < 0))
        return is_int and is_binary and (has_neg == bool(self.signed))

    def int(self, float_datatype: bool = False) -> Array:
        """Integer representation (reference ``int():174``). With
        ``float_datatype=True`` keeps float dtype (STE-differentiable)."""
        int_value = round_ste(self._pre_round_int_value)
        if float_datatype:
            return int_value
        bw = float(jnp.max(self.bit_width)) if self.bit_width is not None else 32
        if bw <= 8 and self.signed:
            return int_value.astype(jnp.int8)
        if bw <= 8 and not self.signed:
            return int_value.astype(jnp.uint8)
        return int_value.astype(jnp.int32)

    # ---- consistency checks -----------------------------------------------
    # value-level checks run only on concrete (non-traced) arrays; under
    # tracing they degrade to shape checks, and scale/zp checks are skipped
    # while training (reference check_scaling_factors_same, :204)

    def check_scaling_factors_same(self, other: "QuantTensor") -> None:
        if self.training or other.training:
            return
        if (hasattr(self.scale, "shape") and hasattr(other.scale, "shape")
                and jnp.shape(self.scale) != jnp.shape(other.scale)):
            raise ValueError("Scaling factor shapes differ")
        a, b = _concrete(self.scale), _concrete(other.scale)
        if a is not None and b is not None and not jnp.allclose(a, b):
            raise ValueError("Scaling factors are different")

    def check_zero_points_same(self, other: "QuantTensor") -> None:
        if self.training or other.training:
            return
        a, b = _concrete(self.zero_point), _concrete(other.zero_point)
        if a is not None and b is not None and not jnp.allclose(a, b):
            raise ValueError("Zero points are different")

    def check_bit_width_same(self, other: "QuantTensor") -> None:
        a, b = _concrete(self.bit_width), _concrete(other.bit_width)
        if a is not None and b is not None and not jnp.allclose(a, b):
            raise ValueError("Bit widths are different")

    # ---- shape ops: metadata follows when it has matching rank ------------

    def reshape(self, *shape) -> "QuantTensor":
        return self.set(value=self.value.reshape(*shape))

    def flatten(self) -> "QuantTensor":
        return self.set(value=self.value.reshape(-1))

    def transpose(self, *axes) -> "QuantTensor":
        value = jnp.transpose(self.value, axes or None)
        meta = {}
        for name in ("scale", "zero_point", "bit_width"):
            m = getattr(self, name)
            if m is not None and jnp.ndim(m) == value.ndim:
                meta[name] = jnp.transpose(m, axes or None)
        return self.set(value=value, **meta)

    # ---- algebra ----------------------------------------------------------

    def __neg__(self) -> "QuantTensor":
        if not self.is_not_none:
            return self.set(value=-self.value)
        neg_value = (-self.int(float_datatype=True) - self.zero_point) * self.scale
        if self.signed:
            return self.set(value=neg_value)
        return QuantTensor(
            value=neg_value, scale=self.scale, zero_point=self.zero_point,
            bit_width=self.bit_width + 1, signed=True, training=self.training)

    def __pos__(self) -> "QuantTensor":
        return self

    def __abs__(self) -> "QuantTensor":
        if self.is_not_none and self.signed:
            abs_value = (jnp.abs(self.int(float_datatype=True)) - self.zero_point) * self.scale
            return QuantTensor(
                value=abs_value, scale=self.scale, zero_point=self.zero_point,
                bit_width=self.bit_width - 1, signed=False, training=self.training)
        return self

    def __add__(self, other: Any) -> "QuantTensor":
        if isinstance(other, QuantTensor) and self.is_not_none and other.is_not_none:
            self.check_scaling_factors_same(other)
            max_val = (max_int(self.signed, False, self.bit_width)
                       + max_int(other.signed, False, other.bit_width))
            min_val = (min_int(self.signed, False, self.bit_width)
                       + min_int(other.signed, False, other.bit_width))
            return QuantTensor(
                value=self.value + other.value,
                scale=(self.scale + other.scale) / 2,
                zero_point=self.zero_point + other.zero_point,
                bit_width=ceil_ste(jnp.log2(max_val - min_val)),
                signed=self.signed or other.signed,
                training=self.training or other.training)
        if isinstance(other, QuantTensor):
            return QuantTensor(self.value + other.value)
        return QuantTensor(self.value + other)

    __radd__ = __add__

    def __sub__(self, other: Any) -> "QuantTensor":
        return self.__add__(-other)

    def __mul__(self, other: Any) -> "QuantTensor":
        if isinstance(other, QuantTensor) and self.is_not_none and other.is_not_none:
            # product metadata is only valid for zero zero-points
            # (reference __mul__:347 raises otherwise)
            for zp in (self.zero_point, other.zero_point):
                z = _concrete(zp)
                if z is not None and bool(jnp.any(z != 0)):
                    raise ValueError(
                        "Zero-points of mul operands are non-zero, not supported")
            return QuantTensor(
                value=self.value * other.value,
                scale=self.scale * other.scale,
                zero_point=self.zero_point * other.zero_point,
                bit_width=self.bit_width + other.bit_width,
                signed=self.signed or other.signed,
                training=self.training or other.training)
        if isinstance(other, QuantTensor):
            return QuantTensor(self.value * other.value)
        return QuantTensor(self.value * other)

    __rmul__ = __mul__

    def __truediv__(self, other: Any) -> "QuantTensor":
        if isinstance(other, QuantTensor) and self.is_not_none and other.is_not_none:
            return QuantTensor(
                value=self.value / other.value,
                scale=self.scale / other.scale,
                zero_point=None,
                bit_width=self.bit_width - other.bit_width,
                signed=self.signed or other.signed,
                training=self.training or other.training)
        if isinstance(other, QuantTensor):
            return QuantTensor(self.value / other.value)
        return QuantTensor(self.value / other)


def cat(tensors: Sequence[Union[QuantTensor, Array]], axis: int = 0) -> QuantTensor:
    """Concatenate QuantTensors; metadata averaged after a same-scale check
    (reference ``QuantTensor.cat:262``)."""
    if len(tensors) < 2:
        t = tensors[0]
        return t if isinstance(t, QuantTensor) else QuantTensor(t)
    if all(isinstance(t, QuantTensor) and t.is_not_none for t in tensors):
        first = tensors[0]
        for t in tensors[1:]:
            first.check_scaling_factors_same(t)
            first.check_zero_points_same(t)
            first.check_bit_width_same(t)
            if t.signed != first.signed:
                raise ValueError("cat operands have mismatched signs")
        n = len(tensors)
        return QuantTensor(
            value=jnp.concatenate([t.value for t in tensors], axis=axis),
            scale=sum(t.scale for t in tensors) / n,
            zero_point=sum(t.zero_point for t in tensors) / n,
            bit_width=sum(t.bit_width for t in tensors) / n,
            signed=first.signed,
            training=any(t.training for t in tensors))
    values = [t.value if isinstance(t, QuantTensor) else t for t in tensors]
    return QuantTensor(jnp.concatenate(values, axis=axis))


def unpack(x: Union[QuantTensor, Array]) -> Array:
    """Value view of either a raw array or a QuantTensor."""
    return x.value if isinstance(x, QuantTensor) else x


def pack(x: Union[QuantTensor, Array]) -> QuantTensor:
    return x if isinstance(x, QuantTensor) else QuantTensor(x)
