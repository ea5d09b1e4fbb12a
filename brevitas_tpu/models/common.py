"""Shared model components for the bnn_pynq family.

Reference: ``src/brevitas_examples/bnn_pynq/models/common.py``
(CommonQuant/CommonWeightQuant/CommonActQuant — const unit scaling, narrow
signed, binary when bit_width==1) and ``models/tensor_norm.py`` (TensorNorm).
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.core.restrict import FloatToIntImpl, RestrictType
from brevitas_tpu.quant.config import QuantConfig, QuantType, ScalingImplType


def common_weight_quant(bit_width: Optional[int]) -> QuantConfig:
    """CommonWeightQuant: const scale 1.0, narrow signed; BINARY at 1 bit;
    FP (no quant) when bit_width is None — matching the reference's
    @value quant_type switch (bnn_pynq/models/common.py:28-35)."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return QuantConfig(
        quant_type=QuantType.BINARY if bit_width == 1 else QuantType.INT,
        bit_width=float(bit_width), signed=True, narrow_range=True,
        scaling_impl=ScalingImplType.CONST, scaling_const=1.0)


def common_act_quant(bit_width: Optional[int], min_val: float = -1.0,
                     max_val: float = 1.0, narrow_range: bool = True,
                     restrict: RestrictType = RestrictType.FP) -> QuantConfig:
    """CommonActQuant: const scale max_val, clamped binary at 1 bit."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return QuantConfig(
        quant_type=QuantType.BINARY if bit_width == 1 else QuantType.INT,
        bit_width=float(bit_width), signed=True, narrow_range=narrow_range,
        scaling_impl=ScalingImplType.CONST, scaling_const=max_val,
        restrict_scaling=restrict,
        restrict_scaling_float_to_int=FloatToIntImpl.CEIL)


class TensorNorm(nnx.Module):
    """Whole-tensor batch norm with scalar learned affine (reference
    TensorNorm, bnn_pynq/models/tensor_norm.py). Stabilizes binary-net
    logits."""

    def __init__(self, eps: float = 1e-4, momentum: float = 0.1):
        self.eps = eps
        self.momentum = momentum
        self.weight = nnx.Param(jnp.ones(()))
        self.bias = nnx.Param(jnp.zeros(()))
        self.running_mean = nnx.BatchStat(jnp.zeros(()))
        self.running_var = nnx.BatchStat(jnp.ones(()))
        self.training: bool = True

    def __call__(self, x):
        import jax

        if self.training:
            mean = jnp.mean(x)
            biased_var = jnp.var(x)
            n = x.size
            unbiased_var = biased_var * n / max(n - 1, 1)
            m = self.momentum
            self.running_mean[...] = ((1 - m) * self.running_mean[...]
                                      + m * jax.lax.stop_gradient(mean))
            self.running_var[...] = ((1 - m) * self.running_var[...]
                                     + m * jax.lax.stop_gradient(unbiased_var))
            inv_std = jax.lax.rsqrt(biased_var + self.eps)
            return (x - mean) * inv_std * self.weight[...] + self.bias[...]
        return ((x - self.running_mean[...])
                * jax.lax.rsqrt(self.running_var[...] + self.eps)
                * self.weight[...] + self.bias[...])
