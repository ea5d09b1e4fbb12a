"""Quant activations (reference ``src/brevitas/nn/quant_activation.py``):
nonlinearity fused with an activation quantizer — the analogue of
FusedActivationQuantProxy (proxy/runtime_quant.py:73).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig, ScalingImplType
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    NoneActQuant,
    Uint8ActPerTensorFloat,
)
from brevitas_tpu.quant.quantizers import ActQuantizer, TrainToggleMixin
from brevitas_tpu.nn.quant_layer import QuantLayerMixin
from brevitas_tpu.quant_tensor import pack

Array = jnp.ndarray


class QuantNonLinearActLayer(nnx.Module, QuantLayerMixin):
    """act_fn → act_quant (reference QuantNonLinearActLayer,
    nn/quant_layer.py:20). ``num_channels`` enables per-channel activation
    scaling (channels-last broadcast)."""

    def __init__(self, act_fn: Optional[Callable], act_quant: Optional[QuantConfig],
                 return_quant_tensor: bool = False,
                 num_channels: Optional[int] = None):
        self.act_fn = act_fn
        self.act_quant = ActQuantizer(act_quant if act_quant is not None
                                      else NoneActQuant, num_channels)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        v = qt.value
        if self.act_fn is not None:
            v = self.act_fn(v)
        out = self.act_quant(v)
        return self.pack_output(out)


class QuantIdentity(QuantNonLinearActLayer):
    """Reference QuantIdentity (nn/quant_activation.py:86)."""

    def __init__(self, act_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 return_quant_tensor: bool = False,
                 num_channels=None):
        super().__init__(None, act_quant, return_quant_tensor, num_channels)


class QuantReLU(QuantNonLinearActLayer):
    """Reference QuantReLU (nn/quant_activation.py:14): unsigned act quant."""

    def __init__(self, act_quant: Optional[QuantConfig] = Uint8ActPerTensorFloat,
                 return_quant_tensor: bool = False,
                 num_channels=None):
        super().__init__(jax.nn.relu, act_quant, return_quant_tensor, num_channels)


class QuantSigmoid(QuantNonLinearActLayer):
    def __init__(self, act_quant: Optional[QuantConfig] = Uint8ActPerTensorFloat,
                 return_quant_tensor: bool = False,
                 num_channels=None):
        super().__init__(jax.nn.sigmoid, act_quant, return_quant_tensor, num_channels)


class QuantTanh(QuantNonLinearActLayer):
    def __init__(self, act_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 return_quant_tensor: bool = False,
                 num_channels=None):
        super().__init__(jnp.tanh, act_quant, return_quant_tensor, num_channels)


class QuantLeakyReLU(QuantNonLinearActLayer):
    """LeakyReLU + signed act quant (reference FlexMLQuantLeakyReLU,
    nn/target/flexml.py:22, and the MelGAN activation helper)."""

    def __init__(self, act_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
                 negative_slope: float = 0.2,
                 return_quant_tensor: bool = False, num_channels=None):
        super().__init__(
            lambda v: jax.nn.leaky_relu(v, negative_slope), act_quant,
            return_quant_tensor, num_channels)
        self.negative_slope = negative_slope


class QuantHardTanh(QuantNonLinearActLayer):
    """Reference QuantHardTanh (nn/quant_activation.py:68): clipped identity
    with the clip range as the (usually learned) quant threshold."""

    def __init__(self, act_quant: Optional[QuantConfig] = None,
                 max_val: float = 1.0, min_val: float = -1.0,
                 return_quant_tensor: bool = False):
        # the symmetric threshold must cover BOTH clip bounds (reference
        # builds the act range from max(|min_val|, max_val))
        threshold = max(abs(min_val), abs(max_val))
        if act_quant is None:
            act_quant = Int8ActPerTensorFloat.let(
                scaling_impl=ScalingImplType.PARAMETER,
                scaling_const=threshold, narrow_range=True)
        elif act_quant.scaling_impl in (ScalingImplType.CONST,
                                        ScalingImplType.PARAMETER) \
                and act_quant.scaling_const is None:
            act_quant = act_quant.let(scaling_const=threshold)
        super().__init__(None, act_quant, return_quant_tensor)
