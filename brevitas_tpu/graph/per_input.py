"""Shape-driven (per-input) module rewrites.

Reference: ``src/brevitas/graph/per_input.py`` — AdaptiveAvgPoolToAvgPool:21
and AvgPoolToQuantDepthwiseConv:69 rewrite pooling based on a sample input's
spatial shape (FX + forward hooks there; direct surgery here).
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.graph.base import named_modules, set_module
from brevitas_tpu.nn import QuantAdaptiveAvgPool2d, QuantAvgPool2d, QuantConv2d
from brevitas_tpu.quant.config import QuantConfig


def adaptive_avgpool_to_avgpool(model: nnx.Module,
                                sample_input_hw: Tuple[int, int]) -> int:
    """Resolve QuantAdaptiveAvgPool2d into fixed-kernel QuantAvgPool2d given
    the spatial size reaching the pool (reference AdaptiveAvgPoolToAvgPool)."""
    h, w = sample_input_hw
    count = 0
    for path, mod in list(named_modules(model)):
        if isinstance(mod, QuantAdaptiveAvgPool2d):
            oh, ow = mod.output_size
            if h % oh or w % ow:
                raise ValueError(f"{path}: {h}x{w} not divisible by {oh}x{ow}")
            trunc_cfg = mod.trunc_quant.cfg if mod.trunc_quant is not None else None
            pool = QuantAvgPool2d((h // oh, w // ow), trunc_quant=trunc_cfg,
                                  return_quant_tensor=mod.return_quant_tensor)
            set_module(model, path, pool)
            count += 1
    return count


def avgpool_to_depthwise_conv(model: nnx.Module, channels: int,
                              weight_quant: Optional[QuantConfig] = None,
                              rngs: Optional[nnx.Rngs] = None) -> int:
    """Replace QuantAvgPool2d with an equivalent frozen depthwise QuantConv2d
    (weights = 1/k², reference AvgPoolToQuantDepthwiseConv) so backends
    without an avg-pool op can run the mean as a conv."""
    rngs = rngs or nnx.Rngs(0)
    count = 0
    for path, mod in list(named_modules(model)):
        if isinstance(mod, QuantAvgPool2d) \
                and not isinstance(mod, QuantAdaptiveAvgPool2d):
            kh, kw = mod.kernel_size
            conv = QuantConv2d(channels, channels, (kh, kw),
                               stride=mod.stride, padding="VALID",
                               groups=channels, use_bias=False,
                               weight_quant=weight_quant, rngs=rngs)
            conv.weight[...] = jnp.full(conv.weight[...].shape, 1.0 / (kh * kw))
            set_module(model, path, conv)
            count += 1
    return count


def bn_to_quant_scale_bias(bn: nnx.BatchNorm,
                           weight_quant: Optional[QuantConfig] = None,
                           bias_quant: Optional[QuantConfig] = None):
    """Convert a trained BatchNorm into an equivalent QuantScaleBias
    (reference BatchNorm1d/2dToQuantScaleBias, nn/quant_bn.py:48)."""
    from brevitas_tpu.nn import QuantScaleBias

    n = bn.num_features
    sb = QuantScaleBias(n, weight_quant=weight_quant, bias_quant=bias_quant)
    scale = (np.asarray(bn.scale[...]) if bn.scale is not None
             else np.ones(n, np.float32))
    bias = (np.asarray(bn.bias[...]) if bn.bias is not None
            else np.zeros(n, np.float32))
    inv_std = 1.0 / np.sqrt(np.asarray(bn.var[...]) + bn.epsilon)
    sb.weight[...] = jnp.asarray(scale * inv_std)
    sb.bias[...] = jnp.asarray(bias - np.asarray(bn.mean[...]) * scale * inv_std)
    return sb
