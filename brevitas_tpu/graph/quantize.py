"""Float → quant auto-quantization by module surgery.

The analogue of the reference's FX-based flexml pipeline
(``src/brevitas/graph/target/flexml.py:338-412``: wbiol handler swapping
Conv/Linear for Quant versions, act handler, avgpool handler). NNX models are
object trees, so the swap is direct module replacement with weight copy; run
:func:`~brevitas_tpu.graph.calibrate.calibration_mode` +
``bias_correction_mode`` afterwards for the full PTQ flow.
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.graph.base import find_modules, named_modules, set_module
from brevitas_tpu.nn import QuantConv1d, QuantConv2d, QuantLinear
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    Int8WeightPerTensorFloat,
    Int32Bias,
)


def quantize(
    model: nnx.Module,
    *,
    weight_quant: QuantConfig = Int8WeightPerTensorFloat,
    act_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
    bias_quant: Optional[QuantConfig] = Int32Bias,
    rngs: Optional[nnx.Rngs] = None,
    bn_to_scale_bias: bool = False,
) -> nnx.Module:
    """Replace nnx.Linear / nnx.Conv with Quant equivalents in place,
    preserving trained weights; each quant layer gets an input act
    quantizer (the flexml structure: activations quantize between layers,
    and the bias quantizer receives input_scale * weight_scale).

    ``bn_to_scale_bias=True`` additionally converts standalone
    ``nnx.BatchNorm`` modules (anything :func:`merge_batchnorms` could not
    fold, e.g. DenseNet's pre-activation BNs) into equivalent
    :class:`~brevitas_tpu.nn.QuantScaleBias` layers — the reference flexml
    wbiol handler's ``BatchNorm2d → BatchNorm2dToQuantScaleBias`` mapping
    (``src/brevitas/graph/target/flexml.py:338``, quantizer map
    ``flexml.py:41``). BNs already neutralized by :func:`merge_batchnorms`
    (tagged ``folded_away``) are skipped."""
    rngs = rngs or nnx.Rngs(0)

    from brevitas_tpu.graph.base import replace_modules_by_class
    from brevitas_tpu.quant.quantizers import ParameterQuantizer

    def _finish(new, kernel, bias):
        new.weight[...] = kernel
        if bias is not None:
            new.bias[...] = bias[...]
        if weight_quant is not None:
            # rebuild the weight quantizer against the real weights so
            # stats-initialized scaling sees them
            new.weight_quant = ParameterQuantizer(weight_quant, kernel,
                                                  channel_axis=kernel.ndim - 1)
        return new

    def linear_factory(path, mod):
        kernel = mod.kernel[...]
        new = QuantLinear(
            kernel.shape[0], kernel.shape[1], use_bias=mod.bias is not None,
            weight_quant=weight_quant, bias_quant=bias_quant,
            input_quant=act_quant, return_quant_tensor=False, rngs=rngs)
        return _finish(new, kernel, mod.bias)

    def conv_factory(path, mod):
        kernel = mod.kernel[...]
        spatial = kernel.ndim - 2
        idil = mod.input_dilation
        if idil is not None and any(
                d != 1 for d in ([idil] if isinstance(idil, int) else idil)):
            raise NotImplementedError(
                f"{path}: input_dilation is not supported by quantize()")
        cls = QuantConv1d if spatial == 1 else QuantConv2d
        in_ch = kernel.shape[-2] * mod.feature_group_count
        new = cls(
            in_ch, kernel.shape[-1], kernel.shape[:spatial],
            stride=mod.strides, padding=mod.padding,
            dilation=mod.kernel_dilation,
            groups=mod.feature_group_count, use_bias=mod.bias is not None,
            weight_quant=weight_quant, bias_quant=bias_quant,
            input_quant=act_quant, return_quant_tensor=False, rngs=rngs)
        return _finish(new, kernel, mod.bias)

    replace_modules_by_class(model, nnx.Linear, linear_factory)
    replace_modules_by_class(model, nnx.Conv, conv_factory)
    if bn_to_scale_bias:
        from brevitas_tpu.nn import batch_norm_to_quant_scale_bias

        def bn_factory(path, bn):
            if getattr(bn, "folded_away", False):
                return None
            return batch_norm_to_quant_scale_bias(
                bn, weight_quant=weight_quant, bias_quant=bias_quant,
                input_quant=act_quant, return_quant_tensor=False)

        replace_modules_by_class(model, nnx.BatchNorm, bn_factory)
    return model


def discover_bn_pairs(model: nnx.Module):
    """Best-effort (layer, BatchNorm) fusion-pair discovery.

    The reference discovers fusion sites by FX-tracing the call graph
    (``MergeBatchNorm.match_node``, graph/fixed_point.py:89). NNX module
    trees carry no dataflow, so this uses the zoo-wide structural
    convention instead: a BatchNorm DIRECTLY following a conv/linear child
    within the same container (declaration order = call order in every
    ConvBlock/Sequential-style module) normalizes that layer's output.
    Channel counts must match; anything unconventional should pass explicit
    pairs to :func:`merge_batchnorms`."""
    from brevitas_tpu.graph.base import _children, named_modules
    from brevitas_tpu.nn.conv import _QuantConvNd
    from brevitas_tpu.nn.linear import QuantLinear as _QL

    def out_channels(mod):
        if isinstance(mod, (_QL, nnx.Linear, _QuantConvNd, nnx.Conv)):
            w = mod.weight if hasattr(mod, "weight") else mod.kernel
            return int(w[...].shape[-1])
        return None

    pairs = []
    for parent_path, parent in named_modules(model):
        kids = list(_children(parent))
        for (name_a, a), (name_b, b) in zip(kids[:-1], kids[1:]):
            n = out_channels(a)
            if n is None or not isinstance(b, nnx.BatchNorm):
                continue
            if b.num_features != n:
                continue
            prefix = f"{parent_path}." if parent_path else ""
            pairs.append((f"{prefix}{name_a}", f"{prefix}{name_b}"))
    return pairs


def refresh_weight_quantizers(model: nnx.Module) -> nnx.Module:
    """Rebuild every layer's weight quantizer against its CURRENT weights.

    Run after weight-mutating passes on an already-quantized model (BN
    fusion, equalization): stats-initialized scales (PARAMETER_FROM_STATS)
    were solved on the original weights and would otherwise keep stale
    magnitudes. The act quantizers are untouched — BN folding is exact on
    pre-activation values, so trained activation scales remain valid."""
    from brevitas_tpu.graph.base import named_modules
    from brevitas_tpu.quant.quantizers import ParameterQuantizer

    for _, mod in named_modules(model):
        wq = getattr(mod, "weight_quant", None)
        if isinstance(wq, ParameterQuantizer) and hasattr(mod, "weight"):
            mod.weight_quant = ParameterQuantizer(
                wq.cfg, mod.weight[...], channel_axis=wq.channel_axis)
    return model


def merge_batchnorms(model: nnx.Module, pairs=None) -> nnx.Module:
    """Fold nnx.BatchNorm modules into preceding quant layers and replace
    them with identities (reference MergeBatchNorm, graph/fixed_point.py:89,
    which deletes the BN node from the FX graph). ``pairs`` is a list of
    (layer_path, bn_path); None runs :func:`discover_bn_pairs`."""
    from brevitas_tpu.graph.base import get_module, set_module
    from brevitas_tpu.nn import merge_bn
    from brevitas_tpu.nn.misc import FoldedBatchNorm

    if pairs is None:
        pairs = discover_bn_pairs(model)

    for layer_path, bn_path in pairs:
        layer = get_module(model, layer_path)
        bn = get_module(model, bn_path)
        merge_bn(layer,
                 bn_scale=bn.scale[...] if bn.scale is not None else jnp.ones(bn.num_features),
                 bn_bias=bn.bias[...] if bn.bias is not None else jnp.zeros(bn.num_features),
                 bn_mean=bn.mean[...], bn_var=bn.var[...], eps=bn.epsilon)
        # the call site survives in NNX, so the module becomes a train-proof
        # identity (a neutralized BatchNorm would re-collect batch stats the
        # next time calibration/training mode runs)
        set_module(model, bn_path, FoldedBatchNorm(bn.num_features))
    return model
