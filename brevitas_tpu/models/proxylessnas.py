"""Quantized ProxylessNAS Mobile14.

Reference: ``src/brevitas_examples/imagenet_classification/models/proxylessnas.py``
— MBConv-style units (optional 1x1 expand → depthwise kxk → 1x1 project)
with residual shortcuts through a SHARED activation quantizer per stage
(operand-scale alignment), NAS-searched kernel sizes/expansions, optional
Hadamard classifier head. Published baselines: 4-bit 74.42 top-1, Hadamard
4-bit 73.52, 4b/5b 75.01 (BASELINE.md).
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.models.mobilenetv1 import (
    common_int_act_quant,
    common_int_weight_per_channel_quant,
    common_int_weight_per_tensor_quant,
    common_uint_act_quant,
)
from brevitas_tpu.nn import (
    HadamardClassifier,
    QuantAvgPool2d,
    QuantConv2d,
    QuantIdentity,
    QuantLinear,
    QuantReLU,
)
from brevitas_tpu.quant.presets import IntBias, TruncTo8bit
from brevitas_tpu.quant.quantizers import TrainToggleMixin

# mobile14 topology (reference quant_proxylessnas_mobile14, proxylessnas.py:301)
RESIDUALS = ((1,), (1, 1, 0, 0), (1, 1, 1, 1), (1, 1, 1, 1, 1, 1, 1, 1),
             (1, 1, 1, 1, 1))
CHANNELS = ((24,), (40, 40, 40, 40), (56, 56, 56, 56),
            (112, 112, 112, 112, 136, 136, 136, 136), (256, 256, 256, 256, 448))
KERNELS = ((3,), (5, 3, 3, 3), (7, 3, 5, 5), (7, 5, 5, 5, 5, 5, 5, 5),
           (7, 7, 7, 7, 7))
EXPANSIONS = ((1,), (3, 3, 3, 3), (3, 3, 3, 3), (6, 3, 3, 3, 6, 3, 3, 3),
              (6, 6, 3, 3, 6))
SHORTCUTS = ((0,), (0, 1, 1, 1), (0, 1, 1, 1), (0, 1, 1, 1, 0, 1, 1, 1),
             (0, 1, 1, 1, 0))
INIT_CHANNELS = 48
FINAL_CHANNELS = 1792


class ConvBlock(nnx.Module):
    """Conv → BN → optional ReLU quant (reference ConvBlock,
    proxylessnas.py:34). ``act_bit_width=None`` means no activation (the
    projection conv ends in the stage's shared quantizer instead)."""

    def __init__(self, in_ch, out_ch, kernel, stride, padding, groups,
                 weight_bit_width, act_bit_width,
                 act_scaling_per_channel=False, bn_eps=1e-3, *, rngs,
                 shared_act=None):
        pad = [(padding, padding)] * 2 if padding else "VALID"
        self.conv = QuantConv2d(
            in_ch, out_ch, kernel, stride=stride, padding=pad, groups=groups,
            use_bias=False,
            weight_quant=common_int_weight_per_channel_quant(weight_bit_width),
            rngs=rngs)
        # momentum 0.9 in flax convention == torch's 0.1 default (the flax
        # default 0.99 lags the training distribution and collapses eval
        # top-1 — the same defect class as the round-2 TFC tail)
        self.bn = nnx.BatchNorm(out_ch, epsilon=bn_eps, momentum=0.9,
                                use_running_average=False, rngs=rngs)
        if shared_act is not None:
            # the stage's shared scale-aligning quantizer caps this block
            # (reference ConvBlock(shared_act=...), proxylessnas.py:60)
            self.activation = shared_act
        elif act_bit_width is not None:
            self.activation = QuantReLU(
                common_uint_act_quant(act_bit_width,
                                      per_channel=act_scaling_per_channel),
                num_channels=out_ch if act_scaling_per_channel else None,
                return_quant_tensor=True)
        else:
            self.activation = None

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return self.activation(x) if self.activation is not None else x


class ProxylessBlock(nnx.Module):
    """Expand → depthwise → project (reference ProxylessBlock,
    proxylessnas.py:80)."""

    def __init__(self, in_ch, out_ch, kernel, stride, expansion, bit_width,
                 depthwise_bit_width, shared_act, *, rngs):
        self.use_bc = expansion > 1
        mid = in_ch * expansion
        if self.use_bc:
            self.bc_conv = ConvBlock(in_ch, mid, 1, 1, 0, 1, bit_width,
                                     depthwise_bit_width,
                                     act_scaling_per_channel=True, rngs=rngs)
        pad = (kernel - 1) // 2
        self.dw_conv = ConvBlock(mid, mid, kernel, stride, pad, mid,
                                 depthwise_bit_width, bit_width, rngs=rngs)
        self.pw_conv = ConvBlock(mid, out_ch, 1, 1, 0, 1, bit_width,
                                 act_bit_width=None, shared_act=shared_act,
                                 rngs=rngs)

    def __call__(self, x):
        if self.use_bc:
            x = self.bc_conv(x)
        return self.pw_conv(self.dw_conv(x))


class ProxylessUnit(nnx.Module):
    """Block + optional identity shortcut through the stage's shared act
    quantizer (reference ProxylessUnit, proxylessnas.py:145)."""

    def __init__(self, in_ch, out_ch, kernel, stride, expansion, residual,
                 shortcut, bit_width, depthwise_bit_width, shared_act, *, rngs):
        self.residual = bool(residual)
        self.shortcut = bool(shortcut)
        # attribute ORDER mirrors the reference (body, then shared_act,
        # proxylessnas.py:165-176) so checkpoint import's order-matching
        # pairs the aliased shared quantizer's state-dict duplicates 1:1
        if self.residual:
            self.body = ProxylessBlock(in_ch, out_ch, kernel, stride,
                                       expansion, bit_width,
                                       depthwise_bit_width, shared_act,
                                       rngs=rngs)
            self.shared_act = shared_act
        # non-residual units are passthrough and register nothing, exactly
        # like the reference (its state dict has no entries for them)

    def __call__(self, x):
        if not self.residual:
            return x
        # the body's pw_conv already ends in shared_act, so both residual
        # operands share one scale before the add (reference ProxylessUnit:
        # identity + shared-act'd body, then shared_act again)
        if not self.shortcut:
            return self.body(x)
        return self.shared_act(x + self.body(x))


class ProxylessNAS(nnx.Module, TrainToggleMixin):

    def __init__(self, *, bit_width: int = 4,
                 first_layer_weight_bit_width: int = 8,
                 depthwise_bit_width: Optional[int] = None,
                 hadamard_classifier: bool = False,
                 num_classes: int = 1000, in_channels: int = 3,
                 channels: Sequence[Sequence[int]] = CHANNELS,
                 init_channels: int = INIT_CHANNELS,
                 final_channels: int = FINAL_CHANNELS,
                 residuals: Sequence[Sequence[int]] = RESIDUALS,
                 shortcuts: Sequence[Sequence[int]] = SHORTCUTS,
                 kernels: Sequence[Sequence[int]] = KERNELS,
                 expansions: Sequence[Sequence[int]] = EXPANSIONS,
                 pool_size: int = 7,
                 rngs: nnx.Rngs):
        depthwise_bit_width = depthwise_bit_width or bit_width
        blocks = [ConvBlock(in_channels, init_channels, 3, 2, 1, 1,
                            first_layer_weight_bit_width, bit_width, rngs=rngs)]
        in_ch = init_channels
        shared_act = None
        for i in range(len(channels)):
            for j, out_ch in enumerate(channels[i]):
                stride = 2 if (j == 0) and (i != 0) else 1
                if not shortcuts[i][j] or shared_act is None:
                    # each non-shortcut unit starts a fresh residual group
                    # with its own shared quantizer (reference creates a new
                    # shared QuantIdentity per group); the instance is NOT
                    # separately registered at top level — it lives (aliased)
                    # inside its units, exactly like the reference, so
                    # checkpoint import's order-matching sees identical walks
                    shared_act = QuantIdentity(common_int_act_quant(bit_width),
                                               return_quant_tensor=True)
                blocks.append(ProxylessUnit(
                    in_ch, out_ch, kernels[i][j], stride, expansions[i][j],
                    residuals[i][j], shortcuts[i][j], bit_width,
                    depthwise_bit_width, shared_act, rngs=rngs))
                in_ch = out_ch
        blocks.append(ConvBlock(in_ch, final_channels, 1, 1, 0, 1, bit_width,
                                bit_width, rngs=rngs))
        self.features = nnx.List(blocks)
        self.final_pool = QuantAvgPool2d(
            pool_size, 1,
            trunc_quant=TruncTo8bit.let(bit_width=float(bit_width)),
            return_quant_tensor=True)
        if hadamard_classifier:
            self.output = HadamardClassifier(final_channels, num_classes)
        else:
            # reference head (proxylessnas.py:286-291): NO input re-quant —
            # the pool's trunc QuantTensor feeds straight in; IntBias takes
            # scale AND bit width from that input
            self.output = QuantLinear(
                final_channels, num_classes, use_bias=True,
                weight_quant=common_int_weight_per_tensor_quant(bit_width),
                bias_quant=IntBias, rngs=rngs)

    def __call__(self, x):
        for blk in self.features:
            x = blk(x)
        x = self.final_pool(x)
        x = x.reshape(x.shape[0], -1)
        return self.output(x)


def quant_proxylessnas_mobile14(bit_width: int = 4, hadamard: bool = False,
                                depthwise_bit_width: Optional[int] = None,
                                **kw) -> ProxylessNAS:
    return ProxylessNAS(bit_width=bit_width, hadamard_classifier=hadamard,
                        depthwise_bit_width=depthwise_bit_width, **kw)
