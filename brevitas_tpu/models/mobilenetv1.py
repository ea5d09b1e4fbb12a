"""Quantized MobileNetV1 (the 4-bit ImageNet recipe).

Reference: ``src/brevitas_examples/imagenet_classification/models/mobilenetv1.py``
— DwsConvBlock (depthwise 3x3 + pointwise 1x1, each Conv→BN→QuantReLU),
8-bit first layer, per-channel weight scaling, per-channel activation scaling
on pointwise blocks except the last stage, learned log-domain act thresholds
(models/common.py: CommonIntWeightPerChannelQuant, CommonUintActQuant with
max_val=6.0 LOG_FP restrict), QuantAvgPool + per-tensor-quant head with
IntBias. Published baseline: 4-bit (8-bit first layer) 71.14 top-1
(BASELINE.md).

Layout NHWC; channels [[32],[64],[128,128],[256,256],[512]*6,[1024,1024]].
"""

from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.core.restrict import RestrictType
from brevitas_tpu.nn import QuantAvgPool2d, QuantConv2d, QuantLinear, QuantReLU
from brevitas_tpu.quant.config import QuantConfig, QuantType, ScalingImplType
from brevitas_tpu.quant.presets import (
    Int8WeightPerTensorFloat,
    IntBias,
    TruncTo8bit,
)
from brevitas_tpu.quant.quantizers import TrainToggleMixin

FIRST_LAYER_BIT_WIDTH = 8


def common_int_weight_per_tensor_quant(bit_width) -> QuantConfig:
    """Reference CommonIntWeightPerTensorQuant (models/common.py:10).
    ``None`` disables quantization (float twin for paired benchmarks)."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return Int8WeightPerTensorFloat.let(bit_width=float(bit_width),
                                        scaling_min_val=2e-16)


def common_int_weight_per_channel_quant(bit_width) -> QuantConfig:
    """Reference CommonIntWeightPerChannelQuant (models/common.py:19)."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return common_int_weight_per_tensor_quant(bit_width).let(
        scaling_per_output_channel=True)


def common_uint_act_quant(bit_width,
                          per_channel: bool = False) -> QuantConfig:
    """Reference CommonUintActQuant (models/common.py:39): unsigned, learned
    log-domain threshold initialized at 6.0 (ReLU6-style)."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return QuantConfig(
        bit_width=float(bit_width), signed=False, narrow_range=False,
        scaling_impl=ScalingImplType.PARAMETER, scaling_const=6.0,
        restrict_scaling=RestrictType.LOG_FP, scaling_min_val=2e-16,
        scaling_per_output_channel=per_channel)


def common_int_act_quant(bit_width) -> QuantConfig:
    """Reference CommonIntActQuant (models/common.py:27): signed, learned
    log-domain threshold initialized at 10.0."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return QuantConfig(
        bit_width=float(bit_width), signed=True, narrow_range=False,
        scaling_impl=ScalingImplType.PARAMETER, scaling_const=10.0,
        restrict_scaling=RestrictType.LOG_FP, scaling_min_val=2e-16)


class ConvBlock(nnx.Module):
    """QuantConv2d → BatchNorm → QuantReLU (reference ConvBlock,
    mobilenetv1.py:76)."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 weight_bit_width: int, act_bit_width: int, *, stride=1,
                 padding=0, groups=1, bn_eps=1e-5,
                 act_scaling_per_channel=False, rngs: nnx.Rngs):
        # explicit symmetric padding (torch parity): JAX "SAME" pads (0,1)
        # asymmetrically for stride-2 convs, shifting the receptive field
        pad = [(padding, padding)] * 2 if padding else "VALID"
        self.conv = QuantConv2d(
            in_ch, out_ch, kernel_size, stride=stride, padding=pad,
            groups=groups, use_bias=False,
            weight_quant=common_int_weight_per_channel_quant(weight_bit_width),
            rngs=rngs)
        self.bn = nnx.BatchNorm(out_ch, epsilon=bn_eps, momentum=0.9,
                                use_running_average=False, rngs=rngs)
        self.activation = QuantReLU(
            common_uint_act_quant(act_bit_width,
                                  per_channel=act_scaling_per_channel),
            num_channels=out_ch if act_scaling_per_channel else None,
            return_quant_tensor=True)  # QuantTensor reaches the next conv
                                       # and the final trunc avg-pool

    def __call__(self, x):
        return self.activation(self.bn(self.conv(x)))


class DwsConvBlock(nnx.Module):
    """Depthwise-separable block (reference DwsConvBlock, mobilenetv1.py:43)."""

    def __init__(self, in_ch: int, out_ch: int, stride: int, bit_width: int,
                 pw_act_per_channel: bool, rngs: nnx.Rngs):
        self.dw_conv = ConvBlock(in_ch, in_ch, 3, bit_width, bit_width,
                                 stride=stride, padding=1, groups=in_ch,
                                 rngs=rngs)
        self.pw_conv = ConvBlock(in_ch, out_ch, 1, bit_width, bit_width,
                                 act_scaling_per_channel=pw_act_per_channel,
                                 rngs=rngs)

    def __call__(self, x):
        return self.pw_conv(self.dw_conv(x))


class MobileNetV1(nnx.Module, TrainToggleMixin):

    def __init__(self, *, channels: Sequence[Sequence[int]] = (
            (32,), (64,), (128, 128), (256, 256),
            (512, 512, 512, 512, 512, 512), (1024, 1024)),
            bit_width: int = 4, in_channels: int = 3,
            num_classes: int = 1000, first_stage_stride: bool = False,
            pool_size: int = 7, rngs: nnx.Rngs):
        init_ch = channels[0][0]
        first_bw = None if bit_width is None else FIRST_LAYER_BIT_WIDTH
        # the reference init block passes NO padding (ConvBlock default 0,
        # mobilenetv1.py:129-136): 224 -> 111, and the 32px stand-in -> 15
        blocks = [ConvBlock(in_channels, init_ch, 3, first_bw,
                            bit_width, stride=2, padding=0,
                            act_scaling_per_channel=True, rngs=rngs)]
        in_ch = init_ch
        stages = channels[1:]
        for i, stage_channels in enumerate(stages):
            pw_per_channel = i < len(stages) - 1
            for j, out_ch in enumerate(stage_channels):
                stride = 2 if (j == 0) and ((i != 0) or first_stage_stride) else 1
                blocks.append(DwsConvBlock(in_ch, out_ch, stride, bit_width,
                                           pw_per_channel, rngs=rngs))
                in_ch = out_ch
        self.features = nnx.List(blocks)
        # reference structure (mobilenetv1.py:153-159): the trunc-quant pool
        # emits a QuantTensor whose scale/bit-width feed the head's IntBias
        # directly — the head has NO input re-quantizer
        self.final_pool = QuantAvgPool2d(
            pool_size, stride=1,
            trunc_quant=(None if bit_width is None else
                         TruncTo8bit.let(bit_width=float(bit_width))),
            return_quant_tensor=bit_width is not None)
        self.output = QuantLinear(
            in_ch, num_classes, use_bias=True,
            weight_quant=common_int_weight_per_tensor_quant(bit_width),
            bias_quant=(None if bit_width is None else IntBias),
            rngs=rngs)

    def __call__(self, x):
        for blk in self.features:
            x = blk(x)
        x = self.final_pool(x)
        x = x.reshape(x.shape[0], -1)
        return self.output(x)


def quant_mobilenet_v1(bit_width: int = 4, width_scale: float = 1.0,
                       num_classes: int = 1000, pool_size: int = 7,
                       *, rngs: nnx.Rngs) -> MobileNetV1:
    """``width_scale``/``pool_size`` support reduced-scale twins (the 224px
    ImageNet geometry pools 7x7; a 32px stand-in reaches the pool at 1x1)."""
    channels = [[32], [64], [128, 128], [256, 256],
                [512] * 6, [1024, 1024]]
    if width_scale != 1.0:
        channels = [[int(c * width_scale) for c in stage] for stage in channels]
    return MobileNetV1(channels=channels, bit_width=bit_width,
                       num_classes=num_classes, pool_size=pool_size,
                       rngs=rngs)
