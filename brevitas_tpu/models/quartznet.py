"""Quantized QuartzNet 15x5 for speech-to-text.

Reference: ``src/brevitas_examples/speech_to_text/quartznet/`` (NeMo-derived
JasperEncoder with separable 1D convs;
``cfg/topology/quartznet15x5.yaml`` defines the block topology: prologue
k=33/s=2 separable → 5 block groups (kernels 33/39/51/63/75, repeat 5,
residual) → epilogue k=87 dilation 2 → 1024-ch 1x1 → CTC head). Published
baselines: 8-bit WER 11.03/10.98, 4-bit per-channel 12.00 (BASELINE.md).

TPU-native: (B, T, C) layout, separable = depthwise QuantConv1d + pointwise
QuantConv1d, per-channel weight scaling, unsigned act quant after ReLU,
residual adds through a shared QuantIdentity so operand scales align
(the role flexml_residual_handler plays in the reference's graph flow).
"""

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.core.restrict import RestrictType
from brevitas_tpu.models.mobilenetv1 import (
    common_int_weight_per_channel_quant,
)
from brevitas_tpu.nn import QuantConv1d, QuantHardTanh, QuantReLU
from brevitas_tpu.quant.config import QuantConfig, QuantType, ScalingImplType

ABS_ACT_VAL = 1.0  # reference cfg ABS_ACT_VAL (quant_quartznet_*.ini)


def _act_quant(bit_width, max_val=ABS_ACT_VAL):
    """Reference make_jasper_activation (quartznet/parts/common.py:43):
    unsigned ReLU quant, learned LOG_FP threshold initialized at
    absolute_act_val (=1.0 in every published config)."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return QuantConfig(
        bit_width=float(bit_width), signed=False, narrow_range=False,
        scaling_impl=ScalingImplType.PARAMETER, scaling_const=float(max_val),
        restrict_scaling=RestrictType.LOG_FP, scaling_min_val=2e-16)


def _norm_scale_quant(bit_width, abs_val=ABS_ACT_VAL):
    """Reference make_norm_scale (common.py:36): QuantHardTanh clamped to
    +/-absolute_act_val with a learned LOG_FP threshold — applied after
    every depthwise conv and on both residual operands (shared instance)."""
    if bit_width is None:
        return QuantConfig(quant_type=QuantType.NONE)
    return QuantConfig(
        bit_width=float(bit_width), signed=True, narrow_range=False,
        scaling_impl=ScalingImplType.PARAMETER, scaling_const=float(abs_val),
        restrict_scaling=RestrictType.LOG_FP, scaling_min_val=2e-16)
from brevitas_tpu.quant.quantizers import TrainToggleMixin

# (filters, repeat, kernel, stride, dilation, residual, separable)
QUARTZNET_15x5 = (
    (256, 1, 33, 2, 1, False, True),   # prologue
    (256, 5, 33, 1, 1, True, True),
    (256, 5, 33, 1, 1, True, True),
    (256, 5, 33, 1, 1, True, True),
    (256, 5, 39, 1, 1, True, True),
    (256, 5, 39, 1, 1, True, True),
    (256, 5, 39, 1, 1, True, True),
    (512, 5, 51, 1, 1, True, True),
    (512, 5, 51, 1, 1, True, True),
    (512, 5, 51, 1, 1, True, True),
    (512, 5, 63, 1, 1, True, True),
    (512, 5, 63, 1, 1, True, True),
    (512, 5, 63, 1, 1, True, True),
    (512, 5, 75, 1, 1, True, True),
    (512, 5, 75, 1, 1, True, True),
    (512, 5, 75, 1, 1, True, True),
    (512, 1, 87, 1, 2, False, True),   # epilogue 1
    (1024, 1, 1, 1, 1, False, False),  # epilogue 2
)


class SeparableConv1d(nnx.Module):
    """Depthwise k-tap + pointwise 1x1 quant convs."""

    def __init__(self, in_ch, out_ch, kernel, stride, dilation, bit_width,
                 *, rngs: nnx.Rngs):
        pad = (kernel // 2) * dilation
        wq = common_int_weight_per_channel_quant(bit_width)
        self.dw = QuantConv1d(in_ch, in_ch, kernel, stride=stride,
                              padding=[(pad, pad)], dilation=dilation,
                              groups=in_ch, use_bias=False, weight_quant=wq,
                              rngs=rngs)
        self.pw = QuantConv1d(in_ch, out_ch, 1, use_bias=False,
                              weight_quant=wq, rngs=rngs)
        # reference norm_depthwise (parts/quartznet.py:165-201): a
        # QuantHardTanh +/-abs_act_val between the depthwise and pointwise
        # convolutions
        self.norm = QuantHardTanh(_norm_scale_quant(bit_width),
                                  max_val=ABS_ACT_VAL, min_val=-ABS_ACT_VAL,
                                  return_quant_tensor=True)

    def __call__(self, x):
        return self.pw(self.norm(self.dw(x)))


class QuartzBlock(nnx.Module):
    """One Jasper/QuartzNet block: repeat x (sepconv → BN → ReLU-quant) with
    an optional quantized residual around the whole block."""

    def __init__(self, in_ch, filters, repeat, kernel, stride, dilation,
                 residual, separable, bit_width, *, rngs: nnx.Rngs):
        self.residual = residual
        convs, bns, acts = [], [], []
        ch = in_ch
        wq = common_int_weight_per_channel_quant(bit_width)
        for r in range(repeat):
            s = stride if r == 0 else 1
            if separable:
                convs.append(SeparableConv1d(ch, filters, kernel, s, dilation,
                                             bit_width, rngs=rngs))
            else:
                pad = (kernel // 2) * dilation
                convs.append(QuantConv1d(ch, filters, kernel, stride=s,
                                         padding=[(pad, pad)], dilation=dilation,
                                         use_bias=False, weight_quant=wq,
                                         rngs=rngs))
            # reference: BatchNorm1d(eps=1e-3, momentum=0.1)
            # (parts/quartznet.py:312); flax momentum convention = 0.9
            bns.append(nnx.BatchNorm(filters, epsilon=1e-3, momentum=0.9,
                                     use_running_average=False, rngs=rngs))
            # return_quant_tensor: the carried grid lets the integer
            # serving twins consume exact codes (convert_int._carried_codes)
            acts.append(QuantReLU(_act_quant(bit_width),
                                  return_quant_tensor=True))
            ch = filters
        self.convs = nnx.List(convs)
        self.bns = nnx.List(bns)
        self.acts = nnx.List(acts)
        if residual:
            self.res_conv = QuantConv1d(in_ch, filters, 1, use_bias=False,
                                        weight_quant=wq, rngs=rngs)
            self.res_bn = nnx.BatchNorm(filters, epsilon=1e-3,
                                        momentum=0.9,
                                        use_running_average=False, rngs=rngs)
            # reference quant_normalization (parts/quartznet.py:238-241):
            # ONE QuantHardTanh +/-abs_act_val applied to both residual
            # operands so the add sees matching scales
            self.res_quant = QuantHardTanh(_norm_scale_quant(bit_width),
                                           max_val=ABS_ACT_VAL,
                                           min_val=-ABS_ACT_VAL,
                                           return_quant_tensor=True)

    def __call__(self, x):
        inp = x
        n = len(self.convs)
        for i in range(n):
            x = self.bns[i](self.convs[i](x))
            if i < n - 1 or not self.residual:
                x = self.acts[i](x)
        if self.residual:
            res = self.res_bn(self.res_conv(inp))
            x = self.res_quant(x) + self.res_quant(res)
            x = self.acts[-1](x)
        return x


class QuartzNet(nnx.Module, TrainToggleMixin):

    def __init__(self, *, num_features: int = 64, vocab_size: int = 29,
                 bit_width: int = 8, outer_bit_width: Optional[int] = None,
                 topology: Sequence = QUARTZNET_15x5, rngs: nnx.Rngs):
        outer_bw = outer_bit_width or bit_width
        blocks = []
        in_ch = num_features
        for i, (filters, repeat, kernel, stride, dilation, residual,
                separable) in enumerate(topology):
            bw = outer_bw if i == 0 or i >= len(topology) - 2 else bit_width
            blocks.append(QuartzBlock(in_ch, filters, repeat, kernel, stride,
                                      dilation, residual, separable, bw,
                                      rngs=rngs))
            in_ch = filters
        self.encoder = nnx.List(blocks)
        # CTC decoder head: 1x1 conv to vocab logits (8-bit like the
        # reference's outer layers)
        self.decoder = QuantConv1d(
            in_ch, vocab_size, 1, use_bias=True,
            weight_quant=common_int_weight_per_channel_quant(outer_bw),
            rngs=rngs)

    def __call__(self, x):
        """x: (B, T, num_features) log-mel features → (B, T', vocab) logits."""
        for blk in self.encoder:
            x = blk(x)
        return self.decoder(x)


def quartznet_15x5(bit_width: int = 8, **kw) -> QuartzNet:
    """8-bit per-channel config (reference README baseline WER 10.98)."""
    return QuartzNet(bit_width=bit_width, **kw)


def quartznet_15x5_4b(**kw) -> QuartzNet:
    """4-bit inner / 8-bit outer layers (reference README WER 12.00)."""
    return QuartzNet(bit_width=4, outer_bit_width=8, **kw)
