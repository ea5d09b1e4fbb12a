"""Quantized MelGAN vocoder generator.

Reference: ``src/brevitas_examples/text_to_speech/melgan/``
(generator_brevitas.py: conv7 → [transposed-conv upsample + ResStack]x4 with
strides 8/8/2/2 → conv7 → tanh; res_stack_brevitas.py: 3 dilated residual
units with shared hardtanh scale alignment; 8-bit weights/acts with a
wider last activation — cfg melgan_8b.ini, README "8 bit W/A, 16-bit last").

TPU-native: (B, T, C) layout; weight-norm is folded into plain kernels
(reference removes it for inference anyway); residual adds go through a
shared QuantIdentity for scale alignment.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.models.mobilenetv1 import common_int_act_quant
from brevitas_tpu.nn import QuantConv1d, QuantConvTranspose1d, QuantIdentity, QuantTanh
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.quantizers import ActQuantizer, TrainToggleMixin
from brevitas_tpu.quant_tensor import unpack

MAX_WAV_VALUE = 32768.0


def _melgan_weight_quant(bit_width: int) -> QuantConfig:
    """Reference melgan weight recipe (melgan/common.py:46-71): PER-TENSOR
    learned scale initialized from weight max (PARAMETER_FROM_STATS),
    narrow range, scaling_min_val 2e-9."""
    from brevitas_tpu.quant.config import ScalingImplType, StatsOp

    return QuantConfig(bit_width=float(bit_width), signed=True,
                       narrow_range=True,
                       scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,
                       scaling_stats_op=StatsOp.MAX, scaling_min_val=2e-9)


def _hardtanh_act(bit_width: int) -> QuantConfig:
    """Const [-1, 1] hardtanh-style act quant (reference
    make_hardtanh_activation: ScalingImplType.CONST, ACT_MAX_VAL=1,
    melgan/common.py:41-111)."""
    from brevitas_tpu.quant.config import ScalingImplType

    return QuantConfig(bit_width=float(bit_width), signed=True,
                       narrow_range=False,
                       scaling_impl=ScalingImplType.CONST, scaling_const=1.0)


class QuantLeakyReLU(nnx.Module):
    """LeakyReLU (torch default slope 0.01) + const hardtanh act quant
    (reference make_leakyRelu_activation, melgan/common.py:128: nn.LeakyReLU()
    followed by the hardtanh quant)."""

    def __init__(self, bit_width: int, negative_slope: float = 0.01):
        self.negative_slope = negative_slope
        self.quant = ActQuantizer(_hardtanh_act(bit_width))

    def __call__(self, x):
        return unpack(self.quant(jax.nn.leaky_relu(x, self.negative_slope)))


class ResStack(nnx.Module):
    """Three dilated residual units (reference ResStack,
    res_stack_brevitas.py:37): each LeakyReLU → conv3 dil 3^i → LeakyReLU →
    conv3, added to the input through a shared scale-aligning quantizer."""

    def __init__(self, channels: int, bit_width: int, *, rngs: nnx.Rngs):
        wq = _melgan_weight_quant(bit_width)
        self.scale_norm = QuantIdentity(_hardtanh_act(bit_width))
        units = []
        for i in range(3):
            d = 3 ** i
            units.append(nnx.List([
                QuantLeakyReLU(bit_width),
                QuantConv1d(channels, channels, 3, padding=[(d, d)],
                            dilation=d, weight_quant=wq, rngs=rngs),
                QuantLeakyReLU(bit_width),
                QuantConv1d(channels, channels, 3, padding=[(1, 1)],
                            weight_quant=wq, rngs=rngs),
            ]))
        self.units = nnx.List(units)

    def __call__(self, x):
        for unit in self.units:
            h = unpack(self.scale_norm(x))
            y = h
            for layer in unit:
                y = layer(y)
            x = h + unpack(self.scale_norm(y))
        return x


class MelGANGenerator(nnx.Module, TrainToggleMixin):

    def __init__(self, *, mel_channels: int = 80, bit_width: int = 8,
                 last_layer_bit_width: int = 16, rngs: nnx.Rngs):
        wq = _melgan_weight_quant(bit_width)
        # SINGLE interleaved block list in the reference's Sequential order
        # (generator_brevitas.py:45-78: conv, [act, transconv, resstack]x4,
        # act, conv, tanh) so checkpoint import order-matches 1:1
        blocks = [QuantConv1d(mel_channels, 512, 7, padding=[(3, 3)],
                              weight_quant=wq, rngs=rngs)]
        channels = [(512, 256, 16, 8), (256, 128, 16, 8),
                    (128, 64, 4, 2), (64, 32, 4, 2)]
        for in_ch, out_ch, k, s in channels:
            blocks.append(QuantLeakyReLU(bit_width))
            blocks.append(QuantConvTranspose1d(
                in_ch, out_ch, k, stride=s, padding="SAME",
                weight_quant=wq, rngs=rngs))
            blocks.append(ResStack(out_ch, bit_width, rngs=rngs))
        blocks.append(QuantLeakyReLU(bit_width))
        blocks.append(QuantConv1d(32, 1, 7, padding=[(3, 3)], weight_quant=wq,
                                  rngs=rngs))
        blocks.append(QuantTanh(_hardtanh_act(last_layer_bit_width)))
        self.blocks = nnx.List(blocks)

    def __call__(self, mel):
        """mel: (B, T, mel_channels) → waveform (B, T*256, 1)."""
        x = (mel + 5.0) / 5.0  # reference's rough spectrogram normalization
        for blk in self.blocks:
            x = blk(x)
        return x


def melgan_8b(**kw) -> MelGANGenerator:
    return MelGANGenerator(bit_width=8, last_layer_bit_width=16, **kw)
