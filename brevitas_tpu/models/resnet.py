"""Quantized ResNet family (v1 basic/bottleneck blocks, ImageNet and CIFAR
stems).

The reference has no hand-written quant ResNet, but its end-to-end tier runs
torchvision ResNets through the flexml auto-quant pipeline
(``tests/brevitas_end_to_end/test_torchvision_models.py:21`` MODEL_LIST:
resnet18 et al. → ``preprocess_flexml`` + ``quantize_flexml`` + QCDQ export).
This module provides the same capability two ways:

* :func:`float_resnet` builds a plain float NNX ResNet suitable for the
  PTQ pipeline (``graph.quantize`` / ``graph.flexml``), mirroring the
  torchvision entry point of that test tier.
* :class:`QuantResNet` builds the QAT model directly, with the residual-add
  scale alignment the flexml residual handler enforces
  (``src/brevitas/graph/target/flexml.py:296``): both operands of every
  residual add pass through ONE shared activation quantizer so the integer
  add sees matching scales.

Layout NHWC; downsampling shortcut is a 1x1 projection conv (ResNet v1).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.models.mobilenetv1 import (
    common_int_act_quant,
    common_int_weight_per_channel_quant,
    common_int_weight_per_tensor_quant,
    common_uint_act_quant,
)
from brevitas_tpu.nn import (
    QuantAdaptiveAvgPool2d,
    QuantConv2d,
    QuantIdentity,
    QuantLinear,
    QuantMaxPool2d,
)
from brevitas_tpu.quant.presets import IntBias, TruncTo8bit
from brevitas_tpu.quant.quantizers import TrainToggleMixin

# (block, layers-per-stage, bottleneck expansion)
_DEPTH_CFG = {
    18: ("basic", (2, 2, 2, 2), 1),
    34: ("basic", (3, 4, 6, 3), 1),
    50: ("bottleneck", (3, 4, 6, 3), 4),
}
_STAGE_CH = (64, 128, 256, 512)


class _ConvBN(nnx.Module):
    """input-quant → Conv → BN. Activations are quantized at their CONSUMER
    (the conv's ``input_quant``) rather than by standalone act modules —
    the serving conversion (``graph/convert_int.py``) then has the input
    grid it needs to run every conv in the integer domain. ``signed_input``
    only for the stem (raw images); everything else follows a relu."""

    def __init__(self, in_ch, out_ch, kernel, stride, weight_bit_width,
                 act_bit_width, *, signed_input=False, rngs):
        pad = [(kernel // 2, kernel // 2)] * 2 if kernel > 1 else "VALID"
        input_quant = (common_int_act_quant(act_bit_width) if signed_input
                       else common_uint_act_quant(act_bit_width))
        self.conv = QuantConv2d(
            in_ch, out_ch, kernel, stride=stride, padding=pad, use_bias=False,
            weight_quant=common_int_weight_per_channel_quant(weight_bit_width),
            input_quant=input_quant, rngs=rngs)
        # momentum 0.9 in flax convention == torch's 0.1 default (flax's
        # default 0.99 lags the training distribution and degrades eval)
        self.bn = nnx.BatchNorm(out_ch, momentum=0.9,
                                use_running_average=False, rngs=rngs)

    def __call__(self, x):
        return self.bn(self.conv(x))


class BasicBlock(nnx.Module):
    """3x3 → 3x3 residual block; the closing add runs through the stage's
    shared quantizer (flexml residual alignment, flexml.py:296)."""

    expansion = 1

    def __init__(self, in_ch, ch, stride, bit_width, shared_act, *, rngs):
        self.conv1 = _ConvBN(in_ch, ch, 3, stride, bit_width, bit_width,
                             rngs=rngs)
        self.conv2 = _ConvBN(ch, ch, 3, 1, bit_width, bit_width, rngs=rngs)
        out_ch = ch * self.expansion
        if stride != 1 or in_ch != out_ch:
            self.downsample = _ConvBN(in_ch, out_ch, 1, stride, bit_width,
                                      bit_width, rngs=rngs)
        else:
            self.downsample = None
        self.shared_act = shared_act

    def __call__(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.conv2(jax.nn.relu(self.conv1(x)))
        return _aligned_residual(self.shared_act, y, identity)



def _aligned_residual(shared_act, y, identity):
    """Quantize both add operands onto ONE shared grid, add, re-quantize,
    relu — the flexml residual-handler contract (flexml.py:296): the integer
    add sees matching operand scales. Operands are dequantized values here
    (fake-quant training); the serving conversion reuses the same shared
    quantizer's frozen scale on both inputs."""
    yq = shared_act(y)
    iq = shared_act(identity)
    out = shared_act(getattr(yq, "value", yq) + getattr(iq, "value", iq))
    return jax.nn.relu(getattr(out, "value", out))


class Bottleneck(nnx.Module):
    """1x1 → 3x3 → 1x1 residual block (ResNet-50 style)."""

    expansion = 4

    def __init__(self, in_ch, ch, stride, bit_width, shared_act, *, rngs):
        self.conv1 = _ConvBN(in_ch, ch, 1, 1, bit_width, bit_width, rngs=rngs)
        self.conv2 = _ConvBN(ch, ch, 3, stride, bit_width, bit_width,
                             rngs=rngs)
        out_ch = ch * self.expansion
        self.conv3 = _ConvBN(ch, out_ch, 1, 1, bit_width, bit_width,
                             rngs=rngs)
        if stride != 1 or in_ch != out_ch:
            self.downsample = _ConvBN(in_ch, out_ch, 1, stride, bit_width,
                                      bit_width, rngs=rngs)
        else:
            self.downsample = None
        self.shared_act = shared_act

    def __call__(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.conv3(jax.nn.relu(self.conv2(jax.nn.relu(self.conv1(x)))))
        return _aligned_residual(self.shared_act, y, identity)



class QuantResNet(nnx.Module, TrainToggleMixin):
    """QAT ResNet with per-stage shared residual quantizers.

    ``cifar_stem=True`` swaps the 7x7/s2 + maxpool ImageNet stem for the
    3x3/s1 CIFAR stem.
    """

    def __init__(self, *, depth: int = 18, bit_width: int = 8,
                 first_layer_weight_bit_width: int = 8,
                 num_classes: int = 1000, in_channels: int = 3,
                 cifar_stem: bool = False, width_mult: float = 1.0,
                 rngs: nnx.Rngs):
        block_kind, stage_layers, expansion = _DEPTH_CFG[depth]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        stem_ch = int(64 * width_mult)
        if cifar_stem:
            self.stem = _ConvBN(in_channels, stem_ch, 3, 1,
                                first_layer_weight_bit_width, 8,
                                signed_input=True, rngs=rngs)
            self.stem_pool = None
        else:
            self.stem = _ConvBN(in_channels, stem_ch, 7, 2,
                                first_layer_weight_bit_width, 8,
                                signed_input=True, rngs=rngs)
            self.stem_pool = QuantMaxPool2d(3, stride=2, padding="SAME")

        blocks = []
        shared_acts = []
        in_ch = stem_ch
        for stage, n_layers in enumerate(stage_layers):
            ch = int(_STAGE_CH[stage] * width_mult)
            # one shared quantizer per stage: every residual add in the
            # stage aligns to the same grid (all blocks produce ch*expansion
            # channels at the same scale)
            shared_act = QuantIdentity(common_int_act_quant(bit_width),
                                       return_quant_tensor=True)
            shared_acts.append(shared_act)
            for j in range(n_layers):
                stride = 2 if (j == 0 and stage != 0) else 1
                blocks.append(block_cls(in_ch, ch, stride, bit_width,
                                        shared_act, rngs=rngs))
                in_ch = ch * expansion
        self.blocks = nnx.List(blocks)
        self.shared_acts = nnx.List(shared_acts)
        self.final_pool = QuantAdaptiveAvgPool2d(
            1, trunc_quant=TruncTo8bit.let(bit_width=float(max(bit_width, 8))))
        self.output = QuantLinear(
            in_ch, num_classes, use_bias=True,
            weight_quant=common_int_weight_per_tensor_quant(bit_width),
            bias_quant=IntBias.let(requires_input_bit_width=False,
                                   bit_width=32.0),
            input_quant=common_int_act_quant(bit_width), rngs=rngs)

    def __call__(self, x):
        x = jax.nn.relu(self.stem(x))
        if self.stem_pool is not None:
            x = self.stem_pool(x)
        for blk in self.blocks:
            x = blk(x)
        x = self.final_pool(x)
        x = x.reshape(x.shape[0], -1)
        return self.output(x)

    def bn_pairs(self) -> Sequence[Tuple[str, str]]:
        """(conv, bn) fusion pairs for serving-time BN folding:
        ``graph.merge_batchnorms(m, m.bn_pairs())`` then
        ``graph.refresh_weight_quantizers(m)`` before
        ``convert_integer_inference``."""
        pairs = [("stem.conv", "stem.bn")]
        for i, blk in enumerate(self.blocks):
            for name in ("conv1", "conv2", "conv3", "downsample"):
                sub = getattr(blk, name, None)
                if sub is not None:
                    pairs.append((f"blocks.{i}.{name}.conv",
                                  f"blocks.{i}.{name}.bn"))
        return pairs



def quant_resnet18(bit_width: int = 8, **kw) -> QuantResNet:
    return QuantResNet(depth=18, bit_width=bit_width, **kw)


def quant_resnet34(bit_width: int = 8, **kw) -> QuantResNet:
    return QuantResNet(depth=34, bit_width=bit_width, **kw)


def quant_resnet50(bit_width: int = 8, **kw) -> QuantResNet:
    return QuantResNet(depth=50, bit_width=bit_width, **kw)


# ---- float model + PTQ hooks (torchvision-analogue entry point) -------------


class _FloatConvBN(nnx.Module):
    def __init__(self, in_ch, out_ch, kernel, stride, *, rngs):
        pad = [(kernel // 2, kernel // 2)] * 2 if kernel > 1 else "VALID"
        self.conv = nnx.Conv(in_ch, out_ch, (kernel, kernel),
                             strides=(stride, stride), padding=pad,
                             use_bias=False, rngs=rngs)
        self.bn = nnx.BatchNorm(out_ch, use_running_average=True, rngs=rngs)

    def __call__(self, x):
        return self.bn(self.conv(x))


class _FloatBasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, in_ch, ch, stride, *, rngs):
        self.conv1 = _FloatConvBN(in_ch, ch, 3, stride, rngs=rngs)
        self.conv2 = _FloatConvBN(ch, ch, 3, 1, rngs=rngs)
        out_ch = ch * self.expansion
        self.downsample = (_FloatConvBN(in_ch, out_ch, 1, stride, rngs=rngs)
                           if stride != 1 or in_ch != out_ch else None)

    def __call__(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.conv2(jax.nn.relu(self.conv1(x)))
        return jax.nn.relu(y + identity)


class FloatResNet(nnx.Module):
    """Plain float ResNet (basic blocks) — the torchvision-style input to
    the PTQ pipeline. ``bn_pairs()`` / ``equalize_regions()`` expose the
    graph metadata ``preprocess_flexml`` needs."""

    def __init__(self, *, depth: int = 18, num_classes: int = 10,
                 in_channels: int = 3, cifar_stem: bool = True,
                 width_mult: float = 1.0, rngs: nnx.Rngs):
        block_kind, stage_layers, _ = _DEPTH_CFG[depth]
        if block_kind != "basic":
            raise NotImplementedError("FloatResNet covers basic-block depths")
        stem_ch = int(64 * width_mult)
        self.stem = _FloatConvBN(in_channels, stem_ch, 3 if cifar_stem else 7,
                                 1 if cifar_stem else 2, rngs=rngs)
        self.cifar_stem = cifar_stem
        blocks = []
        in_ch = stem_ch
        for stage, n_layers in enumerate(stage_layers):
            ch = int(_STAGE_CH[stage] * width_mult)
            for j in range(n_layers):
                stride = 2 if (j == 0 and stage != 0) else 1
                blocks.append(_FloatBasicBlock(in_ch, ch, stride, rngs=rngs))
                in_ch = ch
        self.blocks = nnx.List(blocks)
        self.output = nnx.Linear(in_ch, num_classes, rngs=rngs)

    def __call__(self, x):
        x = jax.nn.relu(self.stem(x))
        if not self.cifar_stem:
            x = nnx.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for blk in self.blocks:
            x = blk(x)
        x = jnp.mean(x, axis=(1, 2))
        return self.output(x)

    def bn_pairs(self) -> Sequence[Tuple[str, str]]:
        """(conv, bn) fusion pairs for ``preprocess_flexml``."""
        pairs = [("stem.conv", "stem.bn")]
        for i, blk in enumerate(self.blocks):
            pairs.append((f"blocks.{i}.conv1.conv", f"blocks.{i}.conv1.bn"))
            pairs.append((f"blocks.{i}.conv2.conv", f"blocks.{i}.conv2.bn"))
            if blk.downsample is not None:
                pairs.append((f"blocks.{i}.downsample.conv",
                              f"blocks.{i}.downsample.bn"))
        return pairs

    def equalize_regions(self):
        """conv1→conv2 within each block is the only relu-separated
        single-consumer pair (residual joins end regions, reference
        walk_region, graph/equalize.py:185)."""
        return [([f"blocks.{i}.conv1.conv"], [f"blocks.{i}.conv2.conv"])
                for i in range(len(self.blocks))]


def float_resnet(depth: int = 18, **kw) -> FloatResNet:
    return FloatResNet(depth=depth, **kw)
