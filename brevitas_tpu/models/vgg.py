"""Quantized VGG family.

Reference: ``src/brevitas_examples/imagenet_classification/models/vgg.py``
(standard A/B/D/E configs; conv(-BN)-ReLU stacks with maxpools, 3 FC
classifier with dropout, 8-bit default; the plain variants carry conv biases
and no BN, the _bn variants are bias-free with BN)."""

from typing import Optional, Sequence, Union

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
    QuantDropout,
    QuantLinear,
    QuantMaxPool2d,
    QuantReLU,
)
from brevitas_tpu.quant.quantizers import TrainToggleMixin

CFGS = {
    "A": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "B": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "D": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"),
    "E": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class QuantVGG(nnx.Module, TrainToggleMixin):

    def __init__(self, cfg: Sequence[Union[int, str]] = CFGS["D"],
                 *, batch_norm: bool = False, bit_width: int = 8,
                 num_classes: int = 1000, in_channels: int = 3,
                 rngs: nnx.Rngs):
        layers = []
        in_ch = in_channels
        for v in cfg:
            if v == "M":
                layers.append(QuantMaxPool2d(2))
                continue
            layers.append(QuantConv2d(
                in_ch, v, 3, padding=[(1, 1)] * 2, use_bias=not batch_norm,
                weight_quant=common_int_weight_per_channel_quant(bit_width),
                rngs=rngs))
            if batch_norm:
                # flax momentum 0.9 == torch 0.1 default (flax default 0.99
                # lags the training distribution and degrades eval)
                layers.append(nnx.BatchNorm(v, momentum=0.9,
                                            use_running_average=False,
                                            rngs=rngs))
            layers.append(QuantReLU(common_uint_act_quant(bit_width),
                                    return_quant_tensor=True))
            in_ch = v
        self.features = nnx.List(layers)
        self.pool = QuantAdaptiveAvgPool2d((7, 7))
        wq = common_int_weight_per_channel_quant(bit_width)
        iq = common_int_act_quant(bit_width)
        # classifier: FC → ReLU → Dropout x2 → final per-tensor-quant FC
        # (reference QuantVGG classifier, vgg.py:70-84)
        self.classifier = nnx.List([
            QuantLinear(in_ch * 49, 4096, weight_quant=wq, input_quant=iq,
                        rngs=rngs),
            QuantReLU(common_uint_act_quant(bit_width)),
            QuantDropout(0.5, rngs=rngs),
            QuantLinear(4096, 4096, weight_quant=wq, rngs=rngs),
            QuantReLU(common_uint_act_quant(bit_width)),
            QuantDropout(0.5, rngs=rngs),
            QuantLinear(4096, num_classes, use_bias=False,
                        weight_quant=common_int_weight_per_tensor_quant(bit_width),
                        rngs=rngs),
        ])

    def __call__(self, x):
        for lyr in self.features:
            x = lyr(x)
        x = self.pool(x)
        x = x.reshape(x.shape[0], -1)
        for lyr in self.classifier:
            x = lyr(x)
        return x


def quant_vgg16(bit_width: int = 8, **kw) -> QuantVGG:
    return QuantVGG(CFGS["D"], batch_norm=False, bit_width=bit_width, **kw)


def quant_vgg16_bn(bit_width: int = 8, **kw) -> QuantVGG:
    return QuantVGG(CFGS["D"], batch_norm=True, bit_width=bit_width, **kw)


def quant_vgg11(bit_width: int = 8, **kw) -> QuantVGG:
    return QuantVGG(CFGS["A"], batch_norm=False, bit_width=bit_width, **kw)


def quant_vgg11_bn(bit_width: int = 8, **kw) -> QuantVGG:
    return QuantVGG(CFGS["A"], batch_norm=True, bit_width=bit_width, **kw)
