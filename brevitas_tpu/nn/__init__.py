"""Quant layers — drop-in quantized NNX modules (reference layer 4,
``src/brevitas/nn/``)."""

from brevitas_tpu.nn.activation import (
    QuantHardTanh,
    QuantLeakyReLU,
    QuantIdentity,
    QuantNonLinearActLayer,
    QuantReLU,
    QuantSigmoid,
    QuantTanh,
)
from brevitas_tpu.nn.attention import QuantMultiheadAttention
from brevitas_tpu.nn.conv import (
    QuantConv1d,
    QuantConv2d,
    QuantConvTranspose1d,
    QuantConvTranspose2d,
)
from brevitas_tpu.nn.eltwise import QuantCat, QuantEltwiseAdd
from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.nn.misc import (
    ClampQuantAccumulator,
    HadamardClassifier,
    QuantDropout,
    QuantEmbedding,
    QuantScaleBias,
    ScaleBias,
    batch_norm_to_quant_scale_bias,
    mul_add_from_bn,
    QuantUpsample,
    QuantUpsamplingBilinear2d,
    QuantUpsamplingNearest2d,
    TruncQuantAccumulator,
    merge_bn,
)
from brevitas_tpu.nn.pool import (
    QuantAdaptiveAvgPool2d,
    QuantAvgPool2d,
    QuantMaxPool1d,
    QuantMaxPool2d,
)
from brevitas_tpu.nn.quant_layer import QuantLayerMixin, QuantWBIOL
from brevitas_tpu.nn.moe import QuantMoE
from brevitas_tpu.nn.rnn import QuantLSTM, QuantRNN

__all__ = [
    "QuantWBIOL",
    "QuantLayerMixin",
    "QuantLinear",
    "QuantLSTM",
    "QuantMultiheadAttention",
    "QuantRNN",
    "QuantConv1d",
    "QuantConv2d",
    "QuantConvTranspose1d",
    "QuantConvTranspose2d",
    "QuantIdentity",
    "QuantReLU",
    "QuantLeakyReLU",
    "QuantSigmoid",
    "QuantTanh",
    "QuantHardTanh",
    "QuantNonLinearActLayer",
    "QuantAvgPool2d",
    "QuantAdaptiveAvgPool2d",
    "QuantMaxPool1d",
    "QuantMaxPool2d",
    "QuantEltwiseAdd",
    "QuantCat",
    "QuantEmbedding",
    "QuantDropout",
    "QuantScaleBias",
    "ScaleBias",
    "QuantUpsample",
    "QuantUpsamplingNearest2d",
    "QuantUpsamplingBilinear2d",
    "TruncQuantAccumulator",
    "ClampQuantAccumulator",
    "HadamardClassifier",
    "merge_bn",
    "mul_add_from_bn",
    "batch_norm_to_quant_scale_bias",
    "QuantMoE",
]
