"""Model zoo (reference ``src/brevitas_examples``): bnn_pynq FC/CNV,
imagenet_classification MobileNetV1/ProxylessNAS/VGG, speech_to_text
QuartzNet, text_to_speech MelGAN."""

from brevitas_tpu.models.cnv import CNV, cnv
from brevitas_tpu.models.common import TensorNorm, common_act_quant, common_weight_quant
from brevitas_tpu.models.fc import FC, lfc, sfc, tfc
from brevitas_tpu.models.llama import (
    QuantLlama,
    llama_smoothquant_regions,
    quant_llama_tiny,
)
from brevitas_tpu.models.melgan import MelGANGenerator, melgan_8b
from brevitas_tpu.models.mobilenetv1 import MobileNetV1, quant_mobilenet_v1
from brevitas_tpu.models.proxylessnas import ProxylessNAS, quant_proxylessnas_mobile14
from brevitas_tpu.models.quartznet import QuartzNet, quartznet_15x5, quartznet_15x5_4b
from brevitas_tpu.models.resnet import (
    FloatResNet,
    QuantResNet,
    float_resnet,
    quant_resnet18,
    quant_resnet34,
    quant_resnet50,
)
from brevitas_tpu.models.torchvision_zoo import (
    adaptive_avg_pool2d,
    float_alexnet,
    float_deeplabv3,
    float_densenet,
    float_fcn,
    float_googlenet,
    float_mnasnet,
    float_mobilenet_v2,
    float_regnetx,
    float_squeezenet,
)
from brevitas_tpu.models.transformer import (
    QuantTransformer,
    quant_transformer_tiny,
    transformer_smoothquant_regions,
)
from brevitas_tpu.models.vgg import QuantVGG, quant_vgg11, quant_vgg16
from brevitas_tpu.models.vit import QuantViT, vit_smoothquant_regions, vit_tiny

__all__ = ["FC", "tfc", "sfc", "lfc", "CNV", "cnv",
           "TensorNorm", "common_act_quant", "common_weight_quant",
           "MobileNetV1", "quant_mobilenet_v1",
           "ProxylessNAS", "quant_proxylessnas_mobile14",
           "QuantVGG", "quant_vgg11", "quant_vgg16",
           "QuartzNet", "quartznet_15x5", "quartznet_15x5_4b",
           "QuantResNet", "quant_resnet18", "quant_resnet34", "quant_resnet50",
           "FloatResNet", "float_resnet",
           "float_alexnet", "float_squeezenet", "float_mobilenet_v2",
           "float_mnasnet", "float_googlenet", "float_densenet",
           "float_regnetx", "float_fcn", "float_deeplabv3",
           "adaptive_avg_pool2d",
           "MelGANGenerator", "melgan_8b",
           "QuantTransformer", "quant_transformer_tiny",
           "transformer_smoothquant_regions",
           "QuantLlama", "quant_llama_tiny", "llama_smoothquant_regions",
           "QuantViT", "vit_tiny", "vit_smoothquant_regions"]
