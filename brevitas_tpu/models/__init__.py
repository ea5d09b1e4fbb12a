"""Model zoo (reference ``src/brevitas_examples``: bnn_pynq FC/CNV families;
MobileNetV1 / ProxylessNAS / QuartzNet / MelGAN arrive in later modules)."""

from brevitas_tpu.models.cnv import CNV, cnv
from brevitas_tpu.models.common import TensorNorm, common_act_quant, common_weight_quant
from brevitas_tpu.models.fc import FC, lfc, sfc, tfc

__all__ = ["FC", "tfc", "sfc", "lfc", "CNV", "cnv",
           "TensorNorm", "common_act_quant", "common_weight_quant"]
