"""CNV: VGG-like quantized ConvNet for CIFAR-10.

Reference: ``src/brevitas_examples/bnn_pynq/models/CNV.py`` — conv stack
[(64,-),(64,pool),(128,-),(128,pool),(256,-),(256,-)] with 3x3 kernels,
BatchNorm + QuantIdentity acts, 2x2 max-pools, then FCs 256→512→512→classes,
TensorNorm head. Input is Q1.7-format quantized (8-bit, power-of-two scale).

Layout is NHWC (TPU-native); CIFAR-10 input (N, 32, 32, 3). After the conv
stack the reference reaches spatial 1x1 with VALID 3x3 convs.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.core.restrict import RestrictType
from brevitas_tpu.models.common import TensorNorm, common_act_quant, common_weight_quant
from brevitas_tpu.nn import QuantConv2d, QuantIdentity, QuantLinear, QuantMaxPool2d
from brevitas_tpu.quant.quantizers import TrainToggleMixin

CNV_OUT_CH_POOL: Sequence[Tuple[int, bool]] = (
    (64, False), (64, True), (128, False), (128, True), (256, False), (256, False))
INTERMEDIATE_FC_FEATURES = ((256, 512), (512, 512))
LAST_FC_IN_FEATURES = 512
KERNEL_SIZE = 3


class CNV(nnx.Module, TrainToggleMixin):

    def __init__(self, *, num_classes: int = 10, weight_bit_width: int = 1,
                 act_bit_width: int = 1, in_bit_width: int = 8,
                 in_channels: int = 3, per_channel_weights: bool = False,
                 rngs: nnx.Rngs):
        # per_channel_weights: BASELINE.md "CNV INT4/INT8 per-channel"
        # variant — stats-scaled per-output-channel INT weights (imagenet
        # recipe style) instead of the reference's const-scale CommonQuant
        def wq(bw):
            if per_channel_weights:
                from brevitas_tpu.quant import presets
                return presets.Int8WeightPerChannelFloat.let(
                    bit_width=float(bw))
            return common_weight_quant(bw)
        # Q1.7 input format: 8-bit, [-1, 1-2^-7], power-of-two scale
        # return_quant_tensor threads scale/bit-width metadata into the
        # convs so the bf16 exact-code MXU path can engage (quant_layer
        # code_domain; max-pool is metadata-passthrough like the reference)
        self.input_quant = QuantIdentity(common_act_quant(
            in_bit_width, max_val=1.0 - 2.0 ** (-7), narrow_range=False,
            restrict=RestrictType.POWER_OF_TWO), return_quant_tensor=True)
        convs = []
        in_ch = in_channels
        for out_ch, pool in CNV_OUT_CH_POOL:
            convs.append(QuantConv2d(
                in_ch, out_ch, KERNEL_SIZE, padding="VALID", use_bias=False,
                weight_quant=wq(weight_bit_width), rngs=rngs))
            convs.append(nnx.BatchNorm(out_ch, epsilon=1e-4, momentum=0.9,
                                       use_running_average=False, rngs=rngs))
            convs.append(QuantIdentity(common_act_quant(act_bit_width),
                                       return_quant_tensor=True))
            if pool:
                convs.append(QuantMaxPool2d(2, return_quant_tensor=True))
            in_ch = out_ch
        self.conv_features = nnx.List(convs)

        fcs = []
        for feat_in, feat_out in INTERMEDIATE_FC_FEATURES:
            fcs.append(QuantLinear(
                feat_in, feat_out, use_bias=False,
                weight_quant=wq(weight_bit_width), rngs=rngs))
            fcs.append(nnx.BatchNorm(feat_out, epsilon=1e-4, momentum=0.9,
                                     use_running_average=False, rngs=rngs))
            fcs.append(QuantIdentity(common_act_quant(act_bit_width),
                                     return_quant_tensor=True))
        fcs.append(QuantLinear(
            LAST_FC_IN_FEATURES, num_classes, use_bias=False,
            weight_quant=wq(weight_bit_width), rngs=rngs))
        self.linear_features = nnx.List(fcs)
        self.norm = TensorNorm()

        import jax
        for lyr in [*convs, *fcs]:
            if isinstance(lyr, (QuantConv2d, QuantLinear)):
                lyr.weight[...] = jax.random.uniform(
                    rngs.params(), lyr.weight[...].shape, minval=-1.0, maxval=1.0)

    def clip_weights(self, min_val: float = -1.0, max_val: float = 1.0):
        for lyr in [*self.conv_features, *self.linear_features]:
            if isinstance(lyr, (QuantConv2d, QuantLinear)):
                lyr.weight[...] = jnp.clip(lyr.weight[...], min_val, max_val)

    def __call__(self, x):
        x = 2.0 * x - 1.0
        x = self.input_quant(x)
        for lyr in self.conv_features:
            x = lyr(x)
        x = x.reshape(x.shape[0], -1)
        for lyr in self.linear_features:
            x = lyr(x)
        return self.norm(x)

    # NOTE: no hand-authored export_layers() — the export walk is DERIVED
    # from one traced forward (export/derive.py), matching the reference's
    # export-any-traced-model property (export/onnx/manager.py:66). Round-4
    # byte-identity vs the former hand list is locked by
    # tests/test_export_derive.py::test_cnv_fc_derived_walk_matches_hand_authored.



def cnv(weight_bit_width=1, act_bit_width=1, in_bit_width=8, **kw) -> CNV:
    return CNV(weight_bit_width=weight_bit_width, act_bit_width=act_bit_width,
               in_bit_width=in_bit_width, **kw)
