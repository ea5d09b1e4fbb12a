"""FC model family: TFC / SFC / LFC quantized MLPs for MNIST.

Reference: ``src/brevitas_examples/bnn_pynq/models/FC.py`` and the cfg matrix
``bnn_pynq/cfg/{tfc,sfc,lfc}_{1w1a,1w2a,2w2a}.ini`` (TFC=[64]*3,
SFC=[256]*3, LFC=[1024]*3 hidden features).

Structure per the reference: input QuantIdentity (binarized Q-format input) →
[QuantLinear(no bias) → BatchNorm → QuantIdentity(act) → Dropout]* →
QuantLinear → TensorNorm, with inputs mapped from [0,1] to [-1,1].
"""

from typing import Sequence

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.models.common import TensorNorm, common_act_quant, common_weight_quant
from brevitas_tpu.nn import QuantIdentity, QuantLinear
from brevitas_tpu.quant.quantizers import TrainToggleMixin

DROPOUT = 0.2


class FC(nnx.Module, TrainToggleMixin):

    def __init__(
        self,
        *,
        num_classes: int = 10,
        weight_bit_width: int = 1,
        act_bit_width: int = 1,
        in_bit_width: int = 1,
        in_features: int = 28 * 28,
        out_features: Sequence[int] = (64, 64, 64),
        dropout: float = DROPOUT,
        rngs: nnx.Rngs,
    ):
        self.in_features = in_features
        # return_quant_tensor: scale/bit-width metadata flows into the
        # next QuantLinear so the bf16 exact-code MXU path can engage
        # (quant_layer.forward_quant code_domain)
        self.input_quant = QuantIdentity(common_act_quant(in_bit_width),
                                         return_quant_tensor=True)
        self.dropout_rate = dropout
        self.rngs = rngs
        self.training: bool = True

        layers = []
        feat_in = in_features
        for feat_out in out_features:
            layers.append(QuantLinear(
                feat_in, feat_out, use_bias=False,
                weight_quant=common_weight_quant(weight_bit_width), rngs=rngs))
            layers.append(nnx.BatchNorm(feat_out, momentum=0.9,
                                        use_running_average=False,
                                        rngs=rngs))
            layers.append(QuantIdentity(common_act_quant(act_bit_width),
                                        return_quant_tensor=True))
            feat_in = feat_out
        self.hidden = nnx.List(layers)
        self.head = QuantLinear(
            feat_in, num_classes, use_bias=False,
            weight_quant=common_weight_quant(weight_bit_width), rngs=rngs)
        self.norm = TensorNorm()
        # reference initializes weights uniform(-1, 1) (FC.py:56-58)
        for lyr in [*layers, self.head]:
            if isinstance(lyr, QuantLinear):
                import jax
                lyr.weight[...] = jax.random.uniform(
                    rngs.params(), lyr.weight[...].shape, minval=-1.0, maxval=1.0)

    def clip_weights(self, min_val: float = -1.0, max_val: float = 1.0):
        """Post-step weight clipping (reference trainer.py:245)."""
        for lyr in [*self.hidden, self.head]:
            if isinstance(lyr, QuantLinear):
                lyr.weight[...] = jnp.clip(lyr.weight[...], min_val, max_val)

    def _dropout(self, x):
        if self.training and self.dropout_rate > 0:
            import jax

            from brevitas_tpu.quant_tensor import QuantTensor
            keep = 1.0 - self.dropout_rate
            if isinstance(x, QuantTensor):
                # dropout is exactly representable on the quant grid: zeros
                # are code 0 and the 1/keep rescale is absorbed into the
                # scale, so the integer codes (value/scale) are unchanged
                mask = jax.random.bernoulli(self.rngs.dropout(), keep,
                                            x.value.shape)
                return QuantTensor(
                    jnp.where(mask, x.value / keep, 0.0),
                    None if x.scale is None else x.scale / keep,
                    x.zero_point, x.bit_width, signed=x.signed,
                    training=x.training)
            mask = jax.random.bernoulli(self.rngs.dropout(), keep, x.shape)
            return jnp.where(mask, x / keep, 0.0)
        return x

    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = 2.0 * x - 1.0
        x = self.input_quant(x)
        x = self._dropout(x)
        i = 0
        while i < len(self.hidden):
            x = self.hidden[i](x)        # QuantLinear
            x = self.hidden[i + 1](x)    # BatchNorm
            x = self.hidden[i + 2](x)    # QuantIdentity
            x = self._dropout(x)
            i += 3
        x = self.head(x)
        return self.norm(x)

    # NOTE: no hand-authored export_layers() — the export walk is DERIVED
    # from one traced forward (export/derive.py), matching the reference's
    # export-any-traced-model property (export/onnx/manager.py:66).



def tfc(weight_bit_width=1, act_bit_width=1, in_bit_width=1, **kw) -> FC:
    return FC(out_features=(64, 64, 64), weight_bit_width=weight_bit_width,
              act_bit_width=act_bit_width, in_bit_width=in_bit_width, **kw)


def sfc(weight_bit_width=1, act_bit_width=1, in_bit_width=1, **kw) -> FC:
    return FC(out_features=(256, 256, 256), weight_bit_width=weight_bit_width,
              act_bit_width=act_bit_width, in_bit_width=in_bit_width, **kw)


def lfc(weight_bit_width=1, act_bit_width=1, in_bit_width=1, **kw) -> FC:
    return FC(out_features=(1024, 1024, 1024), weight_bit_width=weight_bit_width,
              act_bit_width=act_bit_width, in_bit_width=in_bit_width, **kw)
