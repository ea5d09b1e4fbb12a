"""Misc quant layers: embedding, dropout, upsampling, scale-bias, BN fusion,
accumulators, Hadamard classifier.

Reference: ``src/brevitas/nn/quant_embedding.py:22``, ``quant_dropout.py:14``,
``quant_upsample.py:16-87``, ``quant_scale_bias.py:35``, ``quant_bn.py:48``,
``quant_accumulator.py:16,43``, ``hadamard_classifier.py:21``.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig, QuantType
from brevitas_tpu.quant.presets import (
    Int8WeightPerTensorFloat,
    NoneActQuant,
    NoneBiasQuant,
    NoneWeightQuant,
    TruncTo8bit,
)
from brevitas_tpu.quant.quantizers import (
    ActQuantizer,
    BiasQuantizer,
    ClampQuantizer,
    ParameterQuantizer,
    TruncQuantizer,
)
from brevitas_tpu.nn.quant_layer import QuantLayerMixin, QuantWBIOL
from brevitas_tpu.quant_tensor import QuantTensor

Array = jnp.ndarray


class QuantEmbedding(nnx.Module, QuantLayerMixin):
    """Embedding with quantized table (reference QuantEmbedding,
    nn/quant_embedding.py:22). Lookup of a fake-quantized table: gather is
    quantization-transparent, so metadata survives per-tensor scaling."""

    def __init__(self, num_embeddings: int, embedding_dim: int, *,
                 weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
                 return_quant_tensor: bool = False, dtype=jnp.float32,
                 rngs: nnx.Rngs):
        w = jax.random.normal(rngs.params(), (num_embeddings, embedding_dim),
                              dtype)
        self.weight = nnx.Param(w)
        self.weight_quant = ParameterQuantizer(
            weight_quant or NoneWeightQuant, w, channel_axis=0)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, ids: Array):
        qw = self.weight_quant(self.weight[...])
        out = qw.value[ids]
        if qw.scale is not None and qw.scale.ndim == 0:
            return self.pack_output(QuantTensor(
                out, qw.scale, qw.zero_point, qw.bit_width, signed=qw.signed))
        return self.pack_output(QuantTensor(out))


class QuantDropout(nnx.Module, QuantLayerMixin):
    """Dropout preserving quant metadata (reference QuantDropout,
    nn/quant_dropout.py:14). Note: scaling by 1/(1-p) breaks exact integer
    alignment during training, as in the reference."""

    def __init__(self, rate: float = 0.5, return_quant_tensor: bool = False,
                 rngs: Optional[nnx.Rngs] = None):
        self.rate = rate
        if rate > 0 and rngs is None:
            raise ValueError("QuantDropout with rate > 0 requires rngs")
        self.rngs = rngs
        self.training = True
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        if not self.training or self.rate == 0.0:
            return self.pack_output(qt)
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.rngs.dropout(), keep, qt.value.shape)
        return self.pack_output(qt.set(value=jnp.where(mask, qt.value / keep, 0)))


class QuantUpsample(nnx.Module, QuantLayerMixin):
    """Generic upsampling over the spatial dims of channels-last inputs
    (reference QuantUpsample, nn/quant_upsample.py:16). ``mode='nearest'``
    repeats values so quant metadata passes through unchanged; interpolating
    modes ('linear'/'bilinear') produce off-grid values, so metadata is
    dropped, matching the reference's semantics for each mode."""

    def __init__(self, scale_factor=None, size=None, mode: str = "nearest",
                 return_quant_tensor: bool = False):
        if (scale_factor is None) == (size is None):
            raise ValueError("exactly one of scale_factor/size is required")
        self.scale_factor = scale_factor
        self.size = tuple(size) if size is not None else None
        self.mode = mode
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        v = qt.value
        spatial = v.shape[1:-1]
        if self.size is not None:
            out_spatial = self.size
        else:
            sf = self.scale_factor
            sf = (sf,) * len(spatial) if not isinstance(sf, (tuple, list)) else sf
            out_spatial = tuple(int(d * s) for d, s in zip(spatial, sf))
        shape = (v.shape[0],) + out_spatial + (v.shape[-1],)
        method = "nearest" if self.mode == "nearest" else \
            ("linear" if self.mode in ("linear", "bilinear", "trilinear")
             else self.mode)
        out = jax.image.resize(v, shape, method=method)
        if self.mode == "nearest":
            return self.pack_output(qt.set(value=out))
        return self.pack_output(QuantTensor(out, training=qt.training))


class QuantUpsamplingNearest2d(nnx.Module, QuantLayerMixin):
    """Nearest upsampling repeats values → metadata passthrough
    (reference QuantUpsamplingNearest2d, nn/quant_upsample.py:87)."""

    def __init__(self, scale_factor: int = 2, return_quant_tensor: bool = False):
        self.scale_factor = int(scale_factor)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        v = qt.value
        s = self.scale_factor
        v = jnp.repeat(jnp.repeat(v, s, axis=1), s, axis=2)
        return self.pack_output(qt.set(value=v))


class QuantUpsamplingBilinear2d(nnx.Module, QuantLayerMixin):
    """Bilinear interpolation breaks integer alignment → output is a plain
    tensor wrapped without metadata (reference drops through interpolation
    too, nn/quant_upsample.py:56)."""

    def __init__(self, scale_factor: int = 2, return_quant_tensor: bool = False):
        self.scale_factor = int(scale_factor)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        n, h, w, c = qt.value.shape
        s = self.scale_factor
        v = jax.image.resize(qt.value, (n, h * s, w * s, c), method="bilinear")
        return self.pack_output(QuantTensor(v, training=qt.training))


class ScaleBias(nnx.Module):
    """Float per-channel ``y = x * weight + bias`` (reference ScaleBias,
    nn/quant_scale_bias.py:23). Channels-last: weight/bias broadcast over
    the trailing feature axis."""

    def __init__(self, num_features: int, use_bias: bool = True,
                 dtype=jnp.float32):
        self.num_features = num_features
        self.weight = nnx.Param(jnp.ones((num_features,), dtype))
        self.bias = nnx.Param(jnp.zeros((num_features,), dtype)) if use_bias \
            else None

    def __call__(self, x):
        y = x * self.weight[...]
        return y + self.bias[...] if self.bias is not None else y


class QuantScaleBias(QuantWBIOL):
    """y = x * weight + bias with quantized per-channel weight (reference
    QuantScaleBias, nn/quant_scale_bias.py:35 — the fused form of BatchNorm)."""

    def __init__(self, num_features: int, *,
                 weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
                 bias_quant: Optional[QuantConfig] = None,
                 input_quant: Optional[QuantConfig] = None,
                 output_quant: Optional[QuantConfig] = None,
                 return_quant_tensor: bool = False, dtype=jnp.float32,
                 weight_init: Optional[Array] = None,
                 bias_init: Optional[Array] = None):
        self.num_features = num_features
        w = (jnp.asarray(weight_init, dtype) if weight_init is not None
             else jnp.ones((num_features,), dtype))
        b = (jnp.asarray(bias_init, dtype) if bias_init is not None
             else jnp.zeros((num_features,), dtype))
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(b)
        # stats-initialized weight scaling must see the REAL initial weights
        # (pass weight_init when folding e.g. BN multipliers in), otherwise a
        # PARAMETER_FROM_STATS scale freezes on the all-ones placeholder
        self.init_quant(weight_quant, bias_quant, input_quant, output_quant,
                        weight_init=w, channel_axis=0, bias_init=b,
                        return_quant_tensor=return_quant_tensor)

    @property
    def reduce_size(self) -> int:
        return 1

    def __call__(self, x):
        def inner(xv, wv, bv):
            y = xv * wv
            if bv is not None:
                y = y + bv
            return y

        return self.forward_quant(x, inner)


def mul_add_from_bn(bn_scale: Array, bn_bias: Array, bn_mean: Array,
                    bn_var: Array, eps: float = 1e-5):
    """BN statistics -> equivalent (mul, add) affine pair (reference
    mul_add_from_bn, nn/utils.py:11)."""
    mul = bn_scale / jnp.sqrt(bn_var + eps)
    add = -bn_mean * mul + bn_bias
    return mul, add


def batch_norm_to_quant_scale_bias(bn: "nnx.BatchNorm",
                                   **scale_bias_kwargs) -> "QuantScaleBias":
    """Convert a trained nnx.BatchNorm into an equivalent QuantScaleBias
    (reference BatchNorm1d/2dToQuantScaleBias, nn/quant_bn.py:48,73 — there
    the fold happens on state-dict load; here it is an explicit factory).

    Channels-last makes one adapter cover 1d and 2d: the (C,) weight/bias
    broadcast over any (..., C) input.
    """
    mean = bn.mean.get_value()
    var = bn.var.get_value()
    scale = (bn.scale.get_value().reshape(-1) if bn.use_scale
             else jnp.ones_like(mean).reshape(-1))
    bias = (bn.bias.get_value().reshape(-1) if bn.use_bias
            else jnp.zeros_like(mean).reshape(-1))
    mul, add = mul_add_from_bn(scale, bias, mean.reshape(-1), var.reshape(-1),
                               bn.epsilon)
    return QuantScaleBias(mul.shape[0], weight_init=mul, bias_init=add,
                          **scale_bias_kwargs)


class FoldedBatchNorm(nnx.Module):
    """Identity left in place of a BatchNorm folded into its preceding layer.

    The reference's MergeBatchNorm deletes the BN node from the FX graph
    (``src/brevitas/graph/fixed_point.py:89``); NNX call sites persist, so
    the module itself must become a train-proof identity. (A neutralized
    BatchNorm is NOT enough: calibration/training mode flips
    ``use_running_average`` and the next forward would re-collect batch
    statistics, silently resurrecting the folded normalization.)
    """

    folded_away = True

    def __init__(self, num_features: int):
        self.num_features = num_features

    def __call__(self, x, *args, **kwargs):
        return x


def merge_bn(layer, bn_scale: Array, bn_bias: Array, bn_mean: Array,
             bn_var: Array, eps: float = 1e-5) -> None:
    """Fold BatchNorm statistics into the preceding layer's weight/bias
    in-place (reference merge_bn, nn/utils.py:24).

    ``layer`` must expose a weight with output channel LAST — ``.weight``
    on quant layers, ``.kernel`` on float ``nnx.Conv``/``nnx.Linear`` (the
    reference folds into float layers pre-quantization, flexml.py:381) —
    and ``.bias``.
    """
    mul, add = mul_add_from_bn(bn_scale, bn_bias, bn_mean, bn_var, eps)
    attr = "weight" if hasattr(layer, "weight") else "kernel"
    w = getattr(layer, attr)[...]
    getattr(layer, attr)[...] = w * mul  # broadcast over trailing out-channel axis
    if layer.bias is not None:
        layer.bias[...] = layer.bias[...] * mul + add
    else:
        # the attribute was constructed as None (static); mark the new Param
        # as pytree data explicitly
        layer.bias = nnx.data(nnx.Param(add))
        # float nnx.Conv/nnx.Linear gate the bias add on `self.use_bias`,
        # not on `bias is not None` — without this the folded BN shift is
        # silently dropped
        if hasattr(layer, "use_bias"):
            layer.use_bias = True


class TruncQuantAccumulator(nnx.Module, QuantLayerMixin):
    """Standalone trunc accumulator layer (reference TruncQuantAccumulator,
    nn/quant_accumulator.py:16)."""

    def __init__(self, trunc_quant: QuantConfig = TruncTo8bit,
                 return_quant_tensor: bool = True):
        self.trunc_quant = TruncQuantizer(trunc_quant)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        return self.pack_output(self.trunc_quant(self.unpack_input(x)))


class ClampQuantAccumulator(nnx.Module, QuantLayerMixin):
    """Standalone clamp accumulator layer (reference ClampQuantAccumulator,
    nn/quant_accumulator.py:43)."""

    def __init__(self, clamp_quant: QuantConfig,
                 return_quant_tensor: bool = True):
        self.clamp_quant = ClampQuantizer(clamp_quant)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        return self.pack_output(self.clamp_quant(self.unpack_input(x)))


def _hadamard(n: int) -> np.ndarray:
    """Sylvester-construction Hadamard matrix (power-of-two order)."""
    assert n > 0 and (n & (n - 1)) == 0, "Hadamard order must be a power of two"
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


class HadamardClassifier(nnx.Module, QuantLayerMixin):
    """Fixed (non-learned) Hadamard projection classifier with a learned
    global scale (reference HadamardClassifier, nn/hadamard_classifier.py:21).
    The Sylvester construction replaces scipy.linalg.hadamard."""

    def __init__(self, in_channels: int, out_channels: int,
                 fixed_scale: bool = False, return_quant_tensor: bool = False):
        sz = 1 << (max(in_channels, out_channels) - 1).bit_length()
        mat = jnp.asarray(_hadamard(sz), jnp.float32)
        self.proj = mat[:out_channels, :in_channels]
        init_scale = 1.0 / np.sqrt(sz)
        if fixed_scale:
            self.scale = init_scale
        else:
            self.scale = nnx.Param(jnp.asarray(init_scale))
        self.eps = 1e-8
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        v = qt.value
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True) + self.eps
        scale = self.scale[...] if isinstance(self.scale, nnx.Param) else self.scale
        out = -scale * (v / norm) @ self.proj.T
        return self.pack_output(QuantTensor(out, training=qt.training))
