"""Quant layer base: the weight/bias/input/output (WBIOL) forward law.

Re-design of reference ``src/brevitas/nn/quant_layer.py:256-365``
(QuantWeightBiasInputOutputLayer.forward_impl):

    input_quant(x) → weight_quant(w) → accumulator scale/bit-width
    propagation → bias_quant(b | acc_scale, acc_bit_width) → inner forward
    (matmul/conv) → output_quant → pack.

Layout note (TPU-native): activations are channels-last (N..C) and kernels
are ...IO with the output channel LAST, so per-channel weight scales of shape
(1, ..., O) broadcast against both the kernel and the layer output without
the reshape gymnastics the reference needs for NCHW
(``compute_channel_view_shape``, nn/utils.py).
"""

import math
from typing import Optional, Union

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.ops import ceil_ste, max_int
from brevitas_tpu.quant.config import (BitWidthImplType, QuantConfig,
                                        QuantType, ZeroPointImplType)
from brevitas_tpu.quant.presets import NoneActQuant, NoneBiasQuant, NoneWeightQuant
from brevitas_tpu.quant.quantizers import (
    ActQuantizer,
    BiasQuantizer,
    ParameterQuantizer,
    TrainToggleMixin,
)
from brevitas_tpu.quant_tensor import QuantTensor, pack, unpack

Array = jnp.ndarray
TensorOrQuant = Union[Array, QuantTensor]


def _cfg(q: Optional[QuantConfig], default: QuantConfig) -> QuantConfig:
    return default if q is None else q


class QuantLayerMixin(TrainToggleMixin):
    """Input/output packing shared by all quant layers (reference
    QuantLayerMixin, nn/mixin/base.py:80)."""

    return_quant_tensor: bool = False

    def unpack_input(self, x: TensorOrQuant) -> QuantTensor:
        return pack(x)

    def pack_output(self, qt: QuantTensor) -> TensorOrQuant:
        if self.return_quant_tensor:
            return qt
        return qt.value


def _static_leq(v, lim: float) -> bool:
    """True when v is a compile-time-known value <= lim (const bit widths
    stay concrete under jit; learned/traced ones fall back to False)."""
    if v is None:
        return False
    try:
        return float(v) <= lim
    except Exception:
        return False


def _static_integer_zp(zp) -> bool:
    """True when the zero point is statically known to be integral — then
    value/scale = (code - zp) is an exact small integer and bf16-lossless."""
    if zp is None:
        return True
    try:
        import numpy as np

        z = np.asarray(zp)
        return bool(np.all(z == np.round(z)))
    except Exception:
        return False


class QuantWBIOL(nnx.Module, QuantLayerMixin):
    """Base for layers with quantized Weight, Bias, Input, Output."""

    def init_quant(
        self,
        weight_quant: Optional[QuantConfig],
        bias_quant: Optional[QuantConfig],
        input_quant: Optional[QuantConfig],
        output_quant: Optional[QuantConfig],
        weight_init: Array,
        channel_axis: int,
        bias_init: Optional[Array],
        return_quant_tensor: bool,
    ) -> None:
        self.weight_quant = ParameterQuantizer(
            _cfg(weight_quant, NoneWeightQuant), weight_init, channel_axis)
        self.input_quant = ActQuantizer(_cfg(input_quant, NoneActQuant))
        self.output_quant = ActQuantizer(_cfg(output_quant, NoneActQuant))
        self.bias_quant = BiasQuantizer(
            _cfg(bias_quant, NoneBiasQuant), bias_init)
        self.return_quant_tensor = return_quant_tensor

    # -- accumulator bit-width law (reference nn/quant_linear.py:68,
    #    nn/quant_conv.py:107) --
    def max_acc_bit_width(self, input_bit_width: Array,
                          weight_bit_width: Array) -> Array:
        max_input = max_int(False, False, input_bit_width)
        w_cfg = self.weight_quant.cfg
        max_weight = max_int(False, w_cfg.narrow_range, weight_bit_width)
        max_output = max_input * max_weight * self.reduce_size
        return ceil_ste(jnp.log2(max_output))

    @property
    def reduce_size(self) -> int:
        """Number of elements summed per output element (fan-in)."""
        raise NotImplementedError

    # toggled recursively by set_attributes(training=...) from any parent
    training: bool = True
    # when set (jnp.bfloat16), matmul/conv OPERANDS are cast to this dtype —
    # f32 accumulation and all quantizer math stay f32. See
    # utils.set_compute_dtype.
    compute_dtype = None

    def quant_weight(self, input_bit_width=None,
                     input_signed=None) -> QuantTensor:
        cached = getattr(self, "_cached_quant_weight", None)
        if (cached is not None
                and not self.weight_quant.disable_quant
                and not self.training):
            return cached
        if self.weight_quant.cfg.accumulator_bit_width is not None:
            if input_bit_width is None:
                # no-arg callers (export, serving conversion): fall back to
                # the layer's own input quantizer's static format
                icfg = self.input_quant.cfg
                if self.input_quant.quant_type != QuantType.INT:
                    raise ValueError(
                        "accumulator-aware weight quant needs a quantized "
                        "input (give the layer an INT input_quant)")
                input_bit_width = jnp.asarray(float(icfg.bit_width))
                input_signed = icfg.signed
            return self.weight_quant(self.weight[...],
                                     input_bit_width=input_bit_width,
                                     input_signed=input_signed)
        return self.weight_quant(self.weight[...])

    def cache_quant_weight(self) -> None:
        """Precompute the fake-quant weight for EVAL serving so forwards skip
        the quant chain (reference cache_inference_quant_weight / _CachedIO,
        nn/mixin/base.py:24). The cache is inert while training or while
        quantization is bypassed (calibration/bias-correction float twins),
        is cleared by train_mode()/clear_quant_weight_cache(), and is computed
        under eval semantics so quant-delay counters don't advance."""
        if self.weight_quant.cfg.accumulator_bit_width is not None:
            return  # A2Q weights depend on the runtime input bit-width
        delay = getattr(self.weight_quant, "delay", None)
        was_training = delay.training if delay is not None else None
        self.weight_quant.eval_mode()
        self._cached_quant_weight = nnx.data(self.weight_quant(self.weight[...]))
        if was_training:
            self.weight_quant.train_mode()

    def clear_quant_weight_cache(self) -> None:
        self._cached_quant_weight = nnx.data(None)


    def forward_quant(self, inp: TensorOrQuant, inner_forward) -> TensorOrQuant:
        """The WBIOL law (reference forward_impl, nn/quant_layer.py:302-365)."""
        if getattr(self, "_capture_input", False):
            self._bc_last_input = inp  # bias-correction float-twin input
        qt_in = self.unpack_input(inp)
        if self.input_quant.quant_type != QuantType.NONE:
            quant_input = self.input_quant(qt_in.value)
        else:
            quant_input = qt_in  # pass an already-quantized input through
        quant_weight = self.quant_weight(
            input_bit_width=quant_input.bit_width,
            input_signed=quant_input.signed)

        output_scale = None
        output_bit_width = None
        output_zero_point = None
        output_signed = None
        if quant_input.bit_width is not None and quant_weight.bit_width is not None:
            output_bit_width = self.max_acc_bit_width(
                quant_input.bit_width, quant_weight.bit_width)
        if (quant_input.scale is not None and quant_weight.scale is not None
                and self.weight_quant.cfg.scaling_per_group is None):
            # channels-last: per-channel weight scale (1,..,O) broadcasts
            # directly against the (N,..,O) output. Groupwise (MX) weights
            # have no single per-output scale — output metadata stays None.
            w_scale = quant_weight.scale
            if w_scale.ndim > 1:
                w_scale = w_scale.reshape(-1)  # (O,) broadcast over trailing dim
            output_scale = w_scale * quant_input.scale
        if quant_input.signed is not None:
            output_signed = quant_input.signed or quant_weight.signed

        # exact-code MXU path: with compute_dtype set and symmetric INT quant
        # at <= 8 bits, feed the integer CODES (value/scale, exact small ints
        # that bf16 represents losslessly) through the matmul and rescale the
        # f32 accumulation by output_scale — bit-identical to the f32 path,
        # but the MXU runs at bf16 rate instead of the fp32 decomposition.
        code_domain = (
            self.compute_dtype is not None
            and output_scale is not None
            and self.weight_quant.quant_type == QuantType.INT
            and self.weight_quant.cfg.scaling_per_group is None
            and _static_leq(quant_input.bit_width, 9.0)
            and _static_leq(quant_weight.bit_width, 9.0)
            and _static_integer_zp(quant_input.zero_point)
            and _static_integer_zp(quant_weight.zero_point))
        if code_domain:
            x_in = quant_input.value / quant_input.scale
            w_in = quant_weight.value / quant_weight.scale
        else:
            x_in, w_in = quant_input.value, quant_weight.value

        bias = getattr(self, "bias", None)
        if bias is not None:
            quant_bias = self.bias_quant(
                bias[...], input_scale=output_scale,
                input_bit_width=output_bit_width)
            if code_domain:
                out = inner_forward(x_in, w_in, None) * output_scale \
                    + quant_bias.value
            else:
                out = inner_forward(x_in, w_in, quant_bias.value)
            if quant_bias.bit_width is not None and output_bit_width is not None:
                output_bit_width = jnp.maximum(quant_bias.bit_width,
                                               output_bit_width) + 1
        else:
            out = inner_forward(x_in, w_in, None)
            if code_domain:
                out = out * output_scale

        if (self.return_quant_tensor
                and self.output_quant.quant_type == QuantType.NONE
                and quant_input.zero_point is not None
                and output_zero_point is None):
            output_zero_point = quant_input.zero_point

        qt_out = QuantTensor(out, output_scale, output_zero_point,
                             output_bit_width, signed=output_signed,
                             training=self.input_quant.training)
        # pre-output-quant hook: the seam used by PTQ bias correction
        # (reference registers forward-pre-hooks on output_quant,
        # graph/calibrate.py:204-277)
        hook = getattr(self, "_pre_output_hook", None)
        if hook is not None:
            maybe = hook(self, qt_out)
            if maybe is not None:
                qt_out = maybe
        if self.output_quant.quant_type != QuantType.NONE:
            qt_out = self.output_quant(qt_out.value)
        return self.pack_output(qt_out)
