"""Quant pooling (reference ``src/brevitas/nn/quant_avg_pool.py:21,76``,
``quant_max_pool.py:14,53``).

QuantAvgPool keeps integer semantics: the window SUM is an accumulator whose
bit-width grows by ceil(log2(window)), then a trunc quantizer drops LSBs back
to the target bit-width (the division by the window size is folded into the
truncation scale). MaxPool is metadata-passthrough.
"""

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.ops import ceil_ste
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import TruncTo8bit
from brevitas_tpu.quant.quantizers import TrainToggleMixin, TruncQuantizer
from brevitas_tpu.nn.quant_layer import QuantLayerMixin
from brevitas_tpu.quant_tensor import QuantTensor

Array = jnp.ndarray


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class QuantAvgPool2d(nnx.Module, QuantLayerMixin):
    """(N, H, W, C) average pool with truncation re-quantization
    (reference QuantAvgPool2d.forward, nn/quant_avg_pool.py:55-67)."""

    def __init__(self, kernel_size, stride=None,
                 trunc_quant: Optional[QuantConfig] = TruncTo8bit,
                 return_quant_tensor: bool = False):
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride) if stride is not None else self.kernel_size
        self.trunc_quant = TruncQuantizer(trunc_quant) if trunc_quant else None
        self.return_quant_tensor = return_quant_tensor
        # whether the most recent call took the truncation branch — a
        # STATIC metadata-presence decision (safe to record under tracing);
        # the exporter mirrors it so exported graphs truncate exactly when
        # the model does (export/qcdq.py _export_avgpool)
        self.last_call_truncated = None

    @property
    def _kernel_elems(self) -> int:
        return int(np.prod(self.kernel_size))

    def __call__(self, x):
        qt = self.unpack_input(x)
        window = (1, *self.kernel_size, 1)
        strides = (1, *self.stride, 1)
        summed = jax.lax.reduce_window(
            qt.value, 0.0, jax.lax.add, window, strides, "VALID")
        self.last_call_truncated = (
            qt.scale is not None and qt.bit_width is not None
            and self.trunc_quant is not None)
        if self.last_call_truncated:
            acc_bw = qt.bit_width + ceil_ste(
                jnp.log2(jnp.asarray(float(self._kernel_elems))))
            acc = QuantTensor(summed, qt.scale, qt.zero_point, acc_bw,
                              signed=qt.signed, training=qt.training)
            # the truncation scale 2^(acc_bw - out_bw) IS the (power-of-two)
            # division by the window size — the reference emits the truncated
            # sum with the input scale unchanged (quant_avg_pool.py:55-67),
            # exact mean for power-of-two windows
            out = self.trunc_quant(acc)
            return self.pack_output(out)
        return self.pack_output(QuantTensor(summed / self._kernel_elems,
                                            training=qt.training))


class QuantAdaptiveAvgPool2d(QuantAvgPool2d):
    """Output-size-driven variant (reference QuantAdaptiveAvgPool2d,
    nn/quant_avg_pool.py:76). Requires input spatial dims divisible by the
    output size (the common torchvision case)."""

    def __init__(self, output_size, trunc_quant: Optional[QuantConfig] = TruncTo8bit,
                 return_quant_tensor: bool = False):
        self.output_size = _pair(output_size)
        super().__init__(1, 1, trunc_quant, return_quant_tensor)

    def __call__(self, x):
        qt = self.unpack_input(x)
        h, w = qt.value.shape[1], qt.value.shape[2]
        oh, ow = self.output_size
        if h % oh or w % ow:
            raise ValueError(f"adaptive pool needs divisible dims, {h}x{w} -> {oh}x{ow}")
        self.kernel_size = (h // oh, w // ow)
        self.stride = self.kernel_size
        return super().__call__(qt)


class _QuantMaxPoolNd(nnx.Module, QuantLayerMixin):
    """Max pooling: monotone per-element, so quant metadata passes through
    (reference QuantMaxPool1d/2d, nn/quant_max_pool.py:14,53)."""

    def __init__(self, spatial_dims, kernel_size, stride=None, padding="VALID",
                 return_quant_tensor: bool = False):
        n = spatial_dims
        self.kernel_size = tuple(kernel_size) if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * n
        self.stride = (tuple(stride) if isinstance(stride, (tuple, list))
                       else (stride,) * n) if stride is not None else self.kernel_size
        if isinstance(padding, str):
            self.padding = padding.upper()
        else:
            p = tuple(padding) if isinstance(padding, (tuple, list)) else (padding,) * n
            # normalize to per-spatial-dim (lo, hi) pairs; N/C dims unpadded
            self.padding = [(0, 0)] + [
                (int(v[0]), int(v[1])) if isinstance(v, (tuple, list))
                else (int(v), int(v)) for v in p] + [(0, 0)]
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, x):
        qt = self.unpack_input(x)
        window = (1, *self.kernel_size, 1)
        strides = (1, *self.stride, 1)
        out = jax.lax.reduce_window(
            qt.value, -jnp.inf, jax.lax.max, window, strides, self.padding)
        return self.pack_output(qt.set(value=out))


class QuantMaxPool1d(_QuantMaxPoolNd):
    def __init__(self, kernel_size, stride=None, **kw):
        super().__init__(1, kernel_size, stride, **kw)


class QuantMaxPool2d(_QuantMaxPoolNd):
    def __init__(self, kernel_size, stride=None, **kw):
        super().__init__(2, kernel_size, stride, **kw)
