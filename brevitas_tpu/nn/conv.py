"""Quant convolutions (reference ``src/brevitas/nn/quant_conv.py:25,116``,
``quant_convtranspose.py:25,114``).

TPU-native layout: NHWC activations, HWIO kernels (output channel last) —
per-channel scales are (1,...,1,O) and broadcast against kernel and output.
Padding 'SAME'/'VALID' or explicit, matching the reference's standard + "same"
padding support.
"""

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import Int8WeightPerTensorFloat
from brevitas_tpu.nn.quant_layer import QuantWBIOL

Array = jnp.ndarray


def _tuple(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def _partial_vjp_conv(stride, padding, dilation, dn, groups, transposed):
    """MXU conv with low-precision operands and an f32 accumulator output.

    ``preferred_element_type=f32`` makes the output dtype differ from the
    operands, and lax.conv's transpose rule rejects the resulting
    mixed-dtype (f32 cotangent × bf16 operand) pair — unlike dot_general's.
    This custom_vjp computes the backward convs entirely in the operand
    dtype (bf16 operands, MXU f32 internal accumulation, bf16 result) and
    lets the surrounding ``astype`` ops upcast the cotangents — standard
    mixed-precision training semantics; the forward stays exact-f32."""

    def conv_low(x, w):
        if transposed:
            return jax.lax.conv_transpose(
                x, w, strides=stride, padding=padding, rhs_dilation=dilation,
                dimension_numbers=dn)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=padding,
            rhs_dilation=dilation, dimension_numbers=dn,
            feature_group_count=groups)

    @jax.custom_vjp
    def conv(x, w):
        if transposed:
            return jax.lax.conv_transpose(
                x, w, strides=stride, padding=padding, rhs_dilation=dilation,
                dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=padding,
            rhs_dilation=dilation, dimension_numbers=dn,
            feature_group_count=groups,
            preferred_element_type=jnp.float32)

    def fwd(x, w):
        return conv(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        _, vjp = jax.vjp(conv_low, x, w)
        return vjp(g.astype(x.dtype))

    conv.defvjp(fwd, bwd)
    return conv


import functools  # noqa: E402


@functools.lru_cache(maxsize=256)
def _cached_vjp_conv(stride, padding, dilation, dn, groups, transposed):
    return _partial_vjp_conv(stride, padding, dilation, dn, groups,
                             transposed)


class _QuantConvNd(QuantWBIOL):
    """Shared N-d conv machinery."""

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        out_channels: int,
        kernel_size,
        *,
        stride=1,
        padding="SAME",
        dilation=1,
        groups: int = 1,
        use_bias: bool = True,
        weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
        bias_quant: Optional[QuantConfig] = None,
        input_quant: Optional[QuantConfig] = None,
        output_quant: Optional[QuantConfig] = None,
        return_quant_tensor: bool = False,
        transposed: bool = False,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _tuple(kernel_size, spatial_dims)
        self.stride = _tuple(stride, spatial_dims)
        self.dilation = _tuple(dilation, spatial_dims)
        self.groups = groups
        self.transposed = transposed
        if transposed and groups != 1:
            raise ValueError("grouped transposed convolutions are not "
                             "supported (jax.lax.conv_transpose has no "
                             "feature_group_count)")
        if isinstance(padding, str):
            self.padding = padding.upper()
        else:
            p = _tuple(padding, spatial_dims)
            self.padding = tuple(
                (int(x[0]), int(x[1])) if isinstance(x, (tuple, list))
                else (int(x), int(x)) for x in p)
        # HWIO kernel; for grouped conv I = in_channels // groups
        kshape = (*self.kernel_size, in_channels // groups, out_channels)
        fan_in = int(np.prod(self.kernel_size)) * in_channels // groups
        k = 1.0 / fan_in ** 0.5
        w = nnx.initializers.uniform(2 * k)(rngs.params(), kshape, dtype) - k
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(jnp.zeros((out_channels,), dtype)) if use_bias else None
        # per-channel scaling groups over the OUTPUT channel: last axis of HWIO
        self.init_quant(weight_quant, bias_quant, input_quant, output_quant,
                        weight_init=w, channel_axis=len(kshape) - 1,
                        bias_init=jnp.zeros((out_channels,), dtype),
                        return_quant_tensor=return_quant_tensor)
        self._fan_in = fan_in

    @property
    def reduce_size(self) -> int:
        return self._fan_in

    def _dn(self):
        # N + spatial + C, kernel spatial + IO
        spatial = "".join("DHW"[-self.spatial_dims:])
        lhs = "N" + spatial + "C"
        rhs = spatial + "IO"
        return jax.lax.conv_dimension_numbers(
            (1,) * (self.spatial_dims + 2), (1,) * (self.spatial_dims + 2),
            (lhs, rhs, lhs))

    def _transpose_padding(self):
        """Torch ConvTranspose padding semantics: padding p REMOVES p from
        both ends of the output; jax.lax.conv_transpose padding ADDS. The
        equivalence is jax_pad = dilation*(k-1) - p per side."""
        if isinstance(self.padding, str):
            return self.padding
        out = []
        for (lo, hi), k, d in zip(self.padding, self.kernel_size,
                                  self.dilation):
            eff = d * (k - 1)
            out.append((eff - lo, eff - hi))
        return out

    def __call__(self, x):
        def inner(xv, wv, bv):
            out_dtype = xv.dtype
            cd = self.compute_dtype
            if self.transposed:
                # torch ConvTranspose parity: the kernel correlates spatially
                # flipped relative to jax.lax.conv_transpose's convention
                wv = jnp.flip(wv, axis=tuple(range(self.spatial_dims)))
                pad = self._transpose_padding()
            else:
                pad = self.padding
            pad_key = pad if isinstance(pad, str) else tuple(
                (int(lo), int(hi)) for lo, hi in pad)
            conv = _cached_vjp_conv(self.stride, pad_key, self.dilation,
                                    self._dn(), self.groups, self.transposed)
            if cd is not None:  # low-precision MXU operands, f32 accumulation
                xv, wv = xv.astype(cd), wv.astype(cd)
            y = conv(xv, wv)
            if bv is not None:
                y = y + bv
            return y.astype(out_dtype)

        return self.forward_quant(x, inner)


class QuantConv1d(_QuantConvNd):
    """(N, L, C) inputs."""

    def __init__(self, in_channels, out_channels, kernel_size, **kw):
        super().__init__(1, in_channels, out_channels, kernel_size, **kw)


class QuantConv2d(_QuantConvNd):
    """(N, H, W, C) inputs."""

    def __init__(self, in_channels, out_channels, kernel_size, **kw):
        super().__init__(2, in_channels, out_channels, kernel_size, **kw)


class QuantConvTranspose1d(_QuantConvNd):
    def __init__(self, in_channels, out_channels, kernel_size, **kw):
        super().__init__(1, in_channels, out_channels, kernel_size,
                         transposed=True, **kw)


class QuantConvTranspose2d(_QuantConvNd):
    def __init__(self, in_channels, out_channels, kernel_size, **kw):
        super().__init__(2, in_channels, out_channels, kernel_size,
                         transposed=True, **kw)
