"""QAT → integer-domain serving conversion.

The capability Brevitas delegates to ONNX backends (export + onnxruntime,
SURVEY §1 layer 6) done in-framework: freeze trained quantizer state, cache
int8 weights + scales, and run true int8 MXU matmuls/convs with dequant in
the epilogue (:mod:`brevitas_tpu.kernels.int_matmul`).

Asymmetric inputs use the standard QGEMM identity: with x_q = x/s_x + zp_x,
    y = s_x s_w ( x_q @ w_q - zp_x * colsum(w_q) )
so the zp correction folds into the bias. Input clip bounds come from the
FROZEN input quantizer (its bit width / signedness / narrow range), not a
hardcoded 8-bit range; trained output quantizers are re-applied as a frozen
affine requant on the serving output.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu import config
from brevitas_tpu.graph.base import named_modules, set_module
from brevitas_tpu.kernels import int8_matmul
from brevitas_tpu.nn.conv import _QuantConvNd
from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.ops import max_int, min_int
from brevitas_tpu.quant.config import QuantType

Array = jnp.ndarray


def _prefer_pallas_gemm(m: int, k: int, n: int) -> bool:
    """Whether the Pallas epilogue-fused GEMM should beat XLA's int8
    dot_general for an (m, k) x (k, n) serving matmul.

    XLA's int8 path reaches ~94% of MXU peak and fuses the quantize
    prologue/dequant epilogue itself; the hand-written kernel pads every
    operand to its 256/1024 blocks, which measured 332k vs 579k img/s on
    batch-1024 LFC serving. Only large block-aligned problems avoid the
    padding tax."""
    return (m % 256 == 0 and k % 1024 == 0 and n % 1024 == 0
            and min(m, k, n) >= 2048)


def _freeze_act_quant(act_quantizer):
    """Extract (scale, zero_point, lo, hi) from a trained INT activation
    quantizer — post-training these no longer depend on the input."""
    if act_quantizer.quant_type != QuantType.INT:
        raise ValueError(
            f"integer serving supports INT input quantizers, got "
            f"{act_quantizer.quant_type}")
    act_quantizer.eval_mode()
    probe = jnp.zeros((1, 1), jnp.float32)
    qt = act_quantizer(probe)
    cfg = act_quantizer.cfg
    lo = float(min_int(cfg.signed, cfg.narrow_range, qt.bit_width))
    hi = float(max_int(cfg.signed, cfg.narrow_range, qt.bit_width))
    return qt.scale, qt.zero_point, lo, hi


def _freeze_output_quant(act_quantizer):
    """Frozen output requant params, or None when no output quant is set."""
    if act_quantizer is None or act_quantizer.quant_type == QuantType.NONE:
        return None
    s, zp, lo, hi = _freeze_act_quant(act_quantizer)
    return (jnp.asarray(s), jnp.asarray(zp), lo, hi)


def _apply_output_quant(y: Array, frozen) -> Array:
    if frozen is None:
        return y
    s, zp, lo, hi = frozen
    q = jnp.clip(jnp.round(y / s + zp), lo, hi)
    return (q - zp) * s


class Int8InferenceLinear(nnx.Module):
    """Serving twin of a trained QuantLinear: cached int8 kernel + fused
    quantized GEMM."""

    def __init__(self, qlinear: QuantLinear, act: Optional[str] = None):
        qw = qlinear.quant_weight()
        assert float(jnp.max(qw.bit_width)) <= 8.0, "int8 path needs bw<=8"
        self.w_int = jax.lax.stop_gradient(qw.int())  # (in, out) int8
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        if qlinear.input_quant.quant_type == QuantType.NONE:
            raise ValueError(
                "integer inference needs an input quantizer for the input scale")
        x_scale, x_zp, self.x_lo, self.x_hi = _freeze_act_quant(
            qlinear.input_quant)
        self.x_scale = jnp.asarray(x_scale).reshape(())
        self.x_zp = float(jnp.asarray(x_zp).reshape(()))
        self.x_signed = qlinear.input_quant.cfg.signed
        bias = (qlinear.bias[...].astype(jnp.float32)
                if qlinear.bias is not None else jnp.zeros((self.w_int.shape[1],)))
        # unsigned activations (uint8, e.g. post-ReLU) are re-centered into
        # int8 by subtracting 128; together with the zero-point this folds
        # into the bias via (x_q - zp) = (x_q - shift) + (shift - zp)
        self.x_shift = 0.0 if self.x_signed else 128.0
        colsum = jnp.sum(self.w_int.astype(jnp.int32), axis=0).astype(jnp.float32)
        self.bias = bias + (self.x_shift - self.x_zp) * colsum \
            * self.x_scale * self.w_scale
        self.act = act
        self.output_quant = _freeze_output_quant(
            getattr(qlinear, "output_quant", None))

    def __call__(self, x: Array) -> Array:
        from brevitas_tpu.kernels import int8_matmul_reference

        x_int = jnp.clip(jnp.round(x / self.x_scale + self.x_zp),
                         self.x_lo, self.x_hi)
        x_int = (x_int - self.x_shift).astype(jnp.int8)
        flat = x_int.reshape(-1, x_int.shape[-1])
        use_pallas = (jax.default_backend() == "tpu"
                      and config.USE_PALLAS_KERNELS
                      and _prefer_pallas_gemm(flat.shape[0],
                                              *self.w_int.shape))
        mm = int8_matmul if use_pallas else int8_matmul_reference
        y = mm(flat, self.w_int, self.x_scale, self.w_scale,
               self.bias, act=self.act)
        y = y.reshape(*x.shape[:-1], self.w_int.shape[1])
        return _apply_output_quant(y, self.output_quant)


class Int8InferenceConv(nnx.Module):
    """Serving twin of a trained QuantConv: int8 XLA conv with int32
    accumulation, dequant folded into the output epilogue."""

    def __init__(self, qconv: _QuantConvNd):
        qw = qconv.quant_weight()
        assert float(jnp.max(qw.bit_width)) <= 8.0
        self.w_int = jax.lax.stop_gradient(qw.int())  # HWIO int8
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        x_scale, x_zp, self.x_lo, self.x_hi = _freeze_act_quant(
            qconv.input_quant)
        self.x_scale = jnp.asarray(x_scale).reshape(())
        self.x_zp = float(jnp.asarray(x_zp).reshape(()))
        self.x_signed = qconv.input_quant.cfg.signed
        self.stride = qconv.stride
        self.padding = qconv.padding
        self.dilation = qconv.dilation
        self.groups = qconv.groups
        self.dn = qconv._dn()
        self.bias = (qconv.bias[...].astype(jnp.float32)
                     if qconv.bias is not None else None)
        # unsigned inputs re-center by 128 (see Int8InferenceLinear); the
        # x_zp/x_shift are static floats so the common symmetric-signed case
        # statically skips the border-correction conv below
        self.x_shift = 0.0 if self.x_signed else 128.0
        self.output_quant = _freeze_output_quant(
            getattr(qconv, "output_quant", None))

    def _conv(self, x_int: Array) -> Array:
        return jax.lax.conv_general_dilated(
            x_int, self.w_int, window_strides=self.stride,
            padding=self.padding, rhs_dilation=self.dilation,
            dimension_numbers=self.dn, feature_group_count=self.groups,
            preferred_element_type=jnp.int32)

    def __call__(self, x: Array) -> Array:
        x_int = jnp.clip(jnp.round(x / self.x_scale + self.x_zp),
                         self.x_lo, self.x_hi)
        x_int = (x_int - self.x_shift).astype(jnp.int8)
        acc = self._conv(x_int).astype(jnp.float32)
        shift = self.x_shift - self.x_zp  # static python float
        if shift != 0.0:
            # per-position kernel weight sums handle zero-padding borders
            ksum = self._conv(jnp.ones(x.shape, jnp.int8)).astype(jnp.float32)
            acc = acc + shift * ksum
        y = acc * (self.x_scale * self.w_scale)
        if self.bias is not None:
            y = y + self.bias
        return _apply_output_quant(y, self.output_quant)


def convert_integer_inference(model: nnx.Module) -> nnx.Module:
    """Swap every eligible trained quant layer for its integer serving twin
    in place. Layers without an INT input quantizer (no input scale/grid
    available) are left on the fake-quant path."""
    for path, mod in list(named_modules(model)):
        try:
            if isinstance(mod, QuantLinear) \
                    and mod.weight_quant.quant_type == QuantType.INT:
                set_module(model, path, Int8InferenceLinear(mod))
            elif isinstance(mod, _QuantConvNd) \
                    and mod.weight_quant.quant_type == QuantType.INT:
                set_module(model, path, Int8InferenceConv(mod))
        except (ValueError, NotImplementedError, AssertionError):
            continue
    return model
