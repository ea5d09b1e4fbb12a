"""Torch-backend export: TorchScript QCDQ and QOp.

Reference: ``src/brevitas/export/torch/qcdq/`` (TorchQCDQManager,
manager.py:22 — fake-quantize chains traced to TorchScript via
jit_inference_trace, export/manager.py:271) and ``export/torch/qoperator/``
(TorchQOpManager, manager.py:24 — maps WBIOL layers onto
``torch.nn.quantized`` modules).

Here the exported artifact is built from the SAME ``export_layers()`` walk as
the ONNX exporters (``export/qcdq.py``): each quant layer becomes a torch
closure over frozen (scale, zero-point, bit-width) constants, the closures
compose into a ``torch.nn.Module``, and ``torch.jit.trace`` produces the
TorchScript program. Conventions match the ONNX side: the torch graph runs
NCHW float inputs while the NNX model stays NHWC.

Numerics: the QCDQ path is bit-exact vs the fake-quant eval forward — the
activation law ``(clamp(round(x/s + zp), lo, hi) - zp) * s`` uses the same
round-half-to-even in torch and jnp, and weights/biases are baked as the
already-dequantized constants (``quant_weight().value`` and the
``_exported_bias`` accumulator-grid bias), exactly what the NNX forward
consumes. The QOp path stores activations as quint8 and weights as qint8
through ``torch.ao.nn.quantized`` modules, whose fused requantization can
differ from the fake-quant model by an output LSB (reference tolerates the
same vs ONNX Runtime, tests/brevitas_ort/common.py:25 INT_TOLERANCE).

QOp portability note: the reference's torch QOp backend caps weights at 7
bits (qoperator/handler/parameter.py ``validate_bit_width(..., 7, le_then=
True)``) to guard fbgemm's int16 accumulation on pre-VNNI x86. This exporter
allows full 8-bit weights — correct on AVX-VNNI/qnnpack/onednn backends —
so on pre-VNNI x86 CPUs 8-bit-weight QOp artifacts may exceed INT_TOLERANCE;
use ≤7-bit weights or the QCDQ flavor there.

torch is imported lazily: the library works without it, export raises.
"""

import math
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from brevitas_tpu.export.qcdq import _exported_bias, _sequential_children
from brevitas_tpu.models.common import TensorNorm
from brevitas_tpu.nn import (
    QuantConv1d,
    QuantConv2d,
    QuantConvTranspose1d,
    QuantConvTranspose2d,
    QuantIdentity,
    QuantLinear,
    QuantMaxPool2d,
    QuantReLU,
    QuantSigmoid,
    QuantTanh,
)
from brevitas_tpu.nn.activation import QuantHardTanh, QuantNonLinearActLayer
from brevitas_tpu.nn.misc import FoldedBatchNorm, QuantDropout, QuantScaleBias
from brevitas_tpu.nn.pool import QuantAvgPool2d
from brevitas_tpu.quant.config import QuantType

TorchFn = Callable  # (torch.Tensor) -> torch.Tensor

_T_HANDLERS: Dict[type, Callable] = {}


def _t_handles(*classes):
    def deco(fn):
        for c in classes:
            _T_HANDLERS[c] = fn
        return fn

    return deco


def _int_range(bw: float, signed: bool, narrow: bool):
    if signed:
        lo = -(2.0 ** (bw - 1)) + (1.0 if narrow else 0.0)
        hi = 2.0 ** (bw - 1) - 1.0
    else:
        lo = 0.0
        hi = 2.0**bw - 1.0 - (1.0 if narrow else 0.0)
    return lo, hi


def _act_fq_fn(quantizer, probe_shape) -> Optional[TorchFn]:
    """Fake-quant closure for an activation quantizer (frozen constants).

    Per-channel activation scales broadcast over the exported graph's NCHW
    channel axis (the ONNX side does the same via axis=1 QDQ).
    """
    import torch

    if quantizer.quant_type == QuantType.NONE:
        return None
    if quantizer.quant_type != QuantType.INT:
        raise ValueError(
            "torch QCDQ export supports INT activation quantizers only "
            "(binary/ternary export via QONNX, reference FINN flow)")
    qt = quantizer(jnp.zeros(probe_shape, jnp.float32))
    scale = np.asarray(qt.scale, np.float32).reshape(-1)
    zp = np.asarray(qt.zero_point, np.float32).reshape(-1)
    bw = float(np.asarray(qt.bit_width))
    lo, hi = _int_range(bw, bool(qt.signed), quantizer.cfg.narrow_range)
    per_channel = scale.size > 1
    s_t = torch.from_numpy(scale.copy())
    z_t = torch.from_numpy(np.broadcast_to(zp, scale.shape).astype(np.float32).copy())

    def fq(x):
        s, z = s_t, z_t
        if per_channel and x.dim() > 2:
            shape = [1] * x.dim()
            shape[1] = -1  # NCHW channel axis
            s = s_t.view(shape)
            z = z_t.view(shape)
        y = torch.clamp(torch.round(x / s + z), lo, hi)
        return (y - z) * s

    return fq


def _chain(*fns) -> TorchFn:
    fns = [f for f in fns if f is not None]

    def run(x):
        for f in fns:
            x = f(x)
        return x

    return run


def _probe_in(layer):
    return (1,) + (8,) * layer.spatial_dims + (layer.in_channels,)


def _torch_pad(layer) -> Optional[List[int]]:
    """Explicit conv padding as an F.pad spec (last spatial dim first),
    or None when no padding is needed."""
    if isinstance(layer.padding, str):
        if layer.padding == "VALID":
            return None
        raise ValueError("SAME padding export requires static input; use "
                         "explicit padding for export")
    if all(p == (0, 0) for p in layer.padding):
        return None
    pad: List[int] = []
    for lo, hi in reversed(layer.padding):
        pad.extend([lo, hi])
    return pad


@_t_handles(QuantLinear)
def _t_linear(layer: QuantLinear, style: str) -> TorchFn:
    import torch
    import torch.nn.functional as F

    in_qt = None
    in_fq = None
    if layer.input_quant.quant_type != QuantType.NONE:
        in_qt = layer.input_quant(jnp.zeros((1, layer.in_features), jnp.float32))
        in_fq = _act_fq_fn(layer.input_quant, (1, layer.in_features))
    qw = layer.quant_weight()
    w = torch.from_numpy(np.asarray(qw.value, np.float32).T.copy())  # (out, in)
    bias = None
    if layer.bias is not None:
        bias = torch.from_numpy(_exported_bias(layer, in_qt, qw).copy())
    out_fq = _act_fq_fn(layer.output_quant, (1, layer.out_features))
    if style == "qop":
        return _t_qop_linear(layer, in_qt, in_fq, qw, bias, out_fq)

    def run(x):
        return F.linear(x, w, bias)

    return _chain(in_fq, run, out_fq)


@_t_handles(QuantConv1d, QuantConv2d)
def _t_conv(layer, style: str) -> TorchFn:
    import torch
    import torch.nn.functional as F

    spatial = layer.spatial_dims
    in_qt = None
    in_fq = None
    if layer.input_quant.quant_type != QuantType.NONE:
        in_qt = layer.input_quant(jnp.zeros(_probe_in(layer), jnp.float32))
        in_fq = _act_fq_fn(layer.input_quant, _probe_in(layer))
    qw = layer.quant_weight()
    perm = (spatial + 1, spatial) + tuple(range(spatial))  # HWIO → OIHW
    w = torch.from_numpy(
        np.transpose(np.asarray(qw.value, np.float32), perm).copy())
    bias = None
    if layer.bias is not None:
        bias = torch.from_numpy(_exported_bias(layer, in_qt, qw).copy())
    out_fq = _act_fq_fn(
        layer.output_quant,
        (1,) + (8,) * spatial + (layer.out_channels,))
    if style == "qop":
        return _t_qop_conv(layer, in_qt, in_fq, qw, w, bias, out_fq)

    pad = _torch_pad(layer)
    conv = F.conv1d if spatial == 1 else F.conv2d

    def run(x):
        if pad is not None:
            x = F.pad(x, pad)
        return conv(x, w, bias, stride=layer.stride,
                    dilation=layer.dilation, groups=layer.groups)

    return _chain(in_fq, run, out_fq)


@_t_handles(QuantConvTranspose1d, QuantConvTranspose2d)
def _t_convtranspose(layer, style: str) -> TorchFn:
    import torch
    import torch.nn.functional as F

    spatial = layer.spatial_dims
    in_qt = None
    in_fq = None
    if layer.input_quant.quant_type != QuantType.NONE:
        in_qt = layer.input_quant(jnp.zeros(_probe_in(layer), jnp.float32))
        in_fq = _act_fq_fn(layer.input_quant, _probe_in(layer))
    qw = layer.quant_weight()
    perm = (spatial, spatial + 1) + tuple(range(spatial))  # HWIO → IOHW
    w = torch.from_numpy(
        np.transpose(np.asarray(qw.value, np.float32), perm).copy())
    bias = None
    if layer.bias is not None:
        bias = torch.from_numpy(_exported_bias(layer, in_qt, qw).copy())
    out_fq = _act_fq_fn(
        layer.output_quant,
        (1,) + (8,) * spatial + (layer.out_channels,))
    if isinstance(layer.padding, str):
        raise ValueError("ConvTranspose torch export needs explicit padding")
    pads = [p[0] for p in layer.padding]
    if any(p[0] != p[1] for p in layer.padding):
        raise ValueError("asymmetric ConvTranspose padding not expressible "
                         "as a single torch conv_transpose call")
    convt = F.conv_transpose1d if spatial == 1 else F.conv_transpose2d

    def run(x):
        return convt(x, w, bias, stride=layer.stride, padding=pads,
                     dilation=layer.dilation, groups=layer.groups)

    return _chain(in_fq, run, out_fq)


@_t_handles(QuantReLU, QuantSigmoid, QuantTanh, QuantIdentity, QuantHardTanh)
def _t_act(layer: QuantNonLinearActLayer, style: str) -> TorchFn:
    import torch

    fn_map = {QuantReLU: torch.relu, QuantSigmoid: torch.sigmoid,
              QuantTanh: torch.tanh}
    act = fn_map.get(type(layer))
    fq = _act_fq_fn(layer.act_quant, (1, 8))
    return _chain(act, fq)


@_t_handles(QuantMaxPool2d)
def _t_maxpool(layer, style: str) -> TorchFn:
    import torch.nn.functional as F

    same = getattr(layer, "padding", "VALID") == "SAME"
    k, s = layer.kernel_size, layer.stride

    def run(x):
        if same:
            # SAME_UPPER padding resolved against the (traced) input shape
            pads = []
            for dim, (kk, ss) in zip((3, 2), zip(reversed(k), reversed(s))):
                size = x.shape[dim]
                out = -(-size // ss)
                total = max(0, (out - 1) * ss + kk - size)
                pads.extend([total // 2, total - total // 2])
            x = F.pad(x, pads, value=float("-inf"))
        return F.max_pool2d(x, k, s)

    return run


@_t_handles(QuantAvgPool2d)
def _t_avgpool(layer, style: str) -> TorchFn:
    import torch.nn.functional as F

    k, s = layer.kernel_size, layer.stride
    factor = 1.0
    if layer.trunc_quant is not None:
        # same rescale approximation as the ONNX exporter: the layer emits
        # trunc(sum / 2^ceil(log2 k)) at the input scale, AveragePool
        # computes sum/k
        kk = layer._kernel_elems
        factor = kk / (2.0 ** math.ceil(math.log2(kk)))

    def run(x):
        y = F.avg_pool2d(x, k, s)
        return y * factor if factor != 1.0 else y

    return run


@_t_handles(TensorNorm)
def _t_tensor_norm(layer: TensorNorm, style: str) -> TorchFn:
    inv_std = 1.0 / np.sqrt(float(layer.running_var[...]) + layer.eps)
    mul = float(layer.weight[...]) * inv_std
    add = float(layer.bias[...]) - float(layer.running_mean[...]) * mul

    def run(x):
        return x * mul + add

    return run


@_t_handles(QuantScaleBias)
def _t_scale_bias(layer: QuantScaleBias, style: str) -> TorchFn:
    import torch

    probe = (1, 8, 8, layer.num_features)
    in_qt = None
    in_fq = None
    if layer.input_quant.quant_type != QuantType.NONE:
        in_qt = layer.input_quant(jnp.zeros(probe, jnp.float32))
        in_fq = _act_fq_fn(layer.input_quant, probe)
    qw = layer.quant_weight()
    w = torch.from_numpy(
        np.asarray(qw.value, np.float32).reshape(-1, 1, 1).copy())
    b = None
    if layer.bias is not None:
        b = torch.from_numpy(
            _exported_bias(layer, in_qt, qw).reshape(-1, 1, 1).copy())
    out_fq = _act_fq_fn(layer.output_quant, probe)

    def run(x):
        y = x * w
        return y + b if b is not None else y

    return _chain(in_fq, run, out_fq)


def _t_identity_handler(layer, style: str) -> TorchFn:
    return lambda x: x


_T_HANDLERS[QuantDropout] = _t_identity_handler
_T_HANDLERS[FoldedBatchNorm] = _t_identity_handler


def _t_batchnorm(layer, style: str) -> TorchFn:
    import torch
    import torch.nn.functional as F

    n = layer.num_features
    weight = torch.from_numpy(np.asarray(
        layer.scale[...] if layer.scale is not None else np.ones(n),
        np.float32).copy())
    bias = torch.from_numpy(np.asarray(
        layer.bias[...] if layer.bias is not None else np.zeros(n),
        np.float32).copy())
    mean = torch.from_numpy(np.asarray(layer.mean[...], np.float32).copy())
    var = torch.from_numpy(np.asarray(layer.var[...], np.float32).copy())
    eps = float(layer.epsilon)

    def run(x):
        return F.batch_norm(x, mean, var, weight, bias, False, 0.0, eps)

    return run


def _register_nnx_handlers():
    from flax import nnx

    _T_HANDLERS.setdefault(nnx.BatchNorm, _t_batchnorm)
    _T_HANDLERS.setdefault(nnx.Dropout, _t_identity_handler)


# -- QOp: torch.ao.nn.quantized execution ------------------------------------
# Reference TorchQOpManager (export/torch/qoperator/manager.py:24): WBIOL
# layers run as torch quantized modules (quint8 activations, qint8 weights,
# int32 bias at in_scale*w_scale), everything else reuses the QCDQ closures —
# the same split as the ONNX QOp exporter in export/qcdq.py.


def _quint8_params(qt, narrow: bool, what: str):
    """(scale, quint8 zero-point) storing a ≤8-bit INT activation grid.
    Signed grids shift onto quint8 by +128 (exact; same trick as ONNX QOp
    uint8 storage of signed activations). Narrow-range grids are rejected
    like the ONNX QOp exporter: quint8 storage can produce the -2^(bw-1)
    code a narrow model grid excludes."""
    if narrow:
        raise ValueError(f"narrow quant not supported by QOp export ({what})")
    bw = float(np.asarray(qt.bit_width))
    if bw > 8.0:
        raise ValueError(f"QOp export stores {what} as quint8; {bw:g}-bit "
                         "quantizers cannot be represented")
    scale = float(np.asarray(qt.scale).reshape(()))
    zp = float(np.asarray(qt.zero_point).reshape(()))
    if zp != round(zp):
        raise ValueError(f"QOp export needs integer zero-points ({what})")
    zp = int(round(zp)) + (128 if bool(qt.signed) else 0)
    return scale, zp


def _qop_weight_zp_check(qw):
    """torch qint8 weights are symmetric-only; the QOp modules hardcode a
    zero weight zero-point, so reject asymmetric weight quantizers instead
    of silently mis-exporting them (ONNX QOp exports the true zp)."""
    zp = np.asarray(qw.zero_point, np.float64).reshape(-1)
    if np.any(np.round(zp) != 0):
        raise ValueError("torch QOp export requires symmetric (zero "
                         "zero-point) weight quantizers")


def _sub8_input_guard(in_fq, in_qt):
    """quantize_per_tensor clamps to the full quint8 [0,255] range; a
    sub-8-bit model grid clamps tighter. Re-apply the model's own input
    fake-quant first so out-of-grid inputs saturate at the model's clamp
    bounds, mirroring the ONNX QOp exporter's Clip for bw<8."""
    bw = float(np.asarray(in_qt.bit_width))
    return in_fq if bw < 8.0 else None


def _t_qop_linear(layer, in_qt, in_fq, qw, bias, out_fq) -> TorchFn:
    import torch

    if in_qt is None or layer.output_quant.quant_type == QuantType.NONE:
        raise ValueError("QOp export requires INT input and output "
                         "quantizers (reference StdQOpONNXQuantWBIOLHandler)")
    x_scale, x_zp = _quint8_params(in_qt, layer.input_quant.cfg.narrow_range,
                                   "inputs")
    out_qt = layer.output_quant(jnp.zeros((1, layer.out_features), jnp.float32))
    y_scale, y_zp = _quint8_params(
        out_qt, layer.output_quant.cfg.narrow_range, "outputs")
    sub8_fq = _sub8_input_guard(in_fq, in_qt)
    _qop_weight_zp_check(qw)
    w_int = np.asarray(qw.int(), np.float32).T  # (out, in)
    w_scale = np.asarray(qw.scale, np.float32).reshape(-1)
    if w_scale.size > 1:
        wq = torch.quantize_per_channel(
            torch.from_numpy((w_int * w_scale[:, None]).copy()),
            torch.from_numpy(w_scale.astype(np.float64).copy()),
            torch.zeros(w_scale.size, dtype=torch.int64), 0, torch.qint8)
    else:
        wq = torch.quantize_per_tensor(
            torch.from_numpy((w_int * w_scale).copy()),
            float(w_scale[0]), 0, torch.qint8)
    mod = torch.ao.nn.quantized.Linear(layer.in_features, layer.out_features,
                                       bias_=bias is not None)
    mod.set_weight_bias(wq, bias)
    mod.scale = y_scale
    mod.zero_point = y_zp

    def run(x):
        xq = torch.quantize_per_tensor(x, x_scale, x_zp, torch.quint8)
        return mod(xq).dequantize()

    # sub-8-bit input/output grids: the quantized module clamps to the full
    # uint8 range; re-apply the model's own (narrower) fake-quant around it
    fn = _chain(sub8_fq, run, out_fq)
    fn._torch_mod = mod  # packed-params module must register for tracing
    return fn


def _t_qop_conv(layer, in_qt, in_fq, qw, w_oihw, bias, out_fq) -> TorchFn:
    import torch

    if in_qt is None or layer.output_quant.quant_type == QuantType.NONE:
        raise ValueError("QOp export requires INT input and output "
                         "quantizers (reference StdQOpONNXQuantWBIOLHandler)")
    if layer.spatial_dims != 2:
        raise ValueError("torch QOp conv export supports Conv2d")
    x_scale, x_zp = _quint8_params(in_qt, layer.input_quant.cfg.narrow_range,
                                   "inputs")
    out_qt = layer.output_quant(
        jnp.zeros((1, 8, 8, layer.out_channels), jnp.float32))
    y_scale, y_zp = _quint8_params(
        out_qt, layer.output_quant.cfg.narrow_range, "outputs")
    sub8_fq = _sub8_input_guard(in_fq, in_qt)
    _qop_weight_zp_check(qw)
    w_scale = np.asarray(qw.scale, np.float32).reshape(-1)
    if w_scale.size > 1:
        wq = torch.quantize_per_channel(
            w_oihw, torch.from_numpy(w_scale.astype(np.float64).copy()),
            torch.zeros(w_scale.size, dtype=torch.int64), 0, torch.qint8)
    else:
        wq = torch.quantize_per_tensor(w_oihw, float(w_scale[0]), 0,
                                       torch.qint8)
    if isinstance(layer.padding, str):
        raise ValueError("QOp conv export needs explicit padding")
    if any(p[0] != p[1] for p in layer.padding):
        raise ValueError("asymmetric conv padding not supported by torch QOp")
    mod = torch.ao.nn.quantized.Conv2d(
        layer.in_channels, layer.out_channels, layer.kernel_size,
        stride=layer.stride, padding=[p[0] for p in layer.padding],
        dilation=layer.dilation, groups=layer.groups, bias=bias is not None)
    mod.set_weight_bias(wq, bias)
    mod.scale = y_scale
    mod.zero_point = y_zp

    def run(x):
        xq = torch.quantize_per_tensor(x, x_scale, x_zp, torch.quint8)
        return mod(xq).dequantize()

    fn = _chain(sub8_fq, run, out_fq)
    fn._torch_mod = mod
    return fn


# -- module assembly ----------------------------------------------------------


def _glue_fn(item, saved: Dict[str, object]) -> TorchFn:
    import torch
    import torch.nn.functional as F

    op = item[0]
    if op == "flatten":
        return lambda x: torch.flatten(x, 1)
    if op == "affine":
        _, mul, add = item
        return lambda x: x * float(mul) + float(add)
    if op == "debug":
        name = item[1]

        def probe(x):
            saved["__debug_" + name] = x
            return x

        return probe
    if op == "save":
        name = item[1]

        def save(x):
            saved[name] = x
            return x

        return save
    if op == "load":
        name = item[1]
        return lambda x: saved[name]
    if op == "add_saved":
        name = item[1]
        return lambda x: x + saved[name]
    if op == "relu":
        return torch.relu
    if op == "relu6":
        return lambda x: torch.clamp(x, 0.0, 6.0)
    if op == "concat":
        names = item[1]
        return lambda x: torch.cat(
            [x if n == "@" else saved[n] for n in names], dim=1)
    if op == "maxpool":
        _, k, s, pad = item

        def mp(x):
            if pad == "SAME":
                size_h, size_w = x.shape[2], x.shape[3]
                pads = []
                for size in (size_w, size_h):
                    out = -(-size // s)
                    total = max(0, (out - 1) * s + k - size)
                    pads.extend([total // 2, total - total // 2])
                x = F.pad(x, pads, value=float("-inf"))
            return F.max_pool2d(x, k, s)

        return mp
    if op == "avgpool":
        _, k, s = item
        return lambda x: F.avg_pool2d(x, k, s)
    if op == "gap":
        return lambda x: torch.mean(x, dim=(2, 3), keepdim=True)
    if op == "flatten_hwc":
        return lambda x: torch.flatten(x.permute(0, 2, 3, 1), 1)
    if op == "resize_scale":
        _, sh, sw = item
        return lambda x: F.interpolate(x, scale_factor=(sh, sw),
                                       mode="bilinear", align_corners=False)
    if op == "expand_like":
        name = item[1]
        return lambda x: x.expand(-1, -1, saved[name].shape[2],
                                  saved[name].shape[3])
    raise ValueError(f"unknown glue spec {item}")


def build_torch_module(model, example_input, style: str = "qcdq"):
    """Assemble the torch twin of a quant model as an eager
    ``torch.nn.Module`` (constants baked, NCHW float IO)."""
    import torch

    from brevitas_tpu.utils import eval_mode

    assert style in ("qcdq", "qop")
    _register_nnx_handlers()
    eval_mode(model)
    model(jnp.asarray(example_input))  # resolve shape-dependent layer state
    if hasattr(model, "export_layers"):
        items = model.export_layers()
    else:
        # same walk source as the ONNX exporters: derive from one traced
        # forward (CNV/FC lost their hand lists in round 4), child order
        # as last resort
        from brevitas_tpu.export.derive import (
            DeriveError,
            derive_export_items,
        )

        try:
            items = derive_export_items(
                model, example_input,
                output_rank=np.asarray(model(
                    jnp.asarray(example_input))).ndim)
        except DeriveError:
            items = [m for _, m in _sequential_children(model)]
    saved: Dict[str, object] = {}
    fns: List[TorchFn] = []
    for item in items:
        if isinstance(item, tuple):
            fns.append(_glue_fn(item, saved))
            continue
        handler = None
        for cls in type(item).__mro__:
            if cls in _T_HANDLERS:
                handler = _T_HANDLERS[cls]
                break
        if handler is None:
            raise ValueError(
                f"no torch export handler for {type(item).__name__}")
        fns.append(handler(item, style))

    class _Exported(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # quantized modules carry TorchBind packed params and must be
            # registered submodules for torch.jit.trace to capture them
            self.qmods = torch.nn.ModuleList(
                [f._torch_mod for f in fns if hasattr(f, "_torch_mod")])

        def forward(self, x):
            saved.clear()
            for f in fns:
                x = f(x)
            return x

    return _Exported()


def _torch_example(example_input):
    """NHWC jnp example → NCHW torch example (matching the ONNX IO layout)."""
    import torch

    x = np.asarray(example_input, np.float32)
    if x.ndim == 4:
        x = x.transpose(0, 3, 1, 2)
    elif x.ndim == 3:
        x = x.transpose(0, 2, 1)
    return torch.from_numpy(x.copy())


def export_torch_qcdq(model, example_input, path: Optional[str] = None):
    """Trace the QCDQ torch twin to TorchScript (reference export_torch_qcdq,
    export/__init__.py:17-47 → TorchQCDQManager). Returns the ScriptModule;
    saves with ``torch.jit.save`` when ``path`` is given."""
    import torch

    mod = build_torch_module(model, example_input, style="qcdq")
    with torch.no_grad():
        traced = torch.jit.trace(mod, _torch_example(example_input))
    if path:
        torch.jit.save(traced, path)
    return traced


def export_torch_qop(model, example_input, path: Optional[str] = None):
    """Trace the quantized-op torch twin (reference export_torch_qop →
    TorchQOpManager): WBIOL layers execute as ``torch.ao.nn.quantized``
    modules. Returns the ScriptModule; saves when ``path`` is given."""
    import torch

    if torch.backends.quantized.engine == "none":  # pragma: no cover
        for eng in ("fbgemm", "x86", "qnnpack"):
            if eng in torch.backends.quantized.supported_engines:
                torch.backends.quantized.engine = eng
                break
    mod = build_torch_module(model, example_input, style="qop")
    with torch.no_grad():
        traced = torch.jit.trace(mod, _torch_example(example_input))
    if path:
        torch.jit.save(traced, path)
    return traced
