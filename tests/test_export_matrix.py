"""ORT-tier export case matrix.

Reference: ``tests/brevitas_ort/common.py:28-37`` + ``quant_module_cases.py``
— the reference sweeps quantizer family x layer type x bit-widths 2..8 x
narrow on/off through onnxruntime. Here the same matrix runs through the
in-repo interpreter oracle (no onnxruntime in-image) at reduced shapes:
{QuantLinear, QuantConv1d, QuantConv2d, QuantConvTranspose2d} x
{per-tensor, per-channel, shifted-uint-act, po2 fixed-point} x
bits {2..8} x narrow {on, off}, exported QCDQ and QONNX (+ QOp for the
8-bit per-tensor I/O-quantized cases, mirroring the reference's
QuantizeLinear storage constraint).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.export import export_onnx_qcdq, export_qonnx, run_onnx
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode

BITS = range(2, 9)

WEIGHT_STYLES = {
    "per_tensor": presets.Int8WeightPerTensorFloat,
    "per_channel": presets.Int8WeightPerChannelFloat,
    "po2": presets.Int8WeightPerTensorFixedPoint,
}

LAYERS = ["linear", "conv1d", "conv2d", "convtranspose2d"]


def _build(layer_kind, wq, act, rngs):
    if layer_kind == "linear":
        lay = qnn.QuantLinear(6, 5, weight_quant=wq, rngs=rngs)
        shape = (2, 6)
    elif layer_kind == "conv1d":
        lay = qnn.QuantConv1d(3, 4, 3, padding=[(1, 1)], weight_quant=wq,
                              rngs=rngs)
        shape = (2, 5, 3)
    elif layer_kind == "conv2d":
        lay = qnn.QuantConv2d(3, 4, 3, padding=[(1, 1)] * 2, weight_quant=wq,
                              rngs=rngs)
        shape = (2, 5, 5, 3)
    else:
        # explicit zero padding (the torch-default deconv config the
        # reference matrix sweeps; SAME conv-transpose export is refused
        # by design — dynamic-shape padding)
        lay = qnn.QuantConvTranspose2d(3, 4, 2, stride=2,
                                       padding=[(0, 0)] * 2,
                                       weight_quant=wq, rngs=rngs)
        shape = (2, 4, 4, 3)

    class Net(nnx.Module):
        def __init__(self):
            self.inp = qnn.QuantIdentity(act, return_quant_tensor=False)
            self.lay = lay

        def export_layers(self):
            return [self.inp, self.lay]

        def __call__(self, x):
            return self.lay(self.inp(x))

    return Net(), shape


def _feed(x, shape):
    arr = np.asarray(x)
    if len(shape) == 4:
        return arr.transpose(0, 3, 1, 2)
    if len(shape) == 3:
        return arr.transpose(0, 2, 1)
    return arr


def _unfeed(y, rank):
    if rank == 4:
        return y.transpose(0, 2, 3, 1)
    if rank == 3:
        return y.transpose(0, 2, 1)
    return y


def _roundtrip(m, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    m(x)  # calibrate act stats
    eval_mode(m)
    y = np.asarray(m(x))
    span = float(np.abs(y).max()) + 1e-6
    for export_fn in (export_onnx_qcdq, export_qonnx):
        blob = export_fn(m, x)
        (got,) = run_onnx(blob, {"input": _feed(x, shape)})
        got = _unfeed(got, y.ndim)
        np.testing.assert_allclose(
            got, y, atol=2e-4 * span, rtol=1e-4,
            err_msg=f"{export_fn.__name__} diverged from the model")


@pytest.mark.parametrize("style", list(WEIGHT_STYLES))
@pytest.mark.parametrize("layer_kind", LAYERS)
def test_matrix_weight_styles(layer_kind, style, rng):
    """weight style x layer x bits 2..8 x narrow on/off, QCDQ + QONNX."""
    base = WEIGHT_STYLES[style]
    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
    for bits in BITS:
        for narrow in (False, True):
            wq = base.let(bit_width=float(bits), narrow_range=narrow)
            m, shape = _build(layer_kind, wq, act.let(), nnx.Rngs(bits))
            _roundtrip(m, shape, rng)


@pytest.mark.parametrize("layer_kind", LAYERS)
def test_matrix_shifted_uint_act(layer_kind, rng):
    """Asymmetric (shifted-uint8) input activation grid across weight bits
    (the zero-point path of QuantizeLinear / the QONNX Quant op)."""
    act = presets.ShiftedUint8ActPerTensorFloat.let(collect_stats_steps=1)
    for bits in (2, 4, 8):
        wq = presets.Int8WeightPerTensorFloat.let(bit_width=float(bits))
        m, shape = _build(layer_kind, wq, act.let(), nnx.Rngs(bits))
        _roundtrip(m, shape, rng)


@pytest.mark.parametrize("layer_kind", ["linear", "conv2d"])
def test_matrix_qop(layer_kind, rng):
    """QOp dialect over bits 2..8 (int8/uint8 storage bound, reference
    validate_8b_bit_width): I/O-quantized layers become QLinearMatMul /
    QLinearConv and the integer pipeline matches within one output LSB."""
    from brevitas_tpu.export import export_onnx_qop

    for bits in BITS:
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
        wq = presets.Int8WeightPerTensorFloat.let(bit_width=float(bits))
        rngs = nnx.Rngs(bits)
        if layer_kind == "linear":
            lay = qnn.QuantLinear(6, 5, use_bias=True, weight_quant=wq,
                                  input_quant=act, output_quant=act.let(),
                                  rngs=rngs)
            shape = (2, 6)
        else:
            lay = qnn.QuantConv2d(3, 4, 3, use_bias=True,
                                  padding=[(1, 1)] * 2, weight_quant=wq,
                                  input_quant=act, output_quant=act.let(),
                                  rngs=rngs)
            shape = (2, 5, 5, 3)

        class Net(nnx.Module):
            def __init__(self):
                self.lay = lay

            def export_layers(self):
                return [self.lay]

            def __call__(self, x):
                return self.lay(x)

        m = Net()
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        m(x)
        eval_mode(m)
        y = np.asarray(m(x))
        blob = export_onnx_qop(m, x)
        (got,) = run_onnx(blob, {"input": _feed(x, shape)})
        got = _unfeed(got, y.ndim)
        out_scale = float(np.asarray(lay.output_quant(jnp.asarray(y)).scale))
        # integer-pipeline requant can differ by 1 output LSB at ties
        # (reference brevitas_ort tolerance: atol = 1 output quant step)
        np.testing.assert_allclose(got, y, atol=out_scale * 1.01)
