"""Torch-backend export tests (reference export/torch/{qcdq,qoperator}):
the traced TorchScript twin must reproduce the NNX fake-quant model —
bit-exact for QCDQ, within the reference's integer tolerance for QOp
(tests/brevitas_ort/common.py:25 INT_TOLERANCE=2)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.export import export_torch_qcdq, export_torch_qop
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode

torch = pytest.importorskip("torch")


class SmallNet(nnx.Module):
    def __init__(self, w_bits=8, a_bits=8, per_channel=False):
        rngs = nnx.Rngs(0)
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1,
                                                bit_width=float(a_bits))
        uact = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1,
                                                  bit_width=float(a_bits))
        wq = (presets.Int8WeightPerChannelFloat if per_channel
              else presets.Int8WeightPerTensorFloat).let(
                  bit_width=float(w_bits))
        self.inp = qnn.QuantIdentity(act)
        self.l1 = qnn.QuantLinear(16, 32, weight_quant=wq, rngs=rngs)
        self.relu = qnn.QuantReLU(uact)
        self.l2 = qnn.QuantLinear(32, 8, weight_quant=wq, rngs=rngs)

    def export_layers(self):
        return [self.inp, self.l1, self.relu, self.l2]

    def __call__(self, x):
        return self.l2(self.relu(self.l1(self.inp(x))))


@pytest.mark.parametrize("bits", [8, 4, 2])
@pytest.mark.parametrize("per_channel", [False, True])
def test_torch_qcdq_matches_model(bits, per_channel, rng):
    m = SmallNet(w_bits=bits, a_bits=bits, per_channel=per_channel)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)  # collect act stats
    eval_mode(m)
    y_model = np.asarray(m(x))
    ts = export_torch_qcdq(m, x)
    y_torch = ts(torch.from_numpy(np.asarray(x).copy())).numpy()
    np.testing.assert_allclose(y_torch, y_model, rtol=1e-5, atol=1e-5)


def test_torch_qcdq_conv_net(rng):
    class ConvNet(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            uact = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1)
            self.inp = qnn.QuantIdentity(act)
            self.conv1 = qnn.QuantConv2d(
                3, 8, 3, padding=1, rngs=r,
                weight_quant=presets.Int8WeightPerChannelFloat)
            self.relu1 = qnn.QuantReLU(uact)
            self.pool = qnn.QuantMaxPool2d(2, 2)
            self.conv2 = qnn.QuantConv2d(
                8, 4, 3, padding=0, rngs=r,
                weight_quant=presets.Int8WeightPerTensorFloat)

        def export_layers(self):
            return [self.inp, self.conv1, self.relu1, self.pool, self.conv2]

        def __call__(self, x):
            return self.conv2(self.pool(self.relu1(self.conv1(self.inp(x)))))

    m = ConvNet()
    m.conv1.bias[...] = jnp.asarray(
        rng.standard_normal(8).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))  # NHWC
    ts = export_torch_qcdq(m, x)
    x_nchw = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())
    y_torch = ts(x_nchw).numpy()
    np.testing.assert_allclose(y_torch, y_model.transpose(0, 3, 1, 2),
                               rtol=1e-5, atol=1e-5)


def test_torch_qcdq_save_load_roundtrip(rng, tmp_path):
    m = SmallNet()
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    path = str(tmp_path / "smallnet_qcdq.pt")
    export_torch_qcdq(m, x, path=path)
    reloaded = torch.jit.load(path)
    y_model = np.asarray(m(x))
    y_torch = reloaded(torch.from_numpy(np.asarray(x).copy())).numpy()
    np.testing.assert_allclose(y_torch, y_model, rtol=1e-5, atol=1e-5)


class QOpNet(nnx.Module):
    def __init__(self, use_bias: bool, per_channel: bool = False):
        r = nnx.Rngs(0)
        wq = (presets.Int8WeightPerChannelFloat if per_channel
              else presets.Int8WeightPerTensorFloat)
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
        self.l1 = qnn.QuantLinear(
            16, 32, use_bias=use_bias, weight_quant=wq,
            input_quant=act, output_quant=act.let(), rngs=r)

    def export_layers(self):
        return [self.l1]

    def __call__(self, x):
        return self.l1(x)


@pytest.mark.parametrize("use_bias", [False, True])
@pytest.mark.parametrize("per_channel", [False, True])
def test_torch_qop_linear_matches_model(use_bias, per_channel, rng):
    m = QOpNet(use_bias, per_channel)
    if use_bias:
        m.l1.bias[...] = jnp.asarray(
            rng.standard_normal(32).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))
    ts = export_torch_qop(m, x)
    y_torch = ts(torch.from_numpy(np.asarray(x).copy())).numpy()
    out_scale = float(np.asarray(m.l1.output_quant(y_model).scale))
    np.testing.assert_allclose(y_torch, y_model, atol=2.1 * out_scale)


def test_torch_qop_conv_matches_model(rng):
    class ConvNet(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.conv = qnn.QuantConv2d(
                3, 8, 3, padding=1, rngs=r,
                weight_quant=presets.Int8WeightPerChannelFloat,
                input_quant=act, output_quant=act.let())

        def export_layers(self):
            return [self.conv]

        def __call__(self, x):
            return self.conv(x)

    m = ConvNet()
    m.conv.bias[...] = jnp.asarray(
        rng.standard_normal(8).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))  # NHWC
    ts = export_torch_qop(m, x)
    x_nchw = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())
    y_torch = ts(x_nchw).numpy()
    out_scale = float(np.asarray(m.conv.output_quant(y_model).scale))
    np.testing.assert_allclose(y_torch, y_model.transpose(0, 3, 1, 2),
                               atol=2.1 * out_scale)


def test_torch_qop_sub8_input_clamps_to_model_grid(rng):
    """A 4-bit-input QOp export must saturate inputs at the 4-bit grid bounds
    like the fake-quant model does, not at quint8's [0,255] (the quantized
    module's storage range). Regression: inputs beyond the 4-bit range used
    to diverge by ~160 output LSBs."""
    class Sub8Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            in_act = presets.Int8ActPerTensorFloat.let(
                collect_stats_steps=1, bit_width=4.0)
            out_act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.l1 = qnn.QuantLinear(
                16, 32, use_bias=False,
                weight_quant=presets.Int8WeightPerTensorFloat,
                input_quant=in_act, output_quant=out_act, rngs=r)

        def export_layers(self):
            return [self.l1]

        def __call__(self, x):
            return self.l1(x)

    m = Sub8Net()
    x_calib = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    m(x_calib)
    eval_mode(m)
    # inputs 4x beyond the calibrated 4-bit range: the model clamps them
    x = 4.0 * x_calib[:4]
    y_model = np.asarray(m(x))
    ts = export_torch_qop(m, x)
    y_torch = ts(torch.from_numpy(np.asarray(x).copy())).numpy()
    out_scale = float(np.asarray(m.l1.output_quant(y_model).scale))
    np.testing.assert_allclose(y_torch, y_model, atol=2.1 * out_scale)


def test_torch_qop_rejects_narrow_io_quant(rng):
    """Narrow-range input/output grids cannot be stored as quint8 (the
    storage can produce the code the narrow grid excludes) — must raise,
    matching the ONNX QOp validation."""
    class NarrowNet(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(
                collect_stats_steps=1, narrow_range=True)
            self.l1 = qnn.QuantLinear(
                16, 32, use_bias=False,
                weight_quant=presets.Int8WeightPerTensorFloat,
                input_quant=act, output_quant=act.let(), rngs=r)

        def export_layers(self):
            return [self.l1]

        def __call__(self, x):
            return self.l1(x)

    m = NarrowNet()
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="narrow quant not supported"):
        export_torch_qop(m, x)


def test_torch_qop_rejects_asymmetric_weights(rng):
    """torch qint8 weights are symmetric-only; the QOp modules hardcode a
    zero weight zero-point, so a shifted weight quantizer must raise rather
    than silently exporting wrong integer weights."""
    class ShiftedWNet(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.l1 = qnn.QuantLinear(
                16, 32, use_bias=False,
                weight_quant=presets.ShiftedUint8WeightPerTensorFloat,
                input_quant=act, output_quant=act.let(), rngs=r)

        def export_layers(self):
            return [self.l1]

        def __call__(self, x):
            return self.l1(x)

    m = ShiftedWNet()
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="symmetric"):
        export_torch_qop(m, x)


def test_torch_qop_requires_io_quant(rng):
    m = SmallNet()  # WBIOL layers lack input/output quant
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="QOp export requires"):
        export_torch_qop(m, x)


def test_torch_qcdq_lfc(rng):
    """The flagship bnn_pynq model family exports through the same walk
    (INT4 variant; binary needs QONNX, as on the ONNX side)."""
    from brevitas_tpu.models import lfc

    model = lfc(weight_bit_width=4, act_bit_width=4, in_bit_width=4,
                dropout=0.0, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.random((16, 28, 28, 1)).astype(np.float32))
    model(x)
    eval_mode(model)
    y_model = np.asarray(model(x))
    ts = export_torch_qcdq(model, jnp.zeros((1, 784)))
    x_flat = torch.from_numpy(np.asarray(x).reshape(16, -1).copy())
    y_torch = ts(x_flat).numpy()
    # flax BN (rsqrt) vs torch F.batch_norm (1/sqrt) differ at the f32 ulp;
    # a pre-activation within 1 ulp of a 4-bit quant boundary flips one code
    # and shifts ALL of that sample's downstream logits by O(grid step).
    # Accept such tie-cascade rows but stay strict on semantics: most rows
    # f32-exact, identical predictions, worst case bounded by a grid step.
    d = np.abs(y_torch - y_model)
    row_exact = (d.max(axis=-1) < 1e-4)
    assert row_exact.mean() >= 0.75, d.max(axis=-1)
    assert (y_torch.argmax(-1) == y_model.argmax(-1)).all()
    assert d.max() < 1.0, d.max()
