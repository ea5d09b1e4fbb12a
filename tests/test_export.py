"""Export tests: QCDQ/QONNX graphs validated numerically against the NNX
model via the in-repo ONNX interpreter (the onnxruntime-oracle analogue of
reference tests/brevitas_ort/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.export import (
    export_native,
    export_onnx_qcdq,
    export_qonnx,
    load_native,
    run_onnx,
)
from brevitas_tpu.export.onnx_proto import parse_model
from brevitas_tpu.models import tfc
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


class SmallNet(nnx.Module):
    """Linear → ReLU → Linear with full quant pipeline."""

    def __init__(self, w_bits=8, a_bits=8, rngs=None):
        rngs = rngs or nnx.Rngs(0)
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1,
                                                bit_width=float(a_bits))
        uact = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1,
                                                  bit_width=float(a_bits))
        wq = presets.Int8WeightPerTensorFloat.let(bit_width=float(w_bits))
        self.inp = qnn.QuantIdentity(act, return_quant_tensor=False)
        self.l1 = qnn.QuantLinear(16, 32, weight_quant=wq, rngs=rngs)
        self.relu = qnn.QuantReLU(uact)
        self.l2 = qnn.QuantLinear(32, 8, weight_quant=wq, rngs=rngs)

    def export_layers(self):
        return [self.inp, self.l1, self.relu, self.l2]

    def __call__(self, x):
        return self.l2(self.relu(self.l1(self.inp(x))))


@pytest.mark.parametrize("bits", [8, 4, 2])
@pytest.mark.parametrize("style", ["qcdq", "qonnx"])
def test_export_matches_model(bits, style, rng):
    m = SmallNet(w_bits=bits, a_bits=bits)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)  # collect act stats
    eval_mode(m)
    y_model = np.asarray(m(x))
    export_fn = export_onnx_qcdq if style == "qcdq" else export_qonnx
    blob = export_fn(m, x)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    np.testing.assert_allclose(y_onnx, y_model, rtol=1e-4, atol=1e-4)


def test_export_per_channel_weights(rng):
    m = SmallNet()
    m.l1 = qnn.QuantLinear(16, 32,
                           weight_quant=presets.Int8WeightPerChannelFloat,
                           rngs=nnx.Rngs(1))
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))
    blob = export_onnx_qcdq(m, x)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    np.testing.assert_allclose(y_onnx, y_model, rtol=1e-4, atol=1e-4)


def test_export_tfc_binary(rng):
    model = tfc(1, 1, 1, dropout=0.0, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.random((2, 28, 28, 1)).astype(np.float32))
    model(x)
    eval_mode(model)
    y_model = np.asarray(model(x))
    blob = export_qonnx(model, jnp.zeros((1, 784)))
    x_flat = np.asarray(x).reshape(2, -1)
    (y_onnx,) = run_onnx(blob, {"input": x_flat})
    np.testing.assert_allclose(y_onnx, y_model, rtol=1e-3, atol=1e-3)


def test_qcdq_graph_structure(rng):
    m = SmallNet()
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    blob = export_onnx_qcdq(m, x, path="/tmp/smallnet_qcdq.onnx")
    g = parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert ops.count("QuantizeLinear") >= 4  # 2 act + 2 weight
    assert ops.count("DequantizeLinear") == ops.count("QuantizeLinear")
    assert "MatMul" in ops and "Relu" in ops
    # file round-trip
    with open("/tmp/smallnet_qcdq.onnx", "rb") as f:
        assert f.read() == blob


def test_qonnx_uses_custom_domain(rng):
    m = SmallNet()
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    g = parse_model(export_qonnx(m, x))
    quant_nodes = [n for n in g.nodes if n.op_type == "Quant"]
    assert quant_nodes and all(n.domain == "onnx.brevitas" for n in quant_nodes)


def test_export_conv_qcdq(rng):
    class ConvNet(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.inp = qnn.QuantIdentity(act)
            self.conv = qnn.QuantConv2d(
                3, 8, 3, padding=1, rngs=r,
                weight_quant=presets.Int8WeightPerChannelFloat)
            self.relu = qnn.QuantReLU(
                presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1))

        def export_layers(self):
            return [self.inp, self.conv, self.relu]

        def __call__(self, x):
            return self.relu(self.conv(self.inp(x)))

    m = ConvNet()
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))  # NHWC
    blob = export_onnx_qcdq(m, x)
    x_nchw = np.asarray(x).transpose(0, 3, 1, 2)
    (y_onnx,) = run_onnx(blob, {"input": x_nchw})
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-4)


def test_native_export_roundtrip(tmp_path, rng):
    m = SmallNet(w_bits=8)
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    path = str(tmp_path / "model.npz")
    info = export_native(m, path)
    assert info["layers"] == 2
    loaded = load_native(path)
    assert set(loaded) == {"l1", "l2"}
    entry = loaded["l1"]
    assert entry["w_int"].dtype == np.int8
    # dequantized int weights reproduce the fake-quant weights
    qw = m.l1.quant_weight()
    np.testing.assert_allclose(
        entry["w_int"].astype(np.float32) * entry["w_scale"],
        np.asarray(qw.value), rtol=1e-5, atol=1e-6)


class _TruncPoolNet(nnx.Module):
    def __init__(self, k=3):
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
        self.inp = qnn.QuantIdentity(act, return_quant_tensor=True)
        self.pool = qnn.QuantAvgPool2d(k, return_quant_tensor=False)

    def export_layers(self):
        return [self.inp, self.pool]

    def __call__(self, x):
        return self.pool(self.inp(x))


@pytest.mark.parametrize("style", ["qcdq", "qonnx"])
@pytest.mark.parametrize("k", [2, 3])
def test_export_avgpool_trunc_exact(style, k, rng):
    """Trunc-avgpool export reproduces nn/pool.py's integer-domain floor to
    well under one output quant step (round-4 verdict: the old rescale-only
    export was off by up to 1 LSB/element and the test hid it behind a
    whole-quant-step tolerance)."""
    from brevitas_tpu.export import export_onnx_qcdq, export_qonnx

    m = _TruncPoolNet(k)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))  # NHWC
    blob = (export_onnx_qcdq(m, x) if style == "qcdq"
            else export_qonnx(m, x))
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    scale = float(m.inp.act_quant(x).scale)
    # exact integer semantics: only f32 round-off remains (<< one LSB)
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               atol=scale * 1e-3)


def test_qonnx_trunc_op_bit_exact_vs_pool(rng):
    """The QONNX Trunc custom op is BIT-exact against nn/pool.py's floor
    across a sweep that exercises every truncation boundary."""
    from brevitas_tpu.export import export_qonnx

    m = _TruncPoolNet(3)
    x = jnp.asarray(rng.standard_normal((4, 9, 9, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))
    blob = export_qonnx(m, x)
    g = parse_model(blob)
    assert any(n.op_type == "Trunc" and n.domain == "onnx.brevitas"
               for n in g.nodes), "QONNX export must emit the Trunc op"
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    scale = float(m.inp.act_quant(x).scale)
    # bit-exact in the integer domain: identical multiples of the scale
    int_onnx = np.round(y_onnx.transpose(0, 2, 3, 1) / scale)
    int_model = np.round(y_model / scale)
    np.testing.assert_array_equal(int_onnx, int_model)


# -- QOp (QLinearConv / QLinearMatMul) ---------------------------------------


class QOpNet(nnx.Module):
    """Single WBIOL layer with the input+output quant QOp export requires."""

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
def test_qop_linear_matches_model(use_bias, per_channel, rng):
    from brevitas_tpu.export import export_onnx_qop

    m = QOpNet(use_bias, per_channel)
    if use_bias:
        m.l1.bias[...] = jnp.asarray(
            rng.standard_normal(32).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))
    blob = export_onnx_qop(m, x)
    g = parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert ("QLinearConv" in ops) == use_bias
    assert ("QLinearMatMul" in ops) == (not use_bias)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    out_scale = float(np.asarray(m.l1.output_quant(y_model).scale))
    # reference brevitas_ort tolerance is 2 integer quanta (common.py:25)
    np.testing.assert_allclose(y_onnx, y_model, atol=2.1 * out_scale)


def test_qop_conv_matches_model(rng):
    from brevitas_tpu.export import export_onnx_qop

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
    m.conv.bias[...] = jnp.asarray(rng.standard_normal(8).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))  # NHWC
    blob = export_onnx_qop(m, x)
    g = parse_model(blob)
    assert any(n.op_type == "QLinearConv" and len(n.inputs) == 9
               for n in g.nodes)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    out_scale = float(np.asarray(m.conv.output_quant(y_model).scale))
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               atol=2.1 * out_scale)


def test_qop_requires_io_quant(rng):
    from brevitas_tpu.export import export_onnx_qop

    m = SmallNet()  # WBIOL layers lack input/output quant
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="INT input and output"):
        export_onnx_qop(m, x)


def test_qop_mixed_graph_acts_stay_qcdq(rng):
    """Non-WBIOL layers keep QCDQ form inside a QOp export."""
    from brevitas_tpu.export import export_onnx_qop

    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            uact = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1)
            self.l1 = qnn.QuantLinear(16, 32, use_bias=True,
                                      input_quant=act, output_quant=act.let(),
                                      rngs=r)
            self.relu = qnn.QuantReLU(uact)
            self.l2 = qnn.QuantLinear(32, 8, use_bias=False,
                                      input_quant=uact.let(),
                                      output_quant=act.let(), rngs=r)

        def export_layers(self):
            return [self.l1, self.relu, self.l2]

        def __call__(self, x):
            return self.l2(self.relu(self.l1(x)))

    m = Net()
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))
    blob = export_onnx_qop(m, x)
    g = parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert "QLinearConv" in ops and "QLinearMatMul" in ops and "Relu" in ops
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    out_scale = float(np.asarray(m.l2.output_quant(y_model).scale))
    np.testing.assert_allclose(y_onnx, y_model, atol=4.2 * out_scale)


@pytest.mark.parametrize("style", ["qcdq", "qonnx"])
def test_export_convtranspose(style, rng):
    """QuantConvTranspose2d exports as ONNX ConvTranspose (IOHW weights,
    per-channel axis 1, torch-style output-cropping pads)."""

    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.inp = qnn.QuantIdentity(act)
            self.deconv = qnn.QuantConvTranspose2d(
                3, 5, 4, stride=2, padding=1, rngs=r,
                weight_quant=presets.Int8WeightPerChannelFloat)

        def export_layers(self):
            return [self.inp, self.deconv]

        def __call__(self, x):
            return self.deconv(self.inp(x))

    m = Net()
    m.deconv.bias[...] = jnp.asarray(rng.standard_normal(5).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_model = np.asarray(m(x))  # NHWC
    export_fn = export_onnx_qcdq if style == "qcdq" else export_qonnx
    blob = export_fn(m, x)
    g = parse_model(blob)
    assert any(n.op_type == "ConvTranspose" for n in g.nodes)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    assert y_onnx.shape == y_model.transpose(0, 3, 1, 2).shape
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-4)


# -- QuantLSTM QONNX export ---------------------------------------------------


@pytest.mark.parametrize("bidirectional", [False, True])
def test_qonnx_lstm_matches_model(bidirectional, rng):
    """QuantLSTM exports as QONNX QuantLSTMLayer custom nodes carrying all
    act-quantizer params (reference BrevitasQuantLSTMCellFn,
    export/onnx/qonnx/function.py:74); interpreter output matches the scanned
    NNX recurrence."""
    from brevitas_tpu.nn import QuantLSTM

    class Net(nnx.Module):
        def __init__(self):
            self.lstm = QuantLSTM(6, 5, num_layers=2,
                                  bidirectional=bidirectional,
                                  rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.lstm]

        def __call__(self, x):
            y, _ = self.lstm(x)
            return y

    m = Net()
    x = jnp.asarray(rng.standard_normal((3, 7, 6)).astype(np.float32))
    m(x)  # collect act stats
    eval_mode(m)
    y_model = np.asarray(m(x))
    blob = export_qonnx(m, x)
    g = parse_model(blob)
    lstm_nodes = [n for n in g.nodes if n.op_type == "QuantLSTMLayer"]
    assert len(lstm_nodes) == (4 if bidirectional else 2)
    assert all(n.domain == "onnx.brevitas" for n in lstm_nodes)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    np.testing.assert_allclose(y_onnx, y_model, rtol=1e-3, atol=1e-4)


def test_lstm_rejects_qcdq_style(rng):
    from brevitas_tpu.nn import QuantLSTM

    class Net(nnx.Module):
        def __init__(self):
            self.lstm = QuantLSTM(4, 4, rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.lstm]

        def __call__(self, x):
            return self.lstm(x)[0]

    m = Net()
    x = jnp.zeros((1, 3, 4))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="QONNX only"):
        export_onnx_qcdq(m, x)


def test_debug_marker_probe(rng):
    """("debug", name) glue emits a stable probe readable via extra_outputs
    (reference DebugMarkerFunction, export/debug.py)."""
    m = SmallNet()
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    m(x)
    eval_mode(m)

    layers = m.export_layers()
    items = layers[:2] + [("debug", "after_l1")] + layers[2:]
    m.export_layers = lambda: items
    blob = export_onnx_qcdq(m, x)
    y, probe = run_onnx(blob, {"input": np.asarray(x)},
                        extra_outputs=["after_l1"])
    assert probe.shape == (2, 32)  # l1 output


def test_qop_rejects_over_8bit(rng):
    """Regression: >8-bit quantizers must fail QOp export instead of
    silently saturating into int8 storage."""
    from brevitas_tpu.export import export_onnx_qop

    class Net(nnx.Module):
        def __init__(self):
            act16 = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1,
                                                      bit_width=16.0)
            act8 = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.l = qnn.QuantLinear(8, 4, use_bias=False,
                                     input_quant=act16, output_quant=act8,
                                     rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.l]

        def __call__(self, x):
            return self.l(x)

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="cannot be represented"):
        export_onnx_qop(m, x)


def test_resnet_residual_export_matches_model(rng):
    """Residual (save/load/add glue) export: trained quant ResNet →
    QCDQ + QONNX, interpreter oracle reproduces the model."""
    import optax

    from brevitas_tpu.models import quant_resnet18

    m = quant_resnet18(bit_width=8, num_classes=10, cifar_stem=True,
                       width_mult=0.125, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    t = jax.nn.one_hot(jnp.arange(2) % 10, 10)
    opt = nnx.Optimizer(m, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(m, o, x, t):
        loss, grads = nnx.value_and_grad(
            lambda mm: jnp.mean((mm(x) - t) ** 2))(m)
        o.update(m, grads)
        return loss

    for _ in range(20):
        step(m, opt, x, t)
    eval_mode(m)
    y = np.asarray(m(x))
    assert np.std(y) > 0
    xin = {"input": np.transpose(np.asarray(x), (0, 3, 1, 2))}
    for exporter in (export_onnx_qcdq, export_qonnx):
        blob = exporter(m, x)
        out = run_onnx(blob, xin)[0]
        np.testing.assert_allclose(out, y, atol=5e-4)


@pytest.mark.parametrize("style", ["qcdq", "qonnx"])
def test_export_avgpool_trunc_shifted_uint_exact(style, rng):
    """Trunc-avgpool behind an ASYMMETRIC (shifted-uint8) act grid: the
    zero-point rides through the integer-domain floor on both dialects
    (the zp!=0 branches of the QCDQ Mul/Add/Floor/Sub chain and the QONNX
    Trunc op)."""
    from brevitas_tpu.export import export_onnx_qcdq, export_qonnx

    class Net(nnx.Module):
        def __init__(self):
            act = presets.ShiftedUint8ActPerTensorFloat.let(
                collect_stats_steps=1)
            self.inp = qnn.QuantIdentity(act, return_quant_tensor=True)
            self.pool = qnn.QuantAvgPool2d(3, return_quant_tensor=False)

        def export_layers(self):
            return [self.inp, self.pool]

        def __call__(self, x):
            return self.pool(self.inp(x))

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    qt = m.inp.act_quant(x)
    assert float(np.asarray(qt.zero_point)) != 0.0  # the case under test
    y_model = np.asarray(m(x))
    blob = (export_onnx_qcdq(m, x) if style == "qcdq"
            else export_qonnx(m, x))
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    scale = float(np.asarray(qt.scale))
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               atol=scale * 1e-3)


def test_export_avgpool_mirrors_runtime_trunc_decision(rng):
    """The exporter truncates exactly when the MODEL truncated at runtime:
    a pool fed a plain array (metadata unwrapped upstream, e.g. residual
    glue returning .value) computes a plain mean and must export as a bare
    AveragePool — no Floor chain, no Trunc op (round-5 regression: the
    walk-based heuristic emitted a trunc the model never ran)."""
    from brevitas_tpu.export import export_onnx_qcdq

    class Net(nnx.Module):
        def __init__(self):
            act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
            self.inp = qnn.QuantIdentity(act, return_quant_tensor=True)
            self.pool = qnn.QuantAvgPool2d(3, return_quant_tensor=False)

        def export_layers(self):
            return [self.inp, self.pool]

        def __call__(self, x):
            q = self.inp(x)
            return self.pool(q.value)  # metadata dropped -> plain mean

    m = Net()
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    m(x)
    eval_mode(m)
    assert m.pool.last_call_truncated is False
    y_model = np.asarray(m(x))
    blob = export_onnx_qcdq(m, x)
    g = parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert "AveragePool" in ops and "Floor" not in ops
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               atol=1e-5)
