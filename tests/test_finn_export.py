"""FINN-dialect export tests (reference tests/brevitas_finn/ tier:
bnn_pynq models through the FINN ONNX flow).

The interpreter (export/interp.py) executes MultiThreshold / QuantAvgPool2d
natively, so the whole dialect is oracle-checked end-to-end against the
fake-quant eval forward.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.export import export_finn_onnx, run_onnx
from brevitas_tpu.export import onnx_proto as P
from brevitas_tpu.export.finn import (
    finn_datatype,
    hardtanh_bias,
    hardtanh_thresholds,
    read_finn_annotations,
    relu_thresholds,
)
from brevitas_tpu.models.common import common_act_quant
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


def test_finn_datatype_strings():
    assert finn_datatype(1, True) == "BIPOLAR"
    assert finn_datatype(1, False) == "BINARY"
    assert finn_datatype(2, True) == "INT2"
    assert finn_datatype(4, False) == "UINT4"
    assert finn_datatype(32, True) == "INT32"
    with pytest.raises(ValueError):
        finn_datatype(33, True)


@pytest.mark.parametrize("bw", [2, 3, 4, 8])
def test_relu_threshold_counting_matches_fake_quant(bw, rng):
    """Σ_t [x >= T_t] reproduces clip(round(x/s), 0, 2^bw-1) off midpoints."""
    s = 0.37
    thr = relu_thresholds(np.asarray(s), bw).reshape(-1)
    x = rng.uniform(-2.0, 2.0 ** bw * s * 1.5, 4096).astype(np.float32)
    # keep away from exact grid midpoints (round-half-even vs half-up)
    x = x[np.abs((x / s + 0.5) % 1.0 - 0.0) > 1e-3]
    count = (x[:, None] >= thr[None, :]).sum(1)
    fq = np.clip(np.round(x / s), 0, 2 ** bw - 1)
    np.testing.assert_array_equal(count, fq)


@pytest.mark.parametrize("bw,narrow", [(2, True), (2, False), (4, True),
                                       (4, False), (8, True)])
def test_hardtanh_threshold_counting_matches_fake_quant(bw, narrow, rng):
    s = 0.21
    thr = hardtanh_thresholds(np.asarray(s), bw, narrow).reshape(-1)
    bias = hardtanh_bias(bw, narrow)
    lo = -(2 ** (bw - 1)) + (1 if narrow else 0)
    hi = 2 ** (bw - 1) - 1
    x = rng.uniform(lo * s * 1.5, hi * s * 1.5, 4096).astype(np.float32)
    x = x[np.abs((x / s + 0.5) % 1.0 - 0.0) > 1e-3]
    got = (x[:, None] >= thr[None, :]).sum(1) + bias
    fq = np.clip(np.round(x / s), lo, hi)
    np.testing.assert_array_equal(got, fq)


class _ActNet(nnx.Module):
    def __init__(self, act_layer):
        self.act = act_layer

    def export_layers(self):
        return [self.act]

    def __call__(self, x):
        return self.act(x)


def _finn_roundtrip(model, x, atol=1e-5):
    y_model = np.asarray(model(jnp.asarray(x)))
    blob = export_finn_onnx(model, x)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    np.testing.assert_allclose(y_onnx, y_model, atol=atol, rtol=1e-4)
    return blob


def test_finn_relu_multithreshold_roundtrip(rng):
    m = _ActNet(qnn.QuantReLU(
        presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1,
                                           bit_width=4.0)))
    x = rng.standard_normal((8, 16)).astype(np.float32)
    m(jnp.asarray(x))  # calibrate
    eval_mode(m)
    blob = _finn_roundtrip(m, x, atol=1e-5)
    g = P.parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert "MultiThreshold" in ops
    mt = next(n for n in g.nodes if n.op_type == "MultiThreshold")
    assert mt.domain == "finn.custom_op.general"
    assert "out_dtype" in mt.attrs and mt.attrs["out_dtype"] == "UINT4"
    # quant attr moved into annotations by the model transform
    assert "activation_qnt" not in mt.attrs
    anns = read_finn_annotations(blob)
    assert anns.get(mt.outputs[0]) == "UINT4"


@pytest.mark.parametrize("bits", [1, 2])
def test_finn_identity_bipolar_and_int_roundtrip(bits, rng):
    m = _ActNet(qnn.QuantIdentity(common_act_quant(bits)))
    x = (rng.standard_normal((8, 16)) * 0.7).astype(np.float32)
    eval_mode(m)
    blob = _finn_roundtrip(m, x)
    g = P.parse_model(blob)
    mt = next(n for n in g.nodes if n.op_type == "MultiThreshold")
    if bits == 1:
        assert mt.attrs["out_dtype"] == "BIPOLAR"
        assert mt.attrs["out_scale"] == 2.0 and mt.attrs["out_bias"] == -1.0
    else:
        assert mt.attrs["out_dtype"] == "INT2"


def test_finn_tfc_1w1a_roundtrip(rng):
    """The flagship FINN target: binary TFC exports to BIPOLAR
    MultiThresholds + BIPOLAR MatMul weights and executes bit-exact."""
    from brevitas_tpu.models import tfc

    model = tfc(1, 1, 1, dropout=0.0, rngs=nnx.Rngs(0))
    x = rng.random((4, 28, 28, 1)).astype(np.float32)
    model(jnp.asarray(x))
    eval_mode(model)
    y_model = np.asarray(model(jnp.asarray(x)))
    blob = export_finn_onnx(model, jnp.zeros((1, 784)))
    (y_onnx,) = run_onnx(blob, {"input": x.reshape(4, -1)})
    np.testing.assert_allclose(y_onnx, y_model, atol=1e-4, rtol=1e-4)
    g = P.parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert ops.count("MultiThreshold") == 4  # input + 3 hidden acts
    assert ops.count("MatMul") == 4
    # MatMul weights are BIPOLAR-annotated integer (±1) initializers
    anns = read_finn_annotations(blob)
    mm = [n for n in g.nodes if n.op_type == "MatMul"]
    for n in mm:
        assert n.domain == ""  # restore_domain returned them to default
        w = g.initializers[n.inputs[1]]
        assert set(np.unique(w)) <= {-1.0, 1.0}
        assert anns[n.inputs[1]] == "BIPOLAR"


def test_finn_tfc_2w2a_roundtrip(rng):
    from brevitas_tpu.models import tfc

    model = tfc(2, 2, 2, dropout=0.0, rngs=nnx.Rngs(0))
    x = rng.random((4, 28, 28, 1)).astype(np.float32)
    model(jnp.asarray(x))
    eval_mode(model)
    y_model = np.asarray(model(jnp.asarray(x)))
    blob = export_finn_onnx(model, jnp.zeros((1, 784)))
    (y_onnx,) = run_onnx(blob, {"input": x.reshape(4, -1)})
    np.testing.assert_allclose(y_onnx, y_model, atol=1e-4, rtol=1e-4)
    anns = read_finn_annotations(blob)
    assert "INT2" in anns.values()  # weight datatype annotations present


def test_finn_cnv_1w1a_roundtrip(rng):
    """CNV: BIPOLAR convs + max-pools through the FINN dialect."""
    from brevitas_tpu.models import cnv

    model = cnv(1, 1, 8, rngs=nnx.Rngs(0))
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    model(jnp.asarray(x))
    eval_mode(model)
    y_model = np.asarray(model(jnp.asarray(x)))
    blob = export_finn_onnx(model, x)
    (y_onnx,) = run_onnx(blob, {"input": x.transpose(0, 3, 1, 2)})
    np.testing.assert_allclose(y_onnx, y_model, atol=1e-3, rtol=1e-3)
    g = P.parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert "Conv" in ops and "MultiThreshold" in ops and "MaxPool" in ops
    conv = next(n for n in g.nodes if n.op_type == "Conv")
    w = g.initializers[conv.inputs[1]]
    assert set(np.unique(w)) <= {-1.0, 1.0}
    assert read_finn_annotations(blob)[conv.inputs[1]] == "BIPOLAR"


def test_finn_quant_avgpool_roundtrip(rng):
    """Truncated avg-pool exports as the QuantAvgPool2d accumulator node and
    matches the layer's integer truncation law."""
    class PoolNet(nnx.Module):
        def __init__(self):
            self.act = qnn.QuantIdentity(
                presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
                return_quant_tensor=True)
            self.pool = qnn.QuantAvgPool2d(2)

        def export_layers(self):
            return [self.act, self.pool]

        def __call__(self, x):
            return self.pool(self.act(x))

    m = PoolNet()
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    m(jnp.asarray(x))
    eval_mode(m)
    y_model = np.asarray(m(jnp.asarray(x)))  # NHWC
    blob = export_finn_onnx(m, x)
    (y_onnx,) = run_onnx(blob, {"input": x.transpose(0, 3, 1, 2)})
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               atol=1e-4, rtol=1e-4)
    g = P.parse_model(blob)
    assert any(n.op_type == "QuantAvgPool2d" for n in g.nodes)


def test_finn_rejects_io_quant_on_wbiol(rng):
    """FINN WBIOL contract: activations quantize in standalone layers."""
    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)

    class Net(nnx.Module):
        def __init__(self):
            self.l1 = qnn.QuantLinear(
                8, 4, use_bias=False, input_quant=act,
                weight_quant=presets.Int8WeightPerTensorFloat,
                rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.l1]

        def __call__(self, x):
            return self.l1(x)

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    m(x)
    eval_mode(m)
    with pytest.raises(ValueError, match="standalone activation"):
        export_finn_onnx(m, x)


def test_finn_per_channel_relu_thresholds(rng):
    """Per-channel activation scales produce per-channel threshold rows and
    a channel-shaped Mul; oracle-checked through a conv."""
    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.conv = qnn.QuantConv2d(
                3, 8, 3, padding=[(1, 1), (1, 1)], use_bias=False,
                weight_quant=presets.Int8WeightPerChannelFloat.let(
                    bit_width=4.0), rngs=r)
            self.act = qnn.QuantReLU(
                presets.Uint8ActPerTensorFloat.let(
                    collect_stats_steps=1, bit_width=4.0,
                    scaling_per_output_channel=True),
                num_channels=8)

        def export_layers(self):
            return [self.conv, self.act]

        def __call__(self, x):
            return self.act(self.conv(x))

    m = Net()
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    m(jnp.asarray(x))
    eval_mode(m)
    y_model = np.asarray(m(jnp.asarray(x)))
    blob = export_finn_onnx(m, x)
    (y_onnx,) = run_onnx(blob, {"input": x.transpose(0, 3, 1, 2)})
    np.testing.assert_allclose(y_onnx, y_model.transpose(0, 3, 1, 2),
                               atol=1e-4, rtol=1e-4)
    g = P.parse_model(blob)
    mt = next(n for n in g.nodes if n.op_type == "MultiThreshold")
    thr = g.initializers[mt.inputs[1]]
    assert thr.shape == (8, 15)  # 8 channels x (2^4 - 1) thresholds
    assert len({tuple(row) for row in thr}) > 1  # truly per-channel


# -- example-tier FINN exports (reference tests/brevitas_finn/brevitas_examples)


def _finn_example_roundtrip(model, x, feed, want, atol_frac=1e-4):
    blob = export_finn_onnx(model, x)
    (got,) = run_onnx(blob, {"input": feed})
    span = float(np.abs(want).max()) + 1e-9
    np.testing.assert_allclose(got, want, atol=atol_frac * span)
    return blob


def test_finn_quartznet_roundtrip(rng):
    """QuartzNet through the FINN dialect (reference
    tests/brevitas_finn/brevitas_examples/test_quartznet_finn_export.py:1):
    1-d separable convs (depthwise group Conv + pointwise), HardTanh
    norm-scale MultiThresholds, residual adds, CTC decoder. Reduced to the
    stem + one separable/residual group + the two outer blocks so the fast
    tier exercises every handler; the full 15x5 export runs slow-tier."""
    from brevitas_tpu.models.quartznet import QUARTZNET_15x5, QuartzNet

    topo = QUARTZNET_15x5[:2] + QUARTZNET_15x5[-2:]
    m = QuartzNet(num_features=64, topology=topo, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.random((2, 32, 64), dtype=np.float32))
    m(x)
    eval_mode(m)
    y = np.asarray(m(x))
    assert np.abs(y).max() > 0
    blob = _finn_example_roundtrip(m, x, np.asarray(x).transpose(0, 2, 1),
                           y.transpose(0, 2, 1))
    g = P.parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    assert "MultiThreshold" in ops
    # depthwise 1-d convs survive with their group attribute + INT8
    # per-channel integer weights
    dw = [n for n in g.nodes if n.op_type == "Conv"
          and dict(n.attrs).get("group", 1) > 1]
    assert dw, "separable blocks must export grouped (depthwise) Convs"
    anns = read_finn_annotations(blob)
    w = g.initializers[dw[0].inputs[1]]
    assert w.shape[1] == 1  # OIHW depthwise: one input channel per group
    assert np.allclose(w, np.round(w))
    assert anns[dw[0].inputs[1]].startswith("INT")


@pytest.mark.slow
def test_finn_quartznet_15x5_full_roundtrip(rng):
    """Full QuartzNet-15x5 through FINN export + interpreter execution."""
    from brevitas_tpu.models import quartznet_15x5

    m = quartznet_15x5(num_features=64, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.random((2, 32, 64), dtype=np.float32))
    m(x)
    eval_mode(m)
    y = np.asarray(m(x))
    _finn_example_roundtrip(m, x, np.asarray(x).transpose(0, 2, 1),
                    y.transpose(0, 2, 1))


def test_finn_mobilenet_roundtrip(rng):
    """MobileNetV1 through the FINN dialect (reference
    tests/brevitas_finn/brevitas_examples/test_mobilenet_finn_export.py:1):
    depthwise 3x3 + pointwise 1x1 convs, per-channel ReLU MultiThresholds,
    the 8-bit trunc-avgpool QuantAvgPool2d node, and the quantized head.
    BN running stats need a few calibration batches before eval-mode output
    is non-degenerate (momentum 0.9)."""
    from brevitas_tpu.models import quant_mobilenet_v1

    m = quant_mobilenet_v1(bit_width=4, rngs=nnx.Rngs(0))
    step = nnx.jit(lambda mm, xx: mm(xx))
    for _ in range(12):
        xb = jnp.asarray(rng.random((2, 224, 224, 3), dtype=np.float32))
        step(m, xb)
    eval_mode(m)
    x = jnp.asarray(rng.random((1, 224, 224, 3), dtype=np.float32))
    y = np.asarray(m(x))
    assert np.abs(y).max() > 0 and y.std() > 0
    blob = _finn_example_roundtrip(m, x, np.asarray(x).transpose(0, 3, 1, 2), y)
    g = P.parse_model(blob)
    ops = [n.op_type for n in g.nodes]
    # the trunc avg-pool lands as the FINN QuantAvgPool2d accumulator node
    pool = [n for n in g.nodes if n.op_type == "QuantAvgPool2d"]
    assert pool and pool[0].domain == "finn.custom_op.general"
    attrs = dict(pool[0].attrs)
    assert attrs["kernel"] == 7 and attrs["obits"] == 4
    # depthwise convs keep group attr; UINT4 activation annotations exist
    assert any(n.op_type == "Conv" and dict(n.attrs).get("group", 1) > 1
               for n in g.nodes)
    anns = read_finn_annotations(blob)
    assert "UINT4" in anns.values()
