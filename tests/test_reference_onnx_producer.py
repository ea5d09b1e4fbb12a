"""Independent ONNX producer check: the REFERENCE's own QCDQ exporter
(handler patching + ``torch.onnx.export``'s C++ protobuf serializer)
produces bytes this repo's wire validator and interpreter consume — the
external-oracle role onnxruntime plays in the reference's tier 2
(`/root/reference/tests/brevitas_ort/common.py:37`), inverted: an
independent PRODUCER for our CONSUMER."""

import numpy as np
import pytest

from parity.refbridge import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not importable")


def _reference_fc(w, a, in_bw, seed=0):
    from parity.refbridge import import_reference_brevitas

    import_reference_brevitas()
    import torch
    from brevitas_examples.bnn_pynq.models.FC import FC

    torch.manual_seed(seed)
    m = FC(num_classes=10, weight_bit_width=w, act_bit_width=a,
           in_bit_width=in_bw, in_channels=1, out_features=[32, 32],
           in_features=(28, 28))
    m.eval()
    return m


@pytest.mark.slow
@pytest.mark.parametrize("w,a", [(2, 2), (4, 4), (8, 8)])
def test_reference_qcdq_bytes_roundtrip(w, a):
    """torch-serialized reference QCDQ bytes pass the wire validator and the
    interpreter reproduces the reference model's outputs exactly."""
    import torch

    from brevitas_tpu.export.interp import run_onnx
    from brevitas_tpu.export.onnx_proto import parse_model
    from brevitas_tpu.export.validate import validate_onnx
    from parity.refbridge import export_reference_qcdq

    m = _reference_fc(w, a, a)
    x = torch.randn(4, 1, 28, 28)
    data = export_reference_qcdq(m, x)
    assert len(data) > 1000
    validate_onnx(data)  # raises on malformed wire format

    g = parse_model(data)
    inits = set(g.initializers)
    produced = {nm for n in g.nodes for nm in n.outputs}
    graph_ins = sorted({nm for n in g.nodes for nm in n.inputs}
                       - inits - produced - {""})
    assert len(graph_ins) == 1, graph_ins
    with torch.no_grad():
        y_ref = m(x).numpy()
    (y,) = run_onnx(data, {graph_ins[0]: x.numpy()})
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def _graph_input(g):
    inits = set(g.initializers)
    produced = {nm for n in g.nodes for nm in n.outputs}
    ins = sorted({nm for n in g.nodes for nm in n.inputs}
                 - inits - produced - {""})
    assert len(ins) == 1, ins
    return ins[0]


@pytest.mark.slow
@pytest.mark.parametrize("w,a", [(2, 2), (4, 4)])
def test_reference_cnv_qcdq_bytes_roundtrip(w, a):
    """Conv coverage for the independent producer check (round-3 verdict
    #7): the reference's own CNV (conv QCDQ chains, maxpools, flatten, FC
    tail) exported by the reference's exporter; this repo's parser +
    interpreter must reproduce the reference model's outputs."""
    import torch

    from brevitas_tpu.export.interp import run_onnx
    from brevitas_tpu.export.onnx_proto import parse_model
    from brevitas_tpu.export.validate import validate_onnx
    from parity.refbridge import export_reference_qcdq, import_reference_brevitas

    import_reference_brevitas()
    from brevitas_examples.bnn_pynq.models.CNV import CNV

    torch.manual_seed(0)
    m = CNV(num_classes=10, weight_bit_width=w, act_bit_width=a,
            in_bit_width=8, in_ch=3)
    m.eval()
    x = torch.rand(2, 3, 32, 32)
    data = export_reference_qcdq(m, x)
    validate_onnx(data)
    g = parse_model(data)
    with torch.no_grad():
        y_ref = m(x).numpy()
    (y,) = run_onnx(data, {_graph_input(g): x.numpy()})
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


@pytest.mark.slow
def test_reference_perchannel_shifted_uint_conv_bytes_roundtrip():
    """Per-channel weight QCDQ + asymmetric (shifted-uint8) activation
    bytes from the reference's exporter — axes and nonzero zero-points on
    the wire — consumed by this repo's validator/interpreter."""
    import torch
    import torch.nn as tnn

    from brevitas_tpu.export.interp import run_onnx
    from brevitas_tpu.export.onnx_proto import parse_model
    from brevitas_tpu.export.validate import validate_onnx
    from parity.refbridge import export_reference_qcdq, import_reference_brevitas

    import_reference_brevitas()
    import brevitas.nn as qnn_ref
    from brevitas.quant.scaled_int import Int8WeightPerChannelFloat
    from brevitas.quant.shifted_scaled_int import ShiftedUint8ActPerTensorFloat

    torch.manual_seed(1)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.inp = qnn_ref.QuantIdentity(
                act_quant=ShiftedUint8ActPerTensorFloat,
                return_quant_tensor=False)
            self.c1 = qnn_ref.QuantConv2d(
                3, 8, 3, padding=1, bias=True,
                weight_quant=Int8WeightPerChannelFloat)
            self.act = qnn_ref.QuantReLU(
                act_quant=ShiftedUint8ActPerTensorFloat)
            self.c2 = qnn_ref.QuantConv2d(
                8, 4, 3, bias=False,
                weight_quant=Int8WeightPerChannelFloat)

        def forward(self, x):
            return self.c2(self.act(self.c1(self.inp(x))))

    m = Net()
    x = torch.randn(2, 3, 8, 8)  # negative inputs -> nonzero input zp
    with torch.no_grad():
        m.train()
        m(x)  # collect runtime act stats (train-mode collection)
        m(x)
    m.eval()
    data = export_reference_qcdq(m, x)
    validate_onnx(data)
    g = parse_model(data)
    # the wire must actually carry per-axis quantization and a nonzero zp
    axis_nodes = [n for n in g.nodes
                  if n.op_type in ("QuantizeLinear", "DequantizeLinear")
                  and "axis" in n.attrs]
    assert axis_nodes, "expected per-channel (axis) QCDQ nodes on the wire"
    # zp tensors ride as initializers OR Constant-node outputs
    const_of = {n.outputs[0]: n.attrs.get("value") for n in g.nodes
                if n.op_type == "Constant" and n.outputs}
    zps = []
    for n in g.nodes:
        if n.op_type == "QuantizeLinear" and len(n.inputs) > 2:
            z = g.initializers.get(n.inputs[2], const_of.get(n.inputs[2]))
            if z is not None:
                zps.append(np.asarray(z))
    assert zps and any(np.any(z != 0) for z in zps), (
        "expected a nonzero (shifted-uint) zero point on the wire")
    with torch.no_grad():
        y_ref = m(x).numpy()
    (y,) = run_onnx(data, {_graph_input(g): x.numpy()})
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


@pytest.mark.slow
def test_reference_bytes_match_own_exporter_numerics():
    """Import the reference model into the brevitas_tpu twin, export OUR
    QCDQ, and check both byte streams (independent producers) interpret to
    matching numerics on the same inputs."""
    import torch

    from brevitas_tpu.export.interp import run_onnx
    from brevitas_tpu.export.onnx_proto import parse_model
    from brevitas_tpu.utils import eval_mode
    from parity.refbridge import export_reference_qcdq

    m_ref = _reference_fc(2, 2, 2)
    x = torch.randn(4, 1, 28, 28)
    ref_bytes = export_reference_qcdq(m_ref, x)

    import jax.numpy as jnp

    from brevitas_tpu.export import export_onnx_qcdq
    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.models.fc import FC as TpuFC
    from flax import nnx

    twin = TpuFC(out_features=(32, 32), weight_bit_width=2, act_bit_width=2,
                 in_bit_width=2, dropout=0.0, rngs=nnx.Rngs(0))
    sd = {k: v.detach().cpu().numpy() for k, v in m_ref.state_dict().items()}
    import_torch_state_dict(twin, sd)
    eval_mode(twin)
    # FC exports take the pre-flattened (N, features) example (the derived
    # walk treats an equal-shape reshape as transparent; a 4-D example
    # would prepend an NHWC flatten the rank-2 feed below doesn't match)
    our_bytes = export_onnx_qcdq(
        twin, jnp.asarray(x.numpy().reshape(4, -1)))

    g = parse_model(ref_bytes)
    inits = set(g.initializers)
    produced = {nm for n in g.nodes for nm in n.outputs}
    (ref_in,) = sorted({nm for n in g.nodes for nm in n.inputs}
                       - inits - produced - {""})
    (y_ref,) = run_onnx(ref_bytes, {ref_in: x.numpy()})
    # our FC graph takes the pre-flattened (N, features) input
    (y_ours,) = run_onnx(our_bytes, {"input": x.numpy().reshape(4, -1)})
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-4)
