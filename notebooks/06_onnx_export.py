"""Tutorial 6 — ONNX export flows.

Mirrors the reference's ONNX_export_tutorial.ipynb: the three export dialects
(standard QCDQ, QONNX for the FINN toolchain, QOperator) plus the in-repo
interpreter used as a numerical oracle, and native integer serving as the
TPU-side alternative to handing off to an ONNX backend.

Run: python notebooks/06_onnx_export.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.export import (
    export_onnx_qcdq,
    export_onnx_qop,
    export_qonnx,
)
from brevitas_tpu.export.interp import parse_model, run_onnx
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode

rng = np.random.default_rng(0)


class Net(nnx.Module):
    def __init__(self, rngs):
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
        self.inp = qnn.QuantIdentity(act, return_quant_tensor=True)
        self.l1 = qnn.QuantLinear(16, 32, return_quant_tensor=True, rngs=rngs)
        self.relu = qnn.QuantReLU(
            presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
            return_quant_tensor=True)
        self.l2 = qnn.QuantLinear(32, 10, rngs=rngs)

    # export walks this layer sequence (non-sequential topologies pass
    # glue specs; see docs/export.md)
    def export_layers(self):
        return [self.inp, self.l1, self.relu, self.l2]

    def __call__(self, x):
        return self.l2(self.relu(self.l1(self.inp(x))))


m = Net(nnx.Rngs(0))
x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
m(x)                    # one calibration forward
eval_mode(m)
y_ref = np.asarray(m(x))

# -- 1. standard ONNX QCDQ ---------------------------------------------------
# QuantizeLinear -> (Clip) -> DequantizeLinear around every tensor; runs on
# any ONNX backend.
blob = export_onnx_qcdq(m, x, path="/tmp/tutorial_qcdq.onnx")
ops = [n.op_type for n in parse_model(blob).nodes]
print("QCDQ ops:", sorted(set(ops)))
(y,) = run_onnx(blob, {"input": np.asarray(x)})
np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

# -- 2. QONNX (FINN dialect) --------------------------------------------------
# Custom Quant nodes in the onnx.brevitas domain carrying scale/zp/bit-width
# as inputs — what the FINN FPGA flow consumes.
blob_q = export_qonnx(m, x)
doms = {n.domain for n in parse_model(blob_q).nodes if n.op_type == "Quant"}
print("QONNX Quant domain:", doms)
assert doms == {"onnx.brevitas"}
(yq,) = run_onnx(blob_q, {"input": np.asarray(x)})
np.testing.assert_allclose(yq, y_ref, rtol=1e-4, atol=1e-4)

# -- 3. QOperator -------------------------------------------------------------
# Fused integer ops (QLinearMatMul / QLinearConv) — the ONNX Runtime
# quantized-kernel dialect. QOp layers must own BOTH input and output
# quantizers (the reference's StdQOpONNXQuantWBIOLHandler.validate rule),
# because the fused op consumes/produces int8 directly.
class QOpNet(nnx.Module):
    def __init__(self, rngs):
        act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
        self.l1 = qnn.QuantLinear(16, 10, use_bias=True,
                                  input_quant=act, output_quant=act.let(),
                                  rngs=rngs)

    def export_layers(self):
        return [self.l1]

    def __call__(self, x):
        return self.l1(x)


mq = QOpNet(nnx.Rngs(0))
mq(x)
eval_mode(mq)
y_qop_ref = np.asarray(mq(x))
blob_op = export_onnx_qop(mq, x)
ops = [n.op_type for n in parse_model(blob_op).nodes]
print("QOp ops:", sorted(set(ops)))
assert any(o.startswith("QLinear") for o in ops)
(yop,) = run_onnx(blob_op, {"input": np.asarray(x)})
# QOp output is requantized to int8 -> tolerance is one output quantum
out_scale = float(np.asarray(mq.l1.output_quant(jnp.asarray(y_qop_ref)).scale))
np.testing.assert_allclose(yop, y_qop_ref, atol=out_scale * 1.01)

# -- 4. native TPU integer serving (no ONNX handoff) --------------------------
from brevitas_tpu import graph as G

G.convert_integer_inference(m)
y_int = np.asarray(m(x))
print("native int8 serving max diff vs fake-quant:",
      float(np.max(np.abs(y_int - y_ref))))
np.testing.assert_allclose(y_int, y_ref, rtol=1e-4, atol=1e-4)
print("OK")
