"""Tutorial 7 — quantized recurrent layers (QuantLSTM / QuantRNN).

Mirrors the reference's quantized_recurrent.ipynb: per-gate quantization
knobs, bidirectional stacking, training through the scanned cell, stateful
decoding, and QONNX export of the recurrent stack.

The reference loops over timesteps in Python (nn/quant_rnn.py:193) and needs
a TorchScript "fast cell" to be usable; here the cell is a `lax.scan` body —
one compiled kernel over the whole sequence, nothing to script.

Run: python notebooks/07_quantized_recurrent.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode

rng = np.random.default_rng(0)

# -- 1. a quantized LSTM: every dataflow edge has its own quantizer ----------
lstm = qnn.QuantLSTM(
    input_size=16, hidden_size=32, num_layers=2, bidirectional=True,
    weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=4),
    io_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
    gate_acc_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
    sigmoid_quant=presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
    tanh_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
    cell_state_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
    rngs=nnx.Rngs(0))

x = jnp.asarray(rng.standard_normal((8, 20, 16)).astype(np.float32))  # (B,T,F)
y, (h_n, c_n) = lstm(x)
print("output", y.shape, " h_n", h_n.shape, " c_n", c_n.shape)
assert y.shape == (8, 20, 64)          # bidirectional -> 2*H
assert h_n.shape == (4, 8, 32)         # layers*directions

# -- 2. it trains: STE gradients flow through every quantizer ----------------
opt = nnx.Optimizer(lstm, optax.adam(1e-3), wrt=nnx.Param)
target = jnp.asarray(rng.standard_normal((8, 20, 64)).astype(np.float32))


@nnx.jit
def step(model, opt, x, target):
    def loss_fn(m):
        out, _ = m(x)
        return jnp.mean((out - target) ** 2)
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    opt.update(model, grads)
    return loss


losses = [float(step(lstm, opt, x, target)) for _ in range(20)]
print(f"LSTM loss {losses[0]:.4f} -> {losses[-1]:.4f}")
assert losses[-1] < losses[0]

# -- 3. stateful decoding: feed h/c back step by step -------------------------
eval_mode(lstm)
y_full, _ = lstm(x)
# same result decoding one timestep at a time through carried state is only
# meaningful for unidirectional nets; build one:
uni = qnn.QuantRNN(16, 32, num_layers=1, rngs=nnx.Rngs(1),
                   io_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
uni(x)                                  # collect stats
eval_mode(uni)
y_seq, _ = uni(x)
h = None
outs = []
for t in range(x.shape[1]):
    o, h = uni(x[:, t:t + 1, :], h[0] if isinstance(h, tuple) else h)
    outs.append(o)
y_inc = jnp.concatenate(outs, axis=1)
np.testing.assert_allclose(np.asarray(y_inc), np.asarray(y_seq),
                           rtol=1e-4, atol=1e-5)
print("incremental decode == full-sequence scan")

# -- 4. QONNX export of the recurrent stack ----------------------------------
from brevitas_tpu.export import export_qonnx
from brevitas_tpu.export.interp import parse_model


class LSTMNet(nnx.Module):
    def __init__(self, rngs):
        self.lstm = qnn.QuantLSTM(
            16, 32,
            io_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
            rngs=rngs)

    def export_layers(self):
        return [self.lstm]

    def __call__(self, x):
        y, _ = self.lstm(x)
        return y


m = LSTMNet(nnx.Rngs(0))
m(x)
eval_mode(m)
blob = export_qonnx(m, x)
ops = [n.op_type for n in parse_model(blob).nodes]
assert "QuantLSTMLayer" in ops
print("QONNX recurrent ops:", sorted(set(ops)))
print("OK")
