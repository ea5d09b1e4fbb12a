"""Tutorial 1 — QAT quickstart (executable walkthrough).

The reference ships notebooks (Brevitas_TVMCon2021.ipynb etc.); these
tutorials are plain scripts so they run headless and stay tested.

Run: python notebooks/01_qat_quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even where a sitecustomize pre-selects a platform
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets

# -- 1. declare a quantized model ------------------------------------------
# Quantizers are frozen configs; .let() derives variants.

w4 = presets.Int8WeightPerChannelFloat.let(bit_width=4)
act8 = presets.Int8ActPerTensorFloat       # two-phase learned scale
uact8 = presets.Uint8ActPerTensorFloat


class QuantMLP(nnx.Module):
    def __init__(self, rngs):
        self.l1 = qnn.QuantLinear(64, 128, weight_quant=w4,
                                  input_quant=act8, rngs=rngs)
        self.relu = qnn.QuantReLU(uact8)
        self.l2 = qnn.QuantLinear(128, 10, weight_quant=w4,
                                  input_quant=act8, rngs=rngs)

    def __call__(self, x):
        return self.l2(self.relu(self.l1(x)))


model = QuantMLP(nnx.Rngs(0))
opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

# -- 2. one jitted train step: STE grads + quantizer state updates ---------


@nnx.jit
def step(model, opt, x, y):
    loss, grads = nnx.value_and_grad(
        lambda m: optax.softmax_cross_entropy_with_integer_labels(
            m(x), y).mean())(model)
    opt.update(model, grads)
    return loss


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
y = jnp.asarray((np.argmax(np.abs(np.asarray(x))[:, :10], axis=1)).astype(np.int32))
losses = [float(step(model, opt, x, y)) for _ in range(50)]
print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")
assert losses[-1] < losses[0]

# -- 3. inspect quantizer state --------------------------------------------
qw = model.l1.quant_weight()
print("weight scale shape:", qw.scale.shape, "bit width:", float(qw.bit_width))
print("act scale:", float(model.l1.input_quant(x).scale))

# -- 4. eval + integer serving ---------------------------------------------
from brevitas_tpu import graph as G
from brevitas_tpu.utils import eval_mode

eval_mode(model)
y_fake = model(x)  # fake-quant eval forward (float ops, quantized values)
G.convert_integer_inference(model)
y_int = model(x)  # true int8 dot products with dequant epilogue
print("serving layer:", type(model.l1).__name__)
print("int8 vs fake-quant max diff:",
      float(jnp.max(jnp.abs(y_int - y_fake))))
