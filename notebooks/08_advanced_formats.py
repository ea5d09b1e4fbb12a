"""Tutorial 8 — advanced numeric formats and PTQ optimizers.

Beyond the reference snapshot's integer-only surface: FP8/minifloat QAT,
groupwise/OCP-MX weights, A2Q accumulator guarantees, dynamic per-token
activation quant, and the GPTQ/AdaRound weight optimizers — with the serving
twin for each.

Run: python notebooks/08_advanced_formats.py
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

import brevitas_tpu.graph as G
import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode

rng = np.random.default_rng(0)

# -- 1. FP8: bit-exact against the hardware float8 grid ----------------------
lin8 = qnn.QuantLinear(
    32, 16, weight_quant=presets.Fp8e4m3WeightPerChannelFloat,
    input_quant=presets.Fp8e4m3ActPerTensorFloat.let(collect_stats_steps=1),
    rngs=nnx.Rngs(0))
x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
lin8(x)
eval_mode(lin8)
qw = lin8.quant_weight()
grid = qw.value / qw.scale  # scale round-trip costs ~1 ulp, hence allclose
np.testing.assert_allclose(
    np.asarray(grid.astype(jnp.float8_e4m3fn).astype(jnp.float32)),
    np.asarray(grid), rtol=1e-6, atol=1e-6)
print("fp8 weight grid == float8_e4m3fn cast: True")

class W(nnx.Module):
    def __init__(self, l):
        self.l = l

    def __call__(self, x):
        return self.l(x)

m = W(lin8)
y_fake = m(x)
G.convert_integer_inference(m)
print("fp8 serving twin:", type(m.l).__name__, "weights:", m.l.w8.dtype)
assert float(jnp.max(jnp.abs(m(x) - y_fake))) < 1e-3

# -- 2. OCP MX: groupwise power-of-two block scales ---------------------------
mx = qnn.QuantLinear(128, 16, weight_quant=presets.MXInt4Weight,
                     rngs=nnx.Rngs(0))
qt = mx.quant_weight()
print("MXINT4: scale shape", qt.scale.shape, "(full grid),",
      "blocks of 32 share one po2 scale")
assert qt.is_valid()

# -- 3. A2Q: provable accumulator bound ---------------------------------------
a2q = qnn.QuantLinear(
    256, 16,
    weight_quant=presets.Int8AccumulatorAwareWeightPerChannelFloat.let(
        accumulator_bit_width=16),
    input_quant=presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
    rngs=nnx.Rngs(0))
a2q(jnp.abs(x) @ jnp.ones((32, 256)) * 0.1)
eval_mode(a2q)
qw = a2q.quant_weight()
worst = float(jnp.max(jnp.sum(jnp.abs(qw.value / qw.scale), axis=0)) * 255)
print(f"A2Q worst-case int accumulator {worst:.0f} <= {2**15 - 1} (int16)")
assert worst <= 2 ** 15 - 1

# -- 4. dynamic per-token activation quant ------------------------------------
dyn = qnn.QuantLinear(32, 16,
                      weight_quant=presets.Int8WeightPerChannelFloat,
                      input_quant=presets.Int8DynamicActPerTokenFloat,
                      rngs=nnx.Rngs(0))
xt = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
xt = xt.at[0, 2].mul(40.0)  # outlier token gets its own scale
eval_mode(dyn)
md = W(dyn)
y_fake = md(xt)
G.convert_integer_inference(md)
print("dynamic serving twin:", type(md.l).__name__)
assert float(jnp.max(jnp.abs(md(xt) - y_fake))) < 1e-3

# -- 5. GPTQ + AdaRound at 3 bits ---------------------------------------------
class Net(nnx.Module):
    def __init__(self, rngs):
        self.l1 = nnx.Linear(24, 48, rngs=rngs)
        self.l2 = nnx.Linear(48, 8, rngs=rngs)

    def __call__(self, x):
        return self.l2(jax.nn.relu(self.l1(x)))

def ptq(optimizer):
    net = Net(nnx.Rngs(7))
    xb = jnp.asarray(rng.standard_normal((128, 24)).astype(np.float32))
    y_float = net(xb)
    G.quantize(net,
               weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=3),
               act_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    with G.calibration_mode(net):
        net(xb)
    if optimizer == "gptq":
        G.apply_gptq(net, [xb])
    elif optimizer == "adaround":
        G.apply_learned_round(net, [xb], steps=200)
    eval_mode(net)
    return float(jnp.mean((net(xb) - y_float) ** 2))

base, gptq, ada = ptq(None), ptq("gptq"), ptq("adaround")
print(f"3-bit PTQ output MSE: nearest {base:.4f}  gptq {gptq:.4f}  "
      f"adaround {ada:.4f}")
assert gptq < base and ada < base
print("OK")
