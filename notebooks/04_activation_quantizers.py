"""Tutorial 4 — activation quantizers overview.

Mirrors the reference's 02_quant_activation_overview.ipynb: signed vs
unsigned activation quant, stats-driven vs learned scaling, the two-phase
collect-then-learn scheme, per-channel activation scaling, and quantizer
sharing between layers.

Run: python notebooks/04_activation_quantizers.py
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
from brevitas_tpu.quant import presets
from brevitas_tpu.quant.config import ScalingImplType
from brevitas_tpu.utils import eval_mode

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))

# -- 1. signed vs unsigned --------------------------------------------------
# QuantReLU defaults to an unsigned quantizer (output is non-negative);
# QuantTanh to a signed one. Both emit QuantTensors when asked.
relu = qnn.QuantReLU(presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
                     return_quant_tensor=True)
tanh = qnn.QuantTanh(presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
                     return_quant_tensor=True)
relu(x); tanh(x)
eval_mode(relu); eval_mode(tanh)
q_relu, q_tanh = relu(x), tanh(x)
print("relu signed:", bool(q_relu.signed), " tanh signed:", bool(q_tanh.signed))
assert not bool(q_relu.signed) and bool(q_tanh.signed)
assert float(q_relu.value.min()) >= 0.0

# -- 2. the two-phase scale (reference ParameterFromRuntimeStatsScaling) -----
# Int8ActPerTensorFloat collects an EMA of abs-max for collect_stats_steps
# training forwards, then freezes it into a LEARNED parameter that trains
# with the model (reference core/scaling/standalone.py:155-298).
act = qnn.QuantIdentity(
    presets.Int8ActPerTensorFloat.let(collect_stats_steps=3),
    return_quant_tensor=True)
for i in range(3):
    act(x * (i + 1))          # stats phase: scale follows the data
eval_mode(act)
scale_after = float(act(x).scale)
print("collected scale:", scale_after)
assert scale_after > 0

# -- 3. other scaling flavours ----------------------------------------------
# Pure runtime stats (EMA, never learned):
ema = presets.Int8ActPerTensorFloat.let(scaling_impl=ScalingImplType.STATS)
# Fixed constant scale:
const = presets.Int8ActPerTensorFloat.let(
    scaling_impl=ScalingImplType.CONST, scaling_const=6.0)
# Learned from a fixed init (no stats phase):
learned = presets.Int8ActPerTensorFloat.let(
    scaling_impl=ScalingImplType.PARAMETER, scaling_const=3.0)
for cfg, name in [(ema, "runtime-stats"), (const, "const"),
                  (learned, "parameter")]:
    m = qnn.QuantIdentity(cfg, return_quant_tensor=True)
    m(x)
    eval_mode(m)
    print(f"{name:14s} scale = {float(m(x).scale):.4f}")

# const scale is exactly threshold / 2^(bw-1) for signed non-narrow int8
# (reference core/scaling/int_scaling.py IntScaling)
m = qnn.QuantIdentity(const, return_quant_tensor=True)
eval_mode(m)
np.testing.assert_allclose(float(m(x).scale), 6.0 / 128, rtol=1e-6)

# -- 4. per-channel activation scaling --------------------------------------
xc = x.reshape(8, 8, 32) * jnp.linspace(0.1, 10.0, 32)
pc = qnn.QuantIdentity(
    presets.Int8ActPerTensorFloat.let(scaling_per_output_channel=True,
                                      collect_stats_steps=1),
    return_quant_tensor=True, num_channels=32)
pc(xc)
eval_mode(pc)
q = pc(xc)
print("per-channel act scale shape:", q.scale.shape)
assert q.scale.shape[-1] == 32

# -- 5. sharing one quantizer between layers --------------------------------
# Residual branches must agree on scale before an add; share the module
# (the flexml residual handler does exactly this, reference
# graph/target/flexml.py:296).
shared = qnn.QuantIdentity(
    presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
    return_quant_tensor=True)
a, b = x, x * 0.5
shared(a)
eval_mode(shared)
qa, qb = shared(a), shared(b)
summed = qa + qb              # scales match -> valid QuantTensor add
assert summed.is_valid()
print("OK")
