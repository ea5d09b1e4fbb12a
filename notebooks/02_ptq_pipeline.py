"""Tutorial 2 — post-training quantization of a float model.

Run: python notebooks/02_ptq_pipeline.py
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
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


class FloatNet(nnx.Module):
    def __init__(self, rngs):
        self.l1 = nnx.Linear(32, 64, rngs=rngs)
        self.l2 = nnx.Linear(64, 10, rngs=rngs)

    def __call__(self, x):
        return self.l2(jax.nn.relu(self.l1(x)))


model = FloatNet(nnx.Rngs(0))
rng = np.random.default_rng(0)
calib = [jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
         for _ in range(4)]
y_float = model(calib[0])

# equalize → quantize → calibrate → bias-correct
G.equalize(model, [(["l1"], ["l2"])])
G.quantize(model,
           weight_quant=presets.Int8WeightPerChannelFloat,
           act_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=4))
with G.calibration_mode(model):
    for batch in calib:
        model(batch)
with G.bias_correction_mode(model):
    for batch in calib[:2]:
        model(batch)
eval_mode(model)
err = float(jnp.max(jnp.abs(model(calib[0]) - y_float)))
print(f"PTQ max abs error vs float: {err:.4f}")
assert err < 0.2

