"""Tutorial 3 — QuantTensor and QuantConv2d overview.

Mirrors the reference's 01_quant_tensor_quant_conv2d_overview.ipynb: what a
QuantTensor carries, when it is valid, how metadata propagates through
arithmetic, and how QuantConv2d consumes/produces it.

Run: python notebooks/03_quant_tensor_and_conv.py
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
import brevitas_tpu.quant_tensor as qtl
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode

rng = np.random.default_rng(0)
rngs = nnx.Rngs(0)

# -- 1. a QuantTensor from a quant layer ------------------------------------
# return_quant_tensor=True makes the layer emit the full (value, scale,
# zero_point, bit_width, signed) record instead of a bare array.
ident = qnn.QuantIdentity(presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
                          return_quant_tensor=True)
x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
ident(x)            # one stats-collection step
eval_mode(ident)
qt = ident(x)
print("value", qt.value.shape, "scale", float(qt.scale),
      "zp", float(qt.zero_point), "bits", float(qt.bit_width),
      "signed", bool(qt.signed))

# is_valid: value lies exactly on the integer grid implied by the metadata
assert qt.is_valid()
# the underlying integers:
ints = qt.int()
assert float(jnp.max(jnp.abs(ints))) <= 127

# -- 2. metadata propagation through arithmetic -----------------------------
# add: scales must match; output bit-width grows to hold the sum range
s = qt + qt
print("add:  bits", float(qt.bit_width), "->", float(s.bit_width))
assert float(s.bit_width) > float(qt.bit_width)
assert s.is_valid()

# mul: scales multiply, bit-widths add
p = qt * qt
print("mul:  scale", float(qt.scale), "->", float(p.scale),
      " bits ->", float(p.bit_width))

# cat: requires matching scales, keeps them
c = qtl.cat([qt, qt], axis=-1)
assert c.shape[-1] == 2 * qt.shape[-1] and c.is_valid()

# -- 3. QuantConv2d consumes QuantTensors -----------------------------------
# When the input is already a QuantTensor, the conv skips re-quantizing and
# the bias quantizer can use input_scale * weight_scale (the WBIOL law,
# reference nn/quant_layer.py:302-365).
conv = qnn.QuantConv2d(3, 8, (3, 3), padding="SAME",
                       weight_quant=presets.Int8WeightPerChannelFloat,
                       bias_quant=presets.Int32Bias,
                       return_quant_tensor=True, rngs=rngs)
eval_mode(conv)
y = conv(qt)
print("conv out:", y.value.shape, "per-channel scale", y.scale.shape
      if hasattr(y.scale, "shape") else ())

# quant_weight() exposes the quantized weights as a QuantTensor too
qw = conv.quant_weight()
assert qw.is_valid()
print("weight scale shape:", qw.scale.shape)  # (1,1,1,8) per out-channel
print("OK")
