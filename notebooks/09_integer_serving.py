"""Tutorial 9 — integer-domain serving on TPU.

The reference hands integer execution to ONNX backends (FINN, onnxruntime);
here serving is in-framework: trained quant layers convert to serving twins
that run true int8/int4/fp8 compute. This tutorial walks the whole menu:

1. int8 GEMM serving (`Int8InferenceLinear`) — int8 MXU dot, dequant epilogue
2. quantized attention with an int8 KV cache, then a 4-bit KV cache packed
   two positions per byte (2x less cache HBM, 1.51x faster decode on v5e)
3. w4a16 weight-only serving (`WeightOnlyInt4InferenceLinear`)
4. dynamic per-token int8 (`DynamicInt8InferenceLinear`) — nothing to
   calibrate, the LLM serving pattern

Run: python notebooks/09_integer_serving.py
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

# ---------------------------------------------------------------------------
# 1. int8 GEMM serving
# ---------------------------------------------------------------------------
# Train (or calibrate) a quant layer, then convert: the twin stores int8
# weights and computes int8 x int8 -> int32 on the MXU with scale/bias fused
# in the epilogue.

act8 = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
lin = qnn.QuantLinear(64, 32, weight_quant=presets.Int8WeightPerChannelFloat,
                      input_quant=act8.let(), rngs=nnx.Rngs(0))
x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
with G.calibration_mode(lin):
    lin(x)
eval_mode(lin)
y_fake = lin(x)

twin = G.Int8InferenceLinear(lin)
y_int = twin(x)
print("1. int8 GEMM twin: max |fake-quant - int8 serving| =",
      float(jnp.max(jnp.abs(y_fake - y_int))))

# ---------------------------------------------------------------------------
# 2. quantized attention: int8 KV cache, then a 4-bit packed cache
# ---------------------------------------------------------------------------
# K/V quantizers at 4 bits make every cached code fit a nibble, so the
# serving twin packs TWO positions per byte (split halves: position r shares
# a byte with r + L/2). Decode reads half the int8 cache traffic.

E, H, T = 64, 2, 12
kv4 = presets.Int8ActPerTensorFloat.let(bit_width=4, collect_stats_steps=1)
mha = qnn.QuantMultiheadAttention(
    E, H, weight_quant=presets.Int8WeightPerChannelFloat,
    in_proj_input_quant=act8.let(), q_quant=act8.let(),
    k_quant=kv4.let(), v_quant=kv4.let(),
    attn_probs_quant=presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
    out_proj_input_quant=act8.let(), rngs=nnx.Rngs(1))
seq = jnp.asarray(rng.standard_normal((2, T, E)).astype(np.float32))
with G.calibration_mode(mha):
    mha(seq, causal=True)
eval_mode(mha)

attn_twin = G.Int8InferenceAttention(mha)
print("2. attention twin packs int4 KV cache:", attn_twin.kv_int4)

kc_f, vc_f = mha.init_decode_cache(2, T)          # fake-quant float cache
kc_i, vc_i = attn_twin.init_decode_cache(2, T)    # packed nibble cache
print("   float cache:", kc_f.shape, kc_f.dtype,
      "-> packed cache:", kc_i.shape, kc_i.dtype,
      f"({kc_f.size * 4 // max(kc_i.size, 1)}x smaller)")
err = 0.0
for t in range(T):
    xt = seq[:, t:t + 1]
    yf, kc_f, vc_f = mha.decode_step(xt, kc_f, vc_f, t)
    yi, kc_i, vc_i = attn_twin.decode_step(xt, kc_i, vc_i, t)
    err = max(err, float(jnp.max(jnp.abs(yf - yi))))
print("   decode exactness vs fake-quant model: max err =", err)

# ---------------------------------------------------------------------------
# 3. w4a16 weight-only serving
# ---------------------------------------------------------------------------
# No input quantizer: activations stay high-precision, weights cross HBM as
# packed int4 (4x less weight traffic than bf16). The packed GEMM unpacks at
# the VMEM boundary (1.5-1.6x over the bf16 dot at serving batch sizes).

w4 = qnn.QuantLinear(
    512, 512, weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=4),
    input_quant=None, rngs=nnx.Rngs(2))
xw = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
y_fake = w4(xw)
wo_twin = G.WeightOnlyInt4InferenceLinear(w4)
y_wo = wo_twin(xw)
print("3. w4a16 twin: packed weight bytes =", wo_twin.w_packed.size,
      "(vs", 512 * 512, "int8); max err =",
      float(jnp.max(jnp.abs(y_fake - y_wo))))

# ---------------------------------------------------------------------------
# 4. dynamic per-token int8
# ---------------------------------------------------------------------------
# Per-request row scales computed on the fly — no calibration state at all.

dyn = qnn.QuantLinear(
    64, 32, weight_quant=presets.Int8WeightPerChannelFloat,
    input_quant=presets.Int8DynamicActPerTokenFloat, rngs=nnx.Rngs(3))
eval_mode(dyn)
y_fake = dyn(x)
dyn_twin = G.DynamicInt8InferenceLinear(dyn)
y_dyn = dyn_twin(x)
print("4. dynamic per-token twin: max err =",
      float(jnp.max(jnp.abs(y_fake - y_dyn))))

# ---------------------------------------------------------------------------
# 5. whole-model conversion
# ---------------------------------------------------------------------------
# convert_integer_inference walks any model and swaps every eligible layer;
# ineligible layers (no input grid, transposed convs) stay fake-quant.

from brevitas_tpu.models import vit_tiny

vit = vit_tiny(rngs=nnx.Rngs(4), dim=32, depth=1, num_heads=2)
imgs = jnp.asarray(rng.random((4, 28, 28, 1), dtype=np.float32))
with G.calibration_mode(vit):
    vit(imgs)
eval_mode(vit)
y_fake = vit(imgs)
G.convert_integer_inference(vit)
y_int = vit(imgs)
agree = float(np.mean(np.argmax(np.asarray(y_fake), -1)
                      == np.argmax(np.asarray(y_int), -1)))
print("5. QuantViT integer serving: top-1 agreement with fake-quant =", agree)
print("Tutorial 9 OK")
