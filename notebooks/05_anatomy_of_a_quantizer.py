"""Tutorial 5 — anatomy of a quantizer.

Mirrors the reference's 03_anatomy_of_a_quantizer.ipynb. There, a quantizer
is a dependency-injection container (ExtendedInjector) resolved lazily into a
graph of ScriptModules. Here the same capability is a frozen dataclass
(QuantConfig) resolved ONCE into pure functions + nnx state — this walks that
resolution by hand, bottom-up.

Run: python notebooks/05_anatomy_of_a_quantizer.py
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

from brevitas_tpu.core import quant as Q
from brevitas_tpu.core import stats as S
from brevitas_tpu.ops.ste import round_ste
from brevitas_tpu.quant import presets
from brevitas_tpu.quant.config import (
    FloatToIntImpl,
    QuantConfig,
    RestrictType,
    ScalingImplType,
    StatsOp,
)
from brevitas_tpu.quant.quantizers import (
    ParameterQuantizer,
    build_scaling,
    scaling_broadcast_shape,
    stats_view,
)

rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))

# -- 1. the bottom: pure fake-quant math ------------------------------------
# int_quant is scale/shift -> round (STE) -> clamp -> shift/scale back.
scale = jnp.asarray(0.05)
zp = jnp.asarray(0.0)
bw = jnp.asarray(8.0)
wq = Q.int_quant(w, scale, zp, bw, signed=True, narrow_range=True)
# every output is on the integer grid:
ints = wq / scale
np.testing.assert_allclose(ints, jnp.round(ints), atol=1e-4)
# and the STE makes it differentiable: d/dw sum(int_quant(w)) == 1 in-range
g = jax.grad(lambda v: Q.int_quant(v, scale, zp, bw, signed=True,
                                   narrow_range=True).sum())(w)
in_range = jnp.abs(w / scale) < 127
assert float(jnp.abs(g[in_range] - 1.0).max()) < 1e-6

# -- 2. where the scale comes from ------------------------------------------
# A stats op reduces the weight view to a threshold; int_scaling turns the
# threshold into a scale for the integer range.
threshold = S.abs_max(w.reshape(1, -1))[0]        # per-tensor abs-max
denom = Q.int_scaling(bw, signed=True, narrow_range=True)   # 127 for narrow
print("threshold", float(threshold), "denominator", float(denom))
by_hand = threshold / denom
auto = Q.rescaling_scale(threshold, bw, signed=True, narrow_range=True)
np.testing.assert_allclose(by_hand, auto)

# -- 3. declarative config + resolver ---------------------------------------
# QuantConfig is the whole declaration. `.let()` derives variants without
# mutation (the reference's injector `let`).
cfg = QuantConfig(
    bit_width=4.0,
    narrow_range=True,
    scaling_impl=ScalingImplType.PARAMETER_FROM_STATS,   # stats init, learned
    scaling_stats_op=StatsOp.MAX,
    scaling_per_output_channel=True,
    restrict_scaling=RestrictType.FP,
    float_to_int=FloatToIntImpl.ROUND,
)
po2 = cfg.let(restrict_scaling=RestrictType.POWER_OF_TWO,
              restrict_scaling_float_to_int=FloatToIntImpl.CEIL)

# build_scaling is the solver: ScalingImplType -> scaling module with state.
# channel_axis=0: weight rows are output channels in this (out,in) layout.
bshape = scaling_broadcast_shape(w.shape, per_channel=True, channel_axis=0)
view = stats_view(w, per_channel=True, channel_axis=0)
scaling = build_scaling(cfg, bshape, init_stats_input=view,
                        fan_in=view.shape[-1])
print("resolved scaling:", type(scaling).__name__, "shape", bshape)

# -- 4. the assembled quantizer ---------------------------------------------
q = ParameterQuantizer(cfg, w, channel_axis=0)
qt = q(w)
assert qt.scale.shape == (64, 1)       # per-output-channel
assert qt.is_valid()

# power-of-two restriction snaps every scale to 2^ceil(log2 .):
q2 = ParameterQuantizer(po2, w, channel_axis=0)
log2s = np.log2(np.asarray(q2(w).scale))
np.testing.assert_allclose(log2s, np.round(log2s), atol=1e-5)
print("po2 scales: 2^", np.unique(log2s.astype(int)))

# -- 5. presets are just configs --------------------------------------------
# Every reference quantizer (quant/scaled_int.py etc.) exists as a preset:
print("Int4WeightPerTensorFloatDecoupled:",
      presets.Int4WeightPerTensorFloatDecoupled.bit_width,
      presets.Int4WeightPerTensorFloatDecoupled.decoupled)
d = ParameterQuantizer(presets.Int4WeightPerTensorFloatDecoupled, w,
                       channel_axis=0)
assert d(w).is_valid()
print("OK")
