"""AdaRound learned-rounding PTQ (graph/learned_round.py).

Tier-1 analogue: layer-level objective improvement, baking exactness
(re-quantization reproduces the learned integers), and end-to-end PTQ error
reduction vs nearest rounding on the same calibration data.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
import brevitas_tpu.nn as qnn
from brevitas_tpu.graph.learned_round import (
    _rectified_sigmoid,
    apply_learned_round,
    eligible_for_learned_round,
)
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def rngs():
    return nnx.Rngs(0)


def test_rectified_sigmoid_range():
    v = jnp.linspace(-20, 20, 101)
    h = _rectified_sigmoid(v)
    assert float(h.min()) == 0.0 and float(h.max()) == 1.0
    # nearest-round init: h(v0(r)) == r on the open interval
    from brevitas_tpu.graph.learned_round import _init_v
    r = jnp.linspace(0.05, 0.95, 19)
    np.testing.assert_allclose(_rectified_sigmoid(_init_v(r)), r, atol=1e-5)


def test_learned_round_improves_layer_mse(rng):
    class Net(nnx.Module):
        def __init__(self):
            self.l1 = qnn.QuantLinear(
                32, 16, use_bias=True,
                weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=3),
                rngs=rngs())

        def __call__(self, x):
            return self.l1(x)

    m = Net()
    batches = [jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
               for _ in range(2)]
    report = apply_learned_round(m, batches, steps=300)
    (mse_near, mse_learned), = report.values()
    assert mse_learned < mse_near  # rounding beat round-to-nearest


def test_bake_is_exact(rng):
    """After baking, the layer's quant_weight() reproduces the learned
    rounding exactly: weights sit on the frozen grid."""
    m = qnn.QuantLinear(
        16, 8, weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=4),
        rngs=rngs())

    class Wrap(nnx.Module):
        def __init__(self, l):
            self.l = l

        def __call__(self, x):
            return self.l(x)

    net = Wrap(m)
    x = [jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))]
    apply_learned_round(net, x, steps=100)
    qt = m.quant_weight()
    assert qt.is_valid()
    # re-quantization is idempotent on baked weights
    np.testing.assert_allclose(np.asarray(qt.value), np.asarray(m.weight[...]),
                               rtol=0, atol=1e-6)


def test_learned_round_end_to_end_beats_nearest(rng):
    """Full PTQ pipeline: learned round lowers model output error vs the
    identical pipeline without it (2-bit weights so rounding matters)."""
    import copy

    class FloatNet(nnx.Module):
        def __init__(self, rngs):
            self.l1 = nnx.Linear(24, 48, rngs=rngs)
            self.l2 = nnx.Linear(48, 10, rngs=rngs)

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    import jax

    def build():
        m = FloatNet(nnx.Rngs(7))
        return m

    batches = [jnp.asarray(rng.standard_normal((128, 24)).astype(np.float32))
               for _ in range(2)]
    w2 = presets.Int8WeightPerChannelFloat.let(bit_width=3)
    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)

    def ptq(learned):
        m = build()
        y_float = m(batches[0])
        G.quantize(m, weight_quant=w2, act_quant=act)
        with G.calibration_mode(m):
            for b in batches:
                m(b)
        if learned:
            apply_learned_round(m, batches, steps=300)
        eval_mode(m)
        err = float(jnp.mean((m(batches[0]) - y_float) ** 2))
        return err

    assert ptq(True) < ptq(False)


def test_eligibility_guards(rng):
    lin_none = qnn.QuantLinear(8, 8, weight_quant=None, rngs=rngs())
    assert not eligible_for_learned_round(lin_none)
    lin = qnn.QuantLinear(8, 8, rngs=rngs())
    assert eligible_for_learned_round(lin)
    conv_t = qnn.QuantConvTranspose2d(4, 4, 3, rngs=rngs())
    assert not eligible_for_learned_round(conv_t)
    # asymmetric weight quant is out of scope
    shifted = qnn.QuantLinear(
        8, 8, weight_quant=presets.ShiftedUint8WeightPerTensorFloat,
        rngs=rngs())
    assert not eligible_for_learned_round(shifted)
