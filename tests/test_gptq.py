"""GPTQ Hessian-based PTQ (graph/gptq.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
import brevitas_tpu.nn as qnn
from brevitas_tpu.graph.gptq import apply_gptq
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def rngs():
    return nnx.Rngs(0)


class Wrap(nnx.Module):
    def __init__(self, layer):
        self.l = layer

    def __call__(self, x):
        return self.l(x)


def _output_mse(layer_fwd, x, y_ref):
    return float(jnp.mean((layer_fwd(x) - y_ref) ** 2))


def test_gptq_linear_beats_nearest(rng):
    m = qnn.QuantLinear(
        48, 24, weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=3),
        rngs=rngs())
    net = Wrap(m)
    # correlated inputs: where GPTQ's Hessian weighting matters
    base = rng.standard_normal((128, 8)).astype(np.float32)
    mix = rng.standard_normal((8, 48)).astype(np.float32)
    x = jnp.asarray(base @ mix + 0.1 * rng.standard_normal((128, 48)).astype(np.float32))
    w_fp = m.weight[...]
    y_fp = x @ w_fp

    eval_mode(net)
    y_nearest = net(x)  # fake-quant = nearest rounding
    report = apply_gptq(net, [x])
    (mse_near_proxy, mse_gptq_proxy), = report.values()
    assert mse_gptq_proxy < mse_near_proxy
    y_gptq = net(x)
    # true output error also improves
    assert float(jnp.mean((y_gptq - y_fp) ** 2)) \
        < float(jnp.mean((y_nearest - y_fp) ** 2))


def test_gptq_weights_on_grid(rng):
    m = qnn.QuantLinear(
        16, 8, weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=4),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    apply_gptq(net, [x])
    qt = m.quant_weight()
    assert qt.is_valid()
    np.testing.assert_allclose(np.asarray(qt.value),
                               np.asarray(m.weight[...]), rtol=0, atol=1e-6)


def test_gptq_conv_beats_nearest(rng):
    m = qnn.QuantConv2d(
        6, 12, 3, padding="SAME",
        weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=3),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((4, 10, 10, 6)).astype(np.float32))
    # smooth the input spatially so neighbouring patches correlate
    x = (x + jnp.roll(x, 1, axis=1) + jnp.roll(x, 1, axis=2)) / 3.0
    w_fp = m.weight[...]
    eval_mode(net)
    y_nearest = net(x)
    report = apply_gptq(net, [x])
    y_gptq = net(x)

    ref = qnn.QuantConv2d(6, 12, 3, padding="SAME", weight_quant=None,
                          rngs=rngs())
    ref.weight[...] = w_fp
    y_fp = ref(x)
    assert float(jnp.mean((y_gptq - y_fp) ** 2)) \
        < float(jnp.mean((y_nearest - y_fp) ** 2))
    (near, gptq), = report.values()
    assert gptq < near


def test_gptq_grouped_conv(rng):
    m = qnn.QuantConv2d(
        8, 16, 3, padding="SAME", groups=4,
        weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=4),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    apply_gptq(net, [x])
    qt = m.quant_weight()
    assert qt.is_valid()
    np.testing.assert_allclose(np.asarray(qt.value),
                               np.asarray(m.weight[...]), rtol=0, atol=1e-6)


def test_gptq_end_to_end_pipeline(rng):
    class FloatNet(nnx.Module):
        def __init__(self, rngs):
            self.l1 = nnx.Linear(24, 48, rngs=rngs)
            self.l2 = nnx.Linear(48, 10, rngs=rngs)

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    base = rng.standard_normal((256, 6)).astype(np.float32)
    mix = rng.standard_normal((6, 24)).astype(np.float32)
    data = jnp.asarray(base @ mix
                       + 0.1 * rng.standard_normal((256, 24)).astype(np.float32))
    batches = [data[:128], data[128:]]
    w3 = presets.Int8WeightPerChannelFloat.let(bit_width=3)
    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)

    def ptq(gptq):
        m = FloatNet(nnx.Rngs(7))
        y_float = m(batches[0])
        G.quantize(m, weight_quant=w3, act_quant=act)
        with G.calibration_mode(m):
            for b in batches:
                m(b)
        if gptq:
            apply_gptq(m, batches)
        eval_mode(m)
        return float(jnp.mean((m(batches[0]) - y_float) ** 2))

    assert ptq(True) < ptq(False)
