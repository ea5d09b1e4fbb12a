"""GPFQ greedy path-following PTQ (graph/gpfq.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
import brevitas_tpu.nn as qnn
from brevitas_tpu.graph.gpfq import _gpfq_solve, apply_gpfq
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


def test_gpfq_solve_residual_identity(rng):
    """The recursion's accumulated residual equals X (W - Q) exactly."""
    W = jnp.asarray(rng.standard_normal((12, 6)).astype(np.float32))
    X = jnp.asarray(rng.standard_normal((32, 12)).astype(np.float32))
    scale = jnp.asarray(0.11, jnp.float32)
    Q, sqerr = _gpfq_solve(W, X, scale, jnp.asarray(-8.0), jnp.asarray(7.0))
    # on the grid
    ints = np.asarray(Q) / 0.11
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-4)
    assert ints.min() >= -8 and ints.max() <= 7
    # residual identity
    E = X @ (W - Q)
    np.testing.assert_allclose(float(jnp.sum(E * E)), float(sqerr), rtol=1e-4)


def test_gpfq_linear_beats_nearest(rng):
    m = qnn.QuantLinear(
        48, 24, weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=3),
        rngs=rngs())
    net = Wrap(m)
    # correlated inputs: the greedy output-matching has signal to exploit
    base = rng.standard_normal((128, 8)).astype(np.float32)
    mix = rng.standard_normal((8, 48)).astype(np.float32)
    x = jnp.asarray(base @ mix
                    + 0.1 * rng.standard_normal((128, 48)).astype(np.float32))
    w_fp = m.weight[...]
    y_fp = x @ w_fp

    eval_mode(net)
    y_nearest = net(x)  # fake-quant = nearest rounding
    report = apply_gpfq(net, [x])
    (mse_near, mse_gpfq), = report.values()
    assert mse_gpfq < mse_near
    y_gpfq = net(x)
    assert float(jnp.mean((y_gpfq - y_fp) ** 2)) \
        < float(jnp.mean((y_nearest - y_fp) ** 2))


def test_gpfq_weights_on_grid_per_channel(rng):
    m = qnn.QuantLinear(
        16, 8, weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=4),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    apply_gpfq(net, [x])
    qt = m.quant_weight()
    assert qt.is_valid()
    np.testing.assert_allclose(np.asarray(qt.value),
                               np.asarray(m.weight[...]), rtol=0, atol=1e-6)


def test_gpfq_conv_beats_nearest(rng):
    m = qnn.QuantConv2d(
        6, 12, 3, padding="SAME",
        weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=3),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((4, 10, 10, 6)).astype(np.float32))
    x = (x + jnp.roll(x, 1, axis=1) + jnp.roll(x, 1, axis=2)) / 3.0
    w_fp = m.weight[...]
    eval_mode(net)
    y_nearest = net(x)
    report = apply_gpfq(net, [x])
    y_gpfq = net(x)

    ref = qnn.QuantConv2d(6, 12, 3, padding="SAME", weight_quant=None,
                          rngs=rngs())
    ref.weight[...] = w_fp
    y_fp = ref(x)
    assert float(jnp.mean((y_gpfq - y_fp) ** 2)) \
        < float(jnp.mean((y_nearest - y_fp) ** 2))
    (near, gpfq), = report.values()
    assert gpfq < near


def test_gpfq_grouped_conv_on_grid(rng):
    m = qnn.QuantConv2d(
        8, 16, 3, padding="SAME", groups=4,
        weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=4),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    apply_gpfq(net, [x])
    qt = m.quant_weight()
    assert qt.is_valid()
    np.testing.assert_allclose(np.asarray(qt.value),
                               np.asarray(m.weight[...]), rtol=0, atol=1e-6)


def test_gpfq_max_rows_subsampling(rng):
    m = qnn.QuantLinear(
        24, 12, weight_quant=presets.Int8WeightPerTensorFloat.let(bit_width=4),
        rngs=rngs())
    net = Wrap(m)
    x = jnp.asarray(rng.standard_normal((256, 24)).astype(np.float32))
    report = apply_gpfq(net, [x], max_rows=64)
    (near, gpfq), = report.values()
    assert gpfq <= near
    qt = m.quant_weight()
    assert qt.is_valid()


def test_gpfq_end_to_end_pipeline(rng):
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

    def ptq(gpfq):
        m = FloatNet(nnx.Rngs(7))
        y_float = m(batches[0])
        G.quantize(m, weight_quant=w3, act_quant=act)
        with G.calibration_mode(m):
            for b in batches:
                m(b)
        if gpfq:
            apply_gpfq(m, batches)
        eval_mode(m)
        return float(jnp.mean((m(batches[0]) - y_float) ** 2))

    assert ptq(True) < ptq(False)
