"""Groupwise / OCP microscaling (MX) weight quantization. No reference
analogue (later Brevitas ships GroupwiseInt/Float MX quantizers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets
from brevitas_tpu.quant.quantizers import ParameterQuantizer
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def rngs():
    return nnx.Rngs(0)


def test_mx_int8_grid_and_scale_structure(rng):
    w = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    q = ParameterQuantizer(presets.MXInt8Weight, w, channel_axis=1)
    qt = q(w)
    assert qt.is_valid()
    s = np.asarray(qt.scale)
    assert s.shape == (64, 16)
    # one scale per (32-row block, column): constant within each block
    blocks = s.reshape(2, 32, 16)
    assert (blocks == blocks[:, :1, :]).all()
    # MX: scales are powers of two
    log2s = np.log2(blocks[:, 0, :])
    np.testing.assert_allclose(log2s, np.round(log2s), atol=1e-6)


def test_groupwise_beats_per_channel_on_heterogeneous_rows(rng):
    """Weights whose magnitude varies along the REDUCTION dim: per-group
    scales track it, per-channel scales cannot."""
    w = jnp.asarray(rng.standard_normal((128, 8)).astype(np.float32))
    w = w * jnp.repeat(jnp.asarray([0.01, 1.0, 0.02, 2.0]), 32)[:, None]
    g = ParameterQuantizer(presets.Int4WeightPerGroupFloat, w, channel_axis=1)
    c = ParameterQuantizer(
        presets.Int8WeightPerChannelFloat.let(bit_width=4), w, channel_axis=1)
    # overall error improves...
    err_g = float(jnp.mean((g(w).value - w) ** 2))
    err_c = float(jnp.mean((c(w).value - w) ** 2))
    assert err_g < err_c
    # ...and the small-magnitude block (0.01x rows), which the per-channel
    # scale flushes to ~zero, is quantized ~exactly by its own group scale
    sml = slice(0, 32)
    err_g_small = float(jnp.mean((g(w).value[sml] - w[sml]) ** 2))
    err_c_small = float(jnp.mean((c(w).value[sml] - w[sml]) ** 2))
    assert err_g_small < err_c_small / 100


def test_mx_fp4_element_format(rng):
    w = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    q = ParameterQuantizer(presets.MXFp4Weight, w, channel_axis=1)
    qt = q(w)
    assert float(qt.bit_width) == 4.0
    # e2m1 has 15 finite values; per block the grid is tiny
    grid = np.asarray(qt.value / qt.scale)
    assert len(np.unique(np.round(grid, 5))) <= 15


def test_groupwise_conv_kernel(rng):
    """Conv kernels group along the flattened (kh*kw*I) reduction dim."""
    m = qnn.QuantConv2d(8, 16, 2, padding="SAME",
                        weight_quant=presets.MXInt8Weight, rngs=rngs())
    qt = m.quant_weight()
    assert qt.is_valid()
    assert qt.scale.shape == m.weight[...].shape  # (2,2,8,16)


def test_groupwise_layer_trains_and_output_scale_is_none(rng):
    import optax

    m = qnn.QuantLinear(
        64, 16, weight_quant=presets.MXInt4Weight.let(scaling_per_group=16),
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        return_quant_tensor=True, rngs=rngs())
    x = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    m(x)
    eval_mode(m)
    qt = m(x)
    assert qt.scale is None  # groupwise: no single per-output scale exists

    m2 = qnn.QuantLinear(64, 16, weight_quant=presets.MXInt8Weight,
                         rngs=rngs())

    class Wrap(nnx.Module):
        def __init__(self, l):
            self.l = l

        def __call__(self, x):
            return self.l(x)

    net = Wrap(m2)
    opt = nnx.Optimizer(net, optax.adam(1e-2), wrt=nnx.Param)
    y = jnp.asarray((np.arange(32) % 16).astype(np.int32))

    @nnx.jit
    def step(model, opt, x, y):
        import optax as ox
        loss, grads = nnx.value_and_grad(
            lambda mm: ox.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(model)
        opt.update(model, grads)
        return loss

    losses = [float(step(net, opt, x, y)) for _ in range(30)]
    assert losses[-1] < losses[0]


def test_groupwise_validation():
    w = jnp.ones((64, 8))
    with pytest.raises(ValueError, match="divisible"):
        ParameterQuantizer(presets.MXInt8Weight.let(scaling_per_group=48), w,
                           channel_axis=1)
    with pytest.raises(ValueError, match="per-output-channel"):
        ParameterQuantizer(
            presets.MXInt8Weight.let(scaling_per_output_channel=True), w,
            channel_axis=1)
    from brevitas_tpu.graph.gptq import eligible_for_gptq
    m = qnn.QuantLinear(64, 8, weight_quant=presets.MXInt8Weight, rngs=rngs())
    # weight-rewriting INT passes use self.scaling — groupwise is excluded
    assert not eligible_for_gptq(m)
