"""A2Q accumulator-aware quantization (arXiv:2308.13504): the per-channel l1
norm of integer weights is constrained so dot products with quantized inputs
provably never overflow the target accumulator. No reference analogue (later
Brevitas ships AccumulatorAwareWeightQuant)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def _a2q_linear(acc_bits, in_f=64, out_f=16, w_bits=8):
    return qnn.QuantLinear(
        in_f, out_f,
        weight_quant=presets.Int8AccumulatorAwareWeightPerChannelFloat.let(
            bit_width=w_bits, accumulator_bit_width=acc_bits),
        input_quant=presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
        rngs=nnx.Rngs(0))


def _worst_case_acc(layer, input_bits=8, input_signed=False):
    qw = layer.quant_weight(input_bit_width=jnp.asarray(float(input_bits)),
                            input_signed=input_signed)
    w_int = np.asarray(qw.value / qw.scale)
    max_x = 2 ** input_bits - 1 if not input_signed else 2 ** (input_bits - 1)
    return np.abs(w_int).sum(axis=0).max() * max_x


@pytest.mark.parametrize("acc_bits", [12, 16, 24])
def test_a2q_overflow_guarantee(acc_bits, rng):
    m = _a2q_linear(acc_bits)
    m(jnp.abs(jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))))
    eval_mode(m)
    assert _worst_case_acc(m) <= 2 ** (acc_bits - 1) - 1


def test_a2q_constraint_binds_when_tight(rng):
    """At a tight budget the l1 clamp is active (g_eff < g); at a loose one
    the weights are barely touched."""
    x = jnp.abs(jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32)))
    tight = _a2q_linear(12)
    loose = _a2q_linear(32)
    loose.weight[...] = tight.weight[...]
    for m in (tight, loose):
        m(x)
        eval_mode(m)
    qw_t = tight.quant_weight(input_bit_width=jnp.asarray(8.0),
                              input_signed=False)
    qw_l = loose.quant_weight(input_bit_width=jnp.asarray(8.0),
                              input_signed=False)
    # tight budget shrinks the weights vs the loose one
    assert float(jnp.sum(jnp.abs(qw_t.value))) \
        < 0.9 * float(jnp.sum(jnp.abs(qw_l.value)))
    # loose budget ~ unconstrained quantization of the same weights
    base = qnn.QuantLinear(64, 16,
                           weight_quant=presets.Int8WeightPerChannelFloat,
                           rngs=nnx.Rngs(0))
    base.weight[...] = tight.weight[...]
    qw_b = base.quant_weight()
    rel = float(jnp.linalg.norm(qw_l.value - qw_b.value)
                / jnp.linalg.norm(qw_b.value))
    assert rel < 0.15


def test_a2q_trains_and_keeps_guarantee(rng):
    class Net(nnx.Module):
        def __init__(self):
            self.l1 = _a2q_linear(16, in_f=32, out_f=16)

        def __call__(self, x):
            return self.l1(x)

    m = Net()
    m.l1 = qnn.QuantLinear(
        32, 16,
        weight_quant=presets.Int8AccumulatorAwareWeightPerChannelFloat.let(
            accumulator_bit_width=16),
        input_quant=presets.Uint8ActPerTensorFloat.let(collect_stats_steps=2),
        rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(m, optax.adam(1e-2), wrt=nnx.Param)
    x = jnp.abs(jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)))
    y = jnp.asarray((np.arange(64) % 16).astype(np.int32))

    @nnx.jit
    def step(model, opt, x, y):
        loss, grads = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(model)
        opt.update(model, grads)
        return loss

    losses = [float(step(m, opt, x, y)) for _ in range(40)]
    assert losses[-1] < losses[0]
    eval_mode(m)
    assert _worst_case_acc(m.l1) <= 2 ** 15 - 1


def test_a2q_norm_target_trains_when_unclamped(rng):
    """With a loose budget g_eff = g, so the l1 target itself receives
    gradients; when the clamp binds, gradients route to the scale instead
    (the minimum's active branch) — exactly the Brevitas clamp_max
    behaviour."""
    m = _a2q_linear(32, in_f=32, out_f=16)
    opt = nnx.Optimizer(m, optax.adam(1e-2), wrt=nnx.Param)
    x = jnp.abs(jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)))
    y = jnp.asarray((np.arange(64) % 16).astype(np.int32))
    m(x)  # collect input stats

    @nnx.jit
    def step(model, opt, x, y):
        loss, grads = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(model)
        opt.update(model, grads)
        return loss

    g0 = np.asarray(m.weight_quant.g[...]).copy()
    for _ in range(20):
        step(m, opt, x, y)
    assert not np.allclose(np.asarray(m.weight_quant.g[...]), g0)


def test_a2q_integer_serving(rng):
    import brevitas_tpu.graph as G

    class Net(nnx.Module):
        def __init__(self):
            self.l1 = _a2q_linear(16)

        def __call__(self, x):
            return self.l1(x)

    m = Net()
    x = jnp.abs(jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32)))
    m(x)
    eval_mode(m)
    y_fake = m(x)
    G.convert_integer_inference(m)
    assert type(m.l1).__name__ == "Int8InferenceLinear"
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(y_fake),
                               rtol=1e-3, atol=1e-3)


def test_a2q_requires_quantized_input(rng):
    m = qnn.QuantLinear(
        8, 4,
        weight_quant=presets.Int8AccumulatorAwareWeightPerChannelFloat,
        rngs=nnx.Rngs(0))  # no input_quant
    with pytest.raises(ValueError, match="quantized input"):
        m(jnp.ones((2, 8)))
    # export-style no-arg quant_weight on an A2Q layer WITH an input quant
    # resolves the budget from the quantizer's static format
    ok = _a2q_linear(16)
    assert ok.quant_weight().is_valid()
    # ...and A2Q layers are excluded from the INT weight-rewriting passes
    from brevitas_tpu.graph.gptq import eligible_for_gptq
    assert not eligible_for_gptq(ok)
