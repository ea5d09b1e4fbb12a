"""Minifloat (FP8) quantization — core math vs the jnp.float8 hardware-cast
oracle, quantizer integration, and QAT training. No reference analogue (the
snapshot is integer-only; later Brevitas adds FloatQuant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.core.quant import float_quant, minifloat_max_val
from brevitas_tpu.quant import presets
from brevitas_tpu.quant.quantizers import ActQuantizer, ParameterQuantizer
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def rngs():
    return nnx.Rngs(0)


def test_minifloat_max_val_table():
    assert minifloat_max_val(4, 3, 7, nan_reserved=True) == 448.0
    assert minifloat_max_val(5, 2, 15, nan_reserved=False) == 57344.0
    # e4m3 IEEE-style (inf reserved) = 240
    assert minifloat_max_val(4, 3, 7, nan_reserved=False) == 240.0


@pytest.mark.parametrize("fmt,dtype,lo", [
    (dict(exponent_bits=4, mantissa_bits=3, exponent_bias=7, max_val=448.0),
     jnp.float8_e4m3fn, 448.0),
    (dict(exponent_bits=5, mantissa_bits=2, exponent_bias=15, max_val=57344.0),
     jnp.float8_e5m2, 50000.0),
])
def test_float_quant_matches_hardware_cast(fmt, dtype, lo, rng):
    """Bit-exact against the XLA float8 cast, incl. subnormals and RNE ties."""
    x = jnp.asarray(np.concatenate([
        rng.uniform(-lo, lo, 8192),
        rng.standard_normal(8192),
        rng.uniform(-2.0 ** -7, 2.0 ** -7, 2048),
        rng.uniform(-2.0 ** -14, 2.0 ** -14, 2048),
        np.zeros(16),
    ]).astype(np.float32))
    y = float_quant(x, jnp.asarray(1.0), **fmt)
    ref = x.astype(dtype).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_float_quant_saturates(rng):
    x = jnp.asarray([1e6, -1e6, 500.0, -449.0], jnp.float32)
    y = float_quant(x, jnp.asarray(1.0), exponent_bits=4, mantissa_bits=3,
                    exponent_bias=7, max_val=448.0)
    np.testing.assert_array_equal(np.asarray(y), [448.0, -448.0, 448.0, -448.0])


def test_float_quant_ste_gradient(rng):
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    g = jax.grad(lambda v: float_quant(
        v, jnp.asarray(1.0), exponent_bits=4, mantissa_bits=3,
        exponent_bias=7, max_val=448.0).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_fp8_weight_quantizer_scale_maps_absmax_to_format_max(rng):
    w = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    q = ParameterQuantizer(presets.Fp8e4m3WeightPerTensorFloat, w,
                           channel_axis=1)
    qt = q(w)
    np.testing.assert_allclose(float(qt.scale),
                               float(jnp.max(jnp.abs(w))) / 448.0, rtol=1e-6)
    assert float(qt.bit_width) == 8.0
    # quantized values lie on the fp8 grid scaled by `scale`
    grid = (qt.value / qt.scale)
    ref = grid.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fp8_per_channel_weight(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32))
    q = ParameterQuantizer(presets.Fp8e4m3WeightPerChannelFloat, w,
                           channel_axis=3)
    qt = q(w)
    assert qt.scale.shape == (1, 1, 1, 8)


def test_fp8_act_quantizer_two_phase(rng):
    aq = ActQuantizer(presets.Fp8e4m3ActPerTensorFloat.let(
        collect_stats_steps=2))
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    aq(x); aq(x * 2)
    aq.eval_mode()
    qt = aq(x)
    assert float(qt.scale) > 0 and float(qt.bit_width) == 8.0
    grid = qt.value / qt.scale
    ref = grid.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fp8_qat_trains(rng):
    import optax

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                16, 32, weight_quant=presets.Fp8e4m3WeightPerChannelFloat,
                input_quant=presets.Fp8e4m3ActPerTensorFloat.let(
                    collect_stats_steps=3), rngs=rngs)
            self.l2 = qnn.QuantLinear(
                32, 4, weight_quant=presets.Fp8e5m2WeightPerTensorFloat,
                rngs=rngs)

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    m = Net(rngs())
    opt = nnx.Optimizer(m, optax.adam(1e-2), wrt=nnx.Param)
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    y = jnp.asarray((np.arange(64) % 4).astype(np.int32))

    @nnx.jit
    def step(model, opt, x, y):
        loss, grads = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(model)
        opt.update(model, grads)
        return loss

    losses = [float(step(m, opt, x, y)) for _ in range(30)]
    assert losses[-1] < losses[0]


def test_fp8_layer_not_eligible_for_int_ptq_optimizers(rng):
    from brevitas_tpu.graph.gptq import eligible_for_gptq
    from brevitas_tpu.graph.learned_round import eligible_for_learned_round
    lin = qnn.QuantLinear(8, 8, weight_quant=presets.Fp8e4m3WeightPerTensorFloat,
                          rngs=rngs())
    assert not eligible_for_gptq(lin)
    assert not eligible_for_learned_round(lin)


def test_fp8_ptq_error_reasonable(rng):
    """FP8 E4M3 PTQ of a float net lands close to the float function —
    comparable to int8 (both ~8-bit formats)."""
    import brevitas_tpu.graph as G

    class FloatNet(nnx.Module):
        def __init__(self, rngs):
            self.l1 = nnx.Linear(16, 32, rngs=rngs)
            self.l2 = nnx.Linear(32, 8, rngs=rngs)

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))

    def ptq(wq, aq):
        m = FloatNet(nnx.Rngs(3))
        y_float = m(x)
        G.quantize(m, weight_quant=wq, act_quant=aq)
        with G.calibration_mode(m):
            m(x)
        eval_mode(m)
        return float(jnp.mean((m(x) - y_float) ** 2)), y_float

    fp8_err, y_float = ptq(
        presets.Fp8e4m3WeightPerChannelFloat,
        presets.Fp8e4m3ActPerTensorFloat.let(collect_stats_steps=1))
    int8_err, _ = ptq(
        presets.Int8WeightPerChannelFloat,
        presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    scale = float(jnp.mean(y_float ** 2))
    assert fp8_err < 0.01 * scale
    # same ballpark as int8 (e4m3's 3 mantissa bits are coarser than int8's
    # uniform grid on near-Gaussian data; ~10x MSE is the expected trade)
    assert fp8_err < 20 * int8_err


def test_fp8_serving_twin_matches_fake_quant(rng):
    import brevitas_tpu.graph as G

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                16, 32, use_bias=True,
                weight_quant=presets.Fp8e4m3WeightPerChannelFloat,
                input_quant=presets.Fp8e4m3ActPerTensorFloat.let(
                    collect_stats_steps=1), rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(rngs())
    x = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    m(x)
    eval_mode(m)
    y_fake = m(x)
    G.convert_integer_inference(m)
    assert type(m.l1).__name__ == "Fp8InferenceLinear"
    assert m.l1.w8.dtype == jnp.float8_e4m3fn
    y_srv = jax.jit(lambda x: m(x))(x)
    np.testing.assert_allclose(np.asarray(y_srv), np.asarray(y_fake),
                               rtol=1e-3, atol=1e-3)


def test_fp8_serving_saturates_out_of_range_inputs(rng):
    import brevitas_tpu.graph as G

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                8, 4, weight_quant=presets.Fp8e4m3WeightPerTensorFloat,
                input_quant=presets.Fp8e4m3ActPerTensorFloat.let(
                    collect_stats_steps=1), rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(rngs())
    m(jnp.ones((4, 8)))
    eval_mode(m)
    G.convert_integer_inference(m)
    y = m(jnp.full((4, 8), 1e6, jnp.float32))  # way past the act range
    assert np.isfinite(np.asarray(y)).all()  # clamped, not NaN/inf


def test_fp8_dynamic_input_stays_fake_quant(rng):
    """A dynamic FLOAT input quantizer has no static scale to freeze — the
    converter must leave the layer on the (correct) fake-quant path rather
    than serving garbage."""
    import brevitas_tpu.graph as G

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                8, 4, weight_quant=presets.Fp8e4m3WeightPerTensorFloat,
                input_quant=presets.Fp8e4m3DynamicActPerTensorFloat,
                rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(rngs())
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    eval_mode(m)
    y0 = m(x)
    G.convert_integer_inference(m)
    assert type(m.l1).__name__ == "QuantLinear"  # untouched
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(y0), rtol=0)
