"""Dynamic activation quantization (ScalingImplType.DYNAMIC): stateless
per-call scales, per-token variant, and the dynamic int8 serving twin. No
reference analogue (later Brevitas adds dynamic act quant for LLMs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets
from brevitas_tpu.quant.quantizers import ActQuantizer
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def test_dynamic_per_tensor_tracks_input(rng):
    aq = ActQuantizer(presets.Int8DynamicActPerTensorFloat)
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    s1 = float(aq(x).scale)
    s2 = float(aq(x * 10).scale)
    np.testing.assert_allclose(s2, s1 * 10, rtol=1e-5)
    # stateless: no buffers, same input -> same scale
    np.testing.assert_allclose(float(aq(x).scale), s1, rtol=0)


def test_dynamic_per_token_shapes_and_quality(rng):
    x = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))
    x = x.at[1, 3].mul(50.0)  # outlier token
    per_tensor = ActQuantizer(presets.Int8DynamicActPerTensorFloat)
    per_token = ActQuantizer(presets.Int8DynamicActPerTokenFloat)
    qt = jax.jit(lambda v: per_token(v))(x)
    assert qt.scale.shape == (4, 6, 1)
    # non-outlier tokens keep a fine grid: much lower error than per-tensor
    err_token = float(jnp.mean((qt.value[0] - x[0]) ** 2))
    err_tensor = float(jnp.mean((per_tensor(x).value[0] - x[0]) ** 2))
    assert err_token < err_tensor / 10


def test_dynamic_fp8_per_token(rng):
    aq = ActQuantizer(presets.Fp8e4m3DynamicActPerTokenFloat)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    qt = aq(x)
    assert qt.scale.shape == (2, 5, 1)
    grid = qt.value / qt.scale
    ref = grid.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dynamic_serving_twin_matches_fake_quant(rng):
    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                16, 32, use_bias=True,
                weight_quant=presets.Int8WeightPerChannelFloat,
                input_quant=presets.Int8DynamicActPerTokenFloat, rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))
    eval_mode(m)
    y_fake = m(x)
    G.convert_integer_inference(m)
    assert type(m.l1).__name__ == "DynamicInt8InferenceLinear"
    y_srv = jax.jit(lambda v: m(v))(x)
    np.testing.assert_allclose(np.asarray(y_srv), np.asarray(y_fake),
                               rtol=1e-4, atol=1e-5)


def test_dynamic_serving_second_request_scale(rng):
    """The serving twin recomputes scales per request — feeding 10x larger
    inputs must not clip."""
    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                8, 4, weight_quant=presets.Int8WeightPerTensorFloat,
                input_quant=presets.Int8DynamicActPerTensorFloat, rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(nnx.Rngs(0))
    ref = Net(nnx.Rngs(0))
    eval_mode(m); eval_mode(ref)
    G.convert_integer_inference(m)
    x_big = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32)) * 100
    np.testing.assert_allclose(np.asarray(m(x_big)), np.asarray(ref(x_big)),
                               rtol=1e-4, atol=1e-4)


def test_dynamic_calibration_is_noop(rng):
    """calibration_mode must not disturb dynamic quantizers (no state)."""
    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                8, 4, input_quant=presets.Int8DynamicActPerTensorFloat,
                rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    eval_mode(m)
    y0 = m(x)
    with G.calibration_mode(m):
        y_cal = m(x)
    eval_mode(m)
    # float pass inside calibration, unchanged quant behaviour after
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(y0), rtol=0)


def test_per_token_requires_dynamic():
    with pytest.raises(ValueError, match="DYNAMIC"):
        ActQuantizer(presets.Int8ActPerTensorFloat.let(scaling_per_token=True))


def test_llm_ptq_pipeline_small(rng):
    """The LLM PTQ entry point end-to-end at tiny scale: SmoothQuant + GPTQ
    + dynamic act quant keeps bits-per-char near float."""
    from brevitas_tpu.examples.llm_ptq import main

    r = main(["--train-steps", "40", "--depth", "1", "--dim", "32",
              "--heads", "2", "--seq-len", "32", "--batch", "16",
              "--gptq", "--dynamic-act", "--convert-int"])
    assert r["quant_bpc"] < r["float_bpc"] + 0.1
    assert r["served_bpc"] < r["float_bpc"] + 0.1


def test_weight_only_int4_serving(rng):
    """w4a16: no input quantizer, packed int4 weights, bf16 activations."""
    from jax.experimental.pallas import tpu as pltpu

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                64, 32, use_bias=True,
                weight_quant=presets.Int8WeightPerChannelFloat.let(bit_width=4),
                input_quant=None, rngs=rngs)

        def __call__(self, x):
            return self.l1(x)

    m = Net(nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    eval_mode(m)
    y_fake = m(x)
    G.convert_integer_inference(m)
    assert type(m.l1).__name__ == "WeightOnlyInt4InferenceLinear"
    assert m.l1.w_packed.shape == (32, 32)  # K/2 packed rows
    y_srv = m(x)
    # bf16 activations: ~3 decimal digits
    np.testing.assert_allclose(np.asarray(y_srv), np.asarray(y_fake),
                               rtol=2e-2, atol=2e-2)


def test_weight_only_int4_pallas_kernel_matches_reference(rng):
    from jax.experimental.pallas import tpu as pltpu

    from brevitas_tpu.kernels.int4 import (
        int4_weight_only_matmul,
        int4_weight_only_matmul_reference,
        pack_int4_rows,
    )

    w_int = jnp.asarray(rng.integers(-8, 8, (1024, 512)).astype(np.int8))
    wp = pack_int4_rows(w_int)
    x = jnp.asarray(rng.standard_normal((16, 1024)).astype(np.float32))
    ws = jnp.asarray(rng.uniform(0.01, 0.1, 512).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    ref = int4_weight_only_matmul_reference(x, wp, ws, b, act="relu")
    with pltpu.force_tpu_interpret_mode():
        y = int4_weight_only_matmul(x, wp, ws, b, act="relu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)
