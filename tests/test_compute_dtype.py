"""bf16 exact-code MXU path (nn/quant_layer.py code_domain).

With compute_dtype=bf16 and symmetric INT quant <= 8 bits, the matmul runs on
integer CODES (value/scale — small ints that bf16 represents losslessly) and
the f32 accumulation is rescaled by output_scale: numerically identical to
the f32 path, at bf16 MXU rate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.models import lfc
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import set_compute_dtype


def test_quant_linear_code_domain_is_exact(rng):
    l32 = qnn.QuantLinear(
        128, 64, rngs=nnx.Rngs(0),
        weight_quant=presets.Int8WeightPerChannelFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    lbf = qnn.QuantLinear(
        128, 64, rngs=nnx.Rngs(0),
        weight_quant=presets.Int8WeightPerChannelFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    lbf.compute_dtype = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    y32 = np.asarray(l32(x))
    ybf = np.asarray(lbf(x))
    # identical up to f32 rounding of the elementwise rescale
    np.testing.assert_allclose(ybf, y32, rtol=2e-6, atol=2e-6)


def test_plain_cast_fallback_without_metadata(rng):
    """No input scale metadata -> codes unavailable -> operands are cast
    directly (lossy but bounded)."""
    l = qnn.QuantLinear(64, 32, rngs=nnx.Rngs(0),
                        weight_quant=presets.Int8WeightPerTensorFloat)
    lb = qnn.QuantLinear(64, 32, rngs=nnx.Rngs(0),
                         weight_quant=presets.Int8WeightPerTensorFloat)
    lb.compute_dtype = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    a, b = np.asarray(l(x)), np.asarray(lb(x))
    assert b.dtype == np.float32
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert 0 < rel < 0.05  # bf16-operand noise, not exact


def test_lfc_bf16_equals_f32(rng):
    m32 = lfc(weight_bit_width=4, act_bit_width=4, in_bit_width=4,
              dropout=0.0, rngs=nnx.Rngs(0))
    mbf = lfc(weight_bit_width=4, act_bit_width=4, in_bit_width=4,
              dropout=0.0, rngs=nnx.Rngs(0))
    set_compute_dtype(mbf, jnp.bfloat16)
    x = jnp.asarray(rng.random((16, 28, 28, 1)).astype(np.float32))
    o32, obf = np.asarray(m32(x)), np.asarray(mbf(x))
    rel = np.abs(o32 - obf).max() / (np.abs(o32).max() + 1e-9)
    assert rel < 1e-5, rel


def test_dropout_preserves_codes(rng):
    """FC dropout rescales the SCALE, not the codes, so the exact path
    survives training-time dropout."""
    m = lfc(weight_bit_width=4, act_bit_width=4, in_bit_width=4,
            dropout=0.3, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.random((4, 28, 28, 1)).astype(np.float32))
    qt = m.input_quant(2.0 * x.reshape(4, -1) - 1.0)
    dropped = m._dropout(qt)
    codes = np.asarray(dropped.value / dropped.scale)
    np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)


def test_bf16_training_step_learns(rng):
    m = lfc(weight_bit_width=4, act_bit_width=4, in_bit_width=4,
            dropout=0.0, rngs=nnx.Rngs(0))
    set_compute_dtype(m, jnp.bfloat16)
    opt = nnx.Optimizer(m, optax.adam(2e-3), wrt=nnx.Param)
    x = jnp.asarray(rng.random((64, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 64))

    @nnx.jit
    def step(model, opt, x, y):
        loss, g = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(model)
        opt.update(model, g)
        return loss

    l0 = float(step(m, opt, x, y))
    for _ in range(25):
        last = float(step(m, opt, x, y))
    assert last < l0 * 0.7, (l0, last)


def test_conv_code_domain_exact(rng):
    c32 = qnn.QuantConv2d(
        8, 16, 3, rngs=nnx.Rngs(0),
        weight_quant=presets.Int8WeightPerChannelFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    cbf = qnn.QuantConv2d(
        8, 16, 3, rngs=nnx.Rngs(0),
        weight_quant=presets.Int8WeightPerChannelFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    cbf.compute_dtype = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 8)).astype(np.float32))
    a, b = np.asarray(c32(x)), np.asarray(cbf(x))
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-6)


def test_transformer_bf16_matches_f32(rng):
    """Transformer quant layers own their input quantizers, so the exact
    code path engages without model changes."""
    from brevitas_tpu.models.transformer import QuantTransformer

    ids = jnp.asarray(rng.integers(0, 32, (2, 16)).astype(np.int32))

    def build():
        m = QuantTransformer(vocab_size=32, dim=32, depth=1, num_heads=2,
                             max_len=16, bit_width=8, rngs=nnx.Rngs(0))
        m(ids, causal=True)  # settle act stats identically
        return m

    m32, mbf = build(), build()
    set_compute_dtype(mbf, jnp.bfloat16)
    a = np.asarray(m32(ids, causal=True))
    b = np.asarray(mbf(ids, causal=True))
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    # linears run the exact-code path; attention einsum operands now cast to
    # bf16 too (set_compute_dtype covers QuantMultiheadAttention so bf16
    # baselines are bf16 end-to-end, incl. decode caches), which rounds the
    # fake-quant values — standard mixed-precision noise, not exact
    assert rel < 0.03, rel
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.95


def test_lm_bf16_training_learns():
    from brevitas_tpu.examples.lm import train

    model, losses = train(steps=60, batch=16, seq_len=32, dim=64, depth=1,
                          heads=2, bit_width=8, bf16=True,
                          log=lambda _m: None)
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
