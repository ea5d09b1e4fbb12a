"""Model zoo tests (mirror of reference tests/brevitas_examples import/JIT
smoke tests) + loss/logging utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from brevitas_tpu.losses import (
    log_quantizer_bit_widths,
    output_bit_width_weighted_by_ops,
    weight_bit_width_weighted_by_size,
)
from brevitas_tpu.models.mobilenetv1 import quant_mobilenet_v1
from brevitas_tpu.utils import eval_mode, train_mode


def test_mobilenet_v1_forward_and_eval():
    m = quant_mobilenet_v1(bit_width=4, width_scale=0.125, num_classes=10,
                           rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 224, 224, 3),
                                                    dtype=np.float32))
    y = m(x)
    assert y.shape == (2, 10)
    eval_mode(m)
    y2 = m(x)
    assert bool(jnp.all(jnp.isfinite(y2)))
    # per-channel act scaling on the first block
    assert m.features[0].activation.act_quant.per_channel


def test_mobilenet_grad_step():
    import optax

    m = quant_mobilenet_v1(bit_width=4, width_scale=0.125, num_classes=10,
                           rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(m, optax.sgd(0.01), wrt=nnx.Param)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3),
                                                    dtype=np.float32))
    # 32x32 input: skip final 7x7 pool by replacing with 1x1
    m.final_pool.kernel_size = (1, 1)
    m.final_pool.stride = (1, 1)
    y = jnp.asarray([0, 1])

    @nnx.jit
    def step(m, opt, x, y):
        loss, grads = nnx.value_and_grad(
            lambda mm: jnp.mean(
                (mm(x) - jax.nn.one_hot(y, 10)) ** 2))(m)
        opt.update(m, grads)
        return loss

    l0 = float(step(m, opt, x, y))
    l1 = float(step(m, opt, x, y))
    assert np.isfinite(l0) and np.isfinite(l1)


def test_imagenet_val_cli_synthetic():
    from brevitas_tpu.examples.imagenet_val import main

    # tiny width keeps this fast; CLI must produce metrics
    from brevitas_tpu.examples import imagenet_val

    imagenet_val.MODELS["tiny"] = lambda rngs: quant_mobilenet_v1(
        bit_width=4, width_scale=0.125, num_classes=10, rngs=rngs)
    res = main(["--model", "tiny", "--dataset", "synthetic",
                "--batches", "1", "--batch-size", "8", "--num-classes", "10"])
    assert 0.0 <= res["top1"] <= 1.0 and res["images"] == 8


def test_bit_width_losses(rng):
    import brevitas_tpu.nn as qnn
    from brevitas_tpu.quant import presets

    class M(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.l1 = qnn.QuantLinear(
                8, 16, rngs=r,
                weight_quant=presets.Int8WeightPerTensorFloatLearnedBitWidth,
                input_quant=presets.Int8ActPerTensorFloatLearnedBitWidth.let(
                    collect_stats_steps=1))
            self.l2 = qnn.QuantLinear(
                16, 4, rngs=r,
                weight_quant=presets.Int8WeightPerTensorFloatLearnedBitWidth)

        def __call__(self, x):
            return self.l2(self.l1(x))

    m = M()
    loss = weight_bit_width_weighted_by_size(m)
    np.testing.assert_allclose(float(loss), 8.0)
    # loss is differentiable w.r.t. the bit-width offsets
    g = nnx.grad(lambda mm: weight_bit_width_weighted_by_size(mm))(m)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in leaves)
    acc_loss = output_bit_width_weighted_by_ops(m)
    assert float(acc_loss) > 8.0  # accumulators wider than operands
    widths = log_quantizer_bit_widths(m)
    assert any(v == 8.0 for v in widths.values())


def test_mixed_precision_bit_width_learning(rng):
    """Learned bit-widths move under a size-weighted objective — the
    mixed-precision search capability (reference loss/weighted_bit_width.py
    composed with BitWidthParameter)."""
    import optax

    import brevitas_tpu.nn as qnn
    from brevitas_tpu.losses import weight_bit_width_weighted_by_size
    from brevitas_tpu.quant import presets

    class M(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            wq = presets.Int8WeightPerTensorFloatLearnedBitWidth
            self.l1 = qnn.QuantLinear(16, 32, rngs=r, weight_quant=wq)
            self.l2 = qnn.QuantLinear(32, 10, rngs=r, weight_quant=wq)

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    m = M()
    opt = nnx.Optimizer(m, optax.adam(0.05), wrt=nnx.Param)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 16)),
                    jnp.float32)
    y = jax.nn.one_hot(jnp.arange(32) % 10, 10)

    @nnx.jit
    def step(m, opt, x, y):
        def loss_fn(mm):
            task = jnp.mean((mm(x) - y) ** 2)
            size = weight_bit_width_weighted_by_size(mm)
            return task + 0.05 * size

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        opt.update(m, grads)
        return loss

    bw0 = float(m.l1.weight_quant.bit_width_impl())
    for _ in range(30):
        step(m, opt, x, y)
    bw1 = float(m.l1.weight_quant.bit_width_impl())
    assert bw0 == 8.0
    assert bw1 < bw0, f"bit-width did not shrink: {bw1}"
    assert bw1 >= 2.0  # respects min_bit_width floor


def test_eval_mode_freezes_batchnorm_everywhere():
    """Review finding: eval_mode via the shared mixin must switch BN to
    running averages in every model (batch-size-1 inference sanity)."""
    m = quant_mobilenet_v1(bit_width=4, width_scale=0.125, num_classes=10,
                           rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 3),
                                                    dtype=np.float32))
    m.final_pool.kernel_size = (1, 1)
    m.final_pool.stride = (1, 1)
    m(x)  # populate running stats
    m.eval_mode()
    bn = m.features[0].bn
    assert bn.use_running_average is True
    # single-sample inference equals the same sample inside a batch
    y_batch = m(x)
    y_single = m(x[:1])
    np.testing.assert_allclose(y_single, y_batch[:1], rtol=1e-4, atol=1e-5)


def test_proxyless_residual_operands_share_scale():
    from brevitas_tpu.models.proxylessnas import ProxylessUnit

    # construct a tiny unit directly (avoid the full 224 build)
    from brevitas_tpu.models.mobilenetv1 import common_int_act_quant
    import brevitas_tpu.nn as qnn2

    shared = qnn2.QuantIdentity(common_int_act_quant(4),
                                return_quant_tensor=True)
    unit = ProxylessUnit(8, 8, 3, 1, 3, residual=1, shortcut=1, bit_width=4,
                         depthwise_bit_width=4, shared_act=shared,
                         rngs=nnx.Rngs(0))
    # body's projection conv ends in the SAME shared quantizer instance
    assert unit.body.pw_conv.activation is shared
    x = shared(jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 8, 8)).astype(np.float32)))
    y = unit(x)
    assert y.value.shape == (1, 8, 8, 8)


# -- incremental decoding (KV cache) -------------------------------------------


def _decode_equivalence(model, ids):
    """Step-by-step decode logits must match the causal full-seq forward."""
    from brevitas_tpu.utils import eval_mode

    eval_mode(model)
    b, t = ids.shape
    full = np.asarray(model(ids, causal=True))
    caches = model.init_decode_caches(b, t)
    step_logits = []
    for i in range(t):
        logits, caches = model.decode_step(ids[:, i:i + 1], caches, i)
        step_logits.append(np.asarray(logits[:, 0]))
    return full, np.stack(step_logits, axis=1)


def test_transformer_decode_matches_full_forward(rng):
    from brevitas_tpu.models.transformer import quant_transformer_tiny

    model = quant_transformer_tiny(vocab_size=50, max_len=16,
                                   rngs=nnx.Rngs(0))
    ids = jnp.asarray(rng.integers(0, 50, (2, 8)).astype(np.int32))
    for _ in range(35):  # collect act stats past the two-phase window
        model(ids)
    full, stepped = _decode_equivalence(model, ids)
    np.testing.assert_allclose(stepped, full, rtol=1e-4, atol=1e-4)


def test_transformer_int8_decode_matches_full_forward(rng):
    """After convert_integer_inference the decode path runs on an int8 KV
    cache and must still track the converted model's full forward."""
    from brevitas_tpu.graph import convert_integer_inference
    from brevitas_tpu.graph.convert_int import Int8InferenceAttention
    from brevitas_tpu.models.transformer import quant_transformer_tiny
    from brevitas_tpu.utils import eval_mode

    model = quant_transformer_tiny(vocab_size=50, max_len=16,
                                   rngs=nnx.Rngs(0))
    ids = jnp.asarray(rng.integers(0, 50, (2, 8)).astype(np.int32))
    for _ in range(35):
        model(ids)
    eval_mode(model)
    convert_integer_inference(model)
    assert isinstance(model.blocks[0].attn, Int8InferenceAttention)
    kc, vc = model.init_decode_caches(2, 8)[0]
    assert kc.dtype == jnp.int8  # the memory win
    full, stepped = _decode_equivalence(model, ids)
    np.testing.assert_allclose(stepped, full, rtol=1e-3, atol=1e-3)


def test_transformer_generate_greedy(rng):
    from brevitas_tpu.models.transformer import quant_transformer_tiny

    model = quant_transformer_tiny(vocab_size=50, max_len=32,
                                   rngs=nnx.Rngs(0))
    ids = jnp.asarray(rng.integers(0, 50, (2, 4)).astype(np.int32))
    for _ in range(35):
        model(ids)
    from brevitas_tpu.utils import eval_mode

    eval_mode(model)
    out = model.generate(ids, num_tokens=5)
    assert out.shape == (2, 5)
    assert int(out.min()) >= 0 and int(out.max()) < 50
