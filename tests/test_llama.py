"""QuantLlama (RMSNorm + RoPE + SwiGLU) — QAT, PTQ, decode, serving."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.models import (
    QuantLlama,
    llama_smoothquant_regions,
    quant_llama_tiny,
)
from brevitas_tpu.utils import eval_mode


def _tiny(bit_width=8, **kw):
    kw.setdefault("vocab_size", 64)
    kw.setdefault("dim", 32)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 2)
    return QuantLlama(bit_width=bit_width, rngs=nnx.Rngs(0), **kw)


def test_rope_rotation_invariants():
    """apply_rope preserves pairwise norms and makes scores depend only on
    relative position: <rope(q,i), rope(k,j)> == <rope(q,i+s), rope(k,j+s)>."""
    from brevitas_tpu.nn.attention import apply_rope

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 1, 1, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 1, 16)).astype(np.float32))
    # norm preservation
    r = apply_rope(q, jnp.asarray([5]))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(r)),
                               np.linalg.norm(np.asarray(q)), rtol=1e-5)
    # relative-position property
    def score(i, j):
        qi = apply_rope(q, jnp.asarray([i]))
        kj = apply_rope(k, jnp.asarray([j]))
        return float(jnp.sum(qi * kj))

    np.testing.assert_allclose(score(3, 7), score(10, 14), rtol=1e-4)
    assert abs(score(3, 7) - score(3, 9)) > 1e-6  # but not position-blind


def test_llama_forward_and_qat_step(rng):
    m = _tiny(bit_width=4)
    ids = jnp.asarray(rng.integers(0, 64, (2, 12)))
    logits = m(ids)
    assert logits.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(logits)).all()

    opt = nnx.Optimizer(m, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(m, opt, x, y):
        loss, grads = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(m)
        opt.update(m, grads)
        return loss

    y = jnp.asarray(rng.integers(0, 64, (2, 12)))
    l0 = float(step(m, opt, ids, y))
    for _ in range(5):
        l1 = float(step(m, opt, ids, y))
    assert np.isfinite(l0) and l1 < l0


def test_llama_decode_matches_full_forward(rng):
    """KV-cache decode with RoPE reproduces the causal full-sequence forward
    position by position."""
    m = _tiny()
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)))
    m(ids)  # collect act stats
    eval_mode(m)
    full = np.asarray(m(ids, causal=True))
    caches = m.init_decode_caches(2, 8)
    for t in range(8):
        logits_t, caches = m.decode_step(ids[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]), full[:, t],
                                   atol=1e-4, rtol=1e-4)


def test_llama_smoothquant_preserves_function(rng):
    m = _tiny()
    ids = jnp.asarray(rng.integers(0, 64, (2, 10)))
    m(ids)
    eval_mode(m)
    # disable quant for an exactness check of the migration itself
    from brevitas_tpu.graph.calibrate import _set_disable_quant

    _set_disable_quant(m, True)
    y0 = np.asarray(m(ids))
    G.apply_act_equalization(m, llama_smoothquant_regions(m), [ids],
                             alpha=0.5, forward_fn=lambda mm, b: mm(b))
    # apply_act_equalization restores quantization on exit; bypass again for
    # an exactness check of the migration itself
    _set_disable_quant(m, True)
    y1 = np.asarray(m(ids))
    _set_disable_quant(m, False)
    np.testing.assert_allclose(y1, y0, rtol=1e-3, atol=1e-4)


def test_llama_int8_serving_twin_matches_and_decodes(rng):
    m = _tiny()
    ids = jnp.asarray(rng.integers(0, 64, (2, 10)))
    with G.calibration_mode(m):
        m(ids)
        m(ids[:, ::-1])
    eval_mode(m)
    y_fake = np.asarray(m(ids, causal=True))
    G.convert_integer_inference(m)
    assert type(m.blocks[0].attn).__name__ == "Int8InferenceAttention"
    assert m.blocks[0].attn.use_rope
    y_int = np.asarray(m(ids, causal=True))
    span = np.max(np.abs(y_fake)) + 1e-6
    assert np.max(np.abs(y_int - y_fake)) < 0.1 * span, (
        np.max(np.abs(y_int - y_fake)), span)

    # greedy generation through the int8 (rope-aware) decode path
    out = m.generate(ids[:, :4], num_tokens=5)
    assert out.shape == (2, 5)
    # decode agrees with the full forward on the serving twin too
    full = np.asarray(m(ids, causal=True))
    caches = m.init_decode_caches(2, 10)
    for t in range(4):
        logits_t, caches = m.decode_step(ids[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]), full[:, t],
                                   atol=1e-4, rtol=1e-4)


def test_llm_ptq_cli_llama_smoke():
    from brevitas_tpu.examples.llm_ptq import main

    res = main(["--arch", "llama", "--train-steps", "8", "--batch", "8",
                "--seq-len", "24", "--dim", "32", "--depth", "1",
                "--heads", "2", "--calib-batches", "2", "--convert-int",
                "--kv-bits", "4"])
    assert res["arch"] == "llama"
    assert np.isfinite(res["float_bpc"]) and np.isfinite(res["quant_bpc"])
    assert res["served_bpc"] is not None and np.isfinite(res["served_bpc"])
    # PTQ int8 should stay within ~1.5 bits/char of float on this tiny setup
    assert res["quant_bpc"] < res["float_bpc"] + 1.5


def test_llama_gqa_decode_and_serving(rng):
    """Grouped-query attention: 4 query heads sharing 2 KV heads — the KV
    cache is half-size, decode matches the full forward, and the int8
    serving twin (cache at KV heads, codes expanded at attention time)
    reproduces the fake-quant model."""
    m = _tiny(num_heads=4, num_kv_heads=2)
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)))
    with G.calibration_mode(m):
        m(ids)
        m(ids[:, ::-1])
    eval_mode(m)

    # fake-quant: cache holds only KV heads
    caches = m.init_decode_caches(2, 8)
    assert caches[0][0].shape == (2, 8, 2, 8)  # (B, L, KVH, D)
    full = np.asarray(m(ids, causal=True))
    for t in range(8):
        logits_t, caches = m.decode_step(ids[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]), full[:, t],
                                   atol=1e-4, rtol=1e-4)

    y_fake = np.asarray(m(ids, causal=True))
    G.convert_integer_inference(m)
    twin = m.blocks[0].attn
    assert twin.num_kv_heads == 2
    y_int = np.asarray(m(ids, causal=True))
    span = np.max(np.abs(y_fake)) + 1e-6
    assert np.max(np.abs(y_int - y_fake)) < 0.1 * span

    # int8 serving decode: cache at KV heads (B*KVH, L, D)
    caches = m.init_decode_caches(2, 8)
    assert caches[0][0].shape == (4, 8, 8)
    full = np.asarray(m(ids, causal=True))
    for t in range(6):
        logits_t, caches = m.decode_step(ids[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]), full[:, t],
                                   atol=1e-4, rtol=1e-4)


def test_llama_gqa_int4_kv_cache(rng):
    """GQA composes with int4 KV packing: the packed cache stores KV heads
    only (2x from packing x H/KVH from GQA) and decode stays exact vs the
    full forward."""
    import brevitas_tpu.quant.presets as presets

    kv = presets.Int8ActPerTensorFloat.let(bit_width=4.0,
                                           collect_stats_steps=2)
    m = _tiny(num_heads=4, num_kv_heads=2)
    # swap K/V quantizers to 4-bit so the serving twin packs the cache
    from brevitas_tpu.quant.quantizers import ActQuantizer

    for blk in m.blocks:
        blk.attn.k_quant = ActQuantizer(kv.let())
        blk.attn.v_quant = ActQuantizer(kv.let())
        # explicit packing intent (the "auto" policy only packs at the
        # measured head_dim boundary; QuantLlama(kv_bit_width=4) sets this)
        blk.attn.kv_pack_requested = True
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)))
    with G.calibration_mode(m):
        m(ids)
        m(ids[:, ::-1])
    eval_mode(m)
    G.convert_integer_inference(m)
    twin = m.blocks[0].attn
    assert twin.kv_int4 and twin.num_kv_heads == 2
    caches = m.init_decode_caches(2, 16)
    # packed: (B*KVH, ceil(16/2), D) = (4, 8, 8)
    assert caches[0][0].shape == (4, 8, 8)
    full = np.asarray(m(ids, causal=True))
    for t in range(8):
        logits_t, caches = m.decode_step(ids[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]), full[:, t],
                                   atol=1e-4, rtol=1e-4)


def test_llama_kv_bit_width_option(rng):
    """First-class 4-bit KV: QuantLlama(kv_bit_width=4) trains a nibble K/V
    grid and the serving twin auto-packs the decode cache (the manual
    quantizer-swap path above, as a constructor option)."""
    m = _tiny(kv_bit_width=4)
    for blk in m.blocks:
        assert float(blk.attn.k_quant.cfg.bit_width) == 4.0
        assert float(blk.attn.v_quant.cfg.bit_width) == 4.0
        assert float(blk.attn.q_quant.cfg.bit_width) == 8.0
    ids = jnp.asarray(rng.integers(0, 64, (2, 8)))
    with G.calibration_mode(m):
        m(ids)
        m(ids[:, ::-1])
    eval_mode(m)
    G.convert_integer_inference(m)
    assert m.blocks[0].attn.kv_int4
    caches = m.init_decode_caches(2, 16)
    full = np.asarray(m(ids, causal=True))
    for t in range(8):
        logits_t, caches = m.decode_step(ids[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]), full[:, t],
                                   atol=1e-4, rtol=1e-4)
