"""Int4-packed KV cache decode (kernels/int8_attention.py int4kv_*,
Int8InferenceAttention.kv_int4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.graph.convert_int import Int8InferenceAttention
from brevitas_tpu.kernels import (
    int4kv_decode_attention,
    int8_decode_attention,
    pack_kv_halves,
    unpack_kv_halves,
    update_kv_packed,
)
from brevitas_tpu.nn import QuantMultiheadAttention
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


@pytest.fixture(autouse=True)
def force_int4_kv_packing():
    """These tests exercise the PACKED path on tiny heads; the default
    "auto" policy only packs at the kernel's measured win boundary
    (head_dim >= 128) — force packing, restore after."""
    import brevitas_tpu.config as cfg

    prev = cfg.INT4_KV_CACHE
    cfg.INT4_KV_CACHE = "1"
    yield
    cfg.INT4_KV_CACHE = prev


def test_auto_policy_packs_only_at_measured_boundary(rng):
    """Default "auto": head_dim below INT4_KV_MIN_HEAD_DIM stays unpacked
    (int8 decode measured faster there, PERF.md); "0" never packs."""
    import brevitas_tpu.config as cfg

    mha, _ = _calibrated_mha(rng, kv_bits=4)  # head_dim 32
    cfg.INT4_KV_CACHE = "auto"
    assert not Int8InferenceAttention(mha).kv_int4
    prev_dim = cfg.INT4_KV_MIN_HEAD_DIM
    cfg.INT4_KV_MIN_HEAD_DIM = 32  # pretend the boundary sits at this size
    try:
        assert Int8InferenceAttention(mha).kv_int4
    finally:
        cfg.INT4_KV_MIN_HEAD_DIM = prev_dim
    cfg.INT4_KV_CACHE = "0"
    assert not Int8InferenceAttention(mha).kv_int4


def test_pack_unpack_roundtrip(rng):
    codes = rng.integers(-8, 8, (4, 96, 64)).astype(np.int8)
    packed = pack_kv_halves(jnp.asarray(codes), l_half=128)
    assert packed.shape == (4, 128, 64)
    out = np.asarray(unpack_kv_halves(packed))[:, :96]
    np.testing.assert_array_equal(out, codes)


def test_incremental_update_matches_bulk_pack(rng):
    codes = rng.integers(-8, 8, (2, 60, 32)).astype(np.int8)
    bulk = pack_kv_halves(jnp.asarray(codes), l_half=32)
    inc = jnp.zeros((2, 32, 32), jnp.int8)
    for t in range(60):
        inc = update_kv_packed(inc, jnp.asarray(codes[:, t:t + 1]), t)
    np.testing.assert_array_equal(np.asarray(inc), np.asarray(bulk))


def test_update_preserves_sibling_nibble(rng):
    """Writing position p must not disturb position p ± l_half."""
    l_half = 16
    a = rng.integers(-8, 8, (1, 1, 8)).astype(np.int8)
    b = rng.integers(-8, 8, (1, 1, 8)).astype(np.int8)
    cache = jnp.zeros((1, l_half, 8), jnp.int8)
    cache = update_kv_packed(cache, jnp.asarray(a), 3)           # low nibble
    cache = update_kv_packed(cache, jnp.asarray(b), 3 + l_half)  # high nibble
    out = np.asarray(unpack_kv_halves(cache))
    np.testing.assert_array_equal(out[:, 3], a[:, 0])
    np.testing.assert_array_equal(out[:, 3 + l_half], b[:, 0])


@pytest.mark.parametrize("pos", [0, 17, 95])
def test_int4kv_decode_matches_int8_decode(rng, pos):
    BH, L, D = 4, 96, 64
    ck = rng.integers(-8, 8, (BH, L, D)).astype(np.int8)
    cv = rng.integers(-8, 8, (BH, L, D)).astype(np.int8)
    q = jnp.asarray(rng.integers(-127, 128, (BH, 1, D)).astype(np.int8))
    ref = int8_decode_attention(q, jnp.asarray(ck), jnp.asarray(cv), pos,
                                0.02, 0.1, 0.1, 1 / 255.0, head_dim=D)
    kp = pack_kv_halves(jnp.asarray(ck), l_half=64)
    vp = pack_kv_halves(jnp.asarray(cv), l_half=64)
    out = int4kv_decode_attention(q, kp, vp, pos, 0.02, 0.1, 0.1, 1 / 255.0,
                                  head_dim=D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_int4kv_pallas_kernel_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    BH, L, D = 2, 256, 64
    ck = rng.integers(-8, 8, (BH, L, D)).astype(np.int8)
    cv = rng.integers(-8, 8, (BH, L, D)).astype(np.int8)
    q = jnp.asarray(rng.integers(-127, 128, (BH, 1, D)).astype(np.int8))
    kp = pack_kv_halves(jnp.asarray(ck), l_half=128)
    vp = pack_kv_halves(jnp.asarray(cv), l_half=128)
    args = (0.02, 0.1, 0.1, 1 / 255.0)
    ref = int4kv_decode_attention(q, kp, vp, L - 1, *args, head_dim=D,
                                  use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        out = int4kv_decode_attention(q, kp, vp, L - 1, *args, head_dim=D,
                                      use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _calibrated_mha(rng, kv_bits):
    E, H = 64, 2
    kv = presets.Int8ActPerTensorFloat.let(bit_width=kv_bits,
                                           collect_stats_steps=2)
    a8 = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)
    mha = QuantMultiheadAttention(
        E, H, weight_quant=presets.Int8WeightPerChannelFloat,
        in_proj_input_quant=a8.let(), q_quant=a8.let(),
        k_quant=kv.let(), v_quant=kv.let(),
        attn_probs_quant=presets.Uint8ActPerTensorFloat.let(
            collect_stats_steps=2),
        out_proj_input_quant=a8.let(), rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 12, E)).astype(np.float32))
    with G.calibration_mode(mha):
        mha(x, causal=True)
        mha(x * 0.7, causal=True)
    eval_mode(mha)
    return mha, x


def test_serving_twin_int4_cache_exact(rng):
    mha, x = _calibrated_mha(rng, kv_bits=4)
    twin = Int8InferenceAttention(mha)
    assert twin.kv_int4
    kc_f, vc_f = mha.init_decode_cache(2, 16)
    kc_i, vc_i = twin.init_decode_cache(2, 16)
    # short cache: ceil(16/2) packed rows, no 128-padding
    assert kc_i.shape == (4, 8, 32)
    for t in range(12):
        xt = x[:, t:t + 1]
        yf, kc_f, vc_f = mha.decode_step(xt, kc_f, vc_f, t)
        yi, kc_i, vc_i = twin.decode_step(xt, kc_i, vc_i, t)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yi), atol=1e-4)


def test_serving_twin_int8_kv_stays_unpacked(rng):
    mha, _ = _calibrated_mha(rng, kv_bits=8)
    twin = Int8InferenceAttention(mha)
    assert not twin.kv_int4
    kc, _ = twin.init_decode_cache(2, 16)
    assert kc.shape == (4, 16, 32)  # one position per byte


def test_serving_twin_long_cache_is_kernel_aligned(rng):
    mha, _ = _calibrated_mha(rng, kv_bits=4)
    twin = Int8InferenceAttention(mha)
    kc, _ = twin.init_decode_cache(1, 1000)
    assert kc.shape[1] % 128 == 0  # Pallas-eligible split half


def test_llm_ptq_kv_bits_pipeline(rng):
    """The LLM PTQ CLI with quantized attention + 4-bit KV: bpc stays near
    float and the converted attention packs its decode cache."""
    from brevitas_tpu.examples.llm_ptq import main

    r = main(["--train-steps", "40", "--depth", "1", "--dim", "32",
              "--heads", "2", "--seq-len", "32", "--batch", "16",
              "--kv-bits", "4", "--convert-int"])
    assert r["quant_bpc"] < r["float_bpc"] + 0.1
    assert r["served_bpc"] < r["float_bpc"] + 0.1
