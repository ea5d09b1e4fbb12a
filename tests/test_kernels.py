"""Pallas kernel tests vs jnp references — run in interpret mode on CPU
(the TPU path is exercised by bench.py on real hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from brevitas_tpu.kernels import (
    fake_quant,
    fake_quant_reference,
    int8_matmul,
    int8_matmul_reference,
)


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_fake_quant_fwd_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((40, 100)).astype(np.float32))
    s, z = jnp.asarray(0.05), jnp.asarray(3.0)
    got = fake_quant(x, s, z, -128.0, 127.0)
    want = fake_quant_reference(x, s, z, lo=-128.0, hi=127.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fake_quant_grads_match_reference(rng):
    x = jnp.asarray(rng.standard_normal(700).astype(np.float32) * 8)
    s, z = jnp.asarray(0.05), jnp.asarray(0.0)

    def loss_k(x, s, z):
        return jnp.sum(fake_quant(x, s, z, -8.0, 7.0) ** 2)

    def loss_r(x, s, z):
        return jnp.sum(fake_quant_reference(x, s, z, lo=-8.0, hi=7.0) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, s, z)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, s, z)
    for a, b, name in zip(gk, gr, "x s z".split()):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad {name}")


def test_fake_quant_ste_clamp_grad(rng):
    x = jnp.asarray(rng.standard_normal(300).astype(np.float32) * 8)
    s, z = jnp.asarray(0.05), jnp.asarray(0.0)
    gx = jax.grad(lambda v: jnp.sum(
        fake_quant(v, s, z, -8.0, 7.0, True)))(x)
    np.testing.assert_allclose(gx, np.ones_like(gx))


def test_fake_quant_odd_shapes(rng):
    # shapes that don't align to (8, 128) tiles
    for shape in [(3,), (5, 7), (1, 129), (17, 3, 5)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = fake_quant(x, jnp.asarray(0.1), jnp.asarray(0.0), -8.0, 7.0)
        want = fake_quant_reference(x, jnp.asarray(0.1), jnp.asarray(0.0),
                                    lo=-8.0, hi=7.0)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_int8_matmul_matches_reference(rng):
    x = jnp.asarray(rng.integers(-128, 128, (64, 96)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (96, 48)), jnp.int8)
    xs = jnp.asarray(0.02)
    ws = jnp.asarray(rng.random(48).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    got = int8_matmul(x, w, xs, ws, b, act="relu")
    want = int8_matmul_reference(x, w, xs, ws, b, act="relu")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_matmul_no_bias_scalar_scale(rng):
    x = jnp.asarray(rng.integers(-8, 8, (10, 300)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, (300, 5)), jnp.int8)
    got = int8_matmul(x, w, jnp.asarray(0.1), jnp.asarray(0.5))
    want = int8_matmul_reference(x, w, jnp.asarray(0.1), jnp.asarray(0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_int8_matmul_kblocked_large_k(rng):
    """K > single-pass threshold exercises the blocked-accumulation path."""
    import brevitas_tpu.kernels.int_matmul as im

    old = im._BK_SINGLE, im._BK
    im._BK_SINGLE, im._BK = 128, 128  # force K-blocking at test scale
    try:
        x = jnp.asarray(rng.integers(-128, 128, (64, 300)), jnp.int8)
        w = jnp.asarray(rng.integers(-128, 128, (300, 48)), jnp.int8)
        ws = jnp.asarray(rng.random(48).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
        got = int8_matmul(x, w, jnp.asarray(0.02), ws, b, act="relu")
        want = int8_matmul_reference(x, w, jnp.asarray(0.02), ws, b, act="relu")
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        im._BK_SINGLE, im._BK = old


def test_int4_pack_roundtrip(rng):
    from brevitas_tpu.kernels.int4 import (
        pack_int4,
        pack_int4_np,
        unpack_int4,
        unpack_int4_np,
    )

    v = rng.integers(-8, 8, (6, 10)).astype(np.int8)
    packed = pack_int4_np(v)
    assert packed.shape == (6, 5)
    np.testing.assert_array_equal(unpack_int4_np(packed), v)
    # jnp twins agree
    np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(jnp.asarray(v)))), v)


def test_native_export_int4_packing(tmp_path, rng):
    from flax import nnx

    import brevitas_tpu.nn as qnn
    from brevitas_tpu.export import export_native, load_native
    from brevitas_tpu.quant import presets

    layer = qnn.QuantLinear(8, 6, rngs=nnx.Rngs(0),
                            weight_quant=presets.Int4WeightPerTensorFloat)

    class Holder(nnx.Module):
        def __init__(self, l):
            self.l = l

        def __call__(self, x):
            return self.l(x)

    m = Holder(layer)
    path = str(tmp_path / "m4.npz")
    export_native(m, path)
    loaded = load_native(path)
    entry = loaded["l"]
    assert entry["meta"]["int4_packed"]
    assert entry["w_int"].shape == (8, 6)  # unpacked on load
    qw = layer.quant_weight()
    np.testing.assert_allclose(
        entry["w_int"].astype(np.float32) * entry["w_scale"],
        np.asarray(qw.value), rtol=1e-5, atol=1e-6)


def test_fake_quant_multiblock_grads(rng):
    """Ragged multi-block grids must not fold padding into dscale/dzp."""
    n = 1000 * 128  # rows=1000: >1 block of 512 and not a block multiple
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 4)
    s, z = jnp.asarray(0.05), jnp.asarray(1.0)
    gk = jax.grad(lambda *a: jnp.sum(fake_quant(*a, -8.0, 7.0) ** 2),
                  argnums=(0, 1, 2))(x, s, z)
    gr = jax.grad(lambda *a: jnp.sum(
        fake_quant_reference(*a, lo=-8.0, hi=7.0) ** 2),
        argnums=(0, 1, 2))(x, s, z)
    for a, b, name in zip(gk, gr, "x s z".split()):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=f"grad {name}")


def test_fake_quant_ste_clamp_scale_zp_grads(rng):
    """ste_clamp=True must match the reference's STE-clamp scale/zp grads."""
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 8)
    s, z = jnp.asarray(0.05), jnp.asarray(0.5)
    gk = jax.grad(lambda *a: jnp.sum(fake_quant(*a, -8.0, 7.0, True)),
                  argnums=(0, 1, 2))(x, s, z)
    gr = jax.grad(lambda *a: jnp.sum(
        fake_quant_reference(*a, lo=-8.0, hi=7.0, ste_clamp=True)),
        argnums=(0, 1, 2))(x, s, z)
    for a, b, name in zip(gk, gr, "x s z".split()):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad {name}")


# -- int8 fused attention ------------------------------------------------------


def _attn_inputs(rng, bh=4, t=50, d=16):
    q = jnp.asarray(rng.integers(-128, 128, (bh, t, d)).astype(np.int8))
    k = jnp.asarray(rng.integers(-128, 128, (bh, t, d)).astype(np.int8))
    v = jnp.asarray(rng.integers(-128, 128, (bh, t, d)).astype(np.int8))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_int8_attention_matches_reference(causal, rng):
    from brevitas_tpu.kernels import int8_attention, int8_attention_reference

    q, k, v = _attn_inputs(rng)
    args = dict(qk_scale=0.02 / 4.0, p_scale=1 / 255.0, v_scale=0.05,
                causal=causal)
    want = int8_attention_reference(q, k, v, **args)
    got = int8_attention(q, k, v, block_q=32, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_quant_attention_serving_matches_model(rng):
    """The fused serving path reproduces QuantMultiheadAttention's eval
    attention core (fake-quant QKV → softmax → uint8 probs → PV)."""
    import math

    from brevitas_tpu.kernels import quant_attention_serving

    b, h, t, d = 2, 2, 9, 8
    q_s, k_s, v_s, p_s = 0.031, 0.027, 0.044, 1 / 255.0
    rng_ = np.random.default_rng(0)
    q = jnp.asarray((rng_.integers(-127, 128, (b, h, t, d)) * q_s).astype(np.float32))
    k = jnp.asarray((rng_.integers(-127, 128, (b, h, t, d)) * k_s).astype(np.float32))
    v = jnp.asarray((rng_.integers(-127, 128, (b, h, t, d)) * v_s).astype(np.float32))

    # model-side eval numerics (nn/attention.py forward, probs in uint8 grid)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    probs = jax.nn.softmax(scores, axis=-1)
    probs_q = jnp.clip(jnp.round(probs / p_s), 0, 255) * p_s
    want = jnp.einsum("bhqk,bhkd->bhqd", probs_q, v)

    got = quant_attention_serving(q, k, v, q_s, k_s, v_s, p_s, head_dim=d,
                                  use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_int8_inference_attention_matches_fake_quant(rng):
    """convert_integer_inference swaps QuantMultiheadAttention for the int8
    serving twin whose output tracks the fake-quant model."""
    from brevitas_tpu.graph import Int8InferenceAttention, convert_integer_inference
    from brevitas_tpu.nn import QuantMultiheadAttention
    from brevitas_tpu.quant import presets
    from brevitas_tpu.utils import eval_mode
    from flax import nnx

    class Net(nnx.Module):
        def __init__(self):
            self.attn = QuantMultiheadAttention(16, 2, rngs=nnx.Rngs(0))

        def __call__(self, x, causal=False):
            return self.attn(x, causal=causal)

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    for _ in range(35):  # collect act stats past the default two-phase window
        m(x)
    eval_mode(m)
    y_fake = np.asarray(m(x, causal=True))
    convert_integer_inference(m)
    assert isinstance(m.attn, Int8InferenceAttention)
    y_int = np.asarray(m(x, causal=True))
    # tolerance: a few quanta of the out-projection input scale
    tol = 4.0 * float(np.asarray(m.attn.out_proj.x_scale))
    np.testing.assert_allclose(y_int, y_fake, atol=tol)


def test_int8_attention_cross_attention_and_rect_causal(rng):
    """kv length != q length: reference and pallas agree, including the
    rectangular causal mask (tril offset Tk - Tq)."""
    from brevitas_tpu.kernels import int8_attention, int8_attention_reference

    bh, tq, tk, d = 3, 20, 44, 16
    q = jnp.asarray(rng.integers(-128, 128, (bh, tq, d)).astype(np.int8))
    k = jnp.asarray(rng.integers(-128, 128, (bh, tk, d)).astype(np.int8))
    v = jnp.asarray(rng.integers(-128, 128, (bh, tk, d)).astype(np.int8))
    for causal in (False, True):
        args = dict(qk_scale=0.005, p_scale=1 / 255.0, v_scale=0.05,
                    causal=causal)
        want = int8_attention_reference(q, k, v, **args)
        got = int8_attention(q, k, v, block_q=16, **args)
        assert want.shape == (bh, tq, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_int8_inference_attention_cross_attention(rng):
    """Regression: the serving twin must handle kv with a different length
    than the query (was reshaping k/v with q's sequence length)."""
    from brevitas_tpu.graph import convert_integer_inference
    from brevitas_tpu.nn import QuantMultiheadAttention
    from brevitas_tpu.utils import eval_mode
    from flax import nnx

    class Net(nnx.Module):
        def __init__(self):
            self.attn = QuantMultiheadAttention(16, 2, rngs=nnx.Rngs(0))

        def __call__(self, x, kv):
            return self.attn(x, kv=kv)

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    for _ in range(35):
        m(x, kv)
    eval_mode(m)
    y_fake = np.asarray(m(x, kv))
    convert_integer_inference(m)
    y_int = np.asarray(m(x, kv))
    assert y_int.shape == y_fake.shape
    tol = 4.0 * float(np.asarray(m.attn.out_proj.x_scale))
    np.testing.assert_allclose(y_int, y_fake, atol=tol)


# -- int4 packed decode GEMM ---------------------------------------------------


def test_int4_matmul_matches_reference_and_int8(rng):
    from brevitas_tpu.kernels import (int4_matmul, int4_matmul_reference,
                                      pack_int4_rows)

    M, K, N = 5, 1024, 512
    x = jnp.asarray(rng.integers(-8, 8, (M, K)).astype(np.int8))
    w = jnp.asarray(rng.integers(-8, 8, (K, N)).astype(np.int8))
    wp = pack_int4_rows(w)
    ws = jnp.asarray(rng.random(N).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.random(N).astype(np.float32))
    want = np.maximum(
        (np.asarray(x, np.int64) @ np.asarray(w, np.int64)).astype(np.float32)
        * 0.07 * np.asarray(ws)[None] + np.asarray(b)[None], 0)
    got_ref = int4_matmul_reference(x, wp, 0.07, ws, b, act="relu")
    np.testing.assert_allclose(np.asarray(got_ref), want, rtol=1e-5, atol=1e-4)
    got = int4_matmul(x, wp, 0.07, ws, b, act="relu")  # interpret mode fixture
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_int8_inference_linear_uses_int4_packed(rng):
    """A 4-bit QuantLinear serving twin stores packed weights (half the
    bytes) and still matches the fake-quant layer."""
    import brevitas_tpu.nn as qnn
    from brevitas_tpu.graph import Int8InferenceLinear
    from brevitas_tpu.quant import presets
    from flax import nnx

    layer = qnn.QuantLinear(
        512, 512, rngs=nnx.Rngs(0), use_bias=True,
        weight_quant=presets.Int4WeightPerTensorFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1,
                                                      bit_width=4.0))
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    layer(x)
    layer.eval_mode()
    y_fake = np.asarray(layer(x))
    twin = Int8InferenceLinear(layer)
    assert twin.w_packed is not None and twin.w_int is None
    assert twin.w_packed.shape == (256, 512)
    y_int = np.asarray(twin(x))  # CPU → int4_matmul_reference path
    np.testing.assert_allclose(y_int, y_fake, rtol=1e-3, atol=1e-3)


# ---- fused quantized-LSTM cell (kernels/lstm_cell.py) -----------------------


def _lstm_cell_ref(gates, c, sa, ss, st, sc, sth, sh, H, bounds):
    """jnp twin of the fused cell (the rnn.py _fused_scan composition)."""
    from brevitas_tpu.ops import round_ste, tensor_clamp

    def fq(x, s, lo, hi):
        q = round_ste(x / s)
        return tensor_clamp(q, jnp.asarray(float(lo)),
                            jnp.asarray(float(hi))) * s

    ga = fq(gates, sa, *bounds[0])
    i_a, f_a = ga[:, :H], ga[:, H:2 * H]
    g_a, o_a = ga[:, 2 * H:3 * H], ga[:, 3 * H:]
    i_t = fq(jax.nn.sigmoid(i_a), ss[:H], *bounds[1])
    f_t = fq(jax.nn.sigmoid(f_a), ss[H:2 * H], *bounds[1])
    o_t = fq(jax.nn.sigmoid(o_a), ss[2 * H:], *bounds[1])
    g_t = fq(jnp.tanh(g_a), st, *bounds[2])
    c_new = fq(f_t * c + i_t * g_t, sc, *bounds[3])
    th = fq(jnp.tanh(c_new), sth, *bounds[4])
    return fq(o_t * th, sh, *bounds[5]), c_new


_CELL_BOUNDS = ((-128, 127), (0, 255), (-128, 127), (-128, 127),
                (-128, 127), (-128, 127))


def _cell_args(rng, B=8, H=128):
    return (
        jnp.asarray(rng.standard_normal((B, 4 * H)).astype(np.float32) * 2),
        jnp.asarray(rng.standard_normal((B, H)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.01, 0.05, (4 * H,)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.002, 0.01, (3 * H,)).astype(np.float32)),
        jnp.asarray(0.008, jnp.float32), jnp.asarray(0.02, jnp.float32),
        jnp.asarray(0.008, jnp.float32), jnp.asarray(0.008, jnp.float32))


def test_lstm_cell_kernel_forward_exact(rng):
    import functools

    from brevitas_tpu.kernels.lstm_cell import quant_lstm_cell

    args = _cell_args(rng)
    H = 128
    cell = functools.partial(quant_lstm_cell, hidden=H,
                             bounds=_CELL_BOUNDS, interpret=True)
    h_k, c_k = cell(*args)
    h_r, c_r = _lstm_cell_ref(*args, H, _CELL_BOUNDS)
    np.testing.assert_array_equal(np.asarray(h_k), np.asarray(h_r))
    np.testing.assert_array_equal(np.asarray(c_k), np.asarray(c_r))


def test_lstm_cell_kernel_grads_match_reference(rng):
    """Input grads match to f32 noise; scale grads match within the f32
    reduction-order noise floor (the kernel's single-pass sums measured
    CLOSER to an f64 ground truth than jax.grad of the f32 jnp chain)."""
    import functools

    from brevitas_tpu.kernels.lstm_cell import quant_lstm_cell

    args = _cell_args(rng)
    H = 128
    cell = functools.partial(quant_lstm_cell, hidden=H,
                             bounds=_CELL_BOUNDS, interpret=True)

    def loss_k(*a):
        h, cn = cell(*a)
        return jnp.sum(h ** 2) + jnp.sum(jnp.sin(cn))

    def loss_r(*a):
        h, cn = _lstm_cell_ref(*a, H, _CELL_BOUNDS)
        return jnp.sum(h ** 2) + jnp.sum(jnp.sin(cn))

    gk = jax.grad(loss_k, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(8)))(*args)
    for idx, (a, b) in enumerate(zip(gk[:2], gr[:2])):  # gates, c: tight
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(gk[2:], gr[2:]):  # scale sums: f32 cancellation noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-2)


def test_lstm_fused_scan_uses_pallas_cell_and_matches(rng):
    """End-to-end: the QuantLSTM fused path through the Pallas cell
    (interpret mode) equals the jnp fused path."""
    import brevitas_tpu.config as cfg
    from flax import nnx
    from brevitas_tpu.nn import QuantLSTM
    from brevitas_tpu.quant import presets
    from brevitas_tpu.quant.quantizers import (
        convert_runtime_stats_to_parameter,
    )

    fast = dict(collect_stats_steps=1)
    act = presets.Int8ActPerTensorFloat.let(**fast)
    uact = presets.Uint8ActPerTensorFloat.let(**fast)
    lstm = QuantLSTM(8, 128, io_quant=act, gate_acc_quant=act.let(),
                     sigmoid_quant=uact, tanh_quant=act.let(),
                     cell_state_quant=act.let(), rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((8, 6, 8)).astype(np.float32))
    lstm(x)
    convert_runtime_stats_to_parameter(lstm)
    layer = lstm.layers[0]
    stages = layer._fused_cell_params()
    assert stages is not None

    prev_interp, prev_cell = cfg.PALLAS_INTERPRET, cfg.PALLAS_RNN_CELL
    try:
        cfg.PALLAS_INTERPRET = True
        cfg.PALLAS_RNN_CELL = True
        assert layer._pallas_cell_args(stages, 8, jnp.float32) is not None
        y_pallas, _ = lstm(x)
        cfg.PALLAS_RNN_CELL = False
        y_jnp, _ = lstm(x)
    finally:
        cfg.PALLAS_INTERPRET = prev_interp
        cfg.PALLAS_RNN_CELL = prev_cell
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_jnp),
                               rtol=1e-6, atol=1e-6)
