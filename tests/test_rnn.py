"""Quant RNN/LSTM tests (mirror of reference tests/brevitas/nn/test_recurrent.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from brevitas_tpu.nn.rnn import QuantLSTM, QuantRNN
from brevitas_tpu.quant import presets

FAST_ACT = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
FAST_UACT = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1)


def make_lstm(**kw):
    base = dict(io_quant=FAST_ACT, gate_acc_quant=FAST_ACT,
                sigmoid_quant=FAST_UACT, tanh_quant=FAST_ACT,
                cell_state_quant=FAST_ACT, rngs=nnx.Rngs(0))
    base.update(kw)
    return QuantLSTM(8, 16, **base)


def test_lstm_shapes(rng):
    lstm = make_lstm()
    x = jnp.asarray(rng.standard_normal((4, 10, 8)).astype(np.float32))
    y, (h, c) = lstm(x)
    assert y.shape == (4, 10, 16)
    assert h.shape == (1, 4, 16) and c.shape == (1, 4, 16)


def test_lstm_bidirectional_stacked(rng):
    lstm = make_lstm(num_layers=2, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32))
    y, (h, c) = lstm(x)
    assert y.shape == (2, 6, 32)
    assert h.shape == (4, 2, 16)


def test_lstm_quantizer_state_advances_through_scan(rng):
    lstm = make_lstm()
    layer = lstm.layers[0]
    x = jnp.asarray(rng.standard_normal((2, 7, 8)).astype(np.float32))
    before = int(layer.quants.gate_acc.scaling.counter[...])
    lstm(x)
    after = int(layer.quants.gate_acc.scaling.counter[...])
    # counters tick per timestep through the scan carry, saturating at
    # steps+1 (collect_stats_steps=1 → handoff completed inside the scan)
    assert before == 0 and after == 2
    assert float(layer.quants.gate_acc.scaling.value[...]) != 1.0


def test_lstm_grad_flows(rng):
    lstm = make_lstm()
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))

    @nnx.jit
    def grads(model, x):
        return nnx.grad(lambda m, v: jnp.sum(m(v)[0] ** 2))(model, x)

    g = grads(lstm, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


def test_lstm_jit_matches_eager(rng):
    lstm = make_lstm()
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    lstm(x)  # collect
    lstm.eval_mode()
    y_eager, _ = lstm(x)

    @nnx.jit
    def run(model, x):
        return model(x)[0]

    y_jit = run(lstm, x)
    np.testing.assert_allclose(y_eager, y_jit, rtol=1e-5, atol=1e-6)


def test_lstm_matches_unquantized_reference(rng):
    # with quantizers disabled, matches a hand-rolled float LSTM
    lstm = QuantLSTM(4, 6, weight_quant=None, io_quant=None,
                     gate_acc_quant=None, sigmoid_quant=None, tanh_quant=None,
                     cell_state_quant=None, rngs=nnx.Rngs(1))
    x = jnp.asarray(rng.standard_normal((3, 5, 4)).astype(np.float32))
    y, (h, c) = lstm(x)
    layer = lstm.layers[0]
    w_ih, w_hh = np.asarray(layer.w_ih[...]), np.asarray(layer.w_hh[...])
    b = np.asarray(layer.bias[...])
    hh = np.zeros((3, 6), np.float32)
    cc = np.zeros((3, 6), np.float32)
    for t in range(5):
        gates = np.asarray(x[:, t]) @ w_ih + hh @ w_hh + b
        i_g, f_g, g_g, o_g = np.split(gates, 4, axis=-1)
        sig = lambda v: 1 / (1 + np.exp(-v))
        cc = sig(f_g) * cc + sig(i_g) * np.tanh(g_g)
        hh = sig(o_g) * np.tanh(cc)
    np.testing.assert_allclose(y[:, -1], hh, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c[0], cc, rtol=1e-4, atol=1e-5)


def test_rnn_shapes_and_grad(rng):
    rnn = QuantRNN(8, 12, num_layers=2, io_quant=FAST_ACT,
                   gate_acc_quant=FAST_ACT, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 6, 8)).astype(np.float32))
    y, h = rnn(x)
    assert y.shape == (2, 6, 12)
    assert h.shape == (2, 2, 12)


# ---- attention (net-new vs reference) ---------------------------------------


def test_quant_mha_shapes_and_validity(rng):
    from brevitas_tpu.nn import QuantMultiheadAttention

    mha = QuantMultiheadAttention(
        32, 4, rngs=nnx.Rngs(0),
        in_proj_input_quant=FAST_ACT, q_quant=FAST_ACT, k_quant=FAST_ACT,
        v_quant=FAST_ACT, attn_probs_quant=FAST_UACT,
        out_proj_input_quant=FAST_ACT)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    y = mha(x)
    assert y.shape == (2, 10, 32)
    # causal masking zeroes attention to the future
    y_causal = mha(x, causal=True)
    assert y_causal.shape == (2, 10, 32)
    assert bool(jnp.any(y_causal != y))


def test_quant_mha_grad_and_jit(rng):
    from brevitas_tpu.nn import QuantMultiheadAttention

    mha = QuantMultiheadAttention(16, 2, rngs=nnx.Rngs(0),
                                  in_proj_input_quant=FAST_ACT,
                                  q_quant=FAST_ACT, k_quant=FAST_ACT,
                                  v_quant=FAST_ACT,
                                  attn_probs_quant=FAST_UACT,
                                  out_proj_input_quant=FAST_ACT)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))

    @nnx.jit
    def step(m, x):
        return nnx.value_and_grad(lambda mm, v: jnp.sum(mm(v) ** 2),
                                  argnums=1)(m, x)

    loss, g = step(mha, x)
    assert np.isfinite(float(loss))
    assert bool(jnp.any(g != 0))


def test_quant_mha_cross_attention(rng):
    from brevitas_tpu.nn import QuantMultiheadAttention

    mha = QuantMultiheadAttention(16, 2, rngs=nnx.Rngs(0),
                                  in_proj_input_quant=FAST_ACT,
                                  q_quant=FAST_ACT, k_quant=FAST_ACT,
                                  v_quant=FAST_ACT,
                                  attn_probs_quant=FAST_UACT,
                                  out_proj_input_quant=FAST_ACT)
    x = jnp.asarray(rng.standard_normal((2, 4, 16)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    y = mha(x, kv=kv)
    assert y.shape == (2, 4, 16)


def test_lstm_initial_state_threading(rng):
    """h0/c0 must actually seed the recurrence (stateful decoding)."""
    lstm = make_lstm()
    x = jnp.asarray(rng.standard_normal((2, 4, 8)).astype(np.float32))
    y_zero, (h1, c1) = lstm(x)
    # feeding the final state back must differ from the zero-state run
    y_warm, _ = lstm(x, h0=h1, c0=c1)
    assert bool(jnp.any(jnp.abs(y_warm - y_zero) > 1e-6))
    # and segment-wise processing with carried state equals one long run
    lstm2 = QuantLSTM(8, 16, weight_quant=None, io_quant=None,
                      gate_acc_quant=None, sigmoid_quant=None,
                      tanh_quant=None, cell_state_quant=None,
                      rngs=nnx.Rngs(3))
    xa, xb = x[:, :2], x[:, 2:]
    y_full, _ = lstm2(x)
    ya, (h, c) = lstm2(xa)
    yb, _ = lstm2(xb, h0=h, c0=c)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(ya), np.asarray(yb)], axis=1),
        np.asarray(y_full), rtol=1e-5, atol=1e-6)


def test_lstm_bias_quant_applied(rng):
    lstm = QuantLSTM(4, 8, bias_quant=presets.Int8BiasPerTensorFloatInternalScaling,
                     weight_quant=None, io_quant=None, gate_acc_quant=None,
                     sigmoid_quant=None, tanh_quant=None,
                     cell_state_quant=None, rngs=nnx.Rngs(0))
    layer = lstm.layers[0]
    layer.bias[...] = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    qb = layer.bias_quant(layer.bias[...])
    assert qb.scale is not None
    assert qb.is_valid()
