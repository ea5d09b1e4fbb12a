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


# ---------------------------------------------------------------------------
# QuantLSTM option matrix (reference tests/brevitas/nn/test_recurrent.py and
# quant_rnn.py:706-839 signature options)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_cifg(bidirectional, num_layers, rng):
    """CIFG: no forget-gate weights (3-gate packing), forget = 1 - input on
    the sigmoid quantizer's grid."""
    m = QuantLSTM(8, 16, num_layers=num_layers, bidirectional=bidirectional,
                  coupled_input_forget_gates=True, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    y, (h, c) = m(x)
    D = 2 if bidirectional else 1
    assert y.shape == (2, 5, 16 * D)
    assert h.shape == (num_layers * D, 2, 16)
    for lay in m.layers:
        assert lay.num_gates == 3
        assert lay.w_ih[...].shape[1] == 3 * 16
        # forget quantizers alias the input ones
        assert lay.quants.forget_sigmoid is lay.quants.in_sigmoid
        assert lay.quants.forget_acc is lay.quants.gate_acc


def test_lstm_cifg_forget_complements_input(rng):
    """With quantization disabled, CIFG means f_t == 1 - i_t exactly —
    checked via the cell state recursion on a 1-step sequence."""
    m = QuantLSTM(4, 4, coupled_input_forget_gates=True,
                  weight_quant=None, io_quant=None, gate_acc_quant=None,
                  sigmoid_quant=None, tanh_quant=None, cell_state_quant=None,
                  use_bias=False, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((1, 1, 4)).astype(np.float32))
    c0 = jnp.ones((1, 1, 4))
    _, (_, c1) = m(x, h0=jnp.zeros((1, 1, 4)), c0=c0)
    lay = m.layers[0]
    gates = (x[:, 0] @ lay.w_ih[...])  # h0 = 0
    i_g, g_g, o_g = jnp.split(gates, 3, axis=-1)
    i_t = jax.nn.sigmoid(i_g)
    expected_c = (1.0 - i_t) * 1.0 + i_t * jnp.tanh(g_g)
    np.testing.assert_allclose(np.asarray(c1[0]), np.asarray(expected_c),
                               rtol=1e-5, atol=1e-6)


def test_lstm_shared_input_hidden_weights(rng):
    m = QuantLSTM(8, 16, bidirectional=True,
                  shared_input_hidden_weights=True, rngs=nnx.Rngs(0))
    fwd, bwd = m.layers[0], m.layers[1]
    assert fwd.w_ih is bwd.w_ih  # same Param instance
    assert fwd.w_ih_quants is bwd.w_ih_quants
    assert fwd.w_hh is not bwd.w_hh
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    y, _ = m(x)
    assert y.shape == (2, 5, 32)
    # gradient flows once into the shared weight
    import optax
    opt = nnx.Optimizer(m, optax.sgd(0.1), wrt=nnx.Param)
    def loss(mm):
        return jnp.sum(mm(x)[0] ** 2)
    _, grads = nnx.value_and_grad(loss)(m)
    opt.update(m, grads)
    assert m.layers[0].w_ih is m.layers[1].w_ih


def test_lstm_shared_input_hidden_requires_bidirectional():
    with pytest.raises(ValueError, match="bidirectional"):
        QuantLSTM(8, 16, shared_input_hidden_weights=True, rngs=nnx.Rngs(0))


def test_lstm_cat_cell_states_requires_shared_quant():
    with pytest.raises(ValueError, match="shared cell quantizers"):
        QuantLSTM(8, 16, shared_cell_state_quant=False,
                  cat_output_cell_states=True, rngs=nnx.Rngs(0))


def test_lstm_shared_intra_layer_quantizers(rng):
    m = QuantLSTM(8, 16, num_layers=2,
                  shared_intra_layer_weight_quant=True,
                  shared_intra_layer_gate_acc_quant=True, rngs=nnx.Rngs(0))
    for lay in m.layers:
        assert len(lay.w_ih_quants) == 1
        assert lay.w_ih_quants[0] is lay.w_hh_quants[0]
        q = lay.quants
        assert q.forget_acc is q.gate_acc
        assert q.cell_acc is q.gate_acc and q.out_acc is q.gate_acc
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    y, _ = m(x)
    assert y.shape == (2, 5, 16)


def test_lstm_per_gate_weight_quant_default(rng):
    """Default (no intra-layer sharing): each gate has its own weight
    quantizer → per-gate per-tensor scales may differ."""
    m = QuantLSTM(8, 16, rngs=nnx.Rngs(0))
    lay = m.layers[0]
    assert len(lay.w_ih_quants) == 4 and len(lay.w_hh_quants) == 4
    scales = [float(np.asarray(q(lay.w_ih[...][:, g * 16:(g + 1) * 16]).scale))
              for g, q in enumerate(lay.w_ih_quants)]
    assert len(set(scales)) > 1  # independent per-gate scales


def test_lstm_cell_state_quant_shared_across_layers(rng):
    m = QuantLSTM(8, 16, num_layers=3, shared_cell_state_quant=True,
                  rngs=nnx.Rngs(0))
    first = m.layers[0].quants.cell_state
    assert all(lay.quants.cell_state is first for lay in m.layers)
    # io (hidden-state) quant is always shared (quantizers_to_share)
    first_io = m.layers[0].quants.hidden_state
    assert all(lay.quants.hidden_state is first_io for lay in m.layers)


@pytest.mark.parametrize("cifg", [False, True])
def test_lstm_option_matrix_qonnx_export(cifg, rng):
    """Options thread through QONNX export and the exported graph executes
    within an act LSB of the model (reference test_recurrent export tier)."""
    from brevitas_tpu.export import export_qonnx, run_onnx, validate_onnx
    from brevitas_tpu.utils import eval_mode

    class Net(nnx.Module):
        def __init__(self):
            self.lstm = QuantLSTM(8, 16, coupled_input_forget_gates=cifg,
                                  rngs=nnx.Rngs(0))

        def export_layers(self):
            return [self.lstm]

        def __call__(self, x):
            y, _ = self.lstm(x)
            return y

    m = Net()
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    m(x)  # calibrate
    eval_mode(m)
    y_model = np.asarray(m(x))
    blob = export_qonnx(m, x)
    validate_onnx(blob)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x)})
    io_scale = float(np.asarray(
        m.lstm.layers[0].quants.hidden_state(y_model).scale))
    np.testing.assert_allclose(y_onnx, y_model, atol=2.1 * io_scale)


def test_rnn_shared_input_hidden_weights(rng):
    """QuantRNN supports shared input-hidden weights too (reference
    QuantRNN signature, quant_rnn.py:803)."""
    from brevitas_tpu.nn import QuantRNN

    m = QuantRNN(8, 16, bidirectional=True,
                 shared_input_hidden_weights=True, rngs=nnx.Rngs(0))
    assert m.layers[0].w_ih is m.layers[1].w_ih
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    y, _ = m(x)
    assert y.shape == (2, 5, 32)
    with pytest.raises(ValueError, match="bidirectional"):
        QuantRNN(8, 16, shared_input_hidden_weights=True, rngs=nnx.Rngs(0))


# ---- fused cell (static-grid fast path) -------------------------------------


def _force_module_cell(lstm):
    for layer in lstm.layers:
        layer.fused_cell = False


@pytest.mark.parametrize("opts", [
    dict(),
    dict(coupled_input_forget_gates=True),
    dict(shared_intra_layer_gate_acc_quant=True),
    dict(bidirectional=True, num_layers=2),
    dict(coupled_input_forget_gates=True, bidirectional=True),
])
def test_lstm_fused_cell_matches_module_cell(opts, rng):
    """After runtime-stats → parameter migration every cell quantizer grid
    is static, and the fused scan (batched gate fake-quants, no quant state
    in the carry) must equal the per-gate module cell exactly."""
    from brevitas_tpu.quant.quantizers import (
        convert_runtime_stats_to_parameter,
    )

    lstm = make_lstm(**opts)
    x = jnp.asarray(rng.standard_normal((3, 7, 8)).astype(np.float32))
    # collection phase: grids are data-dependent, module cell must run
    assert lstm.layers[0]._fused_cell_params() is None
    lstm(x)
    lstm(x)
    convert_runtime_stats_to_parameter(lstm)
    assert lstm.layers[0]._fused_cell_params() is not None
    y_fused, (h_f, c_f) = lstm(x)
    _force_module_cell(lstm)
    y_slow, (h_s, c_s) = lstm(x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_slow),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_s),
                               rtol=1e-6, atol=1e-6)


def test_lstm_fused_cell_grads_match_module_cell(rng):
    """Gradients — including through the learned scale parameters the fused
    path bakes into its packed scale vectors — agree with the module cell."""
    from brevitas_tpu.quant.quantizers import (
        convert_runtime_stats_to_parameter,
    )

    lstm = make_lstm()
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    lstm(x)
    lstm(x)
    convert_runtime_stats_to_parameter(lstm)

    def loss_fn(model):
        y, _ = model(x)
        return jnp.sum(y ** 2)

    g_fused = nnx.grad(loss_fn)(lstm)
    _force_module_cell(lstm)
    g_slow = nnx.grad(loss_fn)(lstm)
    flat_f = jax.tree.leaves(g_fused)
    flat_s = jax.tree.leaves(g_slow)
    assert len(flat_f) == len(flat_s)
    for a, b in zip(flat_f, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_lstm_fused_cell_inactive_without_quant(rng):
    """A fully-disabled-quant LSTM fuses to the identity stages (no
    fake-quant at all in the scan)."""
    lstm = QuantLSTM(8, 16, weight_quant=None, io_quant=None,
                     gate_acc_quant=None, sigmoid_quant=None,
                     tanh_quant=None, cell_state_quant=None,
                     rngs=nnx.Rngs(0))
    stages = lstm.layers[0]._fused_cell_params()
    assert stages is not None
    assert all(v is None for v in stages.values())
    x = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    y_fused, _ = lstm(x)
    _force_module_cell(lstm)
    y_slow, _ = lstm(x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_slow),
                               rtol=1e-6, atol=1e-6)
