"""Quantizer module tests (mirror of reference tests/brevitas/proxy/ +
core scaling tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from brevitas_tpu.quant import (
    ActQuantizer,
    BiasQuantizer,
    QuantConfig,
    TruncQuantizer,
    WeightQuantizer,
    presets,
)
from brevitas_tpu.quant_tensor import QuantTensor


def test_int8_weight_per_tensor_float(rng):
    w = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    q = WeightQuantizer(presets.Int8WeightPerTensorFloat, w)
    qt = q(w)
    assert isinstance(qt, QuantTensor)
    assert qt.scale.shape == ()
    # narrow 8-bit absmax scaling: scale = absmax/127
    np.testing.assert_allclose(
        qt.scale, np.max(np.abs(np.asarray(w))) / 127.0, rtol=1e-6)
    assert qt.is_valid()
    assert float(qt.bit_width) == 8.0
    # fake-quant error bounded by scale/2
    assert float(jnp.max(jnp.abs(qt.value - w))) <= float(qt.scale) * 0.5 + 1e-7


def test_int8_weight_per_channel_float(rng):
    w = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    q = WeightQuantizer(presets.Int8WeightPerChannelFloat, w)
    qt = q(w)
    assert qt.scale.shape == (8, 1)
    expect = np.max(np.abs(np.asarray(w)), axis=1, keepdims=True) / 127.0
    np.testing.assert_allclose(qt.scale, expect, rtol=1e-6)
    assert qt.is_valid()


def test_weight_quant_grad_flows_through_stats(rng):
    # "backpropagated statistics": d scale / d w_max != 0
    w = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    q = WeightQuantizer(presets.Int8WeightPerTensorFloat, w)
    g = jax.grad(lambda w_: jnp.sum(q(w_).value ** 2))(w)
    assert bool(jnp.any(g != 0))


def test_fixed_point_weight_scale_is_po2(rng):
    w = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    q = WeightQuantizer(presets.Int8WeightPerTensorFixedPoint, w)
    qt = q(w)
    log2s = float(jnp.log2(qt.scale))
    assert log2s == int(log2s), f"scale {float(qt.scale)} is not a power of two"
    assert qt.is_valid()


def test_shifted_uint8_weight(rng):
    w = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    q = WeightQuantizer(presets.ShiftedUint8WeightPerTensorFloat, w)
    qt = q(w)
    # asymmetric: zero_point shifts the negative range into [0, 255]
    assert float(qt.zero_point) > 0
    ints = np.asarray(qt.value) / np.asarray(qt.scale) + np.asarray(qt.zero_point)
    assert ints.min() >= -1e-4 and ints.max() <= 255 + 1e-4
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-3)


def test_binary_ternary_weight(rng):
    w = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    qb = WeightQuantizer(presets.SignedBinaryWeightPerTensorConst, w)
    qt = qb(w)
    np.testing.assert_allclose(np.abs(np.asarray(qt.value)), 0.1, rtol=1e-6)
    assert float(qt.bit_width) == 1.0
    qtr = WeightQuantizer(presets.SignedTernaryWeightPerTensorConst, w)(w)
    uniq = {round(float(v), 4) for v in np.unique(np.asarray(qtr.value))}
    assert uniq <= {-0.1, 0.0, 0.1}


def test_none_quant_passthrough(rng):
    w = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    qt = WeightQuantizer(presets.NoneWeightQuant, w)(w)
    assert qt.scale is None
    np.testing.assert_array_equal(qt.value, w)


def test_decoupled_weight_quant(rng):
    w = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    q = WeightQuantizer(presets.Int8WeightPerChannelFloatDecoupled, w)
    qt = q(w)
    assert qt.scale.shape == (8, 1)
    # scale is a learned parameter initialized from per-channel absmax stats
    params = nnx.state(q, nnx.Param)
    assert len(jax.tree_util.tree_leaves(params)) >= 1
    assert float(jnp.max(jnp.abs(qt.value))) > 0


def test_learned_bit_width(rng):
    w = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    q = WeightQuantizer(presets.Int8WeightPerTensorFloatLearnedBitWidth, w)
    qt = q(w)
    assert float(qt.bit_width) == 8.0
    # gradient flows to the bit-width offset parameter
    grads = nnx.grad(lambda m, w_: jnp.sum(m(w_).value ** 2))(q, w)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(grads)}
    assert any("offset" in k for k in flat), list(flat)


# ---- activations ------------------------------------------------------------


def test_act_two_phase_collect_then_learn(rng):
    cfg = presets.Int8ActPerTensorFloat.let(collect_stats_steps=3)
    q = ActQuantizer(cfg)

    @nnx.jit
    def step(q, x):
        return q(x)

    xs = [jnp.asarray(rng.standard_normal(512).astype(np.float32) * (i + 1))
          for i in range(5)]
    for x in xs:
        qt = step(q, x)
    # after 3 collect steps the learned param took over (counter advanced past)
    assert int(q.scaling.counter[...]) == 4
    param_val = float(q.scaling.value[...])
    assert param_val != 1.0  # handoff happened
    # eval mode: uses the learned param
    q.eval_mode()
    qt_eval = q(xs[0])
    assert qt_eval.is_valid()


def test_act_stats_collection_momentum(rng):
    cfg = presets.Int8ActPerTensorFloat.let(
        collect_stats_steps=10, scaling_stats_momentum=None,
        scaling_stats_op="max")
    q = ActQuantizer(cfg)
    vals = []
    for i in range(4):
        x = jnp.full((64,), float(i + 1))
        q(x)
        vals.append(float(q.scaling.buffer[...]))
    # running mean of absmax stats: 1, 1.5, 2, 2.5
    np.testing.assert_allclose(vals, [1.0, 1.5, 2.0, 2.5], rtol=1e-6)


def test_uint_act_quantizer(rng):
    x = jnp.abs(jnp.asarray(rng.standard_normal(256).astype(np.float32)))
    cfg = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1)
    q = ActQuantizer(cfg)
    qt = q(x)
    assert not qt.signed
    assert float(jnp.min(qt.value)) >= 0.0


def test_shifted_act_zero_point(rng):
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32)) - 0.5
    cfg = presets.ShiftedUint8ActPerTensorFloat.let(collect_stats_steps=2)
    q = ActQuantizer(cfg)
    qt = q(x)
    assert float(qt.zero_point) != 0.0
    ints = np.asarray(qt.value) / np.asarray(qt.scale) + np.asarray(qt.zero_point)
    assert ints.min() >= -1e-3


def test_quant_delay(rng):
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    cfg = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1,
                                            quant_delay_steps=2)
    q = ActQuantizer(cfg)
    y0 = q(x)
    np.testing.assert_array_equal(y0.value, x)  # still FP
    q(x)
    y2 = q(x)
    assert bool(jnp.any(y2.value != x))  # quant kicked in


# ---- bias -------------------------------------------------------------------


def test_bias_quant_external_scale(rng):
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    q = BiasQuantizer(presets.Int16Bias, b)
    acc_scale = jnp.asarray(0.01)
    qt = q(b, input_scale=acc_scale)
    np.testing.assert_allclose(qt.scale, 0.01)
    assert float(qt.bit_width) == 16.0
    assert qt.is_valid()


def test_bias_quant_internal_scale(rng):
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    q = BiasQuantizer(presets.Int8BiasPerTensorFloatInternalScaling, b)
    qt = q(b)
    np.testing.assert_allclose(
        qt.scale, np.max(np.abs(np.asarray(b))) / 128.0, rtol=1e-5)


# ---- trunc ------------------------------------------------------------------


def test_trunc_quantizer():
    # avgpool-style: 16-bit accumulator truncated to 8 bits
    vals = jnp.asarray([1000.0, -513.0]) * 0.5
    qt = QuantTensor(vals, jnp.asarray(0.5), jnp.asarray(0.0),
                     jnp.asarray(16.0), signed=True)
    tq = TruncQuantizer(presets.TruncTo8bit)
    out = tq(qt)
    assert float(out.bit_width) == 8.0
    ints = np.asarray(out.value) / 0.5
    np.testing.assert_allclose(ints, np.floor(np.asarray([1000, -513]) / 256.0))


# ---- train/eval toggling ----------------------------------------------------


def test_train_eval_recursive_toggle(rng):
    cfg = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)
    q = ActQuantizer(cfg)
    q.eval_mode()
    assert q.scaling.training is False
    q.train_mode()
    assert q.scaling.training is True


def test_stochastic_round_weight_quant(rng):
    from brevitas_tpu.core.restrict import FloatToIntImpl

    w = jnp.full((4, 64), 0.305)  # 0.305/0.1 = 3.05 → rounds 3 or 4
    cfg = presets.Int8WeightPerTensorFloat.let(
        float_to_int=FloatToIntImpl.STOCHASTIC_ROUND,
        scaling_impl="const", scaling_const=12.7)  # scale = 0.1
    q = WeightQuantizer(cfg, w, rngs=nnx.Rngs(stochastic_round=0))
    outs = [np.asarray(q(w).value) for _ in range(20)]
    vals = np.unique(np.round(np.concatenate(outs) / 0.1))
    assert set(vals.tolist()) == {3.0, 4.0}  # both round directions occur
    # mean ≈ 3.05 * 0.1 (unbiased)
    mean = np.mean(outs)
    assert 0.295 < mean < 0.315
    # straight-through gradient to the weights via the supported nnx path
    # (plain jax.grad over a stateful module is not supported for rng streams)
    _, g = nnx.value_and_grad(lambda m, v: jnp.sum(m(v).value),
                              argnums=1)(q, w)
    np.testing.assert_allclose(g, np.ones_like(g))


def test_stochastic_round_inside_remat(rng):
    """Stochastic rounding must stay legal inside a jax.checkpoint region
    (the 1F1B pipeline stages and the scanned-epoch remat recipes wrap
    quant layers in remat). The supported pattern passes the module state
    as an ARGUMENT to the rematted function and merges inside it: the
    RngCount then lives at the remat trace level (no cross-trace
    mutation; a closure over state or the live module raises
    TraceContextError), and because backward re-merges from the same
    state, the recompute draws bit-identical rounding noise to the
    forward — which the gradient check below depends on."""
    from brevitas_tpu.core.restrict import FloatToIntImpl

    w = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    cfg = presets.Int8WeightPerTensorFloat.let(
        float_to_int=FloatToIntImpl.STOCHASTIC_ROUND,
        scaling_impl="const", scaling_const=12.7)
    q = WeightQuantizer(cfg, w, rngs=nnx.Rngs(stochastic_round=0))
    graphdef, state = nnx.split(q)

    def loss(state, v):
        def fwd(state_, v_):
            m = nnx.merge(graphdef, state_)
            out = jnp.sum(m(v_).value ** 2)
            _, state2 = nnx.split(m)  # consumed rng count flows out
            return out, state2

        out, _ = jax.checkpoint(fwd)(state, v)
        return out

    # would raise flax TraceContextError if the key were drawn inside
    val, g = jax.jit(jax.value_and_grad(loss, argnums=1))(state, w)
    assert np.isfinite(float(val))
    # STE: d/dv sum(fq(v)^2) = 2*fq(v); the recomputed fq must equal the
    # forward fq bit-for-bit or this comparison drifts by whole grid steps
    m2 = nnx.merge(graphdef, state)
    np.testing.assert_allclose(np.asarray(g),
                               2.0 * np.asarray(m2(w).value), rtol=1e-6)


def test_max_l2_uses_per_channel_view_for_per_tensor_scale(rng):
    """Review finding: AbsMaxL2 must norm PER-CHANNEL maxima even when the
    scale is per-tensor (decoupled L2 presets)."""
    w = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    q = WeightQuantizer(presets.Int4WeightPerTensorFloatDecoupled, w)
    qt = q(w)
    per_ch_max = np.max(np.abs(np.asarray(w)), axis=1)
    expect_thr = np.linalg.norm(per_ch_max) / np.sqrt(4)
    # learned scale initialized from the L2-of-per-channel-maxima stat
    got_thr = float(q.scaling(None))
    np.testing.assert_allclose(got_thr, expect_thr, rtol=1e-5)


def test_max_l2_per_channel_scale_rejected(rng):
    w = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    cfg = presets.Int8WeightPerChannelFloat.let(scaling_stats_op="max_l2")
    with np.testing.assert_raises(ValueError):
        WeightQuantizer(cfg, w)


def test_affine_stats_creates_affine_params(rng):
    from brevitas_tpu.quant.config import ScalingImplType
    from brevitas_tpu.quant.quantizers import ActQuantizer, build_scaling

    cfg = presets.Int8ActPerTensorFloat.let(
        scaling_impl=ScalingImplType.AFFINE_STATS, collect_stats_steps=1)
    q = ActQuantizer(cfg)
    assert q.scaling.affine
    assert hasattr(q.scaling, "affine_weight")
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    assert q(x).is_valid()


def test_mean_learn_sigma_std_learns_sigma(rng):
    cfg = presets.Int8ActPerTensorFloat.let(
        scaling_stats_op="mean_learn_sigma_std", scaling_stats_sigma=3.0,
        scaling_impl="stats")
    q = ActQuantizer(cfg)
    assert float(q.scaling.sigma[...]) == 3.0
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    q(x)
    # sigma is a learnable Param with nonzero gradient
    g = nnx.grad(lambda m, v: jnp.sum(m(v).value ** 2))(q, x)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(g)}
    sigma_grads = [v for k, v in flat.items() if "sigma" in k]
    assert sigma_grads and bool(jnp.any(sigma_grads[0] != 0))


def test_convert_runtime_stats_to_parameter(rng):
    """RuntimeStatsScaling → ParameterScaling migration keeps the learned
    EMA scale (reference ConvertRuntimeStatsToParameter, proxy/utils.py:8)."""
    from brevitas_tpu.quant import convert_runtime_stats_to_parameter
    from brevitas_tpu.quant.config import ScalingImplType
    from brevitas_tpu.quant.quantizers import (ActQuantizer,
                                               ParameterScaling,
                                               RuntimeStatsScaling)
    from brevitas_tpu.quant.presets import Int8ActPerTensorFloat

    q = ActQuantizer(Int8ActPerTensorFloat.let(scaling_impl=ScalingImplType.STATS,
                                               scaling_stats_momentum=0.1))
    # STATS with runtime input resolves to RuntimeStatsScaling for acts
    assert isinstance(q.scaling, RuntimeStatsScaling)
    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    for _ in range(5):
        q(x)
    q.eval_mode()
    scale_before = np.asarray(q(x).scale)
    n = convert_runtime_stats_to_parameter(q)
    assert n == 1
    assert isinstance(q.scaling, ParameterScaling)
    assert q.cfg.scaling_impl == ScalingImplType.PARAMETER
    scale_after = np.asarray(q(x).scale)
    np.testing.assert_allclose(scale_after, scale_before, rtol=1e-5)
    # the migrated scale is a trainable Param
    from flax import nnx as _nnx
    assert isinstance(q.scaling.value, _nnx.Param)


def test_act_two_phase_bf16_input(rng):
    """The lax.cond phases must trace with non-f32 activations: collect,
    handoff and steady state all run on bf16 inputs (the cond branches'
    output types agree on the f32 buffer dtype)."""
    cfg = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)
    q = ActQuantizer(cfg)

    @nnx.jit
    def step(q, x):
        return q(x)

    x = jnp.asarray(rng.standard_normal(256).astype(np.float32) * 3)
    for i in range(4):  # collect(2) + handoff + steady
        qt = step(q, x.astype(jnp.bfloat16))
    assert int(q.scaling.counter[...]) == 3
    assert float(q.scaling.value[...]) != 1.0
    # steady-state grads still flow to the learned scale through the cond
    def loss(q, x):
        return jnp.sum(jnp.abs(q(x).value.astype(jnp.float32)))

    grads = nnx.grad(loss)(q, x.astype(jnp.bfloat16))
    g = jax.tree.leaves(grads)
    assert any(float(jnp.max(jnp.abs(leaf))) > 0 for leaf in g)


def test_convert_two_phase_to_parameter_preserves_scale(rng):
    """ParameterFromRuntimeStatsScaling migrates to a plain ParameterScaling
    (reference ConvertRuntimeStatsToParameter covers it too) with the SAME
    effective scale — post-handoff from the learned value, mid-collection
    from the stats buffer. The migrated module carries no per-call cond
    (the steady-state QAT fast path, PERF.md quantlstm leg)."""
    from brevitas_tpu.quant.quantizers import (
        ParameterFromRuntimeStatsScaling,
        ParameterScaling,
        convert_runtime_stats_to_parameter,
    )

    x = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 2)
    for phase_calls in (1, 5):  # mid-collection / post-handoff
        cfg = presets.Int8ActPerTensorFloat.let(collect_stats_steps=3)
        q = ActQuantizer(cfg)
        assert isinstance(q.scaling, ParameterFromRuntimeStatsScaling)
        for _ in range(phase_calls):
            q(x)
        q.eval_mode()
        scale_before = np.asarray(q(x).scale)
        n = convert_runtime_stats_to_parameter(q)
        assert n == 1
        assert isinstance(q.scaling, ParameterScaling)
        scale_after = np.asarray(q(x).scale)
        np.testing.assert_allclose(scale_after, scale_before, rtol=1e-6)
