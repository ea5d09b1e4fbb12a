"""Functional quant core tests (mirror of reference tests/brevitas/core/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brevitas_tpu.core import quant as Q
from brevitas_tpu.core import restrict as R
from brevitas_tpu.core import stats as S
from brevitas_tpu.ops import tensor_clamp_ste


def test_int_quant_reference_doctest():
    # reference IntQuant doctest (core/quant/int_base.py:31-38):
    # scale=0.01, zp=0, bw=4, narrow+signed → [0.04, -0.05, 0.07, -0.07]
    x = jnp.asarray([0.042, -0.053, 0.31, -0.44])
    y = Q.int_quant(x, jnp.asarray(0.01), jnp.asarray(0.0), jnp.asarray(4.0),
                    signed=True, narrow_range=True)
    np.testing.assert_allclose(y, [0.04, -0.05, 0.07, -0.07], atol=1e-6)


def test_rescaling_int_quant_reference_doctest():
    # reference RescalingIntQuant doctest (core/quant/int.py:125-134):
    # threshold=0.1, bw=4 narrow signed → int_threshold 7, scale=1/70
    x = jnp.asarray([0.042, -0.053, 0.31, -0.44])
    scale = Q.rescaling_scale(jnp.asarray(0.1), jnp.asarray(4.0),
                              signed=True, narrow_range=True)
    np.testing.assert_allclose(scale, 0.1 / 7.0, rtol=1e-6)
    y = Q.int_quant(x, scale, jnp.asarray(0.0), jnp.asarray(4.0),
                    signed=True, narrow_range=True)
    np.testing.assert_allclose(y, [0.0429, -0.0571, 0.1, -0.1], atol=1e-4)


def test_decoupled_int_quant_reference_doctest():
    # reference DecoupledIntQuant doctest (core/quant/int_base.py:117-124)
    x = jnp.asarray([0.042, -0.053, 0.31, -0.44])
    y = Q.decoupled_int_quant(
        x, pre_scale=jnp.asarray(0.02), pre_zero_point=jnp.asarray(0.0),
        scale=jnp.asarray(0.01), zero_point=jnp.asarray(0.0),
        bit_width=jnp.asarray(4.0), signed=True, narrow_range=True)
    np.testing.assert_allclose(y, [0.02, -0.03, 0.07, -0.07], atol=1e-6)


def test_int_quant_unsigned_with_zero_point():
    x = jnp.asarray([0.0, 0.5, 1.0, -0.3])
    scale, zp, bw = jnp.asarray(0.1), jnp.asarray(3.0), jnp.asarray(8.0)
    y = Q.int_quant(x, scale, zp, bw, signed=False, narrow_range=False)
    ints = np.asarray(y) / 0.1 + 3.0
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-5)
    assert float(jnp.min(y)) >= float(-zp * scale)


def test_int_quant_grad_ste_vs_clamped(rng):
    x = jnp.asarray(rng.standard_normal(256).astype(np.float32) * 4)
    scale, zp, bw = jnp.asarray(0.1), jnp.asarray(0.0), jnp.asarray(4.0)

    def loss(clamp_fn, v):
        return jnp.sum(Q.int_quant(v, scale, zp, bw, signed=True,
                                   narrow_range=False, clamp_fn=clamp_fn))

    from brevitas_tpu.ops import tensor_clamp
    g_soft = jax.grad(lambda v: loss(tensor_clamp, v))(x)
    g_ste = jax.grad(lambda v: loss(tensor_clamp_ste, v))(x)
    # signed 4-bit non-narrow range is [-8, 7]
    ints = np.round(np.asarray(x) / 0.1)
    out_of_range = (ints > 7) | (ints < -8)
    # default clamp zeroes gradient out of range; STE passes it through
    assert np.all(np.asarray(g_soft)[out_of_range] == 0)
    np.testing.assert_allclose(g_ste, np.ones_like(g_ste))
    in_range = (ints < 7) & (ints > -8)
    np.testing.assert_allclose(np.asarray(g_soft)[in_range], 1.0)


def test_binary_quant_reference_doctest():
    x = jnp.asarray([0.04, -0.6, 3.3])
    y, bw = Q.binary_quant(x, jnp.asarray(0.1))
    np.testing.assert_allclose(y, [0.1, -0.1, 0.1], atol=1e-6)
    assert float(bw) == 1.0


def test_clamped_binary_quant_grad():
    # reference ClampedBinaryQuant doctest: grad [0.1, 0, 0] for in [.04,-.6,3.3]
    x = jnp.asarray([0.04, -0.6, 3.3])
    g = jax.grad(
        lambda v: jnp.sum(Q.clamped_binary_quant(v, jnp.asarray(0.1))[0]))(x)
    np.testing.assert_allclose(g, [0.1, 0.0, 0.0], atol=1e-6)


def test_ternary_quant_reference_doctest():
    x = jnp.asarray([0.04, -0.6, 3.3])
    y, bw = Q.ternary_quant(x, jnp.asarray(1.0), 0.5)
    np.testing.assert_allclose(y, [0.0, -1.0, 1.0])
    assert float(bw) == 2.0


def test_trunc_int_quant_drops_lsbs():
    # 8-bit value 100 truncated to 4 bits: 100/2^4 = 6.25 → floor → 6
    x = jnp.asarray([100.0 * 0.5])
    y = Q.trunc_int_quant(
        x, jnp.asarray(0.5), jnp.asarray(0.0),
        input_bit_width=jnp.asarray(8.0), output_bit_width=jnp.asarray(4.0),
        float_to_int=jax.numpy.floor)
    np.testing.assert_allclose(y, [6.0 * 0.5])


def test_int_scaling():
    bw = jnp.asarray(8.0)
    assert float(Q.int_scaling(bw, signed=True, narrow_range=False)) == 128.0
    assert float(Q.int_scaling(bw, signed=True, narrow_range=True)) == 127.0
    assert float(Q.int_scaling(bw, signed=False, narrow_range=False)) == 255.0
    assert float(Q.po2_int_scaling(bw, signed=True)) == 128.0


# ---- restrict ---------------------------------------------------------------

def test_restrict_po2():
    v = R.preprocess(R.RestrictType.POWER_OF_TWO, 0.3)
    eff = R.forward(R.RestrictType.POWER_OF_TWO, jnp.asarray(v))
    # 0.3 → log2 → round → 2^-2 = 0.25
    np.testing.assert_allclose(eff, 0.25)
    # gradient flows through the STE round into log-space param
    g = jax.grad(lambda p: R.forward(R.RestrictType.POWER_OF_TWO, p))(jnp.asarray(v))
    assert float(g) != 0.0


def test_restrict_log_fp():
    v = R.preprocess(R.RestrictType.LOG_FP, 8.0)
    np.testing.assert_allclose(v, 3.0)
    np.testing.assert_allclose(R.forward(R.RestrictType.LOG_FP, jnp.asarray(v)), 8.0)


def test_restrict_fp_identity():
    assert R.preprocess(R.RestrictType.FP, 1.7) == 1.7
    np.testing.assert_allclose(R.forward(R.RestrictType.FP, jnp.asarray(1.7)), 1.7)


# ---- stats ------------------------------------------------------------------

def test_stats_shapes_and_values(rng):
    x = jnp.asarray(rng.standard_normal((4, 100)).astype(np.float32))
    np.testing.assert_allclose(
        S.abs_max(x), np.max(np.abs(np.asarray(x)), axis=-1), rtol=1e-6)
    np.testing.assert_allclose(
        S.abs_ave(x), np.mean(np.abs(np.asarray(x)), axis=-1), rtol=1e-5)
    np.testing.assert_allclose(
        S.abs_min_max(x),
        np.abs(np.max(np.asarray(x), -1) - np.min(np.asarray(x), -1)), rtol=1e-6)
    assert S.abs_max_ave(x).shape == (1,)
    assert S.abs_max_l2(x).shape == (1,)


def test_abs_percentile_kthvalue_parity(rng):
    # torch.kthvalue parity: k = floor(.01*q*n + .5), 1-indexed
    x_np = rng.standard_normal(1000).astype(np.float32)
    x = jnp.asarray(x_np)[None, :]
    got = float(S.abs_percentile(x, 99.9)[0])
    k = int(np.floor(0.01 * 99.9 * 1000 + 0.5))
    expect = np.sort(np.abs(x_np))[k - 1]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_negative_min_or_zero():
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(S.negative_min_or_zero(x), [0.0])
    x2 = jnp.asarray([[-1.0, 2.0]])
    np.testing.assert_allclose(S.negative_min_or_zero(x2), [-1.0])


def test_percentile_interval(rng):
    x_np = rng.standard_normal(500).astype(np.float32)
    x = jnp.asarray(x_np)[None, :]
    got = float(S.percentile_interval(x, 1.0, 99.0)[0])
    lo_k = int(np.ceil(0.01 * 1.0 * 500))
    hi_k = int(np.floor(0.01 * 99.0 * 500 + 0.5))
    srt = np.sort(x_np)
    np.testing.assert_allclose(got, abs(srt[hi_k - 1] - srt[lo_k - 1]), rtol=1e-6)


def test_mean_sigma_std(rng):
    x_np = rng.standard_normal((1, 400)).astype(np.float32)
    got = S.mean_sigma_std(jnp.asarray(x_np), sigma=3.0)
    a = np.abs(x_np)
    # unbiased variance (ddof=1) per torch.var's default in the reference
    expect = a.mean(-1) + 3.0 * np.sqrt(a.var(-1, ddof=1) + 1e-8)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_kl_threshold_reasonable(rng):
    x = jnp.asarray(rng.standard_normal(10000).astype(np.float32))
    thr = float(S.kl_minimizer_threshold(x, bit_width=8.0, signed=True))
    absmax = float(jnp.max(jnp.abs(x)))
    assert 0.0 < thr <= absmax * 1.01


def test_distributed_stats_psum():
    # per-shard absmax combined with pmax across a mesh axis
    import jax

    devs = jax.devices()
    n = min(4, len(devs))
    x = jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 1, 8) - 10.0

    def f(shard):
        return S.abs_max(shard, mesh_axis="d")

    out = jax.pmap(f, axis_name="d", devices=devs[:n])(x)
    expect = float(np.max(np.abs(np.asarray(x))))
    np.testing.assert_allclose(np.asarray(out), expect)


def test_mse_threshold_clips_outliers_at_low_bits(rng):
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    x[0, 0] = 30.0
    thr = float(S.mse_threshold(jnp.asarray(x), bit_width=4.0, signed=True)[0])
    assert 0.0 < thr < 15.0  # clips the lone outlier

    def err(t):
        s = t / 8.0
        q = np.clip(np.round(x / s), -8, 7) * s
        return ((q - x) ** 2).sum()

    assert err(thr) < err(30.0)  # beats absmax scaling


def test_mse_threshold_keeps_clean_range(rng):
    # well-behaved data at 8 bits: threshold stays near absmax per channel
    x = rng.standard_normal((4, 512)).astype(np.float32)
    thr = np.asarray(S.mse_threshold(jnp.asarray(x), bit_width=8.0, signed=True))
    absmax = np.abs(x).max(axis=1)
    assert thr.shape == (4,)
    assert np.all(thr > 0.5 * absmax) and np.all(thr <= absmax + 1e-6)


def test_mse_stats_op_in_weight_quantizer(rng):
    from flax import nnx

    import brevitas_tpu.nn as qnn
    from brevitas_tpu.quant import presets

    m = qnn.QuantLinear(
        32, 16, weight_quant=presets.Int4WeightPerChannelFloatMSE,
        rngs=nnx.Rngs(0))
    qt = m.quant_weight()
    assert qt.is_valid()
    assert qt.scale.size == 16
    # per-channel MSE threshold never exceeds the per-channel absmax grid
    from brevitas_tpu.core.quant import int_scaling

    absmax = jnp.max(jnp.abs(m.weight[...]), axis=0)
    int_thr = float(int_scaling(jnp.asarray(4.0), signed=True,
                                narrow_range=True))
    assert np.all(np.asarray(qt.scale).reshape(-1) <= np.asarray(absmax) / int_thr + 1e-6)


def test_mse_stats_distributed_psum(rng):
    import jax

    devs = jax.devices()
    n = min(4, len(devs))
    x = rng.standard_normal((n, 1, 1024)).astype(np.float32)
    x[0, 0, 0] = 25.0

    def f(shard):
        return S.mse_threshold(shard, bit_width=4.0, signed=True,
                               mesh_axis="d")

    out = np.asarray(jax.pmap(f, axis_name="d", devices=devs[:n])(jnp.asarray(x)))
    # all shards agree on ONE global threshold
    assert np.allclose(out, out[0])
    ref = np.asarray(S.mse_threshold(
        jnp.asarray(x.reshape(1, -1)), bit_width=4.0, signed=True))
    np.testing.assert_allclose(out[0], ref, rtol=1e-5)


def test_mse_rejects_learned_bit_width():
    from flax import nnx

    import brevitas_tpu.nn as qnn
    from brevitas_tpu.quant import presets
    from brevitas_tpu.quant.config import StatsOp

    bad = presets.Int8WeightPerTensorFloatLearnedBitWidth.let(
        scaling_stats_op=StatsOp.MSE)
    with np.testing.assert_raises(AssertionError):
        qnn.QuantLinear(8, 4, weight_quant=bad, rngs=nnx.Rngs(0))
