"""Quant layer tests (mirror of reference tests/brevitas/nn/test_wbiol.py,
test_act.py, test_linear.py, test_conv2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.quant import presets
from brevitas_tpu.quant_tensor import QuantTensor


def rngs():
    return nnx.Rngs(0)


def test_quant_linear_default(rng):
    layer = qnn.QuantLinear(16, 8, rngs=rngs())
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    y = layer(x)
    assert y.shape == (4, 8)
    # default: weight quant enabled, fp output
    assert isinstance(y, jnp.ndarray)
    # weight fake-quant error bounded
    qw = layer.quant_weight()
    assert qw.is_valid()


def test_quant_linear_full_pipeline(rng):
    layer = qnn.QuantLinear(
        16, 8, rngs=rngs(),
        weight_quant=presets.Int8WeightPerChannelFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        bias_quant=presets.Int16Bias,
        output_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        return_quant_tensor=True)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    y = layer(x)
    assert isinstance(y, QuantTensor)
    assert y.scale is not None and float(y.bit_width) == 8.0


def test_quant_linear_acc_bit_width(rng):
    layer = qnn.QuantLinear(
        16, 8, rngs=rngs(), use_bias=False,
        weight_quant=presets.Int8WeightPerTensorFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        return_quant_tensor=True)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    y = layer(x)
    # acc bits = ceil(log2(255 * 255 * 16)) = ceil(log2(1040400)) = 20
    assert float(y.bit_width) == 20.0
    # output scale = input_scale * weight_scale
    np.testing.assert_allclose(
        np.asarray(y.scale).reshape(-1),
        (np.asarray(layer.quant_weight().scale)
         * np.asarray(layer.input_quant(x).scale)).reshape(-1), rtol=1e-5)


def test_quant_linear_grad_and_jit(rng):
    layer = qnn.QuantLinear(16, 8, rngs=rngs(),
                            weight_quant=presets.Int8WeightPerTensorFloat)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))

    @nnx.jit
    def loss_grad(model, x):
        return nnx.grad(lambda m, v: jnp.sum(m(v) ** 2))(model, x)

    g = loss_grad(layer, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


@pytest.mark.parametrize("cls,kw", [
    (qnn.QuantConv1d, {}),
    (qnn.QuantConv2d, {}),
    (qnn.QuantConvTranspose2d, {}),
])
def test_quant_conv_shapes(cls, kw, rng):
    layer = cls(8, 16, 3, rngs=rngs(), padding="SAME", **kw)
    if cls is qnn.QuantConv1d:
        x = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
        y = layer(x)
        assert y.shape == (2, 12, 16)
    else:
        x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)).astype(np.float32))
        y = layer(x)
        assert y.shape == (2, 12, 12, 16)


def test_quant_conv2d_per_channel_scale_broadcast(rng):
    layer = qnn.QuantConv2d(
        4, 8, 3, rngs=rngs(), padding="SAME",
        weight_quant=presets.Int8WeightPerChannelFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        use_bias=False, return_quant_tensor=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    y = layer(x)
    assert y.scale.shape == (8,)  # broadcasts against NHWC output
    qw = layer.quant_weight()
    assert qw.scale.shape == (1, 1, 1, 8)


def test_quant_conv_grouped(rng):
    layer = qnn.QuantConv2d(8, 8, 3, rngs=rngs(), groups=8, padding="SAME")
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    assert layer(x).shape == (2, 6, 6, 8)
    assert layer.reduce_size == 9  # depthwise fan-in = k*k*1


def test_quant_relu(rng):
    act = qnn.QuantReLU(
        act_quant=presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1),
        return_quant_tensor=True)
    x = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    y = act(x)
    assert float(jnp.min(y.value)) >= 0.0
    assert not y.signed
    assert y.is_valid()


def test_quant_hardtanh_learned_clip(rng):
    act = qnn.QuantHardTanh(max_val=2.0, return_quant_tensor=True)
    x = jnp.asarray(rng.standard_normal(256).astype(np.float32) * 5)
    y = act(x)
    assert float(jnp.max(jnp.abs(y.value))) <= 2.0 + 1e-5
    assert y.is_valid()


def test_quant_identity_binary():
    act = qnn.QuantIdentity(
        act_quant=presets.SignedBinaryActPerTensorConst.let(scaling_const=1.0),
        return_quant_tensor=True)
    x = jnp.asarray([0.3, -0.7, 2.0])
    y = act(x)
    np.testing.assert_allclose(y.value, [1.0, -1.0, 1.0])


def test_quant_avg_pool_trunc(rng):
    pool = qnn.QuantAvgPool2d(2, return_quant_tensor=True)
    ints = jnp.asarray(rng.integers(-100, 100, (1, 4, 4, 3)).astype(np.float32))
    qt = QuantTensor(ints * 0.1, jnp.asarray(0.1), jnp.asarray(0.0),
                     jnp.asarray(8.0), signed=True)
    y = pool(qt)
    assert y.value.shape == (1, 2, 2, 3)
    assert float(y.bit_width) == 8.0
    # trunc semantics: output ints = floor(sum_ints / 2^(acc_bw - 8)) / k
    assert y.is_valid()


def test_quant_max_pool_passthrough(rng):
    pool = qnn.QuantMaxPool2d(2, return_quant_tensor=True)
    qt = QuantTensor(jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32)),
                     jnp.asarray(0.1), jnp.asarray(0.0), jnp.asarray(8.0),
                     signed=True)
    y = pool(qt)
    np.testing.assert_allclose(y.scale, 0.1)
    assert y.value.shape == (1, 2, 2, 2)


def test_quant_eltwise_add_aligns_scales(rng):
    add = qnn.QuantEltwiseAdd(
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        return_quant_tensor=True)
    a = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    y = add(a, b)
    assert y.scale is not None
    np.testing.assert_allclose(y.value, np.asarray(add.input_quant(a).value)
                               + np.asarray(add.input_quant(b).value), rtol=1e-5)


def test_quant_cat(rng):
    qcat = qnn.QuantCat(
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1),
        return_quant_tensor=True)
    a = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    y = qcat([a, b], axis=1)
    assert y.value.shape == (2, 8)
    assert y.scale is not None


def test_quant_embedding(rng):
    emb = qnn.QuantEmbedding(10, 8, rngs=rngs(), return_quant_tensor=True)
    ids = jnp.asarray([0, 3, 7])
    y = emb(ids)
    assert y.value.shape == (3, 8)
    assert y.is_valid()


def test_quant_scale_bias(rng):
    sb = qnn.QuantScaleBias(8)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    y = sb(x)
    np.testing.assert_allclose(y, x, rtol=1e-6)  # weight=1, bias=0 quantized


def test_merge_bn(rng):
    layer = qnn.QuantLinear(4, 4, rngs=rngs(), weight_quant=None)
    x = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    scale = jnp.asarray([1.0, 2.0, 0.5, 1.5])
    bias = jnp.asarray([0.1, -0.2, 0.0, 0.3])
    mean = jnp.asarray([0.5, 0.1, -0.3, 0.0])
    var = jnp.asarray([1.0, 0.5, 2.0, 1.0])
    y_unfused = (layer(x) - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    qnn.merge_bn(layer, scale, bias, mean, var)
    y_fused = layer(x)
    np.testing.assert_allclose(y_fused, y_unfused, rtol=1e-4, atol=1e-5)


def test_hadamard_classifier(rng):
    cls = qnn.HadamardClassifier(16, 10)
    x = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    y = cls(x)
    assert y.shape == (2, 10)


def test_upsampling(rng):
    up = qnn.QuantUpsamplingNearest2d(2, return_quant_tensor=True)
    qt = QuantTensor(jnp.ones((1, 2, 2, 3)), jnp.asarray(0.1),
                     jnp.asarray(0.0), jnp.asarray(8.0), signed=True)
    y = up(qt)
    assert y.value.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(y.scale, 0.1)


def test_dropout(rng):
    drop = qnn.QuantDropout(0.5, rngs=rngs())
    x = jnp.ones((100,))
    y = drop(x)
    assert bool(jnp.any(y == 0))
    drop.eval_mode()
    np.testing.assert_array_equal(drop(x), x)


def test_train_eval_propagates_to_quantizers(rng):
    layer = qnn.QuantLinear(
        8, 4, rngs=rngs(),
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=1))
    layer.eval_mode()
    assert layer.input_quant.training is False
    assert layer.input_quant.scaling.training is False


def test_conv_transpose_torch_padding_semantics(rng):
    """torch ConvTranspose parity: out = (L-1)*s - 2p + k."""
    layer = qnn.QuantConvTranspose1d(4, 4, 4, stride=2, padding=[(1, 1)],
                                     weight_quant=None, rngs=rngs())
    x = jnp.asarray(rng.standard_normal((1, 10, 4)).astype(np.float32))
    y = layer(x)
    assert y.shape == (1, (10 - 1) * 2 - 2 + 4, 4)  # 20

    import torch

    tconv = torch.nn.ConvTranspose1d(4, 4, 4, stride=2, padding=1, bias=True)
    # copy weights: jax kernel (k, I, O) → torch (in, out, k)
    w = np.asarray(layer.weight[...])
    tconv.weight.data = torch.from_numpy(
        np.ascontiguousarray(w.transpose(1, 2, 0)))
    tconv.bias.data = torch.from_numpy(np.asarray(layer.bias[...]))
    y_torch = tconv(torch.from_numpy(
        np.asarray(x).transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(y, y_torch, rtol=1e-4, atol=1e-5)


def test_conv_transpose_grouped_rejected():
    with np.testing.assert_raises(ValueError):
        qnn.QuantConvTranspose1d(8, 8, 4, stride=2, groups=4,
                                 weight_quant=None, rngs=rngs())


def test_maxpool_explicit_padding(rng):
    pool = qnn.QuantMaxPool2d(2, padding=1)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    y = pool(x)
    assert y.shape == (1, 3, 3, 2)  # (4+2-2)/2+1


def test_hardtanh_asymmetric_min_val(rng):
    act = qnn.QuantHardTanh(max_val=1.0, min_val=-2.0, return_quant_tensor=True)
    x = jnp.asarray([-1.8, -0.5, 0.9])
    y = act(x)
    # threshold covers |min_val| = 2: the -1.8 input survives
    np.testing.assert_allclose(np.asarray(y.value)[0], -1.8, atol=0.02)


def test_quant_dropout_requires_rngs():
    with np.testing.assert_raises(ValueError):
        qnn.QuantDropout(0.5)


def test_batch_norm_to_quant_scale_bias_matches_eval_bn():
    from brevitas_tpu.nn import batch_norm_to_quant_scale_bias

    rng = np.random.default_rng(0)
    bn = nnx.BatchNorm(6, rngs=nnx.Rngs(0))
    # train BN so running stats and affine params are non-trivial
    bn.train()
    for _ in range(5):
        bn(jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32) * 3 + 1))
    bn.scale[...] = jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32))
    bn.bias[...] = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    bn.eval()
    x = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))
    y_bn = bn(x)
    sb = batch_norm_to_quant_scale_bias(bn, weight_quant=None)
    y_sb = sb(x)
    np.testing.assert_allclose(np.asarray(y_sb), np.asarray(y_bn),
                               rtol=1e-5, atol=1e-5)
    # with int8 weight quant the affine is approximated, not exact
    sb8 = batch_norm_to_quant_scale_bias(bn)
    err = float(jnp.max(jnp.abs(sb8(x) - y_bn)))
    assert 0 < err < 0.2


def test_batch_norm_to_quant_scale_bias_parameter_from_stats():
    """Regression: the weight quantizer must be initialized from the folded
    BN multipliers, not the all-ones placeholder."""
    from brevitas_tpu.nn import batch_norm_to_quant_scale_bias
    from brevitas_tpu.quant.config import ScalingImplType
    from brevitas_tpu.quant.presets import Int8WeightPerTensorFloat

    bn = nnx.BatchNorm(4, rngs=nnx.Rngs(0))
    bn.scale[...] = jnp.asarray([5.0, 4.0, 6.0, 5.5])
    bn.var[...] = jnp.ones(4)
    bn.eval()
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (8, 4)).astype(np.float32))
    y_bn = bn(x)
    sb = batch_norm_to_quant_scale_bias(
        bn, weight_quant=Int8WeightPerTensorFloat.let(
            scaling_impl=ScalingImplType.PARAMETER_FROM_STATS))
    err = float(jnp.max(jnp.abs(sb(x) - y_bn)))
    assert err < 0.2, err


def test_quant_upsample_generic():
    """Nearest mode repeats values and keeps quant metadata; interpolating
    modes drop it (reference nn/quant_upsample.py:16,56,87)."""
    qt = QuantTensor(jnp.arange(8.0).reshape(1, 2, 2, 2), jnp.asarray(0.1),
                     jnp.asarray(0.0), jnp.asarray(8.0), True)
    near = qnn.QuantUpsample(scale_factor=2, return_quant_tensor=True)(qt)
    assert near.shape == (1, 4, 4, 2)
    assert near.scale is not None and float(near.scale) == pytest.approx(0.1)
    np.testing.assert_array_equal(
        np.asarray(near.value[0, :2, :2, 0]),
        np.asarray([[0.0, 0.0], [0.0, 0.0]]))
    bil = qnn.QuantUpsample(size=(3, 5), mode="bilinear",
                            return_quant_tensor=True)(qt)
    assert bil.shape == (1, 3, 5, 2)
    assert bil.scale is None  # interpolation breaks integer alignment


def test_scale_bias_float_module():
    from brevitas_tpu.nn import ScaleBias

    sb = ScaleBias(4)
    sb.weight[...] = jnp.arange(1.0, 5.0)
    sb.bias[...] = jnp.full(4, 0.5)
    y = sb(jnp.ones((2, 3, 4)))
    np.testing.assert_allclose(y[0, 0], jnp.arange(1.0, 5.0) + 0.5)
    sb_nobias = ScaleBias(4, use_bias=False)
    assert sb_nobias.bias is None


def test_uint8_max_init_act_preset():
    from brevitas_tpu.nn import QuantReLU
    from brevitas_tpu.quant.presets import Uint8ActPerTensorFloatMaxInit

    act = QuantReLU(Uint8ActPerTensorFloatMaxInit.let(collect_stats_steps=1),
                    return_quant_tensor=True)
    x = jnp.linspace(-1.0, 2.0, 64).reshape(8, 8)
    qt = act(x)  # collect
    from brevitas_tpu.utils import eval_mode
    eval_mode(act)
    qt = act(x)
    assert float(qt.scale) > 0
    assert float(jnp.min(qt.value)) >= 0.0


def test_trunc_quant_accumulator_drops_lsbs():
    """TruncQuantAccumulator (reference nn/quant_accumulator.py:16): ints
    shift right by (in_bw - out_bw) on the SAME scale grid."""
    from brevitas_tpu.nn import TruncQuantAccumulator
    from brevitas_tpu.quant.presets import TruncTo8bit

    acc = TruncQuantAccumulator(TruncTo8bit)
    scale = 0.5
    ints = jnp.arange(-512.0, 512.0, 7.0)  # 11-bit signed accumulator values
    qt = QuantTensor(ints * scale, jnp.asarray(scale), jnp.asarray(0.0),
                     jnp.asarray(11.0), signed=True)
    out = acc(qt)
    assert float(out.bit_width) == 8.0
    # value = floor(int / 2^(11-8)) * scale — still on the input grid
    # (TruncTo8bit uses FLOOR, reference quant/scaled_int.py:196)
    expect = jnp.floor(ints / 8.0) * scale
    np.testing.assert_allclose(np.asarray(out.value), np.asarray(expect),
                               atol=1e-6)
    assert float(out.scale) == scale


def test_clamp_quant_accumulator_msb_clamp():
    """ClampQuantAccumulator (reference nn/quant_accumulator.py:43): clamps
    to the smaller bit-width's range keeping scale (MsbClampBitWidth)."""
    from brevitas_tpu.nn import ClampQuantAccumulator
    from brevitas_tpu.quant import QuantConfig

    cfg = QuantConfig(bit_width=8.0, signed=True)
    acc = ClampQuantAccumulator(cfg)
    scale = 0.25
    ints = jnp.asarray([-300.0, -128.0, -5.0, 0.0, 100.0, 127.0, 400.0])
    qt = QuantTensor(ints * scale, jnp.asarray(scale), jnp.asarray(0.0),
                     jnp.asarray(16.0), signed=True)
    out = acc(qt)
    assert float(out.bit_width) == 8.0
    expect = jnp.clip(ints, -128, 127) * scale
    np.testing.assert_allclose(np.asarray(out.value), np.asarray(expect),
                               atol=1e-6)
    assert float(out.scale) == scale
