"""End-to-end PTQ over the torchvision-parity float zoo.

Mirrors the reference end-to-end tier
(``tests/brevitas_end_to_end/test_torchvision_models.py``: 12 torchvision
architectures → ``preprocess_flexml`` → ``quantize_flexml``). ResNet and VGG
are covered in ``test_model_zoo.py``; this file drives the remaining
families: alexnet, squeezenet1_0, mobilenet_v2, mnasnet0_5, googlenet,
densenet121, regnet_x_400mf, fcn_resnet, deeplabv3_resnet.

Flow per architecture: randomize BN statistics (so folding is non-trivial) →
float forward → BN-fold via auto-discovered pairs → check function preserved
→ flexml 8-bit quantize (incl. standalone-BN → QuantScaleBias) → calibrate →
quantized output tracks float.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.graph.base import named_modules
from brevitas_tpu.graph.flexml import preprocess_flexml, quantize_flexml
from brevitas_tpu.graph.quantize import discover_bn_pairs
from brevitas_tpu.models import (
    adaptive_avg_pool2d,
    float_alexnet,
    float_deeplabv3,
    float_densenet,
    float_fcn,
    float_googlenet,
    float_mnasnet,
    float_mobilenet_v2,
    float_regnetx,
    float_squeezenet,
)
from brevitas_tpu.utils import eval_mode


def _randomize_bn_stats(model, rng):
    """Give every BatchNorm non-trivial running stats so BN folding and the
    BN→QuantScaleBias conversion are exercised with real affine params."""
    for _, mod in named_modules(model):
        if isinstance(mod, nnx.BatchNorm):
            n = mod.num_features
            mod.mean[...] = jnp.asarray(rng.normal(0.0, 0.2, n), jnp.float32)
            mod.var[...] = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
            if mod.scale is not None:
                mod.scale[...] = jnp.asarray(
                    rng.uniform(0.8, 1.2, n), jnp.float32)
            if mod.bias is not None:
                mod.bias[...] = jnp.asarray(
                    rng.normal(0.0, 0.1, n), jnp.float32)


# (builder, kwargs, input HW) — widths shrunk for CPU test speed
ZOO = {
    "alexnet": (float_alexnet, dict(width_mult=0.125, num_classes=10), 64),
    "squeezenet1_0": (
        float_squeezenet, dict(width_mult=0.25, num_classes=10), 64),
    "mobilenet_v2": (
        float_mobilenet_v2, dict(width_mult=0.125, num_classes=10), 64),
    "mnasnet0_5": (
        float_mnasnet, dict(alpha=0.5, width_mult=0.25, num_classes=10), 64),
    "googlenet": (
        float_googlenet, dict(width_mult=0.125, num_classes=10), 64),
    "densenet": (
        float_densenet,
        dict(growth=4, block_config=(2, 2, 2), bn_size=2, init_features=8,
             num_classes=10), 32),
    "regnet_x_400mf": (
        float_regnetx,
        dict(width_mult=0.125, depths=(1, 1, 2, 2), num_classes=10), 32),
    "fcn_resnet": (
        float_fcn,
        dict(width_mult=0.125, stage_layers=(1, 1, 1, 1), num_classes=5), 32),
    "deeplabv3_resnet": (
        float_deeplabv3,
        dict(width_mult=0.125, stage_layers=(1, 1, 1, 1),
             aspp_rates=(2, 4, 6), num_classes=5), 32),
}


@pytest.mark.parametrize("name", sorted(ZOO))
def test_flexml_end_to_end(name, rng):
    builder, kwargs, hw = ZOO[name]
    m = builder(rngs=nnx.Rngs(0), **kwargs)
    _randomize_bn_stats(m, rng)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, 3)).astype(np.float32))
    y_float = np.asarray(m(x))
    assert np.all(np.isfinite(y_float))

    # FULLY AUTOMATIC preprocess (reference preprocess_flexml:381): one
    # traced forward discovers the conv→BN pairs and the equalization
    # regions — no hand-written lists anywhere in the zoo tier
    preprocess_flexml(m, np.zeros((1, hw, hw, 3), np.float32))
    np.testing.assert_allclose(m(x), y_float, rtol=1e-2, atol=1e-2)

    quantize_flexml(m, collect_stats_steps=2)
    with G.calibration_mode(m):
        m(x)
        m(x)
    eval_mode(m)
    y_q = np.asarray(m(x))
    assert y_q.shape == y_float.shape
    err = float(np.max(np.abs(y_q - y_float)))
    span = float(np.max(np.abs(y_float)))
    assert err < 0.35 * span + 0.1, (name, err, span)


def test_bn_folding_discovers_pairs_per_arch(rng):
    """Structural sanity: the conv→BN convention yields folds where expected
    (AlexNet has none; DenseNet folds exactly its conv1→bn2 pairs)."""
    m = float_alexnet(width_mult=0.125, num_classes=10, rngs=nnx.Rngs(0))
    assert discover_bn_pairs(m) == []

    m = float_densenet(growth=4, block_config=(2, 2), bn_size=2,
                       init_features=8, num_classes=10, rngs=nnx.Rngs(0))
    pairs = discover_bn_pairs(m)
    # stem conv→bn + one (conv1, bn2) per dense layer
    assert ("stem_conv", "stem_bn") in pairs
    dense_pairs = [p for p in pairs if "conv1" in p[0]]
    assert len(dense_pairs) == 4
    assert all(b.endswith("bn2") for _, b in dense_pairs)


def test_densenet_standalone_bns_become_quant_scale_bias(rng):
    """DenseNet's pre-activation input BNs cannot fold; quantize_flexml must
    convert them to QuantScaleBias (reference flexml wbiol handler maps
    BatchNorm → BatchNorm2dToQuantScaleBias, flexml.py:338) while skipping
    the BNs merge_batchnorms already neutralized."""
    from brevitas_tpu.nn import QuantScaleBias

    m = float_densenet(growth=4, block_config=(2, 2), bn_size=2,
                       init_features=8, num_classes=10, rngs=nnx.Rngs(0))
    _randomize_bn_stats(m, rng)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    y_float = np.asarray(m(x))

    preprocess_flexml(m, bn_pairs=discover_bn_pairs(m))
    quantize_flexml(m, collect_stats_steps=2)

    kinds = [type(mod).__name__ for _, mod in named_modules(m)]
    n_sb = sum(k == "QuantScaleBias" for k in kinds)
    n_bn = sum(isinstance(mod, nnx.BatchNorm) for _, mod in named_modules(m))
    n_folded = sum(k == "FoldedBatchNorm" for k in kinds)
    # 4 dense-layer input BNs + 1 transition BN (bn→conv order) + final BN
    # = 6 conversions; the folded ones (stem + per-layer bn2) become
    # identities (the reference removes the BN node outright)
    assert n_sb == 6, kinds
    assert n_bn == 0, kinds
    assert n_folded == 5  # 1 stem + 4 bn2

    with G.calibration_mode(m):
        m(x)
        m(x)
    eval_mode(m)
    y_q = np.asarray(m(x))
    err = float(np.max(np.abs(y_q - y_float)))
    span = float(np.max(np.abs(y_float)))
    assert err < 0.35 * span + 0.1, (err, span)


def _quantize_for_export(name, rng):
    builder, kwargs, hw = ZOO[name]
    if name == "alexnet":
        hw = 224  # canonical size: the 6x6 adaptive pool is the identity
    m = builder(rngs=nnx.Rngs(0), **kwargs)
    _randomize_bn_stats(m, rng)
    preprocess_flexml(m, bn_pairs=discover_bn_pairs(m))
    quantize_flexml(m, collect_stats_steps=2)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, 3)).astype(np.float32))
    with G.calibration_mode(m):
        m(x)
        m(x)
    eval_mode(m)
    return m, x


@pytest.mark.parametrize("name", sorted(ZOO))
def test_flexml_qcdq_export(name, rng):
    """Quantize each zoo architecture and export QCDQ ONNX; the in-repo
    interpreter (the onnxruntime-oracle analogue, export/interp.py) must
    reproduce the fake-quant model's outputs. Mirrors the reference
    test_torchvision_graph_quantization_flexml_qcdq_onnx."""
    from brevitas_tpu.export import export_onnx_qcdq
    from brevitas_tpu.export.interp import run_onnx

    m, x = _quantize_for_export(name, rng)
    y_model = np.asarray(m(x))
    blob = export_onnx_qcdq(m, x)
    (y_onnx,) = run_onnx(blob, {"input": np.asarray(x).transpose(0, 3, 1, 2)})
    if y_model.ndim == 4:  # segmentation heads return NHWC maps
        y_model = y_model.transpose(0, 3, 1, 2)
    assert y_onnx.shape == y_model.shape, (y_onnx.shape, y_model.shape)
    span = float(np.max(np.abs(y_model))) + 1e-6
    np.testing.assert_allclose(y_onnx, y_model, atol=2e-2 * span + 1e-4)


def test_adaptive_avg_pool_matches_torch_bins(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 13, 9, 5)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (6, 4)))
    want = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), (6, 4))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # upsampling case (output larger than input) duplicates bins
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x)[:, :1, :1], (3, 3)))
    np.testing.assert_allclose(got, np.broadcast_to(
        x[:, :1, :1], (2, 1, 1, 5)).repeat(3, 1).repeat(3, 2).reshape(
            2, 3, 3, 5), rtol=1e-6)
