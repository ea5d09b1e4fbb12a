"""Float torchvision-style model zoo for the PTQ end-to-end tier.

The reference's end-to-end tier runs 12 torchvision architectures through the
flexml auto-quant pipeline (``tests/brevitas_end_to_end/
test_torchvision_models.py:21`` MODEL_LIST: mobilenet_v2, resnet50, resnet18,
mnasnet0_5, alexnet, googlenet, vgg11, densenet121, deeplabv3_resnet50,
fcn_resnet50, regnet_x_400mf, squeezenet1_0). ResNet and VGG live in their own
modules (``models/resnet.py``, ``models/vgg.py``); this module provides the
rest as plain float NNX models (NHWC) that feed
``graph.flexml.preprocess_flexml`` + ``quantize_flexml``:

* :func:`float_alexnet` — plain conv/ReLU/maxpool stack, no BatchNorm.
* :func:`float_squeezenet` — Fire modules (squeeze → expand1x1/expand3x3
  concat), all-conv classifier.
* :func:`float_mobilenet_v2` — inverted residuals (expand → depthwise →
  project) with ReLU6 and stride-1 residual adds.
* :func:`float_mnasnet` — MNASNet-style inverted residuals incl. 5x5
  depthwise kernels.
* :func:`float_googlenet` — Inception modules (4-branch concat incl. a
  maxpool branch), conv+BN+ReLU basic blocks.
* :func:`float_densenet` — pre-activation dense blocks (BN→ReLU→conv) with
  feature concatenation and avg-pool transitions. The BN→conv ordering means
  only the conv1→bn2 pairs fold; the per-layer input BNs and the final BN
  stay standalone and exercise the flexml BN→QuantScaleBias handler
  (reference flexml.py:338 maps BatchNorm to BatchNorm2dToQuantScaleBias).
* :func:`float_regnetx` — RegNet-X bottleneck blocks with grouped 3x3 convs.
* :func:`float_fcn` / :func:`float_deeplabv3` — segmentation heads (FCN head;
  DeepLabV3 ASPP with dilated convs + image pooling) on a dilated float
  ResNet backbone, bilinear-upsampled to input resolution.

Every model follows the zoo-wide structural convention (a BatchNorm declared
directly after the conv whose output it normalizes), so
``graph.quantize.discover_bn_pairs`` finds the fusion sites without explicit
metadata. Channel counts are torchvision defaults scaled by ``width_mult``.
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = [
    "float_alexnet",
    "float_squeezenet",
    "float_mobilenet_v2",
    "float_mnasnet",
    "float_googlenet",
    "float_densenet",
    "float_regnetx",
    "float_fcn",
    "float_deeplabv3",
    "adaptive_avg_pool2d",
]


def _ch(c: float, width_mult: float, floor: int = 4) -> int:
    return max(floor, int(round(c * width_mult)))


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC adaptive average pooling with torch's bin rule
    (window i = [floor(i*In/Out), ceil((i+1)*In/Out))). Output sizes are
    static, so the Python loops unroll at trace time."""
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    oh, ow = out_hw
    _, ih, iw, _ = x.shape
    if (ih, iw) == (oh, ow):
        return x
    if ih % oh == 0 and iw % ow == 0:
        # uniform bins: a plain average pool (one reduce_window the XLA/TPU
        # backend tiles well, and a shape the export deriver maps directly)
        kh, kw = ih // oh, iw // ow
        return nnx.avg_pool(x, (kh, kw), strides=(kh, kw), padding="VALID")

    def bins(i_size, o_size):
        return [(math.floor(i * i_size / o_size),
                 math.ceil((i + 1) * i_size / o_size)) for i in range(o_size)]

    rows = [jnp.mean(x[:, r0:r1], axis=1) for r0, r1 in bins(ih, oh)]
    x = jnp.stack(rows, axis=1)  # (B, oh, iw, C)
    cols = [jnp.mean(x[:, :, c0:c1], axis=2) for c0, c1 in bins(iw, ow)]
    return jnp.stack(cols, axis=2)  # (B, oh, ow, C)


def _conv(in_ch, out_ch, kernel, *, stride=1, pad=None, groups=1, dilation=1,
          use_bias=True, rngs):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if pad is None:
        pad = [(d * (k // 2), d * (k // 2))
               for k, d in zip(kernel, (dilation, dilation))]
    elif isinstance(pad, int):
        pad = [(pad, pad)] * 2
    return nnx.Conv(in_ch, out_ch, kernel, strides=(stride, stride),
                    padding=pad, feature_group_count=groups,
                    kernel_dilation=(dilation, dilation), use_bias=use_bias,
                    rngs=rngs)


def _bn(ch, *, rngs):
    return nnx.BatchNorm(ch, use_running_average=True, rngs=rngs)


def _max_pool(x, k, s, padding="VALID"):
    return nnx.max_pool(x, (k, k), strides=(s, s), padding=padding)


class _ConvBNAct(nnx.Module):
    """conv → BN → {relu | relu6 | none}; conv and bn are adjacent attributes
    so ``discover_bn_pairs`` pairs them."""

    def __init__(self, in_ch, out_ch, kernel, *, stride=1, groups=1,
                 dilation=1, act="relu", rngs):
        self.conv = _conv(in_ch, out_ch, kernel, stride=stride, groups=groups,
                          dilation=dilation, use_bias=False, rngs=rngs)
        self.bn = _bn(out_ch, rngs=rngs)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        if self.act == "relu":
            return jax.nn.relu(x)
        if self.act == "relu6":
            return jnp.minimum(jax.nn.relu(x), 6.0)
        return x



def _bn_items(bn):
    """ONNX items for a (possibly folded / converted) BatchNorm slot: folded
    BNs are identities and emit nothing; an unfolded nnx.BatchNorm or a
    converted QuantScaleBias emits itself (both have export handlers)."""
    if getattr(bn, "folded_away", False):
        return []
    return [bn]


# ---------------------------------------------------------------- AlexNet ---


class FloatAlexNet(nnx.Module):
    """torchvision ``alexnet``: five convs (no BN), three maxpools, adaptive
    6x6 pool, dropout-MLP classifier."""

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 width_mult: float = 1.0, dropout: float = 0.5,
                 rngs: nnx.Rngs):
        w = lambda c: _ch(c, width_mult)
        self.conv1 = _conv(in_channels, w(64), 11, stride=4, pad=2, rngs=rngs)
        self.conv2 = _conv(w(64), w(192), 5, pad=2, rngs=rngs)
        self.conv3 = _conv(w(192), w(384), 3, rngs=rngs)
        self.conv4 = _conv(w(384), w(256), 3, rngs=rngs)
        self.conv5 = _conv(w(256), w(256), 3, rngs=rngs)
        self.drop1 = nnx.Dropout(dropout, rngs=rngs)
        self.fc1 = nnx.Linear(w(256) * 36, w(4096), rngs=rngs)
        self.drop2 = nnx.Dropout(dropout, rngs=rngs)
        self.fc2 = nnx.Linear(w(4096), w(4096), rngs=rngs)
        self.fc3 = nnx.Linear(w(4096), num_classes, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        x = _max_pool(jax.nn.relu(self.conv1(x)), 3, 2)
        x = _max_pool(jax.nn.relu(self.conv2(x)), 3, 2)
        x = jax.nn.relu(self.conv3(x))
        x = jax.nn.relu(self.conv4(x))
        x = _max_pool(jax.nn.relu(self.conv5(x)), 3, 2)
        x = adaptive_avg_pool2d(x, 6).reshape(x.shape[0], -1)
        x = jax.nn.relu(self.fc1(self.drop1(x, deterministic=deterministic)))
        x = jax.nn.relu(self.fc2(self.drop2(x, deterministic=deterministic)))
        return self.fc3(x)



def float_alexnet(**kw) -> FloatAlexNet:
    return FloatAlexNet(**kw)


# ------------------------------------------------------------- SqueezeNet ---


class _Fire(nnx.Module):
    """squeeze 1x1 → ReLU → [expand 1x1 ∥ expand 3x3] → concat."""

    def __init__(self, in_ch, squeeze, e1, e3, *, rngs):
        self.squeeze = _conv(in_ch, squeeze, 1, rngs=rngs)
        self.expand1 = _conv(squeeze, e1, 1, rngs=rngs)
        self.expand3 = _conv(squeeze, e3, 3, rngs=rngs)
        self.out_channels = e1 + e3

    def __call__(self, x):
        s = jax.nn.relu(self.squeeze(x))
        return jnp.concatenate(
            [jax.nn.relu(self.expand1(s)), jax.nn.relu(self.expand3(s))],
            axis=-1)



class FloatSqueezeNet(nnx.Module):
    """torchvision ``squeezenet1_0``: all-conv classifier + global pool."""

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 width_mult: float = 1.0, dropout: float = 0.5,
                 rngs: nnx.Rngs):
        w = lambda c: _ch(c, width_mult)
        self.stem = _conv(in_channels, w(96), 7, stride=2, rngs=rngs)
        cfg = [(w(16), w(64), w(64)), (w(16), w(64), w(64)),
               (w(32), w(128), w(128)), (w(32), w(128), w(128)),
               (w(48), w(192), w(192)), (w(48), w(192), w(192)),
               (w(64), w(256), w(256)), (w(64), w(256), w(256))]
        fires, in_ch = [], w(96)
        for sq, e1, e3 in cfg:
            fires.append(_Fire(in_ch, sq, e1, e3, rngs=rngs))
            in_ch = fires[-1].out_channels
        self.fires = nnx.List(fires)
        self.pool_after = (2, 6)  # maxpool after these fire indices (and stem)
        self.drop = nnx.Dropout(dropout, rngs=rngs)
        self.classifier = _conv(in_ch, num_classes, 1, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        x = _max_pool(jax.nn.relu(self.stem(x)), 3, 2)
        for i, fire in enumerate(self.fires):
            x = fire(x)
            if i in self.pool_after:
                x = _max_pool(x, 3, 2)
        x = self.drop(x, deterministic=deterministic)
        x = jax.nn.relu(self.classifier(x))
        return jnp.mean(x, axis=(1, 2))



def float_squeezenet(**kw) -> FloatSqueezeNet:
    return FloatSqueezeNet(**kw)


# ----------------------------------------------- MobileNetV2 and MNASNet ---


class _InvertedResidual(nnx.Module):
    """1x1 expand → kxk depthwise → 1x1 project (linear); residual add at
    stride 1 with matching channels. Covers MobileNetV2 (k=3, ReLU6) and
    MNASNet (k∈{3,5}, ReLU)."""

    def __init__(self, in_ch, out_ch, *, stride, expand_ratio, kernel=3,
                 act="relu6", rngs):
        hidden = max(4, int(round(in_ch * expand_ratio)))
        self.expand = (None if expand_ratio == 1 else
                       _ConvBNAct(in_ch, hidden, 1, act=act, rngs=rngs))
        self.depthwise = _ConvBNAct(hidden, hidden, kernel, stride=stride,
                                    groups=hidden, act=act, rngs=rngs)
        self.project = _ConvBNAct(hidden, out_ch, 1, act="none", rngs=rngs)
        self.use_residual = stride == 1 and in_ch == out_ch

    def __call__(self, x):
        y = x if self.expand is None else self.expand(x)
        y = self.project(self.depthwise(y))
        return x + y if self.use_residual else y



class FloatMobileNetV2(nnx.Module):
    """torchvision ``mobilenet_v2`` (t, c, n, s inverted-residual table)."""

    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 width_mult: float = 1.0, dropout: float = 0.2,
                 rngs: nnx.Rngs):
        w = lambda c: _ch(c, width_mult)
        self.stem = _ConvBNAct(in_channels, w(32), 3, stride=2, act="relu6",
                               rngs=rngs)
        blocks, in_ch = [], w(32)
        for t, c, n, s in self.CFG:
            for j in range(n):
                blocks.append(_InvertedResidual(
                    in_ch, w(c), stride=s if j == 0 else 1, expand_ratio=t,
                    act="relu6", rngs=rngs))
                in_ch = w(c)
        self.blocks = nnx.List(blocks)
        self.head = _ConvBNAct(in_ch, w(1280), 1, act="relu6", rngs=rngs)
        self.drop = nnx.Dropout(dropout, rngs=rngs)
        self.classifier = nnx.Linear(w(1280), num_classes, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        x = self.stem(x)
        for blk in self.blocks:
            x = blk(x)
        x = jnp.mean(self.head(x), axis=(1, 2))
        return self.classifier(self.drop(x, deterministic=deterministic))



def float_mobilenet_v2(**kw) -> FloatMobileNetV2:
    return FloatMobileNetV2(**kw)


class FloatMNASNet(nnx.Module):
    """torchvision ``mnasnet0_5``-style: sep-conv stem stage then
    (t, c, n, s, k) inverted residuals incl. 5x5 depthwise kernels. ``alpha``
    is the MNASNet depth multiplier (0.5 for mnasnet0_5)."""

    CFG = [(3, 24, 3, 2, 3), (3, 40, 3, 2, 5), (6, 80, 3, 2, 5),
           (6, 96, 2, 1, 3), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 alpha: float = 0.5, width_mult: float = 1.0,
                 dropout: float = 0.2, rngs: nnx.Rngs):
        w = lambda c: _ch(c * alpha, width_mult)
        stem_ch = w(32)
        self.stem = _ConvBNAct(in_channels, stem_ch, 3, stride=2, rngs=rngs)
        # separable first stage: depthwise 3x3 + linear 1x1 projection
        self.sep_dw = _ConvBNAct(stem_ch, stem_ch, 3, groups=stem_ch,
                                 rngs=rngs)
        self.sep_pw = _ConvBNAct(stem_ch, w(16), 1, act="none", rngs=rngs)
        blocks, in_ch = [], w(16)
        for t, c, n, s, k in self.CFG:
            for j in range(n):
                blocks.append(_InvertedResidual(
                    in_ch, w(c), stride=s if j == 0 else 1, expand_ratio=t,
                    kernel=k, act="relu", rngs=rngs))
                in_ch = w(c)
        self.blocks = nnx.List(blocks)
        head_ch = _ch(1280, width_mult)  # head is not alpha-scaled
        self.head = _ConvBNAct(in_ch, head_ch, 1, rngs=rngs)
        self.drop = nnx.Dropout(dropout, rngs=rngs)
        self.classifier = nnx.Linear(head_ch, num_classes, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        x = self.sep_pw(self.sep_dw(self.stem(x)))
        for blk in self.blocks:
            x = blk(x)
        x = jnp.mean(self.head(x), axis=(1, 2))
        return self.classifier(self.drop(x, deterministic=deterministic))



def float_mnasnet(**kw) -> FloatMNASNet:
    return FloatMNASNet(**kw)


# -------------------------------------------------------------- GoogLeNet ---


class _Inception(nnx.Module):
    """Four-branch Inception module (torchvision ``googlenet`` uses 3x3 in
    the "5x5" branch); outputs concatenate on channels."""

    def __init__(self, in_ch, c1, c3r, c3, c5r, c5, pool_proj, *, rngs):
        self.branch1 = _ConvBNAct(in_ch, c1, 1, rngs=rngs)
        self.branch2a = _ConvBNAct(in_ch, c3r, 1, rngs=rngs)
        self.branch2b = _ConvBNAct(c3r, c3, 3, rngs=rngs)
        self.branch3a = _ConvBNAct(in_ch, c5r, 1, rngs=rngs)
        self.branch3b = _ConvBNAct(c5r, c5, 3, rngs=rngs)
        self.branch4 = _ConvBNAct(in_ch, pool_proj, 1, rngs=rngs)
        self.out_channels = c1 + c3 + c5 + pool_proj

    def __call__(self, x):
        return jnp.concatenate([
            self.branch1(x),
            self.branch2b(self.branch2a(x)),
            self.branch3b(self.branch3a(x)),
            self.branch4(_max_pool(x, 3, 1, padding="SAME")),
        ], axis=-1)



class FloatGoogLeNet(nnx.Module):
    """torchvision ``googlenet`` (aux_logits=False): conv stem + 9 Inception
    modules + global pool."""

    # (c1, c3r, c3, c5r, c5, pool_proj) for 3a..5b
    CFG = [(64, 96, 128, 16, 32, 32), (128, 128, 192, 32, 96, 64),
           (192, 96, 208, 16, 48, 64), (160, 112, 224, 24, 64, 64),
           (128, 128, 256, 24, 64, 64), (112, 144, 288, 32, 64, 64),
           (256, 160, 320, 32, 128, 128), (256, 160, 320, 32, 128, 128),
           (384, 192, 384, 48, 128, 128)]
    POOL_AFTER = (1, 6)  # maxpool after 3b and 4e

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 width_mult: float = 1.0, dropout: float = 0.2,
                 rngs: nnx.Rngs):
        w = lambda c: _ch(c, width_mult)
        self.stem1 = _ConvBNAct(in_channels, w(64), 7, stride=2, rngs=rngs)
        self.stem2 = _ConvBNAct(w(64), w(64), 1, rngs=rngs)
        self.stem3 = _ConvBNAct(w(64), w(192), 3, rngs=rngs)
        modules, in_ch = [], w(192)
        for cfg in self.CFG:
            modules.append(_Inception(in_ch, *map(w, cfg), rngs=rngs))
            in_ch = modules[-1].out_channels
        self.inceptions = nnx.List(modules)
        self.drop = nnx.Dropout(dropout, rngs=rngs)
        self.classifier = nnx.Linear(in_ch, num_classes, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        x = _max_pool(self.stem1(x), 3, 2, padding="SAME")
        x = _max_pool(self.stem3(self.stem2(x)), 3, 2, padding="SAME")
        for i, inc in enumerate(self.inceptions):
            x = inc(x)
            if i in self.POOL_AFTER:
                x = _max_pool(x, 3, 2, padding="SAME")
        x = jnp.mean(x, axis=(1, 2))
        return self.classifier(self.drop(x, deterministic=deterministic))



def float_googlenet(**kw) -> FloatGoogLeNet:
    return FloatGoogLeNet(**kw)


# --------------------------------------------------------------- DenseNet ---


class _DenseLayer(nnx.Module):
    """BN→ReLU→1x1 conv (bn_size·k) → BN→ReLU→3x3 conv (k); the input BN
    (``bn1``) follows a concat so it cannot fold — conv1→bn2 can."""

    def __init__(self, in_ch, growth, bn_size, *, rngs):
        self.bn1 = _bn(in_ch, rngs=rngs)
        self.conv1 = _conv(in_ch, bn_size * growth, 1, use_bias=False,
                           rngs=rngs)
        self.bn2 = _bn(bn_size * growth, rngs=rngs)
        self.conv2 = _conv(bn_size * growth, growth, 3, use_bias=False,
                           rngs=rngs)

    def __call__(self, x):
        y = self.conv1(jax.nn.relu(self.bn1(x)))
        return self.conv2(jax.nn.relu(self.bn2(y)))



class _Transition(nnx.Module):
    def __init__(self, in_ch, out_ch, *, rngs):
        self.bn = _bn(in_ch, rngs=rngs)
        self.conv = _conv(in_ch, out_ch, 1, use_bias=False, rngs=rngs)

    def __call__(self, x):
        x = self.conv(jax.nn.relu(self.bn(x)))
        return nnx.avg_pool(x, (2, 2), strides=(2, 2))



class FloatDenseNet(nnx.Module):
    """torchvision ``densenet121``-family: dense blocks concatenate every
    layer's ``growth`` new channels; transitions halve channels and
    resolution."""

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 growth: int = 32, block_config: Sequence[int] = (6, 12, 24, 16),
                 bn_size: int = 4, init_features: Optional[int] = None,
                 rngs: nnx.Rngs):
        ch = init_features if init_features is not None else 2 * growth
        self.stem_conv = _conv(in_channels, ch, 7, stride=2, use_bias=False,
                               rngs=rngs)
        self.stem_bn = _bn(ch, rngs=rngs)
        layers, transitions = [], []
        for bi, n_layers in enumerate(block_config):
            block = []
            for _ in range(n_layers):
                block.append(_DenseLayer(ch, growth, bn_size, rngs=rngs))
                ch += growth
            layers.append(nnx.List(block))
            if bi != len(block_config) - 1:
                transitions.append(_Transition(ch, ch // 2, rngs=rngs))
                ch //= 2
        self.blocks = nnx.List(layers)
        self.transitions = nnx.List(transitions)
        self.final_bn = _bn(ch, rngs=rngs)
        self.classifier = nnx.Linear(ch, num_classes, rngs=rngs)

    def __call__(self, x):
        x = jax.nn.relu(self.stem_bn(self.stem_conv(x)))
        x = _max_pool(x, 3, 2, padding="SAME")
        for bi, block in enumerate(self.blocks):
            for layer in block:
                x = jnp.concatenate([x, layer(x)], axis=-1)
            if bi < len(self.transitions):
                x = self.transitions[bi](x)
        x = jax.nn.relu(self.final_bn(x))
        return self.classifier(jnp.mean(x, axis=(1, 2)))



def float_densenet(**kw) -> FloatDenseNet:
    return FloatDenseNet(**kw)


# ---------------------------------------------------------------- RegNetX ---


class _XBlock(nnx.Module):
    """RegNet-X bottleneck: 1x1 → grouped 3x3 → 1x1 with projection shortcut
    (bottleneck ratio 1, as in regnet_x_*)."""

    def __init__(self, in_ch, out_ch, *, stride, group_width, rngs):
        groups = max(1, out_ch // group_width)
        self.conv1 = _ConvBNAct(in_ch, out_ch, 1, rngs=rngs)
        self.conv2 = _ConvBNAct(out_ch, out_ch, 3, stride=stride,
                                groups=groups, rngs=rngs)
        self.conv3 = _ConvBNAct(out_ch, out_ch, 1, act="none", rngs=rngs)
        self.proj = (None if stride == 1 and in_ch == out_ch else
                     _ConvBNAct(in_ch, out_ch, 1, stride=stride, act="none",
                                rngs=rngs))

    def __call__(self, x):
        identity = x if self.proj is None else self.proj(x)
        return jax.nn.relu(self.conv3(self.conv2(self.conv1(x))) + identity)



class FloatRegNetX(nnx.Module):
    """torchvision ``regnet_x_400mf``: stem 3x3/s2 then 4 stages of X-blocks
    (depths (1, 2, 7, 12), widths (32, 64, 160, 400), group width 16)."""

    def __init__(self, *, num_classes: int = 1000, in_channels: int = 3,
                 depths: Sequence[int] = (1, 2, 7, 12),
                 widths: Sequence[int] = (32, 64, 160, 400),
                 group_width: int = 16, width_mult: float = 1.0,
                 rngs: nnx.Rngs):
        gw = max(1, int(round(group_width * width_mult)))
        ws = [max(gw, int(round(c * width_mult)) // gw * gw) for c in widths]
        self.stem = _ConvBNAct(in_channels, _ch(32, width_mult), 3, stride=2,
                               rngs=rngs)
        blocks, in_ch = [], _ch(32, width_mult)
        for depth, out_ch in zip(depths, ws):
            for j in range(depth):
                blocks.append(_XBlock(in_ch, out_ch, stride=2 if j == 0 else 1,
                                      group_width=gw, rngs=rngs))
                in_ch = out_ch
        self.blocks = nnx.List(blocks)
        self.classifier = nnx.Linear(in_ch, num_classes, rngs=rngs)

    def __call__(self, x):
        x = self.stem(x)
        for blk in self.blocks:
            x = blk(x)
        return self.classifier(jnp.mean(x, axis=(1, 2)))



def float_regnetx(**kw) -> FloatRegNetX:
    return FloatRegNetX(**kw)


# ----------------------------------------------------------- Segmentation ---


class _FCNHead(nnx.Module):
    """torchvision FCNHead: 3x3 conv-BN-ReLU → dropout → 1x1 classifier."""

    def __init__(self, in_ch, num_classes, *, rngs):
        inter = max(4, in_ch // 4)
        self.conv = _ConvBNAct(in_ch, inter, 3, rngs=rngs)
        self.drop = nnx.Dropout(0.1, rngs=rngs)
        self.classifier = _conv(inter, num_classes, 1, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        return self.classifier(
            self.drop(self.conv(x), deterministic=deterministic))



class _ASPP(nnx.Module):
    """DeepLabV3 atrous spatial pyramid pooling: 1x1 + three dilated 3x3
    branches + global image pooling, concatenated and projected."""

    def __init__(self, in_ch, out_ch, *, rates=(12, 24, 36), rngs):
        self.branch0 = _ConvBNAct(in_ch, out_ch, 1, rngs=rngs)
        self.branches = nnx.List([
            _ConvBNAct(in_ch, out_ch, 3, dilation=r, rngs=rngs)
            for r in rates])
        self.image_pool = _ConvBNAct(in_ch, out_ch, 1, rngs=rngs)
        self.project = _ConvBNAct(out_ch * (len(rates) + 2), out_ch, 1,
                                  rngs=rngs)
        self.drop = nnx.Dropout(0.5, rngs=rngs)

    def __call__(self, x, *, deterministic: bool = True):
        feats = [self.branch0(x)] + [b(x) for b in self.branches]
        pooled = self.image_pool(jnp.mean(x, axis=(1, 2), keepdims=True))
        feats.append(jnp.broadcast_to(
            pooled, pooled.shape[:1] + x.shape[1:3] + pooled.shape[3:]))
        y = self.project(jnp.concatenate(feats, axis=-1))
        return self.drop(y, deterministic=deterministic)



class FloatSegmentation(nnx.Module):
    """torchvision ``fcn_resnet50`` / ``deeplabv3_resnet50`` analogue: a
    dilated float-ResNet backbone (stride-8 final stages, like
    replace_stride_with_dilation=[False, True, True]) with an FCN or
    DeepLabV3 head, bilinearly upsampled to input resolution."""

    def __init__(self, *, head: str = "fcn", num_classes: int = 21,
                 in_channels: int = 3, width_mult: float = 1.0,
                 stage_layers: Sequence[int] = (2, 2, 2, 2),
                 aspp_rates: Sequence[int] = (12, 24, 36),
                 rngs: nnx.Rngs):
        from brevitas_tpu.models.resnet import _FloatBasicBlock, _FloatConvBN
        from brevitas_tpu.models.resnet import _STAGE_CH

        stem_ch = _ch(64, width_mult)
        self.stem = _FloatConvBN(in_channels, stem_ch, 7, 2, rngs=rngs)
        blocks, in_ch = [], stem_ch
        for stage, n_layers in enumerate(stage_layers):
            ch = _ch(_STAGE_CH[stage], width_mult)
            for j in range(n_layers):
                # stride-8 output: stages 3 and 4 keep stride 1 (dilation in
                # torchvision; plain stride-1 here keeps the quant pipeline
                # identical while preserving the topology)
                stride = 2 if (j == 0 and stage == 1) else 1
                blocks.append(_FloatBasicBlock(in_ch, ch, stride, rngs=rngs))
                in_ch = ch
        self.blocks = nnx.List(blocks)
        if head == "fcn":
            self.head = _FCNHead(in_ch, num_classes, rngs=rngs)
        elif head == "deeplabv3":
            aspp_ch = _ch(256, width_mult)
            self.aspp = _ASPP(in_ch, aspp_ch, rates=aspp_rates, rngs=rngs)
            self.head = _FCNHead(aspp_ch, num_classes, rngs=rngs)
        else:
            raise ValueError(head)
        self.head_kind = head
        # backbone output stride is 8 (stem /2, maxpool /2, stage-1 /2); an
        # Upsample MODULE (not raw jax.image.resize) so the traced export
        # derivation sees one Resize node instead of the bilinear gather soup
        from brevitas_tpu.nn.misc import QuantUpsample
        self.upsample = QuantUpsample(scale_factor=8, mode="bilinear")

    def __call__(self, x, *, deterministic: bool = True):
        x = _max_pool(jax.nn.relu(self.stem(x)), 3, 2, padding="SAME")
        for blk in self.blocks:
            x = blk(x)
        if self.head_kind == "deeplabv3":
            x = self.aspp(x, deterministic=deterministic)
        x = self.head(x, deterministic=deterministic)
        return self.upsample(x)





def float_fcn(**kw) -> FloatSegmentation:
    return FloatSegmentation(head="fcn", **kw)


def float_deeplabv3(**kw) -> FloatSegmentation:
    return FloatSegmentation(head="deeplabv3", **kw)
