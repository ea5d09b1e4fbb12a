"""Automatic graph discovery (graph/autograph.py): the TPU-native analogue
of the reference's FX ``_extract_regions``/``walk_region``
(graph/equalize.py:185-234) and the traced BN-pair matching behind
``preprocess_flexml`` (graph/target/flexml.py:381)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from brevitas_tpu.graph import (
    equalize,
    extract_regions,
    find_bn_pairs,
    merge_batchnorms,
    preprocess_flexml,
    trace_module_graph,
)
from brevitas_tpu.graph.quantize import discover_bn_pairs

X224 = np.zeros((1, 224, 224, 3), np.float32)


def test_alexnet_regions_complete():
    """Plain sequential conv/relu/pool/flatten stack: every adjacent
    conv→conv / fc→fc pair becomes a region, walking through functional
    relu, max-pool, adaptive-avg-pool and reshape glue. conv5→fc1 is
    correctly DROPPED: the spatial flatten makes conv5's 256 output
    channels meet fc1's 9216 input dims, which the reference's
    _cross_layer_equalization rejects (equalize.py:132)."""
    from brevitas_tpu.models.torchvision_zoo import float_alexnet

    m = float_alexnet(rngs=nnx.Rngs(0))
    regions = extract_regions(m, X224)
    assert regions == [
        (["conv1"], ["conv2"]), (["conv2"], ["conv3"]),
        (["conv3"], ["conv4"]), (["conv4"], ["conv5"]),
        (["fc1"], ["fc2"]), (["fc2"], ["fc3"])]


def test_traced_bn_pairs_match_declaration_convention():
    """The traced pairs agree with the declaration-order heuristic on a
    convention-following model — but derive from real dataflow."""
    from brevitas_tpu.models.torchvision_zoo import float_mobilenet_v2

    m = float_mobilenet_v2(rngs=nnx.Rngs(0))
    traced = set(find_bn_pairs(m, X224))
    declared = set(discover_bn_pairs(m))
    assert traced == declared
    assert len(traced) >= 50  # every conv in the net has its BN


def test_traced_bn_pairs_see_through_declaration_order():
    """Declaration order lies; dataflow does not. A model whose BN is
    declared before the conv it normalizes (call order conv→bn) is found
    by the trace and missed/wrong under the declaration convention."""
    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.bn = nnx.BatchNorm(8, use_running_average=True, rngs=r)
            self.conv = nnx.Conv(3, 8, (3, 3), rngs=r)

        def __call__(self, x):
            return self.bn(self.conv(x))

    m = Net()
    x = np.zeros((1, 8, 8, 3), np.float32)
    assert find_bn_pairs(m, x) == [("conv", "bn")]


def test_residual_tap_blocks_bn_fold():
    """A conv output consumed by BOTH a BN and a residual add must not
    fold (the residual branch would see unnormalized values)."""
    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.conv = nnx.Conv(8, 8, (3, 3), padding="SAME", rngs=r)
            self.bn = nnx.BatchNorm(8, use_running_average=True, rngs=r)

        def __call__(self, x):
            y = self.conv(x)
            return self.bn(y) + y  # tap before BN

    m = Net()
    x = np.zeros((1, 8, 8, 8), np.float32)
    assert find_bn_pairs(m, x) == []


def test_mobilenet_regions_after_bn_merge_group_residual_chains():
    """MobileNetV2: pre-merge the BNs block every region (reference order:
    merge BN first); post-merge, residual chains group into multi-src /
    multi-sink regions (walk_region crosses the adds both ways)."""
    from brevitas_tpu.models.torchvision_zoo import float_mobilenet_v2

    m = float_mobilenet_v2(rngs=nnx.Rngs(0))
    assert extract_regions(m, X224) == []
    merge_batchnorms(m, find_bn_pairs(m, X224))
    regions = extract_regions(m, X224)
    assert len(regions) >= 5
    multi = [r for r in regions if len(r[0]) > 1]
    assert multi, "residual chains must group multiple sources"
    for srcs, sinks in multi:
        assert len(sinks) >= len(srcs) - 1


def test_depthwise_separable_regions():
    """Depthwise convs participate in regions (reference _get_input_axis
    depthwise branch, graph/equalize.py:89-95): the MobileNetV1 pattern
    conv → dw → pw yields BOTH the conv→dw and dw→pw regions instead of
    stopping at the grouped conv."""
    import brevitas_tpu.nn as qnn

    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.conv = qnn.QuantConv2d(3, 8, 3, padding="SAME",
                                        weight_quant=None, rngs=r)
            self.dw = qnn.QuantConv2d(8, 8, 3, groups=8, padding="SAME",
                                      weight_quant=None, rngs=r)
            self.pw = qnn.QuantConv2d(8, 16, 1, weight_quant=None, rngs=r)

        def __call__(self, x):
            import jax
            x = jax.nn.relu(self.conv(x))
            x = jax.nn.relu(self.dw(x))
            return self.pw(x)

    m = Net()
    x = np.zeros((1, 16, 16, 3), np.float32)
    assert extract_regions(m, x) == [
        (["conv"], ["dw"]), (["dw"], ["pw"])]


def test_quant_mobilenet_v1_regions_cover_depthwise():
    """The actual MobileNetV1 model (a named BASELINE config) discovers
    equalization regions through every depthwise-separable block after BN
    merge — the case the DFQ paper (arXiv:1906.04721) targets."""
    from brevitas_tpu.models.mobilenetv1 import quant_mobilenet_v1

    m = quant_mobilenet_v1(bit_width=None, width_scale=0.25, num_classes=10,
                           rngs=nnx.Rngs(0))
    sample = np.zeros((1, 224, 224, 3), np.float32)
    merge_batchnorms(m, find_bn_pairs(m, sample))
    regions = extract_regions(m, sample)
    dw_paths = {p for p, mod in _named_quant_convs(m) if mod.groups > 1}
    as_sink = {p for _, sinks in regions for p in sinks} & dw_paths
    as_src = {p for srcs, _ in regions for p in srcs} & dw_paths
    assert as_sink == dw_paths, "every depthwise conv must be a sink"
    assert as_src == dw_paths, "every depthwise conv must be a source"


def _named_quant_convs(model):
    from brevitas_tpu.graph.base import named_modules
    from brevitas_tpu.nn.conv import _QuantConvNd

    return [(p, m) for p, m in named_modules(model)
            if isinstance(m, _QuantConvNd)]


def test_auto_equalization_preserves_function(rng):
    """Equalizing auto-extracted regions is function-preserving."""
    from brevitas_tpu.models.torchvision_zoo import float_mobilenet_v2

    m = float_mobilenet_v2(rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    sample = np.zeros((1, 64, 64, 3), np.float32)
    merge_batchnorms(m, find_bn_pairs(m, sample))
    y0 = np.asarray(m(x))
    equalize(m, extract_regions(m, sample), iterations=3)
    y1 = np.asarray(m(x))
    np.testing.assert_allclose(y1, y0, atol=5e-4, rtol=5e-3)


def test_preprocess_flexml_argument_free(rng):
    """preprocess_flexml(model, sample) needs NO hand-written lists and is
    function-preserving end-to-end (reference preprocess_flexml:381)."""
    from brevitas_tpu.models.torchvision_zoo import float_mnasnet

    m = float_mnasnet(rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    y0 = np.asarray(m(x))
    preprocess_flexml(m, np.zeros((1, 64, 64, 3), np.float32))
    y1 = np.asarray(m(x))
    np.testing.assert_allclose(y1, y0, atol=5e-4, rtol=5e-3)
    # BNs actually folded
    from brevitas_tpu.nn.misc import FoldedBatchNorm
    from brevitas_tpu.graph.base import named_modules
    assert any(isinstance(mod, FoldedBatchNorm)
               for _, mod in named_modules(m))


def test_quant_model_graph_traces():
    """Quant layers trace too (innermost registered scope wins over their
    internal quantizer modules)."""
    from brevitas_tpu.models import tfc

    m = tfc(2, 2, 2, dropout=0.0, rngs=nnx.Rngs(0))
    from brevitas_tpu.utils import eval_mode

    eval_mode(m)
    g = trace_module_graph(m, np.zeros((1, 28, 28, 1), np.float32))
    # 4 QuantLinear + 3 BatchNorm + 4 QuantIdentity (input + 3 hidden)
    from brevitas_tpu.nn import QuantLinear

    linears = [p for p, n in g.modules.items()
               if isinstance(n.module, QuantLinear)]
    assert len(linears) == 4


def test_smoothquant_region_discovery_superset_of_hand_list():
    """LayerNorm→linear migration sites from the traced graph cover every
    hand-written region and additionally find the final-norm→head site."""
    from brevitas_tpu.graph.autograph import extract_act_equalization_regions
    from brevitas_tpu.models.transformer import (
        quant_transformer_tiny,
        transformer_smoothquant_regions,
    )

    m = quant_transformer_tiny(rngs=nnx.Rngs(0))
    auto = {(tuple(s), tuple(sorted(k)))
            for s, k in extract_act_equalization_regions(
                m, np.zeros((1, 16), np.int32))}
    hand = {(tuple(s), tuple(sorted(k)))
            for s, k in transformer_smoothquant_regions(m)}
    assert hand <= auto
    assert (("ln_f",), ("head",)) in auto - hand


def test_smoothquant_regions_on_llama():
    """RMSNorm sources on the Llama-family model: attention + MLP norms."""
    from brevitas_tpu.graph.autograph import extract_act_equalization_regions
    from brevitas_tpu.models.llama import quant_llama_tiny

    m = quant_llama_tiny(rngs=nnx.Rngs(0))
    regions = extract_act_equalization_regions(
        m, np.zeros((1, 16), np.int32))
    srcs = {s[0] for s, _ in regions}
    assert any("ln1" in s or "attn_norm" in s or "input" in s for s in srcs) \
        or len(regions) >= 2, regions


def test_convtranspose_equalization_region(rng):
    """Transposed convs participate as sinks (reference _supported_layers
    includes ConvTranspose with swapped axes; HWIO keeps I/O on the same
    trailing axes here) and equalization stays function-preserving."""
    import jax

    class Net(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.conv = nnx.Conv(3, 8, (3, 3), padding="SAME", rngs=r)
            self.up = nnx.ConvTranspose(8, 4, (2, 2), strides=(2, 2), rngs=r)

        def __call__(self, x):
            return self.up(jax.nn.relu(self.conv(x)))

    m = Net()
    sample = np.zeros((1, 8, 8, 3), np.float32)
    regions = extract_regions(m, sample)
    assert regions == [(["conv"], ["up"])]
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    y0 = np.asarray(m(x))
    equalize(m, regions, iterations=3)
    np.testing.assert_allclose(np.asarray(m(x)), y0, rtol=2e-3, atol=1e-4)
