"""FlexML-style auto-quantization pipeline.

Reference: ``src/brevitas/graph/target/flexml.py`` — ``preprocess_flexml:381``
(trace → standardize → merge BN → equalize) and ``quantize_flexml:398``
(8-bit fixed-point quantizers: po2 scales, per-tensor, act quantizers at
every activation, residual re-quant alignment). The FX tracing steps become
explicit arguments (BN pairs, equalization regions) since NNX module trees
need no tracer for module-level rewriting.
"""

from typing import List, Optional, Sequence, Tuple

from flax import nnx

from brevitas_tpu.core.restrict import FloatToIntImpl, RestrictType
from brevitas_tpu.graph.calibrate import clip_float_weights
from brevitas_tpu.graph.equalize import equalize
from brevitas_tpu.graph.quantize import merge_batchnorms, quantize
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFixedPoint,
    Int8WeightPerTensorFixedPoint,
    Int32Bias,
    Uint8ActPerTensorFixedPoint,
)

# 8-bit fixed-point defaults (reference flexml.py:41 QUANT_WBIOL_MAP)
FLEXML_WEIGHT_QUANT = Int8WeightPerTensorFixedPoint
FLEXML_ACT_QUANT = Int8ActPerTensorFixedPoint
FLEXML_UACT_QUANT = Uint8ActPerTensorFixedPoint
FLEXML_BIAS_QUANT = Int32Bias


def preprocess_flexml(
    model: nnx.Module,
    sample_input=None,
    bn_pairs: Optional[Sequence[Tuple[str, str]]] = None,
    equalize_regions: Optional[List[Tuple[Sequence[str], Sequence[str]]]] = None,
    equalize_iterations: int = 10,
    clip_threshold: Optional[float] = None,
) -> nnx.Module:
    """BN fusion + cross-layer equalization + optional weight clipping
    (reference preprocess_flexml, flexml.py:381).

    Fully automatic when given ``sample_input``: one traced forward
    (``graph.autograph``) discovers the conv→BN fusion pairs and the
    equalization regions exactly like the reference's FX walk — no
    hand-written pair/region lists. Regions are re-extracted AFTER BN
    fusion, matching the reference's transform order (trace → merge BN →
    equalize). Explicit ``bn_pairs``/``equalize_regions`` override
    discovery."""
    if sample_input is not None:
        from brevitas_tpu.graph.autograph import extract_regions, find_bn_pairs

        if bn_pairs is None:
            bn_pairs = find_bn_pairs(model, sample_input)
        if bn_pairs:
            merge_batchnorms(model, bn_pairs)
        if equalize_regions is None:
            equalize_regions = extract_regions(model, sample_input)
    elif bn_pairs:
        merge_batchnorms(model, bn_pairs)
    if equalize_regions:
        equalize(model, equalize_regions, iterations=equalize_iterations)
    if clip_threshold is not None:
        clip_float_weights(model, clip_threshold)
    return model


def quantize_flexml(model: nnx.Module, *, rngs: Optional[nnx.Rngs] = None,
                    collect_stats_steps: int = 30) -> nnx.Module:
    """Swap float layers for 8-bit fixed-point quant layers (reference
    quantize_flexml, flexml.py:398). Run calibration_mode afterwards."""
    return quantize(
        model,
        weight_quant=FLEXML_WEIGHT_QUANT,
        act_quant=FLEXML_ACT_QUANT.let(collect_stats_steps=collect_stats_steps),
        bias_quant=FLEXML_BIAS_QUANT,
        rngs=rngs,
        # standalone BatchNorms (anything merge_batchnorms could not fold)
        # become QuantScaleBias, as in the reference wbiol handler
        # (flexml.py:338)
        bn_to_scale_bias=True)
