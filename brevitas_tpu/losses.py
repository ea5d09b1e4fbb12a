"""Bit-width regularization losses for mixed-precision search.

Reference: ``src/brevitas/loss/weighted_bit_width.py`` —
WeightBitWidthWeightedBySize:56, ActivationBitWidthWeightedBySize:74,
QuantLayerOutputBitWidthWeightedByOps:92 — objectives over LEARNED bit-widths
(BitWidthImplType.PARAMETER) that pull precision down weighted by how much
each tensor contributes to model size / compute. They double as observable
model-size metrics.
"""

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.graph.base import find_modules, named_modules
from brevitas_tpu.nn.quant_layer import QuantWBIOL
from brevitas_tpu.quant.config import BitWidthImplType, QuantType
from brevitas_tpu.quant.quantizers import ActQuantizer, ParameterQuantizer


def _learned_weight_quantizers(model) -> List[Tuple[str, ParameterQuantizer, int]]:
    out = []
    for path, layer in find_modules(model, QuantWBIOL):
        wq = layer.weight_quant
        if (wq.quant_type != QuantType.NONE
                and wq.cfg.bit_width_impl == BitWidthImplType.PARAMETER):
            out.append((path, wq, int(np.prod(layer.weight[...].shape))))
    return out


def weight_bit_width_weighted_by_size(model) -> jnp.ndarray:
    """sum(bw_i * numel_i) / sum(numel_i) over learned weight bit-widths
    (reference WeightBitWidthWeightedBySize)."""
    total, denom = 0.0, 0
    for _, wq, size in _learned_weight_quantizers(model):
        total = total + wq.bit_width_impl() * size
        denom += size
    if denom == 0:
        return jnp.asarray(0.0)
    return total / denom


def act_bit_width_weighted_by_size(
        model, act_sizes: Optional[Dict[str, int]] = None) -> jnp.ndarray:
    """Weighted mean of learned activation bit-widths; ``act_sizes`` maps
    quantizer paths to activation element counts (defaults to 1 each)."""
    total, denom = 0.0, 0
    for path, mod in named_modules(model):
        if isinstance(mod, ActQuantizer) and mod.quant_type != QuantType.NONE \
                and mod.cfg.bit_width_impl == BitWidthImplType.PARAMETER:
            size = (act_sizes or {}).get(path, 1)
            total = total + mod.bit_width_impl() * size
            denom += size
    if denom == 0:
        return jnp.asarray(0.0)
    return total / denom


def output_bit_width_weighted_by_ops(
        model, layer_ops: Optional[Dict[str, int]] = None) -> jnp.ndarray:
    """Accumulator bit-width weighted by per-layer MAC counts (reference
    QuantLayerOutputBitWidthWeightedByOps). ``layer_ops`` maps layer paths to
    op counts; defaults to the layer fan-in."""
    total, denom = 0.0, 0
    for path, layer in find_modules(model, QuantWBIOL):
        wq = layer.weight_quant
        iq = layer.input_quant
        if wq.quant_type == QuantType.NONE or iq.quant_type == QuantType.NONE:
            continue
        ops = (layer_ops or {}).get(path, layer.reduce_size)
        acc_bw = layer.max_acc_bit_width(iq.bit_width_impl(),
                                         wq.bit_width_impl())
        total = total + acc_bw * ops
        denom += ops
    if denom == 0:
        return jnp.asarray(0.0)
    return total / denom


def log_quantizer_bit_widths(model) -> Dict[str, float]:
    """Observability helper (reference LogWeightBitWidth/LogActivationBitWidth,
    utils/logging.py:28-43): current effective bit-width per quantizer."""
    out = {}
    for path, mod in named_modules(model):
        if isinstance(mod, (ActQuantizer, ParameterQuantizer)) \
                and mod.quant_type != QuantType.NONE:
            out[path] = float(mod.bit_width_impl())
    return out


def quant_grid_regularizer(model, order: float = 1.0) -> jnp.ndarray:
    """Piecewise-affine distance of quantized weights to their integer grid,
    averaged over all INT-quantized parameters.

    A soft-quantization regularizer in the spirit of PARQ (Piecewise-Affine
    Regularized Quantization, arXiv:2503.15748): adding
    ``strength * quant_grid_regularizer(model)`` to the task loss pulls
    weights toward representable grid points, shrinking the fake-quant
    rounding residual the STE otherwise ignores. Anneal ``strength`` upward
    during training to transition from soft to (near-)hard quantization.
    ``order=1`` is the W-shaped |·| penalty; ``order=2`` its smooth variant.
    """
    import jax

    from brevitas_tpu.nn.quant_layer import QuantWBIOL

    total = jnp.asarray(0.0)
    count = 0
    for _path, layer in named_modules(model):
        if not isinstance(layer, QuantWBIOL):
            continue
        wq = layer.weight_quant
        if wq.quant_type != QuantType.INT:
            continue
        qt = layer.quant_weight()
        if qt.scale is None:
            continue
        # the TRUE sawtooth gradient, not the STE (round_ste's identity
        # backward would cancel the residual's gradient exactly); the scale
        # is frozen so the penalty pulls weights, not the grid
        scale = jax.lax.stop_gradient(qt.scale)
        codes = layer.weight[...] / scale
        resid = codes - jax.lax.stop_gradient(jnp.round(codes))
        total = total + jnp.mean(jnp.abs(resid) ** order)
        count += 1
    if count == 0:
        return jnp.asarray(0.0)
    return total / count
