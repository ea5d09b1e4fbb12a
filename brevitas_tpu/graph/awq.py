"""AWQ — activation-aware weight quantization (arXiv:2306.00978).

Beyond the reference snapshot (later Brevitas ships AWQ in its LLM entry
point). Where SmoothQuant picks one global ``alpha`` analytically, AWQ
searches a per-region grid of activation-derived per-channel scales and
keeps the one that minimizes the QUANTIZED sink's output reconstruction
error on calibration data:

    s(alpha) = a_max**alpha          (a_max = per-channel act maxima)
    err(alpha) = sum_sinks || dq(q(W * s)) (x / s) - W x ||^2

The winning ``s`` migrates exactly like an equalization scale (source output
channels by 1/s — RMSNorm/LayerNorm scales absorb it exactly — and sink
input channels by s), and each sink's weight quantizer is rebuilt against
the scaled weights. Function-preserving in float; the win is purely lower
weight-quantization error where activations are large.
"""

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.graph.base import get_module
from brevitas_tpu.graph.equalize import EPSILON, _is_norm_source, _scale_region
from brevitas_tpu.nn.linear import QuantLinear

__all__ = ["apply_awq"]

DEFAULT_ALPHAS = tuple(np.linspace(0.0, 1.0, 11))


def _quantize_weight(layer: QuantLinear, w: jnp.ndarray) -> jnp.ndarray:
    """Fake-quantize candidate weights with the layer's own quantizer config
    (fresh stats-solved scale, per-channel on the output axis)."""
    from brevitas_tpu.quant.quantizers import ParameterQuantizer

    pq = ParameterQuantizer(layer.weight_quant.cfg, w, channel_axis=w.ndim - 1)
    return pq(w).value


def apply_awq(
    model: nnx.Module,
    regions: List[Tuple[Sequence[str], Sequence[str]]],
    calib_batches: Sequence,
    *,
    alphas: Sequence[float] = DEFAULT_ALPHAS,
    forward_fn=None,
    max_tokens: int = 4096,
) -> Dict[int, Tuple[float, jnp.ndarray]]:
    """Run AWQ over ``regions`` ([(source paths, sink paths), ...], the same
    format as :func:`apply_act_equalization`; sinks must be QuantLinear).
    Returns ``{region_index: (best_alpha, s)}``. Run BEFORE
    ``calibration_mode`` so act scales are solved on the migrated
    distribution."""
    from brevitas_tpu.graph.calibrate import (
        _restore_modes,
        _set_disable_quant,
        _snapshot_modes,
    )
    from brevitas_tpu.nn.quant_layer import QuantWBIOL
    from brevitas_tpu.quant.quantizers import ParameterQuantizer
    from brevitas_tpu.quant_tensor import QuantTensor
    from brevitas_tpu.utils import eval_mode

    # validate before touching state
    sink_mods: List[List[QuantLinear]] = []
    for src_paths, sink_paths in regions:
        for p in src_paths:
            src = get_module(model, p)
            if _is_norm_source(src) and src.scale is None:
                raise ValueError(f"{p}: norm source cannot absorb 1/s "
                                 "(use_scale=False)")
        mods = []
        for p in sink_paths:
            m = get_module(model, p)
            if not isinstance(m, QuantLinear):
                raise TypeError(f"{p}: AWQ sinks must be QuantLinear")
            if not isinstance(m, QuantWBIOL):
                raise TypeError(f"{p}: run quantize() first")
            mods.append(m)
        sink_mods.append(mods)

    # capture each region's sink input (shared across the region's sinks)
    snap = _snapshot_modes(model)
    eval_mode(model)
    _set_disable_quant(model, True)
    captured: List[List[jnp.ndarray]] = [[] for _ in regions]
    try:
        for mods in sink_mods:
            mods[0]._capture_input = True
        for b in calib_batches:
            forward_fn(model, b) if forward_fn is not None else model(b)
            for i, mods in enumerate(sink_mods):
                x = mods[0]._bc_last_input
                if isinstance(x, QuantTensor):
                    x = x.value
                captured[i].append(x.reshape(-1, x.shape[-1]))
    finally:
        for mods in sink_mods:
            mods[0]._capture_input = False
            if hasattr(mods[0], "_bc_last_input"):
                del mods[0]._bc_last_input
        _set_disable_quant(model, False)
        _restore_modes(snap)

    result: Dict[int, Tuple[float, jnp.ndarray]] = {}
    for i, (src_paths, sink_paths) in enumerate(regions):
        x = jnp.concatenate(captured[i], axis=0)[:max_tokens]
        a_max = jnp.maximum(jnp.max(jnp.abs(x), axis=0), EPSILON)
        a_max = a_max / jnp.maximum(jnp.mean(a_max), EPSILON)  # scale-free
        sinks = sink_mods[i]
        weights = [m.weight[...] for m in sinks]
        y_ref = [x @ w for w in weights]

        best = None
        for alpha in alphas:
            s = jnp.maximum(a_max ** float(alpha), EPSILON)
            x_s = x / s
            err = 0.0
            for m, w, y in zip(sinks, weights, y_ref):
                wq = _quantize_weight(m, w * s[:, None])
                err += float(jnp.mean((x_s @ wq - y) ** 2))
            if best is None or err < best[1]:
                best = (float(alpha), err, s)
        alpha, _, s = best
        srcs = [get_module(model, p) for p in src_paths]
        _scale_region(srcs, sinks, s)
        # rebuild each sink's weight quantizer against the migrated weights
        for m in sinks:
            m.weight_quant = ParameterQuantizer(
                m.weight_quant.cfg, m.weight[...],
                channel_axis=m.weight[...].ndim - 1)
        result[i] = (alpha, s)
    return result
