"""Cross-layer equalization (PTQ preprocessing).

Reference: ``src/brevitas/graph/equalize.py`` — ``_cross_layer_equalization:116``
implements §4.1 of arXiv:1906.04721 (Nagel et al., data-free quantization):
for sources feeding sinks, scale source output channels and sink input
channels by sqrt(range_src/range_sink) so per-channel ranges match.

Region discovery: the reference walks an FX graph (``_extract_regions:217``).
Here regions are given explicitly (list of (src_paths, sink_paths)) or
derived from a sequential scan of a module list — module-level transforms
don't need a tracer in NNX.
"""

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.graph.base import get_module
from brevitas_tpu.nn.conv import _QuantConvNd
from brevitas_tpu.nn.linear import QuantLinear

EPSILON = 1e-9


def _axes(module) -> Tuple[int, int]:
    """(input_axis, output_axis) of the module's kernel.

    Channels-last layouts: Linear kernels are (in, out); conv kernels are
    (*spatial, I, O). Grouped convolutions are rejected like the reference
    (_get_input_axis, graph/equalize.py:87-104)."""
    if isinstance(module, (QuantLinear, nnx.Linear)):
        return 0, 1
    if isinstance(module, (_QuantConvNd, nnx.Conv)):
        groups = getattr(module, "groups", None)
        if groups is None:
            groups = getattr(module, "feature_group_count", 1)
        if groups != 1:
            raise ValueError("grouped/depthwise convolutions are not "
                             "supported for cross-layer equalization")
        w = module.weight[...] if hasattr(module, "weight") else module.kernel[...]
        return w.ndim - 2, w.ndim - 1
    raise ValueError(f"unsupported module for equalization: {type(module)}")


def _kernel(module):
    return module.weight if hasattr(module, "weight") else module.kernel


def _channel_view(w: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.moveaxis(w, axis, 0).reshape(w.shape[axis], -1)


def _channel_range(x2d: jnp.ndarray) -> jnp.ndarray:
    out = jnp.max(x2d, axis=1) - jnp.min(x2d, axis=1)
    # constant channels get the mean range so s stays finite and the channel
    # is left ~unscaled (reference _channel_range zero guard, equalize.py:73)
    return jnp.where(out == 0.0, jnp.mean(out), out)


def cross_layer_equalization(srcs: Sequence, sinks: Sequence) -> jnp.ndarray:
    """Equalize one region in place; returns the scaling factors."""
    src_views = []
    for m in srcs:
        _, out_ax = _axes(m)
        src_views.append(_channel_view(_kernel(m)[...], out_ax))
    sink_views = []
    for m in sinks:
        in_ax, _ = _axes(m)
        sink_views.append(_channel_view(_kernel(m)[...], in_ax))
    src_range = _channel_range(jnp.concatenate(src_views, axis=1))
    sink_range = _channel_range(jnp.concatenate(sink_views, axis=1)) + EPSILON
    s = jnp.sqrt(src_range / sink_range)
    inv_s = 1.0 / jnp.maximum(s, EPSILON)

    for m in srcs:
        _, out_ax = _axes(m)
        k = _kernel(m)
        shape = [1] * k[...].ndim
        shape[out_ax] = k[...].shape[out_ax]
        k[...] = k[...] * inv_s.reshape(shape)
        bias = getattr(m, "bias", None)
        if bias is not None:
            bias[...] = bias[...] * inv_s
    for m in sinks:
        in_ax, _ = _axes(m)
        k = _kernel(m)
        shape = [1] * k[...].ndim
        shape[in_ax] = k[...].shape[in_ax]
        k[...] = k[...] * s.reshape(shape)
    return s


def equalize(model: nnx.Module,
             regions: List[Tuple[Sequence[str], Sequence[str]]],
             iterations: int = 10) -> nnx.Module:
    """Iterative equalization over named regions (reference _equalize,
    graph/equalize.py:157). ``regions`` entries are
    ([src_path, ...], [sink_path, ...]) module paths."""
    for _ in range(iterations):
        for src_paths, sink_paths in regions:
            cross_layer_equalization(
                [get_module(model, p) for p in src_paths],
                [get_module(model, p) for p in sink_paths])
    return model


def sequential_regions(layer_paths: Sequence[str]) -> List[Tuple[List[str], List[str]]]:
    """Adjacent-pair regions for a plain sequential stack of layers."""
    return [([a], [b]) for a, b in zip(layer_paths[:-1], layer_paths[1:])]
