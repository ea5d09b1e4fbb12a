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
    (*spatial, I, O). Depthwise convolutions (``groups == out_channels``,
    i.e. one input channel per group) map input channel i to output channel
    i, so BOTH roles live on the kernel's O axis — the HWIO analogue of the
    reference's depthwise input axis 0 on OIHW kernels (_get_input_axis,
    graph/equalize.py:87-104). Other grouped convs are rejected like the
    reference."""
    if isinstance(module, (QuantLinear, nnx.Linear)):
        return 0, 1
    if isinstance(module, (_QuantConvNd, nnx.Conv, nnx.ConvTranspose)):
        # channels-last HWIO kernels put I/O on the same trailing axes for
        # forward AND transposed convs (unlike torch's OIHW/IOHW split the
        # reference handles in _get_input_axis/_get_output_axis)
        groups = getattr(module, "groups", None)
        if groups is None:
            groups = getattr(module, "feature_group_count", 1)
        w = module.weight[...] if hasattr(module, "weight") else module.kernel[...]
        if groups != 1:
            out_channels = w.shape[-1]
            if groups == out_channels and w.shape[-2] == 1:
                return w.ndim - 1, w.ndim - 1
            raise ValueError("grouped (non-depthwise) convolutions are not "
                             "supported for cross-layer equalization")
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


def _is_norm_source(m) -> bool:
    """LayerNorm/RMSNorm-style elementwise affine: absorbs 1/s into its own
    scale/bias — the canonical SmoothQuant source (LN → linear migration)."""
    return isinstance(m, (nnx.LayerNorm, nnx.RMSNorm)) or (
        hasattr(m, "scale") and not hasattr(m, "kernel")
        and not hasattr(m, "weight") and not isinstance(m, nnx.BatchNorm))


def _scale_region(srcs: Sequence, sinks: Sequence, s: jnp.ndarray) -> None:
    """Rescale a region by per-channel factors ``s``: source output channels
    (and biases) by 1/s, sink input channels by s — function-preserving for
    positively-homogeneous ops between them (s > 0)."""
    inv_s = 1.0 / jnp.maximum(s, EPSILON)
    for m in srcs:
        if _is_norm_source(m):
            if m.scale is None:
                # bias alone cannot absorb 1/s: norm(x) + b/s != (norm(x)+b)/s
                raise ValueError(
                    "norm source without an elementwise scale cannot absorb "
                    "equalization factors (use_scale=False)")
            m.scale[...] = m.scale[...] * inv_s
            bias = getattr(m, "bias", None)
            if bias is not None:
                bias[...] = bias[...] * inv_s
            continue
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
    _scale_region(srcs, sinks, s)
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


def apply_act_equalization(
    model: nnx.Module,
    regions: List[Tuple[Sequence[str], Sequence[str]]],
    calib_batches: Sequence,
    *,
    alpha: float = 0.5,
    forward_fn=None,
):
    """SmoothQuant-style activation equalization (arXiv:2211.10438).

    Beyond the reference snapshot (later Brevitas adds activation
    equalization to ``graph/equalize.py``). Per region, the difficulty of
    quantizing the sink's INPUT activations is migrated into its weights:
    with per-channel activation maxima ``a_j`` (measured on calibration data,
    quantization bypassed) and sink weight maxima ``w_j``,

        s_j = a_j**alpha / w_j**(1 - alpha)

    then source output channels scale by 1/s and sink input channels by s —
    exact for the positively-homogeneous ops between them. Run AFTER
    ``quantize()`` (sinks must be quant layers so inputs can be captured) and
    BEFORE ``calibration_mode`` so activation scales are solved on the
    smoothed distribution. Returns ``{region_index: s}``.
    """
    from brevitas_tpu.graph.calibrate import (
        _restore_modes,
        _set_disable_quant,
        _snapshot_modes,
    )
    from brevitas_tpu.nn.quant_layer import QuantWBIOL
    from brevitas_tpu.quant_tensor import QuantTensor
    from brevitas_tpu.utils import eval_mode

    # resolve and validate every path BEFORE touching model state, so a typo
    # or a float sink cannot leave quantization disabled model-wide
    probes = []
    for src_paths, sink_paths in regions:
        for p in src_paths:
            src = get_module(model, p)
            if _is_norm_source(src) and src.scale is None:
                raise ValueError(
                    f"{p}: norm source has no elementwise scale to absorb "
                    "1/s into (use_scale=False) — equalization would change "
                    "the function")
        probe = get_module(model, sink_paths[0])
        if not isinstance(probe, QuantWBIOL):
            raise TypeError(
                f"{sink_paths[0]}: activation equalization captures sink "
                "inputs through quant layers — run quantize() first")
        probes.append(probe)
    snap = _snapshot_modes(model)
    eval_mode(model)
    _set_disable_quant(model, True)
    act_max = [None] * len(regions)
    try:
        for probe in probes:
            probe._capture_input = True
        for b in calib_batches:
            forward_fn(model, b) if forward_fn is not None else model(b)
            for i, probe in enumerate(probes):
                x = probe._bc_last_input
                if isinstance(x, QuantTensor):
                    x = x.value
                m = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)
                act_max[i] = m if act_max[i] is None else jnp.maximum(
                    act_max[i], m)
    finally:
        for probe in probes:
            probe._capture_input = False
            if hasattr(probe, "_bc_last_input"):
                del probe._bc_last_input
        _set_disable_quant(model, False)
        _restore_modes(snap)

    result = {}
    for i, (src_paths, sink_paths) in enumerate(regions):
        srcs = [get_module(model, p) for p in src_paths]
        sinks = [get_module(model, p) for p in sink_paths]
        views = []
        for m in sinks:
            in_ax, _ = _axes(m)
            views.append(_channel_view(jnp.abs(_kernel(m)[...]), in_ax))
        w_max = jnp.max(jnp.concatenate(views, axis=1), axis=1)
        a = act_max[i]
        s = a ** alpha / jnp.maximum(w_max, EPSILON) ** (1.0 - alpha)
        # dead channels (no signal, or zero weight) are left unscaled
        s = jnp.where((a <= EPSILON) | (w_max <= EPSILON), 1.0, s)
        _scale_region(srcs, sinks, s)
        result[i] = s
    return result


def absorb_bias_by_batch_norm(
    model: nnx.Module,
    groups: Sequence[Tuple[str, str, Sequence[int]]],
) -> nnx.Module:
    """High-bias absorption (DFQ §4.2, arXiv:1906.04721).

    Reference: ``AbsorbBiasByBatchNorm`` (``src/brevitas/graph/equalize.py:246``)
    shifts the activation distribution after each BatchNorm down by
    ``c = relu(mu - 3*sigma)`` per channel and compensates the next layer's
    bias, shrinking the post-BN activation range that PTQ must cover.

    ``groups`` entries are ``(bn_path, next_layer_path, next_input_shape)``
    where ``next_input_shape`` is the (batch=1, channels-last) input shape of
    the next layer. Differences from the reference, both deliberate:

    * ``c`` is computed from the BN's OUTPUT distribution
      (``relu(beta - 3*|gamma|)``, the paper's formula — a BN output has mean
      ``beta`` and std ``|gamma|`` under its own running stats) and absorbed
      into the BN bias, which shifts the output by exactly ``-c``. The
      reference uses the pre-BN running stats and edits the preceding layer's
      bias, which only matches when the BN affine is identity.
    * The next layer's compensation is ``mean(next(c) - next(0))`` — the pure
      linear response ``E[W c]`` — where the reference adds
      ``mean(next(c))``, double-counting the next layer's existing bias.
    """
    for bn_path, next_path, next_input_shape in groups:
        bn = get_module(model, bn_path)
        nxt = get_module(model, next_path)
        gamma = bn.scale[...] if bn.scale is not None else jnp.ones(bn.num_features)
        beta = bn.bias[...] if bn.bias is not None else jnp.zeros(bn.num_features)
        c = jnp.maximum(beta - 3.0 * jnp.abs(gamma), 0.0)
        if not bool(jnp.any(c > 0.0)):
            continue
        if bn.bias is None:
            raise ValueError(f"{bn_path}: BN has no affine bias to absorb into")
        bn.bias[...] = beta - c

        x_c = jnp.broadcast_to(c, tuple(next_input_shape)).astype(jnp.float32)
        y_c = nxt(x_c)
        y_0 = nxt(jnp.zeros_like(x_c))
        y_c = getattr(y_c, "value", y_c)
        y_0 = getattr(y_0, "value", y_0)
        # mean over batch+spatial leaves the per-output-channel response;
        # exact for Linear/VALID conv, a spatial-mean approximation under
        # padding (same approximation as the reference, equalize.py:269-273)
        comp = jnp.mean((y_c - y_0).reshape(-1, y_c.shape[-1]), axis=0)
        bias = getattr(nxt, "bias", None)
        if bias is None:
            raise ValueError(f"{next_path}: next layer needs a bias to "
                             "receive the absorbed offset")
        bias[...] = bias[...] + comp
    return model


def split_batch_norm(bn: nnx.BatchNorm, sizes: Sequence[int],
                     *, rngs: nnx.Rngs) -> List[nnx.BatchNorm]:
    """Split one BatchNorm over channel chunks (reference
    ``MoveSplitBatchNormBeforeCat``, ``src/brevitas/graph/fixed_point.py:27``:
    a BN applied to ``cat(xs, channel_axis)`` equals per-chunk BNs applied
    before the concat). NNX models call ``jnp.concatenate`` inline rather
    than through graph nodes, so the rewrite is explicit surgery: build the
    chunk BNs with this helper and move them ahead of the concat."""
    if sum(sizes) != bn.num_features:
        raise ValueError(f"chunk sizes {sizes} do not sum to {bn.num_features}")
    chunks = []
    start = 0
    for n in sizes:
        sl = slice(start, start + n)
        chunk = nnx.BatchNorm(
            n, epsilon=bn.epsilon, momentum=bn.momentum,
            use_running_average=bn.use_running_average,
            use_bias=bn.bias is not None, use_scale=bn.scale is not None,
            rngs=rngs)
        chunk.mean[...] = bn.mean[sl]
        chunk.var[...] = bn.var[sl]
        if bn.scale is not None:
            chunk.scale[...] = bn.scale[sl]
        if bn.bias is not None:
            chunk.bias[...] = bn.bias[sl]
        chunks.append(chunk)
        start += n
    return chunks
