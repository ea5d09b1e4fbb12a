"""PTQ calibration and bias correction.

Reference: ``src/brevitas/graph/calibrate.py`` — ``calibration_mode:52``
(quant disabled, stats collected, counters finalized on exit),
``bias_correction_mode:68`` / ``_BiasCorrection:167`` (per-layer FP-vs-quant
output-mean error accumulated into the bias), ``ClipFloatWeights:85``.

These run the model eagerly (no jit) — calibration is a one-shot offline
pass; the trained/corrected state is then used inside jitted programs.
"""

from contextlib import contextmanager
from typing import Dict

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.graph.base import find_modules, named_modules
from brevitas_tpu.nn.quant_layer import QuantWBIOL
from brevitas_tpu.quant.quantizers import (
    ActQuantizer,
    BiasQuantizer,
    ParameterFromRuntimeStatsScaling,
    ParameterQuantizer,
    ZeroPoint,
)
from brevitas_tpu.quant_tensor import QuantTensor


def finalize_collect_stats(model: nnx.Module) -> None:
    """Promote collected buffers into learned parameters and close the
    collection phase (reference finalize_collect_stats, graph/calibrate.py:47,
    done eagerly instead of lazily at the next training step)."""
    for _, mod in named_modules(model):
        if isinstance(mod, ParameterFromRuntimeStatsScaling):
            c = int(mod.counter[...])
            if 0 < c <= mod.steps:
                mod.value[...] = mod.rc.preprocess_runtime(mod.buffer[...])
            mod.counter[...] = jnp.asarray(mod.steps + 1, jnp.int32)
        elif isinstance(mod, ZeroPoint) and hasattr(mod, "counter"):
            c = int(mod.counter[...])
            if 0 < c <= mod.steps:
                mod.value[...] = mod.buffer[...]
            mod.counter[...] = jnp.asarray(mod.steps + 1, jnp.int32)


def _set_disable_quant(model: nnx.Module, value: bool) -> None:
    for _, mod in named_modules(model):
        if isinstance(mod, (ActQuantizer, ParameterQuantizer, BiasQuantizer)):
            mod.disable_quant = value


_MODE_ATTRS = ("training", "use_running_average", "deterministic")


def _snapshot_modes(model: nnx.Module):
    snap = []
    for path, mod in named_modules(model):
        for attr in _MODE_ATTRS:
            if attr in vars(mod):
                snap.append((mod, attr, getattr(mod, attr)))
    return snap


def _restore_modes(snap) -> None:
    for mod, attr, val in snap:
        setattr(mod, attr, val)


@contextmanager
def calibration_mode(model: nnx.Module, enabled: bool = True):
    """Feed calibration batches inside this context: quantization is
    bypassed (FP forward) while activation quantizers collect statistics;
    on exit stats are finalized into parameters, quant is re-enabled, and the
    previous train/eval state is restored (reference calibration_mode saves
    previous_training_state, graph/calibrate.py:55)."""
    if not enabled:
        yield model
        return
    from brevitas_tpu.utils import train_mode

    snap = _snapshot_modes(model)
    _set_disable_quant(model, True)
    train_mode(model)
    try:
        yield model
    finally:
        finalize_collect_stats(model)
        _set_disable_quant(model, False)
        _restore_modes(snap)


@contextmanager
def bias_correction_mode(model: nnx.Module, enabled: bool = True):
    """Feed batches inside this context. Each WBIOL layer runs twice per
    call — float twin (quant bypassed) and quantized — and the per-channel
    output-mean error accumulates into the bias on exit (reference
    _BiasCorrection, graph/calibrate.py:167-277). The quantized output is
    corrected in-flight so downstream layers see corrected activations,
    matching the reference's hook behaviour."""
    if not enabled:
        yield model
        return
    layers = find_modules(model, QuantWBIOL)
    acc: Dict[str, jnp.ndarray] = {}
    iters: Dict[str, int] = {}

    def make_hook(path):
        def hook(layer, qt_out: QuantTensor):
            if getattr(layer, "_bc_in_float_pass", False):
                return None
            # float twin on the same input (captured by the layer wrapper
            # below via _bc_last_input)
            x = layer._bc_last_input
            layer._bc_in_float_pass = True
            _set_disable_quant(layer, True)
            hook_ref = layer._pre_output_hook
            layer._pre_output_hook = None
            try:
                ref = layer(x)
            finally:
                layer._pre_output_hook = hook_ref
                _set_disable_quant(layer, False)
                layer._bc_in_float_pass = False
            ref_v = ref.value if isinstance(ref, QuantTensor) else ref
            axes = tuple(range(ref_v.ndim - 1))  # channels-last layout
            err = jnp.mean(ref_v, axis=axes) - jnp.mean(qt_out.value, axis=axes)
            acc[path] = acc.get(path, 0.0) + err
            iters[path] = iters.get(path, 0) + 1
            return qt_out.set(value=qt_out.value + err)

        return hook

    # per-instance input capture (forward_quant stores the input when the
    # flag is set) — no class-level patching, so concurrent models and other
    # QuantWBIOL instances are unaffected
    for path, layer in layers:
        layer._capture_input = True
        layer._pre_output_hook = make_hook(path)
    try:
        yield model
    finally:
        for path, layer in layers:
            layer._capture_input = False
            layer._pre_output_hook = None
            if hasattr(layer, "_bc_last_input"):
                del layer._bc_last_input
            n = iters.get(path, 0)
            if n and path in acc:
                corr = acc[path] / n
                if getattr(layer, "bias", None) is not None:
                    layer.bias[...] = layer.bias[...] + corr
                else:
                    layer.bias = nnx.Param(corr)


def cache_inference_quant_weights(model: nnx.Module) -> int:
    """Precompute fake-quant weights on every WBIOL layer for eval serving
    (reference cache_inference_quant_weight). Returns the layer count."""
    n = 0
    for _, layer in find_modules(model, QuantWBIOL):
        layer.cache_quant_weight()
        n += 1
    return n


def clear_inference_quant_weight_cache(model: nnx.Module) -> None:
    for _, layer in find_modules(model, QuantWBIOL):
        layer.clear_quant_weight_cache()


def clip_float_weights(model: nnx.Module, threshold: float = 15.0) -> None:
    """Clamp float weights before PTQ to kill extreme outliers (reference
    ClipFloatWeights, graph/calibrate.py:85)."""
    for _, layer in find_modules(model, QuantWBIOL):
        layer.weight[...] = jnp.clip(layer.weight[...], -threshold, threshold)
