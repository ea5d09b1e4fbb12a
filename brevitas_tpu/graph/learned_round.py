"""Learned weight rounding for PTQ (AdaRound, arXiv:2004.10568).

Beyond the reference snapshot's parity surface: the snapshot always rounds
weights to nearest (``float_to_int_impl = RoundSte``); later Brevitas
releases add a learned-round PTQ step, and this is the TPU-native version.
Per layer, rounding becomes a continuous choice between floor and ceil via a
rectified sigmoid, optimized against the layer's float output on calibration
inputs, then baked back into the weights. The whole optimization is one
``lax.scan`` under ``jit`` — no per-step Python.

Usage (after calibration, before bias correction)::

    with calibration_mode(model):
        for b in batches: model(b)
    apply_learned_round(model, batches)
    with bias_correction_mode(model):
        for b in batches: model(b)
"""

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from brevitas_tpu.graph.base import find_modules
from brevitas_tpu.nn.conv import _QuantConvNd
from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.nn.quant_layer import QuantWBIOL
from brevitas_tpu.ops import max_int, min_int
from brevitas_tpu.quant.config import QuantType, ZeroPointImplType
from brevitas_tpu.quant.quantizers import ParameterScaling, stats_view
from brevitas_tpu.quant_tensor import QuantTensor

Array = jnp.ndarray

# rectified-sigmoid stretch (AdaRound eq. 23)
ZETA, GAMMA = 1.1, -0.1


def _rectified_sigmoid(v: Array) -> Array:
    return jnp.clip(jax.nn.sigmoid(v) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def _init_v(residual: Array) -> Array:
    """Invert the rectified sigmoid so h(v0) == the nearest-round residual."""
    r = jnp.clip(residual, GAMMA + 1e-4, ZETA - 1e-4)
    return -jnp.log((ZETA - GAMMA) / (r - GAMMA) - 1.0)


def _inner_apply(layer: QuantWBIOL, x: Array, w: Array) -> Array:
    """The layer's multiply-accumulate with an explicit weight (bias excluded
    — it cancels in the MSE objective)."""
    if isinstance(layer, QuantLinear):
        return x @ w
    if isinstance(layer, _QuantConvNd) and not layer.transposed:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=layer.stride, padding=layer.padding,
            rhs_dilation=layer.dilation, dimension_numbers=layer._dn(),
            feature_group_count=layer.groups,
            preferred_element_type=jnp.float32).astype(x.dtype)
    raise NotImplementedError(type(layer).__name__)


def eligible_for_learned_round(layer) -> bool:
    """INT weight quant, symmetric (zero zero-point), non-decoupled, and a
    supported inner op."""
    if not isinstance(layer, (QuantLinear, _QuantConvNd)):
        return False
    if isinstance(layer, _QuantConvNd) and layer.transposed:
        return False
    cfg = layer.weight_quant.cfg
    return (layer.weight_quant.quant_type == QuantType.INT
            and not cfg.decoupled
            and cfg.accumulator_bit_width is None  # A2Q grid is input-coupled
            and cfg.scaling_per_group is None      # MX bypasses self.scaling
            and ZeroPointImplType(cfg.zero_point_impl) == ZeroPointImplType.ZERO)


def _capture_inputs(model: nnx.Module, layer: QuantWBIOL,
                    batches: Sequence, forward_fn) -> Array:
    """Collect the tensors entering the layer's MAC on the calibration set
    (post input-quant, with earlier layers already rounded)."""
    layer._capture_input = True
    xs = []
    try:
        for b in batches:
            forward_fn(model, b) if forward_fn is not None else model(b)
            x = layer._bc_last_input
            if isinstance(x, QuantTensor):
                x = x.value
            if layer.input_quant.quant_type != QuantType.NONE:
                x = layer.input_quant(x).value
            xs.append(x)
    finally:
        layer._capture_input = False
        if hasattr(layer, "_bc_last_input"):
            del layer._bc_last_input
    return jnp.concatenate(xs, axis=0)


def _optimize_layer(layer: QuantWBIOL, x: Array, *, steps: int, lr: float,
                    lam: float, beta_start: float, beta_end: float,
                    warmup: float) -> Tuple[Array, float, float]:
    """Returns (v*, mse_nearest, mse_learned) for the layer on inputs x."""
    w = layer.weight[...]
    qt = layer.weight_quant(w)
    scale, bw = qt.scale, qt.bit_width
    cfg = layer.weight_quant.cfg
    nmin = min_int(cfg.signed, cfg.narrow_range, bw)
    nmax = max_int(cfg.signed, cfg.narrow_range, bw)

    w_s = w / scale
    floor_w = jnp.floor(w_s)
    v0 = _init_v(w_s - floor_w)
    fp_out = _inner_apply(layer, x, w)

    def quant_w(h):
        return jnp.clip(floor_w + h, nmin, nmax) * scale

    def mse(wq):
        return jnp.mean((_inner_apply(layer, x, wq) - fp_out) ** 2)

    warmup_t = int(steps * warmup)
    opt = optax.adam(lr)

    def loss_fn(v, t):
        h = _rectified_sigmoid(v)
        rec = mse(quant_w(h))
        # annealed rounding regularizer: pushes h to {0,1} late in training
        frac = jnp.clip((t - warmup_t) / max(steps - warmup_t, 1), 0.0, 1.0)
        beta = beta_end + (beta_start - beta_end) * (1.0 - frac)
        reg = jnp.mean(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)
        return rec + lam * jnp.where(t < warmup_t, 0.0, reg)

    @jax.jit
    def run(v0):
        def body(carry, t):
            v, opt_state = carry
            g = jax.grad(loss_fn)(v, t)
            updates, opt_state = opt.update(g, opt_state, v)
            return (optax.apply_updates(v, updates), opt_state), ()

        (v, _), _ = jax.lax.scan(body, (v0, opt.init(v0)),
                                 jnp.arange(steps, dtype=jnp.float32))
        return v

    v = run(v0)
    mse_nearest = float(mse(quant_w(jnp.round(w_s - floor_w))))
    mse_learned = float(mse(quant_w((_rectified_sigmoid(v) >= 0.5)
                                    .astype(w.dtype))))
    return v, mse_nearest, mse_learned


def freeze_weight_scale(layer: QuantWBIOL) -> None:
    """Replace the weight quantizer's scaling with a learned parameter fixed
    at the CURRENT threshold. Weight-rewriting PTQ passes (AdaRound, GPTQ)
    must do this before baking: a stats-driven scale would shift once the
    weights move off their original magnitudes and break the baked grid."""
    q = layer.weight_quant
    w = layer.weight[...]
    view = stats_view(w, q.stats_per_channel, q.channel_axis)
    threshold = q.scaling(view)
    q.scaling = ParameterScaling(q.cfg, threshold, bshape=q.bshape)


def _bake(layer: QuantWBIOL, v: Array) -> None:
    """Write the learned rounding into the weights and freeze the quantizer's
    scale so re-quantization reproduces the learned integers exactly."""
    q = layer.weight_quant
    w = layer.weight[...]
    qt = q(w)
    scale, bw = qt.scale, qt.bit_width
    cfg = q.cfg
    nmin = min_int(cfg.signed, cfg.narrow_range, bw)
    nmax = max_int(cfg.signed, cfg.narrow_range, bw)
    h = (_rectified_sigmoid(v) >= 0.5).astype(w.dtype)
    w_int = jnp.clip(jnp.floor(w / scale) + h, nmin, nmax)
    freeze_weight_scale(layer)  # BEFORE the weights move off the grid basis
    layer.weight[...] = w_int * scale
    layer.clear_quant_weight_cache()


def apply_learned_round(
    model: nnx.Module,
    calib_batches: Sequence,
    *,
    steps: int = 1000,
    lr: float = 3e-3,
    lam: float = 0.01,
    beta_start: float = 20.0,
    beta_end: float = 2.0,
    warmup: float = 0.2,
    forward_fn: Optional[Callable] = None,
    layer_filter: Optional[Callable[[str], bool]] = None,
) -> Dict[str, Tuple[float, float]]:
    """Sequentially learn weight rounding for every eligible quant layer.

    Layers are processed in definition order (forward order for the model
    zoo); each layer's calibration inputs are re-captured after earlier
    layers were baked, so quantization error propagates as in deployment.
    ``forward_fn(model, batch)`` overrides plain ``model(batch)`` for models
    with non-trivial call signatures. Returns per-layer
    ``{path: (output_mse_nearest_round, output_mse_learned_round)}``.
    """
    from brevitas_tpu.graph.calibrate import _restore_modes, _snapshot_modes
    from brevitas_tpu.utils import eval_mode

    snap = _snapshot_modes(model)
    eval_mode(model)
    report: Dict[str, Tuple[float, float]] = {}
    try:
        targets: List[Tuple[str, QuantWBIOL]] = [
            (p, l) for p, l in find_modules(model, QuantWBIOL)
            if eligible_for_learned_round(l)
            and (layer_filter is None or layer_filter(p))]
        for path, layer in targets:
            x = _capture_inputs(model, layer, calib_batches, forward_fn)
            v, mse_near, mse_learned = _optimize_layer(
                layer, x, steps=steps, lr=lr, lam=lam,
                beta_start=beta_start, beta_end=beta_end, warmup=warmup)
            _bake(layer, v)
            report[path] = (mse_near, mse_learned)
    finally:
        _restore_modes(snap)
    return report
