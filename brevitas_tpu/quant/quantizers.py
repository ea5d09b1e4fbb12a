"""NNX quantizer modules — the stateful resolution of a QuantConfig.

These replace three reference layers at once (SURVEY §1 layers 1-3): the
scaling/zero-point/bit-width ScriptModules (``src/brevitas/core/``), the enum
solvers (``src/brevitas/quant/solver/``), and the proxies
(``src/brevitas/proxy/``). A quantizer is constructed once per layer slot from
a :class:`~brevitas_tpu.quant.config.QuantConfig` plus shape info, owns
exactly the state the config implies, and returns a
:class:`~brevitas_tpu.quant_tensor.QuantTensor`.

State machines reproduced from the reference:
- learned scale (ParameterScaling, core/scaling/standalone.py:75);
- runtime EMA scale (RuntimeStatsScaling, core/scaling/runtime.py:75);
- two-phase stats→parameter handoff with step counter
  (ParameterFromRuntimeStatsScaling, core/scaling/standalone.py:155-264),
  implemented with jnp.where selection so it stays jit-compatible;
- stats/runtime/learned zero-points (core/zero_point.py);
- learned bit-width (BitWidthParameter, core/bit_width/parameter.py:23);
- delayed quantization (DelayWrapper, core/quant/delay.py:43).

Training vs eval is a static module attribute (``training``), toggled
recursively via ``set_attributes`` — changing it intentionally recompiles,
giving distinct train/eval programs like the reference's module.train().
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.core import quant as Qf
from brevitas_tpu.core import restrict as R
from brevitas_tpu.core import stats as S
from brevitas_tpu.ops import (
    abs_binary_sign_grad,
    max_int,
    min_int,
    round_ste,
    round_to_zero_ste,
    scalar_clamp_min_ste,
    tensor_clamp,
    tensor_clamp_ste,
)
from brevitas_tpu.quant.config import (
    BitWidthImplType,
    QuantConfig,
    QuantType,
    ScalingImplType,
    ZeroPointImplType,
)
from brevitas_tpu.quant_tensor import QuantTensor

Array = jnp.ndarray


class TrainToggleMixin:
    """Recursive train/eval switch — the analogue of torch
    Module.train()/eval(). Toggles the quantizer state machines
    (``training``: EMA vs frozen stats, counter advancement), BatchNorm
    (``use_running_average``) and dropout (``deterministic``) in one place so
    every model gets correct eval semantics. Returning to training
    invalidates any cached inference quant weights so QAT never trains
    against a frozen weight."""

    def train_mode(self):
        self.set_attributes(training=True, raise_if_not_found=False)
        self.set_attributes(use_running_average=False, raise_if_not_found=False)
        self.set_attributes(deterministic=False, raise_if_not_found=False)
        _clear_quant_weight_caches(self)
        return self

    def eval_mode(self):
        self.set_attributes(training=False, raise_if_not_found=False)
        self.set_attributes(use_running_average=True, raise_if_not_found=False)
        self.set_attributes(deterministic=True, raise_if_not_found=False)
        return self


def _clear_quant_weight_caches(module) -> None:
    from brevitas_tpu.graph.base import named_modules

    for _, mod in named_modules(module):
        if hasattr(mod, "clear_quant_weight_cache"):
            mod.clear_quant_weight_cache()


# ---------------------------------------------------------------------------
# shape helpers (replace reference view-shape solvers,
# quant/solver/weight.py:36-88 and core/function_wrapper/shape.py)
# ---------------------------------------------------------------------------

def stats_view(x: Array, per_channel: bool, channel_axis: int = 0) -> Array:
    """View ``x`` as (groups, elems) for stats ops: one group per output
    channel, or a single group for per-tensor."""
    if per_channel:
        x = jnp.moveaxis(x, channel_axis, 0)
        return x.reshape(x.shape[0], -1)
    return x.reshape(1, -1)


def scaling_broadcast_shape(shape: Sequence[int], per_channel: bool,
                            channel_axis: int = 0) -> Tuple[int, ...]:
    """Broadcastable metadata shape: channel dim kept, all others 1."""
    if not per_channel:
        return ()
    return tuple(d if i == channel_axis % len(shape) else 1
                 for i, d in enumerate(shape))


def _expand(stat: Array, bshape: Tuple[int, ...]) -> Array:
    """Reshape a (groups,) stat to the broadcastable metadata shape."""
    if bshape == ():
        return stat.reshape(())
    return stat.reshape(bshape)


def _float_quant_params(cfg: QuantConfig):
    """Resolve (exponent_bits, mantissa_bits, bias, max_val) for
    QuantType.FLOAT; bias defaults to the IEEE-style 2^(e-1) - 1."""
    if cfg.exponent_bit_width is None or cfg.mantissa_bit_width is None:
        raise ValueError("QuantType.FLOAT requires exponent_bit_width and "
                         "mantissa_bit_width")
    if not cfg.signed:
        raise ValueError("minifloat formats are signed")
    if cfg.decoupled:
        raise ValueError("decoupled quantization is integer-only")
    e, m = int(cfg.exponent_bit_width), int(cfg.mantissa_bit_width)
    bias = (int(cfg.exponent_bias) if cfg.exponent_bias is not None
            else 2 ** (e - 1) - 1)
    mv = Qf.minifloat_max_val(e, m, bias, nan_reserved=cfg.nan_reserved)
    return e, m, bias, mv


# ---------------------------------------------------------------------------
# bit-width impls
# ---------------------------------------------------------------------------

class BitWidth(nnx.Module):
    """CONST or learned-PARAMETER bit-width (reference BitWidthConst,
    core/bit_width/const.py:14; BitWidthParameter, core/bit_width/parameter.py:23)."""

    def __init__(self, cfg: QuantConfig):
        self.impl = BitWidthImplType(cfg.bit_width_impl)
        self.const = float(cfg.bit_width)
        if self.impl == BitWidthImplType.PARAMETER:
            if cfg.bit_width < cfg.min_bit_width or cfg.min_bit_width < 2:
                raise ValueError("learned bit-width requires bit_width >= min_bit_width >= 2")
            self.base = float(cfg.min_bit_width)
            self.offset = nnx.Param(jnp.asarray(cfg.bit_width - cfg.min_bit_width))

    def __call__(self) -> Array:
        if self.impl == BitWidthImplType.CONST:
            return jnp.asarray(self.const)
        return round_ste(abs_binary_sign_grad(self.offset[...]) + self.base)


# ---------------------------------------------------------------------------
# scaling impls (thresholds, linear domain out)
# ---------------------------------------------------------------------------

class _RestrictClamp:
    """restrict.forward then STE min-clamp (reference _RestrictClampValue,
    core/restrict_val.py:22)."""

    def __init__(self, cfg: QuantConfig):
        self.restrict = R.RestrictType(cfg.restrict_scaling)
        self.f2i = cfg.restrict_scaling_float_to_int
        self.min_val = cfg.scaling_min_val

    def preprocess(self, v):
        return R.preprocess(self.restrict, v)

    def preprocess_runtime(self, v: Array) -> Array:
        """Differentiable preprocess for runtime stats values."""
        if self.restrict in (R.RestrictType.LOG_FP, R.RestrictType.POWER_OF_TWO):
            return jnp.log2(v)
        return v

    def forward(self, stored: Array) -> Array:
        v = R.forward(self.restrict, stored, self.f2i)
        if self.min_val is not None and self.min_val != 0:
            v = scalar_clamp_min_ste(v, self.min_val)
        return v

    def clamp_only(self, v: Array) -> Array:
        if self.min_val is not None and self.min_val != 0:
            v = scalar_clamp_min_ste(v, self.min_val)
        return v


class ConstScaling(nnx.Module):
    """Reference ConstScaling (core/scaling/standalone.py:22)."""

    def __init__(self, cfg: QuantConfig, init: float, bshape: Tuple[int, ...] = ()):
        self.rc = _RestrictClamp(cfg)
        self.stored = jnp.full(bshape, self.rc.preprocess(float(init)))

    def __call__(self, stats_input: Optional[Array]) -> Array:
        return self.rc.forward(self.stored)


class ParameterScaling(nnx.Module):
    """Learned scale (reference ParameterScaling, core/scaling/standalone.py:75)."""

    def __init__(self, cfg: QuantConfig, init, bshape: Tuple[int, ...] = ()):
        self.rc = _RestrictClamp(cfg)
        init = jnp.asarray(self.rc.preprocess(init), dtype=jnp.float32)
        if init.shape != bshape:
            init = jnp.broadcast_to(init.reshape((1,) * len(bshape)) if init.ndim == 0
                                    else init.reshape(bshape), bshape)
        self.value = nnx.Param(init)

    def __call__(self, stats_input: Optional[Array]) -> Array:
        return abs_binary_sign_grad(self.rc.forward(self.value[...]))


class StatsScaling(nnx.Module):
    """Stateless scale from current statistics — the default weight path
    ("backpropagated statistics": grads flow through the stats op into the
    weights). Reference StatsFromParameterScaling/_StatsScaling,
    core/scaling/runtime.py:19-73."""

    def __init__(self, cfg: QuantConfig, stats_fn, bshape: Tuple[int, ...]):
        self.rc = _RestrictClamp(cfg)
        self.stats_fn = stats_fn
        self.bshape = bshape
        self.affine = bool(cfg.scaling_affine)
        if self.affine:
            self.affine_weight = nnx.Param(jnp.ones(bshape))
            self.affine_bias = nnx.Param(jnp.zeros(bshape))

    def __call__(self, stats_input: Array) -> Array:
        stats = _expand(_stats_call(self, stats_input), self.bshape)
        if self.affine:
            stats = stats * self.affine_weight[...] + self.affine_bias[...]
        return self.rc.forward(self.rc.preprocess_runtime(stats))


class RuntimeStatsScaling(nnx.Module):
    """Batch stats while training (EMA tracked in background), EMA at eval —
    the batch-norm pattern. Reference RuntimeStatsScaling,
    core/scaling/runtime.py:75."""

    def __init__(self, cfg: QuantConfig, stats_fn, bshape: Tuple[int, ...]):
        self.rc = _RestrictClamp(cfg)
        self.stats_fn = stats_fn
        self.bshape = bshape
        self.momentum = cfg.scaling_stats_momentum
        self.buffer = nnx.BatchStat(jnp.ones(bshape))
        self.counter = nnx.Variable(jnp.zeros((), jnp.int32))
        self.training: bool = True
        self.affine = bool(cfg.scaling_affine)
        if self.affine:
            self.affine_weight = nnx.Param(jnp.ones(bshape))
            self.affine_bias = nnx.Param(jnp.zeros(bshape))

    def _post(self, stats: Array) -> Array:
        if self.affine:
            stats = stats * self.affine_weight[...] + self.affine_bias[...]
        return self.rc.forward(self.rc.preprocess_runtime(stats))

    def __call__(self, stats_input: Optional[Array]) -> Array:
        if self.training:
            stats = _expand(_stats_call(self, stats_input), self.bshape)
            c = self.counter[...]
            new_buf = _momentum_update(self.buffer[...], stats, self.momentum, c)
            self.buffer[...] = jnp.where(c == 0, jax.lax.stop_gradient(stats), new_buf)
            self.counter[...] = c + 1
            return self._post(stats)
        return self._post(self.buffer[...])


class ParameterFromRuntimeStatsScaling(nnx.Module):
    """Two-phase: collect running stats for ``collect_stats_steps`` training
    steps, then hand the buffer off into a learned parameter (reference
    ParameterFromRuntimeStatsScaling, core/scaling/standalone.py:155-264).

    The reference's Python-side counter/branching becomes a ``lax.cond`` on
    the carried int32 counter, so the whole thing lives inside one jitted
    train step AND the stats computation is genuinely skipped once the
    handoff completes — for percentile/KL stats inside a recurrent scan the
    collection branch costs orders of magnitude more than the learned-scale
    steady state (bench.py quantlstm leg measured ~90x), and XLA executes
    only the taken branch of a conditional.
    """

    def __init__(self, cfg: QuantConfig, stats_fn, bshape: Tuple[int, ...] = ()):
        assert cfg.collect_stats_steps > 0
        self.rc = _RestrictClamp(cfg)
        self.stats_fn = stats_fn
        self.bshape = bshape
        self.steps = int(cfg.collect_stats_steps)
        self.momentum = cfg.scaling_stats_momentum
        self.buffer = nnx.BatchStat(jnp.ones(bshape))
        self.value = nnx.Param(jnp.ones(bshape))
        self.counter = nnx.Variable(jnp.zeros((), jnp.int32))
        self.training: bool = True

    def _from_param(self) -> Array:
        return abs_binary_sign_grad(self.rc.forward(self.value[...]))

    def __call__(self, stats_input: Optional[Array]) -> Array:
        c = self.counter[...]
        if not self.training:
            # eval: restricted buffer while collecting, param afterwards
            buf = self.rc.forward(self.rc.preprocess_runtime(self.buffer[...]))
            return abs_binary_sign_grad(
                jnp.where(c <= self.steps, buf, self.rc.forward(self.value[...])))

        collecting = c < self.steps
        active = c <= self.steps  # collection or the handoff step

        def _active_branch(_):
            stats = _expand(_stats_call(self, stats_input), self.bshape)
            # buffer dtype (f32): cond branches must agree on output types
            # even when the activation is bf16/f16
            clamped = self.rc.clamp_only(stats).astype(self.buffer[...].dtype)
            # EMA / running-mean update of the buffer while collecting
            new_buf = jnp.where(
                c == 0, clamped,
                _momentum_update(self.buffer[...], clamped, self.momentum, c))
            buf = jnp.where(collecting, new_buf, self.buffer[...])
            # handoff: at step == steps, param := preprocess(buffer)
            val = jnp.where(c == self.steps,
                            self.rc.preprocess_runtime(buf), self.value[...])
            return buf, val, abs_binary_sign_grad(clamped)

        def _steady_branch(_):
            return (self.buffer[...], self.value[...],
                    jnp.ones(self.bshape, self.buffer[...].dtype))

        buf, val, from_stats = jax.lax.cond(
            active, _active_branch, _steady_branch, None)
        self.buffer[...] = buf
        self.value[...] = val
        self.counter[...] = jnp.where(active, c + 1, c)
        return jnp.where(collecting, from_stats, self._from_param())


# stats ops that aggregate per-channel maxima into one group (AbsMaxL2 /
# AbsMaxAve) must ALWAYS see a per-channel view, whatever the scale shape
# (reference fixes OverOutputChannelView for them, quant/base.py:219)
GROUP_REDUCING_STATS_OPS = frozenset({S.StatsOp.MAX_L2, S.StatsOp.MAX_AVE})


def _stats_call(mod, x: Array) -> Array:
    """Invoke a scaling module's stats fn, supplying the learned sigma when
    present (MEAN_LEARN_SIGMA_STD)."""
    sigma = getattr(mod, "sigma", None)
    if sigma is not None:
        return mod.stats_fn(x, sigma=sigma[...])
    return mod.stats_fn(x)


def _momentum_update(buf: Array, update: Array, momentum: Optional[float],
                     counter: Array) -> Array:
    """EMA or cumulative running mean (reference inplace_momentum_update,
    core/utils.py:25)."""
    update = jax.lax.stop_gradient(update)
    if momentum is None:
        new_counter = counter + 1
        return buf * (counter / new_counter) + update / new_counter
    return buf * (1 - momentum) + momentum * update


class FloatToIntMixin:
    """FloatToIntImpl resolution incl. STOCHASTIC_ROUND (reference
    FloatToIntImplType.STOCHASTIC_ROUND): the rng stream lives on the module
    (``self.rngs``) and is consumed per call so it lifts correctly through
    nnx transforms (a closure over the Rngs object would pin the original
    trace)."""

    def _init_float_to_int(self, cfg: QuantConfig, rngs: Optional[nnx.Rngs]):
        self._stochastic = (R.FloatToIntImpl(cfg.float_to_int)
                            == R.FloatToIntImpl.STOCHASTIC_ROUND)
        if self._stochastic:
            self.rngs = rngs if rngs is not None else nnx.Rngs(stochastic_round=0)
        else:
            self.rngs = rngs
            self._f2i_static = R.float_to_int_fn(cfg.float_to_int)

    def _float_to_int(self, x):
        if self._stochastic:
            from brevitas_tpu.ops.ste import stochastic_round_ste

            return stochastic_round_ste(x, self.rngs.stochastic_round())
        return self._f2i_static(x)


def build_scaling(cfg: QuantConfig, bshape: Tuple[int, ...],
                  init_stats_input: Optional[Array] = None,
                  fan_in: Optional[int] = None) -> nnx.Module:
    """Resolve ScalingImplType → scaling module (replacement for
    SolveScalingImplFromEnum, quant/solver/weight.py + act.py)."""
    impl = ScalingImplType(cfg.scaling_impl)
    if impl == ScalingImplType.AFFINE_STATS and not cfg.scaling_affine:
        # AFFINE_STATS implies the learned affine on top of stats
        # (reference _AffineRescaling, core/scaling/runtime.py:105)
        cfg = cfg.let(scaling_affine=True)
    op = S.StatsOp(cfg.scaling_stats_op)
    learned_sigma = op == S.StatsOp.MEAN_LEARN_SIGMA_STD
    if op == S.StatsOp.MSE:
        # the search needs a static target grid: int quant, const bit-width
        # (a learned bit-width would silently leave the search optimizing
        # the initial grid while quantization happens on the trained one)
        assert QuantType(cfg.quant_type) == QuantType.INT, \
            "StatsOp.MSE searches an int grid; use INT quant_type"
        assert BitWidthImplType(cfg.bit_width_impl) == BitWidthImplType.CONST, \
            "StatsOp.MSE needs a CONST bit-width (learned widths move the grid)"
    stats_fn = S.stats_fn(
        op, sigma=cfg.scaling_stats_sigma,
        high_percentile_q=cfg.high_percentile_q,
        low_percentile_q=cfg.low_percentile_q,
        bit_width=cfg.bit_width, signed=cfg.signed,
        narrow_range=cfg.narrow_range, po2_int_scale=cfg.po2_int_scale,
        mse_num_candidates=cfg.mse_search_candidates)
    if cfg.stats_reduce_mesh_axis is not None:
        base_fn, axis = stats_fn, cfg.stats_reduce_mesh_axis
        stats_fn = lambda x, **kw: base_fn(x, mesh_axis=axis, **kw)  # noqa: E731

    def init_stats(x):
        if learned_sigma:
            assert cfg.scaling_stats_sigma is not None, \
                "MEAN_LEARN_SIGMA_STD requires scaling_stats_sigma as init"
            return stats_fn(x, sigma=cfg.scaling_stats_sigma)
        return stats_fn(x)

    def attach_sigma(module):
        if learned_sigma:
            module.sigma = nnx.Param(
                jnp.asarray(float(cfg.scaling_stats_sigma)))
        return module
    if impl == ScalingImplType.CONST:
        assert cfg.scaling_const is not None, "CONST scaling requires scaling_const"
        return ConstScaling(cfg, cfg.scaling_const, bshape)
    if impl == ScalingImplType.HE:
        assert fan_in, "HE scaling requires fan-in"
        return ConstScaling(cfg, math.sqrt(2.0 / fan_in), bshape)
    if impl == ScalingImplType.PARAMETER:
        if cfg.scaling_const is not None:
            init = jnp.full(bshape, cfg.scaling_const)
        elif init_stats_input is not None:
            init = _expand(init_stats(init_stats_input), bshape)
        else:
            init = jnp.ones(bshape)
        return ParameterScaling(cfg, init, bshape)
    if impl == ScalingImplType.PARAMETER_FROM_STATS:
        if init_stats_input is not None:
            # parameter initialized from stats of the initial parameter value
            # (reference ParameterFromStatsScalingInit, quant/solver/parameter.py)
            init = _expand(init_stats(init_stats_input), bshape)
            return ParameterScaling(cfg, init, bshape)
        return attach_sigma(ParameterFromRuntimeStatsScaling(cfg, stats_fn, bshape))
    if impl in (ScalingImplType.STATS, ScalingImplType.AFFINE_STATS):
        if init_stats_input is not None:
            return attach_sigma(StatsScaling(cfg, stats_fn, bshape))
        return attach_sigma(RuntimeStatsScaling(cfg, stats_fn, bshape))
    if impl == ScalingImplType.DYNAMIC:
        # stateless per-call stats — no EMA, no phase, nothing to train or
        # checkpoint; the LLM dynamic-quant pattern
        return attach_sigma(StatsScaling(cfg, stats_fn, bshape))
    raise ValueError(f"unsupported scaling impl {impl}")


# ---------------------------------------------------------------------------
# zero-point impls
# ---------------------------------------------------------------------------

class ZeroPoint(nnx.Module):
    """Zero-point resolution (reference core/zero_point.py). Produces the
    integer-domain zero-point given (stats_input, scale, bit_width)."""

    def __init__(self, cfg: QuantConfig, bshape: Tuple[int, ...],
                 runtime: bool):
        self.impl = ZeroPointImplType(cfg.zero_point_impl)
        self.cfg = cfg
        self.bshape = bshape
        if self.impl == ZeroPointImplType.ZERO:
            return
        self.stats_fn = S.stats_fn(
            cfg.zero_point_stats_op, low_percentile_q=cfg.low_percentile_q)
        if self.impl == ZeroPointImplType.PARAMETER:
            self.value = nnx.Param(jnp.zeros(bshape))
        elif self.impl == ZeroPointImplType.PARAMETER_FROM_STATS:
            assert runtime, "two-phase zero-point is an activation feature"
            self.steps = int(cfg.collect_stats_steps)
            self.momentum = cfg.scaling_stats_momentum
            self.buffer = nnx.BatchStat(jnp.zeros(bshape))
            self.value = nnx.Param(jnp.zeros(bshape))
            self.counter = nnx.Variable(jnp.zeros((), jnp.int32))
            self.training: bool = True

    def _scale_shift(self, zp_linear: Array, scale: Array, bit_width: Array) -> Array:
        """zp/scale + min_int, optionally quantized (reference
        _ScaleShiftZeroPoint, core/zero_point.py:38)."""
        cfg = self.cfg
        from brevitas_tpu.ops import min_int as _min_int
        mi = _min_int(cfg.signed, cfg.narrow_range, bit_width)
        if cfg.quantize_zero_point:
            return Qf.int_quant_to_int(
                zp_linear, scale, mi, bit_width, signed=cfg.signed,
                narrow_range=cfg.narrow_range,
                clamp_fn=tensor_clamp_ste if cfg.clamp_ste else tensor_clamp)
        return zp_linear / scale + mi

    def __call__(self, stats_input: Optional[Array], scale: Array,
                 bit_width: Array) -> Array:
        if self.impl == ZeroPointImplType.ZERO:
            return jnp.zeros(())
        if self.impl == ZeroPointImplType.PARAMETER:
            zp = abs_binary_sign_grad(self.value[...])
            return self._scale_shift(zp, scale, bit_width)
        if self.impl == ZeroPointImplType.STATS:
            # from-parameter stats: negate so a negative min becomes a shift
            # (reference StatsFromParameterZeroPoint, core/zero_point.py:57)
            stats = _expand(self.stats_fn(stats_input), self.bshape)
            return self._scale_shift(-stats, scale, bit_width)
        # PARAMETER_FROM_STATS: two-phase runtime collection
        c = self.counter[...]
        if self.training:
            stats = _expand(self.stats_fn(stats_input), self.bshape)
            collecting = c < self.steps
            new_buf = jnp.where(
                c == 0, jax.lax.stop_gradient(stats),
                _momentum_update(self.buffer[...], stats, self.momentum, c))
            self.buffer[...] = jnp.where(collecting, new_buf, self.buffer[...])
            self.value[...] = jnp.where(c == self.steps, self.buffer[...],
                                        self.value[...])
            self.counter[...] = jnp.where(c <= self.steps, c + 1, c)
            out = jnp.where(collecting, stats, self.value[...])
        else:
            out = jnp.where(c <= self.steps, self.buffer[...], self.value[...])
        return self._scale_shift(abs_binary_sign_grad(out), scale, bit_width)


# ---------------------------------------------------------------------------
# delay
# ---------------------------------------------------------------------------

class QuantDelay(nnx.Module):
    """Return the FP value for the first N training steps
    (reference DelayWrapper, core/quant/delay.py:43)."""

    def __init__(self, steps: int):
        self.steps = int(steps)
        if self.steps > 0:
            self.counter = nnx.Variable(jnp.zeros((), jnp.int32))
        self.training: bool = True

    def __call__(self, x: Array, y: Array) -> Array:
        if self.steps <= 0:
            return y
        c = self.counter[...]
        if self.training:
            self.counter[...] = c + 1
        return jnp.where(c < self.steps, x, y)


# ---------------------------------------------------------------------------
# full quantizers
# ---------------------------------------------------------------------------

class ParameterQuantizer(nnx.Module, TrainToggleMixin, FloatToIntMixin):
    """Weight-side quantizer (reference WeightQuantProxyFromInjector +
    WeightQuantSolver stack, proxy/parameter_quant.py:65,
    quant/solver/weight.py:91).

    Construction takes the initial parameter value so stats-initialized
    scaling (PARAMETER / PARAMETER_FROM_STATS) resolves immediately — the
    analogue of the reference's tracked_parameter_list.
    """

    def __init__(self, cfg: QuantConfig, weight_init: Array,
                 channel_axis: int = 0, rngs: Optional[nnx.Rngs] = None):
        self.cfg = cfg
        self.quant_type = QuantType(cfg.quant_type)
        self.disable_quant: bool = False  # calibration-mode bypass
        self._init_float_to_int(cfg, rngs)
        self.channel_axis = channel_axis
        self.per_channel = cfg.scaling_per_output_channel
        self.bshape = scaling_broadcast_shape(
            weight_init.shape, self.per_channel, channel_axis)
        if self.quant_type == QuantType.NONE:
            return
        # group-reducing ops (AbsMaxL2/AbsMaxAve) aggregate per-channel maxima
        # into ONE group: they always need the per-channel view and cannot
        # produce per-channel scales
        op = S.StatsOp(cfg.scaling_stats_op)
        if op in GROUP_REDUCING_STATS_OPS and self.per_channel:
            raise ValueError(f"{op} reduces channel groups to a single stat; "
                             "it cannot drive per-channel scaling")
        self.stats_per_channel = self.per_channel or op in GROUP_REDUCING_STATS_OPS
        view = stats_view(weight_init, self.stats_per_channel, channel_axis)
        fan_in = view.shape[-1]
        self.bit_width_impl = BitWidth(cfg)
        if cfg.decoupled:
            # learned scale initialized from pre-scaling stats of the weight
            # (built once; the symmetric non-decoupled scaling is never used)
            pre_op = S.StatsOp(cfg.pre_scaling_stats_op)
            self.pre_stats_fn = S.stats_fn(
                pre_op, high_percentile_q=cfg.high_percentile_q)
            pre_cfg = cfg.let(scaling_impl=ScalingImplType.PARAMETER,
                              scaling_stats_op=cfg.pre_scaling_stats_op)
            pre_view = stats_view(
                weight_init,
                self.per_channel or pre_op in GROUP_REDUCING_STATS_OPS,
                channel_axis)
            self.scaling = build_scaling(pre_cfg, self.bshape,
                                         init_stats_input=pre_view,
                                         fan_in=pre_view.shape[-1])
        else:
            self.scaling = build_scaling(cfg, self.bshape,
                                         init_stats_input=view, fan_in=fan_in)
        self.zero_point = ZeroPoint(cfg, self.bshape, runtime=False)
        self.delay = QuantDelay(cfg.quant_delay_steps)
        # groupwise / microscaling (OCP MX): one scale per `scaling_per_group`
        # consecutive reduction-dim elements per output channel. No analogue
        # in the reference snapshot; later Brevitas ships GroupwiseInt/Float.
        if cfg.scaling_per_group is not None:
            if self.quant_type not in (QuantType.INT, QuantType.FLOAT):
                raise ValueError("groupwise quant supports INT/FLOAT elements")
            if cfg.decoupled or cfg.accumulator_bit_width is not None:
                raise ValueError("groupwise quant excludes decoupled/A2Q")
            if self.per_channel:
                raise ValueError("scaling_per_group already implies "
                                 "per-output-channel grouping")
            if ZeroPointImplType(cfg.zero_point_impl) != ZeroPointImplType.ZERO:
                raise ValueError("groupwise quant is symmetric-only")
            if ScalingImplType(cfg.scaling_impl) != ScalingImplType.STATS:
                raise ValueError("groupwise scales are weight statistics — "
                                 "use scaling_impl=STATS")
            if channel_axis % weight_init.ndim != weight_init.ndim - 1:
                raise ValueError("groupwise quant expects the output channel "
                                 "axis last (channels-last kernels)")
            G = int(cfg.scaling_per_group)
            red = weight_init.size // weight_init.shape[-1]
            if red % G != 0:
                raise ValueError(
                    f"reduction size {red} is not divisible by the group "
                    f"size {G}")
            self._group_rc = _RestrictClamp(cfg)
            self._group_stats = S.stats_fn(
                S.StatsOp(cfg.scaling_stats_op),
                sigma=cfg.scaling_stats_sigma,
                high_percentile_q=cfg.high_percentile_q)

        # A2Q accumulator-aware weight norm (arXiv:2308.13504; no analogue in
        # the reference snapshot, later Brevitas ships AccumulatorAwareQuant):
        # a learned per-channel l1-norm target g, clamped at quantization time
        # so the integer weights guarantee no accumulator overflow
        if cfg.accumulator_bit_width is not None:
            if self.quant_type != QuantType.INT or cfg.decoupled:
                raise ValueError("accumulator-aware quant is plain-INT only")
            if ZeroPointImplType(cfg.zero_point_impl) != ZeroPointImplType.ZERO:
                raise ValueError("accumulator-aware quant is symmetric-only")
            pc_view = stats_view(weight_init, True, channel_axis)
            l1 = _expand(jnp.sum(jnp.abs(pc_view), axis=-1), self.bshape) \
                if self.per_channel else jnp.sum(jnp.abs(weight_init))
            self.g = nnx.Param(jnp.asarray(l1, jnp.float32))

    def _clamp_fn(self):
        return tensor_clamp_ste if self.cfg.clamp_ste else tensor_clamp

    def _groupwise_quant(self, w: Array) -> QuantTensor:
        """Microscaling path: reshape the reduction dims into (K/G, G) blocks
        per output channel, one stats-driven scale per block. The returned
        scale is expanded to the full weight shape (exact elementwise grid —
        QuantTensor algebra and is_valid hold unchanged)."""
        cfg = self.cfg
        G = int(cfg.scaling_per_group)
        out = w.shape[-1]
        red = w.size // out
        blocks = w.reshape(red // G, G, out)
        view = jnp.moveaxis(blocks, 1, -1).reshape(-1, G)  # (K/G*O, G)
        stats = self._group_stats(view).reshape(red // G, 1, out)
        threshold = self._group_rc.forward(
            self._group_rc.preprocess_runtime(stats))
        bit_width = self.bit_width_impl()
        if self.quant_type == QuantType.FLOAT:
            e, mb, bias, mv = _float_quant_params(cfg)
            scale = threshold / mv
            y = Qf.float_quant(blocks, scale, exponent_bits=e,
                               mantissa_bits=mb, exponent_bias=bias,
                               max_val=mv, float_to_int=self._float_to_int,
                               clamp_fn=self._clamp_fn())
            bit_width = jnp.asarray(1.0 + e + mb)
        else:
            scale = Qf.rescaling_scale(threshold, bit_width, signed=cfg.signed,
                                       narrow_range=cfg.narrow_range,
                                       po2_int_scale=cfg.po2_int_scale)
            y = Qf.int_quant(blocks, scale, jnp.zeros(()), bit_width,
                             signed=cfg.signed, narrow_range=cfg.narrow_range,
                             float_to_int=self._float_to_int,
                             clamp_fn=self._clamp_fn())
        full_scale = jnp.broadcast_to(scale, blocks.shape).reshape(w.shape)
        return QuantTensor(self.delay(w, y.reshape(w.shape)), full_scale,
                           jnp.zeros(()), bit_width, signed=True)

    def _a2q_quant(self, w: Array, input_bit_width, input_signed):
        """Accumulator-aware path: weight-norm w to an l1 budget that bounds
        the accumulator, then round TOWARD ZERO so the integer l1 norm can
        only shrink (the overflow guarantee)."""
        cfg = self.cfg
        if input_bit_width is None or input_signed is None:
            raise ValueError(
                "accumulator-aware weight quant needs input_bit_width and "
                "input_signed (quantize the layer input)")
        view = stats_view(w, self.stats_per_channel, self.channel_axis)
        bit_width = self.bit_width_impl()
        threshold = self.scaling(view)
        scale = Qf.rescaling_scale(threshold, bit_width, signed=cfg.signed,
                                   narrow_range=cfg.narrow_range,
                                   po2_int_scale=cfg.po2_int_scale)
        # accumulator budget: sum_k |w_int_k| * max|x_int| <= 2^(A-1) - 1.
        # signed non-narrow inputs reach |-2^(b-1)| = 2^(b-1) — one MORE than
        # max_int — so the magnitude bound is 2^(b-1), not 2^(b-1)-1
        ibw = jnp.asarray(input_bit_width, jnp.float32)
        max_x = jnp.where(jnp.asarray(bool(input_signed)),
                          2.0 ** (ibw - 1.0), 2.0 ** ibw - 1.0)
        T = (2.0 ** (cfg.accumulator_bit_width - 1.0) - 1.0) / max_x
        g = abs_binary_sign_grad(self.g[...])
        g_eff = jnp.minimum(g, T * scale)
        if self.per_channel:
            l1 = _expand(jnp.sum(jnp.abs(
                stats_view(w, True, self.channel_axis)), axis=-1), self.bshape)
        else:
            l1 = jnp.sum(jnp.abs(w))
        w_norm = w * (g_eff / jnp.maximum(l1, 1e-10))
        y_int = round_to_zero_ste(w_norm / scale)
        y_int = self._clamp_fn()(
            y_int, min_int(cfg.signed, cfg.narrow_range, bit_width),
            max_int(cfg.signed, cfg.narrow_range, bit_width))
        return QuantTensor(self.delay(w, y_int * scale), scale, jnp.zeros(()),
                           bit_width, signed=True)

    def __call__(self, w: Array, *, input_bit_width=None,
                 input_signed=None) -> QuantTensor:
        cfg = self.cfg
        if self.quant_type == QuantType.NONE or self.disable_quant:
            return QuantTensor(w)
        if cfg.accumulator_bit_width is not None:
            return self._a2q_quant(w, input_bit_width, input_signed)
        if cfg.scaling_per_group is not None:
            return self._groupwise_quant(w)
        view = stats_view(w, self.stats_per_channel, self.channel_axis)
        if self.quant_type == QuantType.BINARY:
            scale = self.scaling(view)
            y, bit_width = Qf.binary_quant(w, scale)
            return QuantTensor(self.delay(w, y), scale, jnp.zeros(()), bit_width,
                               signed=True)
        if self.quant_type == QuantType.TERNARY:
            scale = self.scaling(view)
            y, bit_width = Qf.ternary_quant(w, scale, cfg.ternary_threshold)
            return QuantTensor(self.delay(w, y), scale, jnp.zeros(()), bit_width,
                               signed=True)
        if self.quant_type == QuantType.FLOAT:
            e, mb, bias, mv = _float_quant_params(cfg)
            threshold = self.scaling(view)
            scale = threshold / mv  # measured range maps to the format max
            y = Qf.float_quant(w, scale, exponent_bits=e, mantissa_bits=mb,
                               exponent_bias=bias, max_val=mv,
                               float_to_int=self._float_to_int,
                               clamp_fn=self._clamp_fn())
            return QuantTensor(self.delay(w, y), scale, jnp.zeros(()),
                               jnp.asarray(1.0 + e + mb), signed=True)
        bit_width = self.bit_width_impl()
        threshold = self.scaling(view)
        scale = Qf.rescaling_scale(threshold, bit_width, signed=cfg.signed,
                                   narrow_range=cfg.narrow_range,
                                   po2_int_scale=cfg.po2_int_scale)
        zp = self.zero_point(view, scale, bit_width)
        if cfg.decoupled:
            # pre-scaling stats always view per output channel (reference
            # fixes OverOutputChannelView for the pre-scale path,
            # quant/base.py:219-279, even when the learned scale is
            # per-tensor — AbsMaxL2 norms the per-channel maxima)
            pre_view = stats_view(w, True, self.channel_axis)
            pre_threshold = _expand(self.pre_stats_fn(pre_view), self.bshape)
            pre_scale = Qf.rescaling_scale(
                pre_threshold, bit_width, signed=cfg.signed,
                narrow_range=cfg.narrow_range, po2_int_scale=cfg.po2_int_scale)
            y = Qf.decoupled_int_quant(
                w, pre_scale, jnp.zeros(()), scale, zp, bit_width,
                signed=cfg.signed, narrow_range=cfg.narrow_range,
                float_to_int=self._float_to_int,
                clamp_fn=self._clamp_fn())
        else:
            y = Qf.int_quant(
                w, scale, zp, bit_width, signed=cfg.signed,
                narrow_range=cfg.narrow_range,
                float_to_int=self._float_to_int,
                clamp_fn=self._clamp_fn())
        return QuantTensor(self.delay(w, y), scale, zp, bit_width,
                           signed=cfg.signed)


# Backwards-friendly alias: weights are the common case.
WeightQuantizer = ParameterQuantizer


class ActQuantizer(nnx.Module, TrainToggleMixin, FloatToIntMixin):
    """Activation-side quantizer (reference ActQuantProxyFromInjector +
    ActQuantSolver, proxy/runtime_quant.py:87, quant/solver/act.py:121)."""

    def __init__(self, cfg: QuantConfig, num_channels: Optional[int] = None,
                 rngs: Optional[nnx.Rngs] = None):
        self.cfg = cfg
        self.quant_type = QuantType(cfg.quant_type)
        self.training: bool = True
        self.disable_quant: bool = False  # calibration-mode bypass
        self._init_float_to_int(cfg, rngs)
        if self.quant_type == QuantType.NONE:
            return
        # per-channel activation scaling: channels-last, so the scale is a
        # plain (C,) vector broadcasting over (..., C) activations
        # (reference needs per_channel_broadcastable_shape for NCHW,
        # quant/solver/act.py; channels-last makes it implicit)
        self.per_channel = bool(cfg.scaling_per_output_channel)
        if self.per_channel and num_channels is None:
            raise ValueError("per-channel act quant requires num_channels")
        op = S.StatsOp(cfg.scaling_stats_op)
        if op in GROUP_REDUCING_STATS_OPS and self.per_channel:
            raise ValueError(f"{op} reduces channel groups to a single stat; "
                             "it cannot drive per-channel scaling")
        self.stats_per_channel = self.per_channel or op in GROUP_REDUCING_STATS_OPS
        bshape = (num_channels,) if self.per_channel else ()
        self.bit_width_impl = BitWidth(cfg)
        # per-token: one dynamic scale per leading position, reduced over the
        # channel axis (LLM dynamic-quant; no state, bypasses self.scaling)
        self.per_token = bool(cfg.scaling_per_token)
        if self.per_token:
            if ScalingImplType(cfg.scaling_impl) != ScalingImplType.DYNAMIC:
                raise ValueError(
                    "per-token activation scaling requires scaling_impl=DYNAMIC")
            if self.per_channel:
                raise ValueError("per-token and per-channel scaling are exclusive")
            if ZeroPointImplType(cfg.zero_point_impl) != ZeroPointImplType.ZERO:
                raise ValueError("per-token scaling is symmetric-only")
            self._token_rc = _RestrictClamp(cfg)
            self._token_stats = S.stats_fn(
                op, sigma=cfg.scaling_stats_sigma,
                high_percentile_q=cfg.high_percentile_q,
                low_percentile_q=cfg.low_percentile_q)
        self.scaling = build_scaling(cfg, bshape)
        self.zero_point = ZeroPoint(cfg, bshape, runtime=True)
        self.delay = QuantDelay(cfg.quant_delay_steps)

    def _token_threshold(self, x: Array) -> Array:
        t = self._token_stats(x.reshape(-1, x.shape[-1]))
        t = self._token_rc.forward(self._token_rc.preprocess_runtime(t))
        return t.reshape(x.shape[:-1] + (1,))

    def static_int_params(self):
        """``(scale, bit_width)`` when this INT quantizer's output grid is
        data-independent (const/learned scale, zero zero-point, no delay) —
        gradients flow through the returned scale into the learned
        parameter. Returns ``"identity"`` for disabled quantizers and
        ``None`` when the quantizer carries per-call state (runtime stats,
        two-phase collection, dynamic/per-token scaling), in which case the
        caller must invoke the quantizer normally. Used to fuse per-timestep
        quant chains (QuantLSTM scan) into batched fake-quant calls."""
        if self.quant_type == QuantType.NONE:
            return "identity"
        cfg = self.cfg
        if (self.quant_type != QuantType.INT or self.disable_quant
                or self.per_token or self.per_channel
                or cfg.quant_delay_steps > 0):
            return None
        if ZeroPointImplType(cfg.zero_point_impl) != ZeroPointImplType.ZERO:
            return None
        if not isinstance(self.scaling, (ConstScaling, ParameterScaling)):
            return None
        bit_width = self.bit_width_impl()
        threshold = self.scaling(None)
        scale = Qf.rescaling_scale(
            threshold, bit_width, signed=cfg.signed,
            narrow_range=cfg.narrow_range, po2_int_scale=cfg.po2_int_scale)
        return scale, bit_width

    def __call__(self, x: Array) -> QuantTensor:
        cfg = self.cfg
        if self.quant_type == QuantType.NONE:
            return QuantTensor(x, training=self.training)
        if self.disable_quant:
            # calibration mode: advance scaling/zero-point statistics state
            # but emit the float value unchanged (the reference achieves this
            # with post-forward hooks, graph/calibrate.py:112-133)
            if ScalingImplType(cfg.scaling_impl) == ScalingImplType.DYNAMIC:
                return QuantTensor(x, training=self.training)  # stateless
            view = stats_view(x, self.stats_per_channel, channel_axis=-1)
            bit_width = self.bit_width_impl()
            if self.quant_type == QuantType.INT:
                threshold = self.scaling(view)
                scale = Qf.rescaling_scale(
                    threshold, bit_width, signed=cfg.signed,
                    narrow_range=cfg.narrow_range,
                    po2_int_scale=cfg.po2_int_scale)
                self.zero_point(view, scale, bit_width)
            else:
                self.scaling(view)
            return QuantTensor(x, training=self.training)
        view = stats_view(x, self.stats_per_channel, channel_axis=-1)
        bit_width = self.bit_width_impl()
        if self.quant_type == QuantType.BINARY:
            scale = self.scaling(view)
            y, bit_width = Qf.clamped_binary_quant(x, scale)
            return QuantTensor(self.delay(x, y), scale, jnp.zeros(()), bit_width,
                               signed=True, training=self.training)
        if self.quant_type == QuantType.TERNARY:
            scale = self.scaling(view)
            y, bit_width = Qf.ternary_quant(x, scale, cfg.ternary_threshold)
            return QuantTensor(self.delay(x, y), scale, jnp.zeros(()), bit_width,
                               signed=True, training=self.training)
        if self.quant_type == QuantType.FLOAT:
            e, mb, bias, mv = _float_quant_params(cfg)
            threshold = self._token_threshold(x) if self.per_token \
                else self.scaling(view)
            scale = threshold / mv
            y = Qf.float_quant(
                x, scale, exponent_bits=e, mantissa_bits=mb,
                exponent_bias=bias, max_val=mv,
                float_to_int=self._float_to_int,
                clamp_fn=tensor_clamp_ste if cfg.clamp_ste else tensor_clamp)
            return QuantTensor(self.delay(x, y), scale, jnp.zeros(()),
                               jnp.asarray(1.0 + e + mb), signed=True,
                               training=self.training)
        threshold = self._token_threshold(x) if self.per_token \
            else self.scaling(view)
        scale = Qf.rescaling_scale(threshold, bit_width, signed=cfg.signed,
                                   narrow_range=cfg.narrow_range,
                                   po2_int_scale=cfg.po2_int_scale)
        zp = self.zero_point(view, scale, bit_width)
        y = Qf.int_quant(
            x, scale, zp, bit_width, signed=cfg.signed,
            narrow_range=cfg.narrow_range,
            float_to_int=self._float_to_int,
            clamp_fn=tensor_clamp_ste if cfg.clamp_ste else tensor_clamp)
        return QuantTensor(self.delay(x, y), scale, zp, bit_width,
                           signed=cfg.signed, training=self.training)


class BiasQuantizer(nnx.Module, TrainToggleMixin):
    """Bias quantizer: scale either external (input_scale * weight_scale, the
    accumulator scale) or internal from bias stats (reference
    BiasQuantProxyFromInjector, proxy/parameter_quant.py:113-175)."""

    def __init__(self, cfg: QuantConfig, bias_init: Optional[Array] = None):
        self.cfg = cfg
        self.quant_type = QuantType(cfg.quant_type)
        self.disable_quant: bool = False  # calibration-mode bypass
        if self.quant_type == QuantType.NONE:
            return
        self.bit_width_impl = BitWidth(cfg)
        if not cfg.requires_input_scale:
            assert bias_init is not None
            view = stats_view(bias_init, per_channel=False)
            self.scaling = build_scaling(cfg, (), init_stats_input=view,
                                         fan_in=view.shape[-1])

    def __call__(self, b: Array, input_scale: Optional[Array] = None,
                 input_bit_width: Optional[Array] = None) -> QuantTensor:
        cfg = self.cfg
        if self.quant_type == QuantType.NONE or self.disable_quant:
            return QuantTensor(b)
        if cfg.requires_input_bit_width:
            assert input_bit_width is not None
            bit_width = input_bit_width
        else:
            bit_width = self.bit_width_impl()
        if cfg.requires_input_scale:
            assert input_scale is not None, (
                "bias quantizer requires the accumulator scale "
                "(input_scale * weight_scale)")
            scale = input_scale
            # a 1-D bias takes the accumulator scale flattened to per-channel;
            # higher-rank biases (e.g. stacked MoE experts (E, 1, B)) already
            # broadcast against the accumulator scale's own shape
            if b.ndim == 1 and scale.ndim > 1:
                scale = scale.reshape(-1)
        else:
            threshold = self.scaling(stats_view(b, per_channel=False))
            scale = Qf.rescaling_scale(threshold, bit_width, signed=cfg.signed,
                                       narrow_range=cfg.narrow_range,
                                       po2_int_scale=cfg.po2_int_scale)
        y = Qf.int_quant(
            b, scale, jnp.zeros(()), bit_width, signed=cfg.signed,
            narrow_range=cfg.narrow_range,
            float_to_int=R.float_to_int_fn(cfg.float_to_int),
            clamp_fn=tensor_clamp_ste if cfg.clamp_ste else tensor_clamp)
        return QuantTensor(y, scale, jnp.zeros(()), bit_width, signed=cfg.signed)


class TruncQuantizer(nnx.Module, TrainToggleMixin):
    """Accumulator LSB truncation, e.g. after avg-pool sums (reference
    TruncQuantProxyFromInjector, proxy/runtime_quant.py:178 + TruncIntQuant)."""

    def __init__(self, cfg: QuantConfig):
        self.cfg = cfg
        self.bit_width_impl = BitWidth(cfg)

    def __call__(self, qt: QuantTensor) -> QuantTensor:
        cfg = self.cfg
        out_bw = self.bit_width_impl()
        y = Qf.trunc_int_quant(
            qt.value, qt.scale, qt.zero_point, qt.bit_width, out_bw,
            float_to_int=R.float_to_int_fn(cfg.float_to_int))
        return QuantTensor(y, qt.scale, qt.zero_point, out_bw,
                           signed=qt.signed, training=qt.training)


class ClampQuantizer(nnx.Module, TrainToggleMixin):
    """MSB clamp to a smaller bit-width keeping scale (reference
    ClampQuantProxyFromInjector, proxy/runtime_quant.py:167)."""

    def __init__(self, cfg: QuantConfig):
        self.cfg = cfg
        self.bit_width_impl = BitWidth(cfg)

    def __call__(self, qt: QuantTensor) -> QuantTensor:
        cfg = self.cfg
        out_bw = self.bit_width_impl()
        y = Qf.int_quant(
            qt.value, qt.scale, qt.zero_point, out_bw, signed=cfg.signed,
            narrow_range=cfg.narrow_range,
            clamp_fn=tensor_clamp_ste if cfg.clamp_ste else tensor_clamp)
        return QuantTensor(y, qt.scale, qt.zero_point, out_bw,
                           signed=cfg.signed, training=qt.training)


def convert_runtime_stats_to_parameter(root: nnx.Module) -> int:
    """Migrate every RuntimeStatsScaling in the tree to a ParameterScaling
    seeded from its EMA buffer (reference ConvertRuntimeStatsToParameter,
    proxy/utils.py:8-31 — the checkpoint-surgery path for switching a
    trained model from runtime-stats to learned-scale fine-tuning).

    A learned affine on top of the stats (AFFINE_STATS) folds into the seed.
    The owning quantizer's config is updated so later checkpoint restores
    rebuild a parameter-scaling module. Returns the count converted.
    """
    from brevitas_tpu.graph.base import named_modules
    from brevitas_tpu.quant.config import ScalingImplType

    count = 0
    for _, mod in named_modules(root):
        scaling = getattr(mod, "scaling", None)
        cfg = getattr(mod, "cfg", None)
        if cfg is None:
            continue
        if isinstance(scaling, RuntimeStatsScaling):
            seed = scaling.buffer[...]
            if scaling.affine:
                seed = (seed * scaling.affine_weight[...]
                        + scaling.affine_bias[...])
        elif isinstance(scaling, ParameterFromRuntimeStatsScaling):
            # two-phase scaler: seed from the learned value once the handoff
            # happened, from the stats buffer mid-collection (both mapped to
            # the linear domain — ParameterScaling re-preprocesses). Besides
            # reference parity this is the steady-state QAT fast path: the
            # plain learned parameter carries no per-call lax.cond.
            post = int(scaling.counter[...]) > scaling.steps
            seed = (scaling.rc.forward(scaling.value[...]) if post
                    else scaling.buffer[...])
        else:
            continue
        new_cfg = cfg.let(scaling_impl=ScalingImplType.PARAMETER,
                          scaling_affine=False)
        mod.cfg = new_cfg
        mod.scaling = ParameterScaling(new_cfg, seed, scaling.bshape)
        count += 1
    return count
