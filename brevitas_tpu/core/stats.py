"""Statistics ops for scale/zero-point estimation.

Reference: ``src/brevitas/core/stats/stats_op.py`` (AbsMax:129, AbsMinMax:144,
AbsMaxAve:161, AbsMaxL2:173, AbsAve:188, AbsPercentile:41,
NegativeMinOrZero:22, NegativePercentileOrZero:69, PercentileInterval:97,
MeanSigmaStd:203, KLMinimizerThreshold:280).

Canonical input layout: the caller views the input as 2-D ``(groups, elems)``
where ``groups`` is 1 for per-tensor stats or the number of channels for
per-channel stats (reference encodes this as "view shape impls",
``src/brevitas/core/function_wrapper/shape.py``). Every op reduces axis -1 and
returns shape ``(groups,)``. This normalization keeps shapes static and the
reductions XLA-tileable.

All ops accept ``mesh_axis``: when set, per-shard statistics are combined with
the appropriate collective (pmax/psum) so that data-parallel calibration sees
global statistics — a capability the reference lacks entirely (single device,
SURVEY §2.4).
"""

import enum
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray

DEFAULT_MOMENTUM = 0.1
DEFAULT_STD_DEV_EPSILON = 1e-8


class StatsOp(str, enum.Enum):
    """Reference enum StatsOp (src/brevitas/inject/enum.py:61)."""
    MAX = "max"                      # AbsMax
    AVE = "ave"                      # AbsAve
    MAX_AVE = "max_ave"              # AbsMaxAve
    MAX_L2 = "max_l2"                # AbsMaxL2
    MEAN_SIGMA_STD = "mean_sigma_std"
    MEAN_LEARN_SIGMA_STD = "mean_learn_sigma_std"
    PERCENTILE = "percentile"        # AbsPercentile
    MIN_MAX = "min_max"              # AbsMinMax
    PERCENTILE_INTERVAL = "percentile_interval"
    MIN = "min"                      # NegativeMinOrZero (zero-point side)
    PERCENTILE_LOW = "percentile_low"  # NegativePercentileOrZero
    MSE = "mse"                      # grid-search threshold minimizing quant MSE


def _maybe_all(op, x, mesh_axis):
    if mesh_axis is None:
        return x
    return op(x, axis_name=mesh_axis)


def abs_max(x: Array, mesh_axis: Optional[str] = None) -> Array:
    out = jnp.max(jnp.abs(x), axis=-1)
    return _maybe_all(jax.lax.pmax, out, mesh_axis)


def abs_min_max(x: Array, mesh_axis: Optional[str] = None) -> Array:
    mx = _maybe_all(jax.lax.pmax, jnp.max(x, axis=-1), mesh_axis)
    mn = _maybe_all(jax.lax.pmin, jnp.min(x, axis=-1), mesh_axis)
    return jnp.abs(mx - mn)


def abs_ave(x: Array, mesh_axis: Optional[str] = None) -> Array:
    out = jnp.mean(jnp.abs(x), axis=-1)
    return _maybe_all(jax.lax.pmean, out, mesh_axis)


def abs_max_ave(x: Array, mesh_axis: Optional[str] = None) -> Array:
    """Mean over groups of per-group abs-max; returns a scalar-shaped (1,) stat.

    Reference AbsMaxAve reduces max over the stats dim then means over the
    rest (stats_op.py:161). Under sharding the per-group maxima combine with
    pmax BEFORE the mean (mean-of-local-means would underestimate)."""
    per_group = jnp.max(jnp.abs(x), axis=-1)
    per_group = _maybe_all(jax.lax.pmax, per_group, mesh_axis)
    return jnp.mean(per_group, keepdims=True)


def abs_max_l2(x: Array, mesh_axis: Optional[str] = None) -> Array:
    """RMS of per-group abs-max (reference AbsMaxL2, stats_op.py:173)."""
    per_group_max = jnp.max(jnp.abs(x), axis=-1)
    per_group_max = _maybe_all(jax.lax.pmax, per_group_max, mesh_axis)
    out = jnp.linalg.norm(per_group_max.reshape(-1), ord=2)
    out = out / math.sqrt(per_group_max.size)
    return out.reshape(1)


def mean_sigma_std(x: Array, sigma, epsilon: float = DEFAULT_STD_DEV_EPSILON,
                   mesh_axis: Optional[str] = None) -> Array:
    """mean(|x|) + sigma * std(|x|) (reference MeanSigmaStd, stats_op.py:203)."""
    abs_val = jnp.abs(x)
    mean_val = _maybe_all(jax.lax.pmean, jnp.mean(abs_val, axis=-1), mesh_axis)
    if mesh_axis is None:
        # unbiased (ddof=1), matching torch.var's default in the reference
        var = jnp.var(abs_val, axis=-1, ddof=1)
    else:
        # global unbiased variance via E[x^2] - E[x]^2 with n/(n-1) correction
        mean_sq = jax.lax.pmean(jnp.mean(abs_val**2, axis=-1), axis_name=mesh_axis)
        n = abs_val.shape[-1] * jax.lax.axis_size(mesh_axis)
        var = (mean_sq - mean_val**2) * (n / max(n - 1, 1))
    std_val = jnp.sqrt(var + epsilon)
    return mean_val + sigma * std_val


def _kth_smallest(x_flat: Array, k: int) -> Array:
    """1-indexed k-th smallest value along axis -1 (torch.kthvalue parity)."""
    return jnp.sort(x_flat, axis=-1)[..., k - 1]


def abs_percentile(x: Array, q: float, mesh_axis: Optional[str] = None) -> Array:
    """q-th percentile of |x| using torch.kthvalue index semantics:
    k = floor(q/100 * n + 0.5), 1-indexed (reference AbsPercentile,
    stats_op.py:41-66)."""
    if mesh_axis is not None:
        x = jax.lax.all_gather(x, axis_name=mesh_axis, axis=-1, tiled=True)
    n = x.shape[-1]
    k = max(1, min(n, int(math.floor(0.01 * q * n + 0.5))))
    return _kth_smallest(jnp.abs(x), k)


def negative_min_or_zero(x: Array, mesh_axis: Optional[str] = None) -> Array:
    """min(x) clamped above by 0 (reference NegativeMinOrZero, stats_op.py:22)."""
    mn = _maybe_all(jax.lax.pmin, jnp.min(x, axis=-1), mesh_axis)
    return jnp.minimum(mn, 0.0)


def negative_percentile_or_zero(x: Array, q: float,
                                mesh_axis: Optional[str] = None) -> Array:
    """Low percentile clamped above by 0, k = ceil(q/100 * n)
    (reference NegativePercentileOrZero, stats_op.py:69)."""
    if mesh_axis is not None:
        x = jax.lax.all_gather(x, axis_name=mesh_axis, axis=-1, tiled=True)
    n = x.shape[-1]
    k = max(1, min(n, int(math.ceil(0.01 * q * n))))
    return jnp.minimum(_kth_smallest(x, k), 0.0)


def percentile_interval(x: Array, low_q: float, high_q: float,
                        mesh_axis: Optional[str] = None) -> Array:
    """|high percentile - low percentile| (reference PercentileInterval,
    stats_op.py:97)."""
    if mesh_axis is not None:
        x = jax.lax.all_gather(x, axis_name=mesh_axis, axis=-1, tiled=True)
    n = x.shape[-1]
    low_k = max(1, min(n, int(math.ceil(0.01 * low_q * n))))
    high_k = max(1, min(n, int(math.floor(0.01 * high_q * n + 0.5))))
    x_sorted = jnp.sort(x, axis=-1)
    return jnp.abs(x_sorted[..., high_k - 1] - x_sorted[..., low_k - 1])


def kl_minimizer_threshold(x: Array, bit_width: float, signed: bool,
                           num_bins: int = 1001,
                           smoothing_eps: float = 1e-4) -> Array:
    """KL-divergence-minimizing clipping threshold (reference
    KLMinimizerThreshold, stats_op.py:280, after MXNet's calibration).

    Host-side calibration utility: sweeps symmetric thresholds over a
    ``num_bins`` histogram of x and picks the one minimizing KL(P||Q) between
    the clipped distribution and its quantized re-expansion. Not jittable
    (data-dependent histogram work); intended for PTQ calibration offline.
    """
    import numpy as np

    x = np.asarray(jax.device_get(x)).reshape(-1)
    absmax = float(np.max(np.abs(x))) if x.size else 1.0
    if absmax == 0.0:
        return jnp.asarray(1.0)
    n_quant = int(2 ** (bit_width - 1) - 1) * 2 + 1 if signed else int(2**bit_width - 1)
    hist, edges = np.histogram(x, bins=num_bins, range=(-absmax, absmax))
    best_div, best_threshold = np.inf, absmax
    for i in range(n_quant // 2, num_bins // 2 + 1):
        start, stop = num_bins // 2 - i, num_bins // 2 + i + 1
        threshold = edges[min(stop, num_bins)]
        sliced = hist[start:stop].astype(np.float64)
        p = sliced.copy()
        # outliers fold into edge bins
        p[0] += hist[:start].sum()
        p[-1] += hist[stop:].sum()
        if p.sum() == 0:
            continue
        # quantize p down to n_quant bins then re-expand
        factor = len(sliced) / n_quant
        q = np.zeros_like(sliced)
        for j in range(n_quant):
            lo, hi = int(round(j * factor)), int(round((j + 1) * factor))
            hi = max(hi, lo + 1)
            seg = sliced[lo:hi]
            nz = (seg > 0).sum()
            if nz:
                q[lo:hi] = np.where(seg > 0, seg.sum() / nz, 0.0)
        p_s = _smooth(p, smoothing_eps)
        q_s = _smooth(q, smoothing_eps)
        if p_s is None or q_s is None:
            continue
        div = float(np.sum(p_s * np.log(p_s / q_s)))
        if div < best_div:
            best_div, best_threshold = div, float(threshold)
    return jnp.asarray(best_threshold)


DEFAULT_MSE_CANDIDATES = 80


def mse_threshold(x: Array, *, bit_width: float, signed: bool,
                  narrow_range: bool = False, po2_int_scale: bool = False,
                  num_candidates: int = DEFAULT_MSE_CANDIDATES,
                  mesh_axis: Optional[str] = None) -> Array:
    """Per-group clipping threshold minimizing the int fake-quant MSE.

    Grid-searches ``num_candidates`` fractions of the per-group absmax and
    picks, per group, the threshold whose symmetric int grid has the lowest
    squared reconstruction error. Later-Brevitas parity (the reference
    snapshot stops at percentile/KL; MSE joins Brevitas in the MSE stats-op
    family) designed for XLA: the candidate sweep is a ``lax.map`` over a
    static grid — every iterate is one fused quant-dequant pass, no
    data-dependent shapes.

    Under a mesh axis, the absmax combines with pmax and each candidate's
    error with psum, so data-parallel calibration agrees on one threshold.
    Unlike KL (host-side histogram search, non-jittable), this runs inside
    jit and therefore inside collected-stats scaling loops.
    """
    from brevitas_tpu.core.quant import int_scaling, po2_int_scaling
    from brevitas_tpu.ops import max_int, min_int

    absmax = jnp.max(jnp.abs(x), axis=-1)                    # (G,)
    absmax = _maybe_all(jax.lax.pmax, absmax, mesh_axis)
    bw = jnp.asarray(float(bit_width))
    # same threshold->scale divisor as rescaling_scale so the searched grid
    # is the grid the quantizer will actually use
    if po2_int_scale:
        int_thr = po2_int_scaling(bw, signed=signed)
    else:
        int_thr = int_scaling(bw, signed=signed, narrow_range=narrow_range)
    n_min = min_int(signed, narrow_range, bw)
    n_max = max_int(signed, narrow_range, bw)
    fracs = jnp.linspace(1.0 / num_candidates, 1.0, num_candidates)

    def err_for(frac):
        thr = absmax * frac                                   # (G,)
        scale = jnp.maximum(thr / int_thr, 1e-30)
        q = jnp.clip(jnp.round(x / scale[:, None]), n_min, n_max)
        return jnp.sum((q * scale[:, None] - x) ** 2, axis=-1)  # (G,)

    errs = jax.lax.map(err_for, fracs)                        # (C, G)
    # ONE collective over the stacked errors (not one per candidate)
    errs = _maybe_all(jax.lax.psum, errs, mesh_axis)
    best = jnp.argmin(errs, axis=0)                           # (G,)
    return absmax * fracs[best]


def _smooth(p, eps):
    import numpy as np

    is_zeros = (p == 0).astype(np.float64)
    n_zeros = is_zeros.sum()
    n_nonzeros = p.size - n_zeros
    if n_nonzeros == 0:
        return None
    eps1 = eps * n_zeros / n_nonzeros
    out = p.astype(np.float64) + eps * is_zeros - eps1 * (1 - is_zeros)
    out = np.maximum(out, 1e-12)
    return out / out.sum()


def stats_fn(op: StatsOp, *, sigma: Optional[float] = None,
             high_percentile_q: Optional[float] = None,
             low_percentile_q: Optional[float] = None,
             bit_width: Optional[float] = None,
             signed: Optional[bool] = None,
             narrow_range: bool = False,
             po2_int_scale: bool = False,
             mse_num_candidates: Optional[int] = None):
    """Resolve a StatsOp enum to a callable ``f(x2d, mesh_axis=None) -> (groups,)``.

    TPU-native replacement for SolveScalingStatsOpFromEnum
    (reference quant/solver/common.py:81)."""
    op = StatsOp(op)
    if op == StatsOp.MAX:
        return abs_max
    if op == StatsOp.AVE:
        return abs_ave
    if op == StatsOp.MAX_AVE:
        return abs_max_ave
    if op == StatsOp.MAX_L2:
        return abs_max_l2
    if op == StatsOp.MIN_MAX:
        return abs_min_max
    if op == StatsOp.MEAN_SIGMA_STD:
        assert sigma is not None, f"{op} requires sigma"
        return partial(mean_sigma_std, sigma=sigma)
    if op == StatsOp.MEAN_LEARN_SIGMA_STD:
        # sigma supplied per call by the scaling module's learned Param
        # (reference MeanLearnedSigmaStd, stats_op.py:246)
        return mean_sigma_std
    if op == StatsOp.PERCENTILE:
        assert high_percentile_q is not None, "percentile requires high_percentile_q"
        return partial(abs_percentile, q=high_percentile_q)
    if op == StatsOp.MIN:
        return negative_min_or_zero
    if op == StatsOp.PERCENTILE_LOW:
        assert low_percentile_q is not None
        return partial(negative_percentile_or_zero, q=low_percentile_q)
    if op == StatsOp.PERCENTILE_INTERVAL:
        assert low_percentile_q is not None and high_percentile_q is not None
        return partial(percentile_interval, low_q=low_percentile_q,
                       high_q=high_percentile_q)
    if op == StatsOp.MSE:
        assert bit_width is not None and signed is not None, \
            "MSE threshold search needs the target int grid (bit_width/signed)"
        return partial(
            mse_threshold, bit_width=float(bit_width), signed=signed,
            narrow_range=narrow_range, po2_int_scale=po2_int_scale,
            num_candidates=mse_num_candidates or DEFAULT_MSE_CANDIDATES)
    raise ValueError(f"unknown stats op {op}")
