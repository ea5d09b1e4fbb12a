"""Profiling and model-cost reporting.

The reference's observability surface is bit-width logging callbacks
(`src/brevitas/utils/logging.py:28,43`) and size-weighted bit-width losses
(`src/brevitas/loss/weighted_bit_width.py`). The TPU-native additions here:

- :func:`cost_report` — XLA cost analysis of a compiled function (FLOPs,
  bytes accessed) plus measured wall time and MFU/SOL vs the chip peak.
- :func:`model_size_report` — per-quant-layer parameters, effective weight
  bit-width, compressed size and MACs (output shapes from one traced
  forward via :mod:`graph.autograph`), with totals — the model-size view
  the reference derives from its weighted-bit-width losses.
- :func:`trace_profile` — a thin ``jax.profiler`` wrapper that records a
  TensorBoard-readable trace directory around N calls of a function.
"""

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cost_report", "model_size_report", "trace_profile"]

# chip peaks for MFU (detected via device_kind); extend as hardware appears
_PEAKS = {
    "v5 lite": {"bf16": 197e12, "int8": 394e12},
    "v5e": {"bf16": 197e12, "int8": 394e12},
    "v5p": {"bf16": 459e12, "int8": 918e12},
}


def _chip_peak(dtype_key: str = "bf16") -> Optional[float]:
    kind = jax.devices()[0].device_kind.lower()
    for name, peaks in _PEAKS.items():
        if name in kind:
            return peaks.get(dtype_key)
    return None


def cost_report(fn: Callable, *args, measure: bool = True,
                repeats: int = 5, dtype_key: str = "bf16") -> Dict:
    """Compile ``fn(*args)`` and report XLA's cost analysis.

    Returns {flops, bytes_accessed, wall_s, achieved_flops, mfu} — the
    utilization keys require ``measure`` and a recognized chip.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    out: Dict = {}
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["flops"] = float(ca.get("flops", 0.0))
        out["bytes_accessed"] = float(ca.get("bytes accessed", 0.0))
    except Exception:
        out["flops"] = None
        out["bytes_accessed"] = None
    if measure:
        jax.device_get(jitted(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            res = jitted(*args)
        jax.device_get(res)  # full sync (relay under-syncs on scans)
        out["wall_s"] = (time.perf_counter() - t0) / repeats
        if out.get("flops"):
            out["achieved_flops"] = out["flops"] / out["wall_s"]
            peak = _chip_peak(dtype_key)
            if peak:
                out["mfu"] = out["achieved_flops"] / peak
    return out


def _layer_macs(mod, out_shape) -> Optional[int]:
    """Per-forward MACs of a linear/conv from its kernel and output shape."""
    w = getattr(mod, "weight", None) or getattr(mod, "kernel", None)
    if w is None or out_shape is None:
        return None
    w_shape = tuple(w[...].shape)
    n_out_elems = int(np.prod(out_shape))
    if len(w_shape) == 2:  # (in, out)
        return n_out_elems * w_shape[0]
    if len(w_shape) >= 3:  # (*spatial, I, O) — I already folds groups
        per_out = int(np.prod(w_shape[:-1]))
        return n_out_elems * per_out
    return None


def _weight_bits(mod) -> float:
    """Effective weight storage bits (learned bit-widths read live)."""
    wq = getattr(mod, "weight_quant", None)
    if wq is None:
        return 32.0
    from brevitas_tpu.quant.config import QuantType

    qt = QuantType(wq.quant_type)
    if qt == QuantType.NONE:
        return 32.0
    if qt == QuantType.BINARY:
        return 1.0
    if qt == QuantType.TERNARY:
        return 2.0
    try:
        return float(np.asarray(mod.quant_weight().bit_width))
    except Exception:
        bw = getattr(wq.cfg, "bit_width", None)
        return float(bw) if bw else 32.0


def model_size_report(model, sample_input) -> Dict:
    """Per-layer and total parameter/size/MAC breakdown.

    Returns ``{"layers": [row...], "totals": {...}}``; each row carries
    path, kind, params, weight_bits, weight_bytes, macs. MACs come from one
    traced forward (output shapes per module), so batch dims reflect the
    sample input.
    """
    from brevitas_tpu.graph.autograph import trace_module_graph
    from brevitas_tpu.nn.conv import _QuantConvNd
    from brevitas_tpu.nn.linear import QuantLinear
    from flax import nnx

    graph = trace_module_graph(model, sample_input)
    rows: List[Dict] = []
    for path, node in graph.modules.items():
        mod = node.module
        if not isinstance(mod, (QuantLinear, _QuantConvNd, nnx.Linear,
                                nnx.Conv, nnx.ConvTranspose)):
            continue
        w = getattr(mod, "weight", None) or getattr(mod, "kernel", None)
        if w is None:
            continue
        params = int(np.prod(w[...].shape))
        bias = getattr(mod, "bias", None)
        if bias is not None:
            params += int(np.prod(bias[...].shape))
        bits = _weight_bits(mod)
        rows.append({
            "path": path,
            "kind": type(mod).__name__,
            "params": params,
            "weight_bits": bits,
            "weight_bytes": int(np.ceil(params * bits / 8)),
            "macs": _layer_macs(mod, node.out_shape),
        })
    rows.sort(key=lambda r: r["path"])
    totals = {
        "params": sum(r["params"] for r in rows),
        "weight_bytes": sum(r["weight_bytes"] for r in rows),
        "float32_bytes": sum(r["params"] * 4 for r in rows),
        "macs": sum(r["macs"] or 0 for r in rows),
    }
    if totals["float32_bytes"]:
        totals["compression"] = round(
            totals["float32_bytes"] / max(totals["weight_bytes"], 1), 2)
    return {"layers": rows, "totals": totals}


def trace_profile(fn: Callable, *args, logdir: str = "/tmp/jax_trace",
                  repeats: int = 3):
    """Record a ``jax.profiler`` trace of ``repeats`` calls to ``fn`` into
    ``logdir`` (TensorBoard / xprof readable); returns the last result."""
    jax.device_get(fn(*args))  # compile outside the trace
    with jax.profiler.trace(logdir):
        for _ in range(repeats):
            res = fn(*args)
        jax.device_get(res)
    return res
