"""Profiling / model-cost reporting (utils/profiling.py) — the TPU-native
observability layer over the reference's bit-width logging callbacks
(utils/logging.py) and size-weighted bit-width losses."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.models import tfc
from brevitas_tpu.utils import eval_mode
from brevitas_tpu.utils.profiling import (
    cost_report,
    model_size_report,
    trace_profile,
)


def test_model_size_report_tfc():
    m = tfc(2, 2, 2, dropout=0.0, rngs=nnx.Rngs(0))
    eval_mode(m)
    rep = model_size_report(m, np.zeros((1, 28, 28, 1), np.float32))
    by_path = {r["path"]: r for r in rep["layers"]}
    assert by_path["hidden.0"]["params"] == 784 * 64
    assert by_path["hidden.0"]["macs"] == 784 * 64  # batch 1
    assert all(r["weight_bits"] == 2.0 for r in rep["layers"])
    # 2-bit weights: 16x smaller than f32
    assert rep["totals"]["compression"] == 16.0
    assert rep["totals"]["params"] == sum(
        r["params"] for r in rep["layers"])


def test_model_size_report_binary_and_float():
    m1 = tfc(1, 1, 1, dropout=0.0, rngs=nnx.Rngs(0))
    rep1 = model_size_report(m1, np.zeros((1, 28, 28, 1), np.float32))
    assert all(r["weight_bits"] == 1.0 for r in rep1["layers"])
    m32 = tfc(None, None, None, dropout=0.0, rngs=nnx.Rngs(0))
    rep32 = model_size_report(m32, np.zeros((1, 28, 28, 1), np.float32))
    assert all(r["weight_bits"] == 32.0 for r in rep32["layers"])
    assert rep32["totals"].get("compression") == 1.0


def test_cost_report_flops_and_timing():
    m = tfc(4, 4, 4, dropout=0.0, rngs=nnx.Rngs(0))
    eval_mode(m)
    x = jnp.zeros((8, 28, 28, 1))
    rep = cost_report(lambda v: m(v), x, repeats=2)
    assert rep["wall_s"] > 0
    if rep["flops"] is not None:
        # at least the matmul MACs x2 for batch 8
        assert rep["flops"] >= 2 * 8 * (784 * 64 + 64 * 64 * 2 + 64 * 10)
        assert rep["achieved_flops"] > 0


def test_trace_profile_writes_trace(tmp_path):
    m = tfc(2, 2, 2, dropout=0.0, rngs=nnx.Rngs(0))
    eval_mode(m)
    x = jnp.zeros((4, 28, 28, 1))
    logdir = str(tmp_path / "trace")
    y = trace_profile(lambda v: m(v), x, logdir=logdir, repeats=2)
    assert y.shape == (4, 10)
    import os

    found = [f for _, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler wrote no trace files"
