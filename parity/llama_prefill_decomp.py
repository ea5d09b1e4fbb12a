"""Llama int8 prefill: where does the non-roofline time go?

Round-4 verdict weak-6: the prefill leg sits at ~0.48 of the measured
roofline with no decomposition. This script times the serving model's
sublayers SEPARATELY at the exact bench-leg shapes (dim-1024, 6 blocks,
batch 8, seq 512), each under one jit with the same scan-of-4 discipline as
the leg, and emits a table accounting for the step time: attention
sublayers, MLP sublayers, embed+head, and the bf16 twin equivalents.

Run on the TPU:  python parity/llama_prefill_decomp.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from flax import nnx

DIMS = dict(vocab_size=2000, dim=1024, depth=6, num_heads=16)
BATCH, SEQ, SCAN = 8, 512, int(os.environ.get("DECOMP_SCAN", "16"))
REPS = 5


def _timed(model, fn, *args):
    """best-of-REPS wall time of a jitted fn over a scan of SCAN calls.

    ``model`` is nnx.split and its state passed as a jit ARGUMENT —
    closing over the module would inline ~100 MB of weights as constants
    and blow the remote-compile request limit (HTTP 413).

    ``fn(m, i, *args)`` receives the scan step index ``i`` and MUST fold it
    into its inputs (e.g. ``(ids + i) % vocab``): a loop-invariant body is
    legal for XLA to hoist out of the While, which would time ONE call no
    matter the scan length. FLOPs/bytes come from a single-call lowering
    (XLA cost analysis counts a While body once, not times trip-count)."""
    graphdef, state = nnx.split(model)

    @jax.jit
    def run(state, *a):
        m = nnx.merge(graphdef, state)

        def body(c, i):
            return c, jnp.sum(fn(m, i, *a), dtype=jnp.float32)

        _, sums = jax.lax.scan(body, 0, jnp.arange(SCAN))
        return sums

    @jax.jit
    def run1(state, *a):
        m = nnx.merge(graphdef, state)
        return jnp.sum(fn(m, jnp.int32(0), *a), dtype=jnp.float32)

    run(state, *args).block_until_ready()
    try:
        ca = run1.lower(state, *args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops = nbytes = 0.0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(run(state, *args))
        best = min(best, time.perf_counter() - t0)
    return best / SCAN, flops, nbytes


def main():
    from brevitas_tpu.graph import convert_integer_inference
    from brevitas_tpu.models.llama import QuantLlama
    from brevitas_tpu.quant.presets import NoneActQuant, NoneWeightQuant
    from brevitas_tpu.utils import eval_mode, set_compute_dtype

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, DIMS["vocab_size"],
                                   (BATCH, SEQ)).astype(np.int32))

    m = QuantLlama(bit_width=8, rngs=nnx.Rngs(0), **DIMS)
    m(ids)
    eval_mode(m)
    mi = convert_integer_inference(m)

    mf = QuantLlama(weight_quant=NoneWeightQuant, act_quant=NoneActQuant,
                    uact_quant=NoneActQuant, rngs=nnx.Rngs(0), **DIMS)
    eval_mode(mf)
    set_compute_dtype(mf, jnp.bfloat16)

    x = jnp.asarray(rng.standard_normal(
        (BATCH, SEQ, DIMS["dim"])).astype(np.float32))

    vocab = DIMS["vocab_size"]
    parts = {}
    # dispatch floor: a near-empty scan body at the same trip count — the
    # fixed per-run relay/sync cost every other row also pays
    parts["null_floor"] = _timed(
        nnx.Module(), lambda m, i, a: a * (1.0 + 0.0 * i),
        jnp.ones((8,), jnp.float32))
    parts["full_int"] = _timed(mi, lambda m, i, t: m((t + i) % vocab), ids)
    parts["full_bf16"] = _timed(mf, lambda m, i, t: m((t + i) % vocab), ids)

    def attn_only(m, i, xx):
        h = xx * (1.0 + 1e-6 * i)
        for blk in m.blocks:
            h = h + blk.attn(blk.attn_norm(h), causal=True)
        return h

    def mlp_only(m, i, xx):
        h = xx * (1.0 + 1e-6 * i)
        for blk in m.blocks:
            h = h + blk.mlp(blk.mlp_norm(h))
        return h

    parts["attn_int"] = _timed(mi, attn_only, x)
    parts["attn_bf16"] = _timed(mf, attn_only, x.astype(jnp.bfloat16))
    parts["mlp_int"] = _timed(mi, mlp_only, x)
    parts["mlp_bf16"] = _timed(mf, mlp_only, x.astype(jnp.bfloat16))
    parts["embed_head_int"] = _timed(
        mi, lambda m, i, t: m.head(m.final_norm(m.embed((t + i) % vocab))),
        ids)
    parts["embed_head_bf16"] = _timed(
        mf, lambda m, i, t: m.head(m.final_norm(m.embed((t + i) % vocab))),
        ids)

    # pure-GEMM surrogate at the dominant shapes: what would the projections
    # cost with NO requant epilogues and NO attention core?
    d, hidden = DIMS["dim"], mi.blocks[0].mlp.gate_proj.out_features
    a8 = jnp.ones((BATCH * SEQ, d), jnp.int8)
    w8_sq = jnp.ones((d, d), jnp.int8)
    w8_h = jnp.ones((d, hidden), jnp.int8)
    w8_hd = jnp.ones((hidden, d), jnp.int8)

    def gemms(_m, i, a, wsq, wh, whd):
        a = a + (i % 2).astype(jnp.int8)
        y = 0.0
        for _ in range(DIMS["depth"]):
            for w in (wsq, wsq, wsq, wsq):  # q, k, v, o
                y += jnp.sum(jax.lax.dot_general(
                    a, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))
            for w in (wh, wh):  # gate, up
                y += jnp.sum(jax.lax.dot_general(
                    a, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))
            ah = jnp.ones((BATCH * SEQ, hidden), jnp.int8)
            y += jnp.sum(jax.lax.dot_general(
                ah, whd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
        return jnp.asarray([y], jnp.float32)

    parts["gemms_int8_only"] = _timed(nnx.Module(), gemms,
                                      a8, w8_sq, w8_h, w8_hd)

    floor = parts["null_floor"][0]
    total = parts["full_int"][0]
    rows = []
    for name, (dt, fl, by) in sorted(parts.items(),
                                     key=lambda kv: -kv[1][0]):
        compute = max(dt - floor, 0.0)
        row = {"part": name, "ms": round(dt * 1e3, 3),
               "ms_minus_floor": round(compute * 1e3, 3),
               "frac_of_full_int": round(dt / total, 3),
               "gflops": round(fl / 1e9, 2), "mbytes": round(by / 1e6, 1)}
        if compute > 0 and fl:
            row["tflops_eff"] = round(fl / compute / 1e12, 1)
        rows.append(row)
    acc = (parts["attn_int"][0] + parts["mlp_int"][0]
           + parts["embed_head_int"][0] - 2 * floor) / max(total - floor,
                                                           1e-9)
    print(json.dumps({"scan": SCAN, "rows": rows,
                      "floor_ms_per_call": round(floor * 1e3, 3),
                      "sublayer_sum_over_full_minus_floor": round(acc, 3),
                      "hidden": hidden,
                      "batch": BATCH, "seq": SEQ}, indent=1))


if __name__ == "__main__":
    main()
