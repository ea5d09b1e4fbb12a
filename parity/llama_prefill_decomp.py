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
BATCH, SEQ, SCAN = 8, 512, 4
REPS = 5


def _timed(model, fn, *args):
    """best-of-REPS wall time of a jitted fn over a scan of SCAN calls.

    ``model`` is nnx.split and its state passed as a jit ARGUMENT —
    closing over the module would inline ~100 MB of weights as constants
    and blow the remote-compile request limit (HTTP 413)."""
    graphdef, state = nnx.split(model)

    @jax.jit
    def run(state, *a):
        m = nnx.merge(graphdef, state)

        def body(c, _):
            return c, jnp.sum(fn(m, *a), dtype=jnp.float32)

        _, sums = jax.lax.scan(body, 0, None, length=SCAN)
        return sums

    run(state, *args).block_until_ready()
    try:
        ca = run.lower(state, *args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / SCAN
        nbytes = float(ca.get("bytes accessed", 0.0)) / SCAN
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

    parts = {}
    parts["full_int"] = _timed(mi, lambda m, i: m(i), ids)
    parts["full_bf16"] = _timed(mf, lambda m, i: m(i), ids)

    def attn_only(m, xx):
        h = xx
        for blk in m.blocks:
            h = h + blk.attn(blk.attn_norm(h), causal=True)
        return h

    def mlp_only(m, xx):
        h = xx
        for blk in m.blocks:
            h = h + blk.mlp(blk.mlp_norm(h))
        return h

    parts["attn_int"] = _timed(mi, attn_only, x)
    parts["attn_bf16"] = _timed(mf, attn_only, x.astype(jnp.bfloat16))
    parts["mlp_int"] = _timed(mi, mlp_only, x)
    parts["mlp_bf16"] = _timed(mf, mlp_only, x.astype(jnp.bfloat16))
    parts["embed_head_int"] = _timed(
        mi, lambda m, i: m.head(m.final_norm(m.embed(i))), ids)
    parts["embed_head_bf16"] = _timed(
        mf, lambda m, i: m.head(m.final_norm(m.embed(i))), ids)

    # pure-GEMM surrogate at the dominant shapes: what would the projections
    # cost with NO requant epilogues and NO attention core?
    d, hidden = DIMS["dim"], mi.blocks[0].mlp.gate_proj.out_features
    a8 = jnp.ones((BATCH * SEQ, d), jnp.int8)
    w8_sq = jnp.ones((d, d), jnp.int8)
    w8_h = jnp.ones((d, hidden), jnp.int8)
    w8_hd = jnp.ones((hidden, d), jnp.int8)

    def gemms(_m, a, wsq, wh, whd):
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

    total = parts["full_int"][0]
    rows = []
    for name, (dt, fl, by) in sorted(parts.items(),
                                     key=lambda kv: -kv[1][0]):
        rows.append({
            "part": name, "ms": round(dt * 1e3, 3),
            "frac_of_full_int": round(dt / total, 3),
            "gflops": round(fl / 1e9, 2), "mbytes": round(by / 1e6, 1)})
    acc = (parts["attn_int"][0] + parts["mlp_int"][0]
           + parts["embed_head_int"][0]) / total
    print(json.dumps({"rows": rows,
                      "sublayer_sum_over_full": round(acc, 3),
                      "hidden": hidden,
                      "batch": BATCH, "seq": SEQ}, indent=1))


if __name__ == "__main__":
    main()
