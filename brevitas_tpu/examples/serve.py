"""Integer-domain serving demo: continuous batching over a device mesh.

The BASELINE north-star's serving shape: a trained QAT model converted to
int8 serving twins, requests accumulated into fixed-size batches (padding the
tail), executed under one jit with the batch sharded over the mesh data axis.
Reports per-batch latency and sustained throughput.

Run: python -m brevitas_tpu.examples.serve --requests 512 --batch-size 128
"""

import argparse
import json
import time
from collections import deque
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

import brevitas_tpu.graph as G
from brevitas_tpu.models import lfc
from brevitas_tpu.parallel import make_mesh
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


class ContinuousBatcher:
    """Accumulates requests into fixed-size device batches; flushes full
    batches immediately and pads the final partial batch."""

    def __init__(self, batch_size: int, feature_shape):
        self.batch_size = batch_size
        self.feature_shape = tuple(feature_shape)
        self.queue: deque = deque()

    def submit(self, request: np.ndarray) -> None:
        self.queue.append(request)

    def batches(self) -> Iterator[np.ndarray]:
        while self.queue:
            take = min(self.batch_size, len(self.queue))
            items = [self.queue.popleft() for _ in range(take)]
            batch = np.stack(items)
            if take < self.batch_size:
                pad = np.zeros((self.batch_size - take, *self.feature_shape),
                               batch.dtype)
                batch = np.concatenate([batch, pad])
            yield batch, take


def build_int8_model(rngs: nnx.Rngs):
    """LFC INT8 with input quantizers so every layer converts to an int8
    serving twin."""
    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
    model = lfc(weight_bit_width=8, act_bit_width=8, in_bit_width=8,
                dropout=0.0, rngs=rngs)
    # give each linear an input quantizer for the integer path
    from brevitas_tpu.nn import QuantLinear
    from brevitas_tpu.quant.quantizers import ActQuantizer

    for _, mod in G.named_modules(model):
        if isinstance(mod, QuantLinear):
            mod.input_quant = ActQuantizer(act)
    # calibrate on representative inputs (zeros would eps-floor the scales
    # and saturate the int8 path at serving time)
    import numpy as _np

    calib = _np.random.default_rng(1).random((64, 28, 28, 1), dtype=_np.float32)
    model(jnp.asarray(calib))
    eval_mode(model)
    return model


def decode_demo(args):
    """Token-generation serving: greedy decode on the quant transformer's
    integer twins with an int8 — or, with ``--kv-bits 4``, int4-packed — KV
    cache. The whole generation runs as ONE jitted ``lax.scan`` over
    positions (dispatch-per-token would dominate the measurement)."""
    from brevitas_tpu.models import QuantTransformer
    from brevitas_tpu.quant.quantizers import ActQuantizer

    max_len = args.decode_tokens + 8
    aq = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)
    uq = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=2)
    model = QuantTransformer(
        vocab_size=256, dim=args.decode_dim, depth=2, num_heads=4,
        max_len=max_len, act_quant=aq, uact_quant=uq, rngs=nnx.Rngs(0))
    if args.kv_bits:
        kvq = aq.let(bit_width=float(args.kv_bits))
        for blk in model.blocks:
            blk.attn.k_quant = ActQuantizer(kvq.let())
            blk.attn.v_quant = ActQuantizer(kvq.let())
        if args.kv_bits <= 4:
            # an explicit --kv-bits 4 asks for the PACKED cache (capacity
            # over speed); the default "auto" policy only packs where the
            # kernel measured >= int8 decode speed (config.py)
            from brevitas_tpu import config as _cfg
            _cfg.INT4_KV_CACHE = "1"
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (args.decode_batch, 16)), jnp.int32)
    with G.calibration_mode(model):
        model(ids)
        model(jnp.roll(ids, 1, axis=1))
    eval_mode(model)
    if args.integer:
        G.convert_integer_inference(model)

    graphdef, state = nnx.split(model)
    caches0 = model.init_decode_caches(args.decode_batch, max_len)
    tok0 = ids[:, :1]

    @jax.jit
    def generate(state, tok0, caches):
        def body(carry, pos):
            tok, caches = carry
            m = nnx.merge(graphdef, state)
            logits, caches = m.decode_step(tok, caches, pos)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, caches), nxt[:, 0]
        (_, _), toks = jax.lax.scan(
            body, (tok0, caches), jnp.arange(args.decode_tokens))
        return toks

    jax.device_get(generate(state, tok0, caches0))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(generate(state, tok0, caches0))
        best = min(best, time.perf_counter() - t0)
    n_tok = args.decode_batch * args.decode_tokens
    out = {
        "mode": "decode",
        "tokens": n_tok,
        "tokens_per_sec": n_tok / best,
        "ms_per_token_step": best / args.decode_tokens * 1e3,
        "kv_bits": args.kv_bits,
        "kv_cache_bytes": sum(int(k.size + v.size) for k, v in
                              model.init_decode_caches(args.decode_batch,
                                                       max_len)),
        "integer_path": args.integer,
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu int8 serving demo")
    p.add_argument("--requests", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--data-axis-size", type=int, default=0,
                   help="0 = all local devices")
    p.add_argument("--float", dest="integer", action="store_false",
                   help="serve the fake-quant path instead of int8 twins")
    p.add_argument("--decode", action="store_true",
                   help="token-generation serving on the quant transformer "
                        "instead of image classification")
    p.add_argument("--decode-tokens", type=int, default=128)
    p.add_argument("--decode-batch", type=int, default=32)
    p.add_argument("--decode-dim", type=int, default=128)
    p.add_argument("--kv-bits", type=int, default=0,
                   help="decode mode: quantize K/V at this width (<=4 packs "
                        "the cache two positions per byte)")
    args = p.parse_args(argv)
    if args.decode:
        return decode_demo(args)

    n_dev = args.data_axis_size or len(jax.devices())
    mesh = make_mesh([("data", n_dev)])
    model = build_int8_model(nnx.Rngs(0))
    if args.integer:
        G.convert_integer_inference(model)

    graphdef, state = nnx.split(model)

    @jax.jit
    def infer(state, x):
        m = nnx.merge(graphdef, state)
        return m(x)

    batcher = ContinuousBatcher(args.batch_size, (28, 28, 1))
    rng = np.random.default_rng(0)
    for _ in range(args.requests):
        batcher.submit(rng.random((28, 28, 1), dtype=np.float32))

    sharding = NamedSharding(mesh, P("data", None, None, None))
    # warmup: compile outside the timed loop
    warm = jax.device_put(jnp.zeros((args.batch_size, 28, 28, 1)), sharding)
    jax.device_get(infer(state, warm))
    latencies = []
    served = 0
    t0 = time.time()
    for batch, n_real in batcher.batches():
        tb = time.perf_counter()
        xb = jax.device_put(jnp.asarray(batch), sharding)
        logits = jax.device_get(infer(state, xb))[:n_real]
        latencies.append(time.perf_counter() - tb)
        served += n_real
    dt = time.time() - t0
    out = {
        "requests": served,
        "batches": len(latencies),
        "throughput_rps": served / dt,
        "p50_batch_ms": float(np.percentile(latencies, 50) * 1e3),
        "p99_batch_ms": float(np.percentile(latencies, 99) * 1e3),
        "devices": n_dev,
        "integer_path": args.integer,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
