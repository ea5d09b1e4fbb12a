"""On-TPU interleaved A/B for the CNV QAT tax (VERDICT r2 weakness #2).

Measures the EXACT bench leg graph (bench.py::_scanned_train, scanned
10-step epoch, batch 256) for:
  fp          — float CNV baseline
  qat         — int8 per-channel QAT, REMAT_FAKE_QUANT off (round-2 state)
  qat_remat   — same, jax.checkpoint(prevent_cse=True) around int_quant

All three compile up front, then run interleaved for ``reps`` rounds so
relay drift cancels (same methodology as the QuantLSTM round-3 table,
PERF.md). config.REMAT_FAKE_QUANT is flipped between *builds*; the flag is
read at trace time so each compiled epoch pins its own variant.

Run (on the axon TPU): python -m parity.cnv_qat_ab [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from brevitas_tpu import config


def sqr_hinge(logits, y):
    t = 2.0 * jax.nn.one_hot(y, logits.shape[-1]) - 1.0
    return jnp.mean(jnp.maximum(0.0, 1.0 - t * logits) ** 2)


def build_epoch(bits, steps=10, batch=256):
    from brevitas_tpu.models import cnv
    from brevitas_tpu.utils import set_compute_dtype

    if bits is None:
        model = cnv(None, None, None, rngs=nnx.Rngs(0))
    else:
        model = cnv(bits, bits, 8, per_channel_weights=True,
                    rngs=nnx.Rngs(0))
    set_compute_dtype(model, jnp.bfloat16)
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((steps, batch, 32, 32, 3), dtype=np.float32))
    ys = jnp.asarray(rng.integers(0, 10, (steps, batch)).astype(np.int32))
    graphdef, state = nnx.split((model, optimizer))

    @jax.jit
    def epoch(state, xs, ys):
        def body(state, item):
            x, y = item
            m, opt = nnx.merge(graphdef, state)
            loss, grads = nnx.value_and_grad(
                lambda mm: sqr_hinge(mm(x), y))(m)
            opt.update(m, grads)
            m.clip_weights(-1.0, 1.0)
            _, state = nnx.split((m, opt))
            return state, loss

        state, losses = jax.lax.scan(body, state, (xs, ys))
        return state, losses

    box = {"state": state}

    def run_once():
        box["state"], losses = epoch(box["state"], xs, ys)
        jax.device_get(losses)

    t0 = time.perf_counter()
    run_once()
    print(f"  compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
    return run_once, steps * batch


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    variants = {}

    config.REMAT_FAKE_QUANT = False
    print("building fp ...", flush=True)
    variants["fp"] = build_epoch(None)
    print("building qat (no remat) ...", flush=True)
    variants["qat"] = build_epoch(8)
    config.REMAT_FAKE_QUANT = True
    print("building qat_remat (prevent_cse=True) ...", flush=True)
    variants["qat_remat"] = build_epoch(8)
    config.REMAT_FAKE_QUANT = False

    times = {k: [] for k in variants}
    for r in range(reps):
        for k, (run, _) in variants.items():
            t0 = time.perf_counter()
            run()
            times[k].append(time.perf_counter() - t0)
        print(f"rep {r}: " + "  ".join(
            f"{k}={times[k][-1]*1e3:.1f}ms" for k in variants), flush=True)

    best = {k: min(v) for k, v in times.items()}
    n = variants["fp"][1]
    print()
    for k in variants:
        ips = n / best[k]
        print(f"{k:10s} best {best[k]*1e3:7.2f} ms  {ips:9.0f} img/s  "
              f"vs fp {best['fp'] / best[k]:.4f}", flush=True)


if __name__ == "__main__":
    main()
