"""Quantify the CNV QAT/FP bytes ratio on CPU (XLA cost analysis).

VERDICT round-2 weakness #2: CNV QAT legs pay a 7-8% tax vs FP while the
MLP leg is free. The LSTM work (PERF.md round-3 section) showed the QAT/FP
throughput ratio on this bandwidth-bound chip tracks the *bytes-accessed*
ratio almost exactly. This probe reproduces the bench's exact train-step
graph (bench.py::_scanned_train, one scan step) on CPU and reports bytes +
FLOPs for FP vs INT8-per-channel QAT, with and without remat of the model
forward, so the fix can be chosen from the ceiling math instead of burning
relay time.

Run: JAX_PLATFORMS=cpu python -m parity.cnv_bytes_probe
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx


def sqr_hinge(logits, y):
    t = 2.0 * jax.nn.one_hot(y, logits.shape[-1]) - 1.0
    return jnp.mean(jnp.maximum(0.0, 1.0 - t * logits) ** 2)


def step_cost(bits, batch=256, remat=False, bf16=True):
    from brevitas_tpu.models import cnv
    from brevitas_tpu.utils import set_compute_dtype

    if bits is None:
        model = cnv(None, None, None, rngs=nnx.Rngs(0))
    else:
        model = cnv(bits, bits, 8, per_channel_weights=True,
                    rngs=nnx.Rngs(0))
    if bf16:
        set_compute_dtype(model, jnp.bfloat16)
    optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, (batch,)).astype(np.int32))
    graphdef, state = nnx.split((model, optimizer))

    @jax.jit
    def step(state, x, y):
        m, opt = nnx.merge(graphdef, state)

        def loss_fn(mm):
            gd, st = nnx.split(mm)

            def fwd(st_, xx):
                m2 = nnx.merge(gd, st_)
                out = m2(xx)
                _, st2 = nnx.split(m2)
                return out, st2

            if remat:
                fwd = jax.checkpoint(fwd)
            out, st2 = fwd(st, x)
            nnx.update(mm, st2)
            return sqr_hinge(out, y)

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        opt.update(m, grads)
        m.clip_weights(-1.0, 1.0)
        _, state = nnx.split((m, opt))
        return state, loss

    ca = step.lower(state, x, y).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    rows = []
    for label, bits in [("fp", None), ("int8pc", 8), ("int4pc", 4)]:
        for remat in (False, True):
            f, b = step_cost(bits, remat=remat)
            rows.append((label, remat, f, b))
            print(f"{label:8s} remat={remat!s:5s}  flops={f/1e9:8.3f} G  "
                  f"bytes={b/1e6:9.2f} MB", flush=True)
    by = {(l, r): (f, b) for l, r, f, b in rows}
    for remat in (False, True):
        fp_b = by[("fp", remat)][1]
        for label in ("int8pc", "int4pc"):
            qb = by[(label, remat)][1]
            print(f"bytes ratio fp/{label} remat={remat}: {fp_b/qb:.4f} "
                  f"(ceiling on QAT/FP throughput if bandwidth-bound)")


if __name__ == "__main__":
    main()
