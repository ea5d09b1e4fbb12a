"""Quantized character language-model trainer (QuantTransformer demo CLI).

Net-new vs the reference (Brevitas ships no attention example); rounds out
the model-family CLIs (bnn_pynq / imagenet_val / speech_to_text /
text_to_speech) with the transformer. Trains a causal char-LM on a built-in
corpus (or a user file) with INT-quantized weights/activations, whole-epoch
`lax.scan` training, and reports bits-per-character.

Run: python -m brevitas_tpu.examples.lm --steps 200 --bit-width 8
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from brevitas_tpu.models.transformer import QuantTransformer

# enough structure for a tiny model to beat the unigram entropy quickly
_CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "pack my box with five dozen liquor jugs. "
    "how vexingly quick daft zebras jump! "
    "sphinx of black quartz, judge my vow. "
) * 64


def _batches(text: str, seq_len: int, batch: int, steps: int, seed: int = 0):
    codes = np.frombuffer(text.encode("latin-1"), dtype=np.uint8)
    vocab = int(codes.max()) + 1
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(codes) - seq_len - 1, (steps, batch))
    idx = starts[..., None] + np.arange(seq_len + 1)
    chunks = codes[idx]  # (steps, batch, seq+1)
    return (jnp.asarray(chunks[..., :-1].astype(np.int32)),
            jnp.asarray(chunks[..., 1:].astype(np.int32)), vocab)


def train(steps: int = 200, batch: int = 32, seq_len: int = 64,
          dim: int = 128, depth: int = 2, heads: int = 4,
          bit_width: int = 8, lr: float = 1e-3, text: str = _CORPUS,
          scan: bool = True, bf16: bool = False, log=print):
    xs, ys, vocab = _batches(text, seq_len, batch, steps)
    model = QuantTransformer(vocab_size=vocab, dim=dim, depth=depth,
                             num_heads=heads, max_len=seq_len,
                             bit_width=bit_width, rngs=nnx.Rngs(0))
    if bf16:
        # exact-code MXU path: the quant layers carry their own input
        # quantizers, so integer codes flow straight onto the bf16 MXU
        # (nn/quant_layer.py code_domain) with f32 fake-quant semantics
        from brevitas_tpu.utils import set_compute_dtype

        set_compute_dtype(model, jnp.bfloat16)
    optimizer = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)

    def objective(m, x, y):
        logits = m(x, causal=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    if scan:
        graphdef, state = nnx.split((model, optimizer))

        @jax.jit
        def epoch(state, xs, ys):
            def body(state, batch_xy):
                x, y = batch_xy
                m, opt = nnx.merge(graphdef, state)
                loss, grads = nnx.value_and_grad(
                    lambda mm: objective(mm, x, y))(m)
                opt.update(m, grads)
                _, state = nnx.split((m, opt))
                return state, loss

            return jax.lax.scan(body, state, (xs, ys))

        t0 = time.perf_counter()
        state, losses = epoch(state, xs, ys)
        losses = jax.device_get(losses)
        dt = time.perf_counter() - t0
        nnx.update((model, optimizer), state)
    else:
        @nnx.jit
        def step(model, optimizer, x, y):
            loss, grads = nnx.value_and_grad(
                lambda mm: objective(mm, x, y))(model)
            optimizer.update(model, grads)
            return loss

        t0 = time.perf_counter()
        losses = [jax.device_get(step(model, optimizer, xs[i], ys[i]))
                  for i in range(steps)]
        dt = time.perf_counter() - t0
        losses = np.asarray(losses)

    bpc = float(losses[-1]) / np.log(2.0)
    log(f"steps {steps}  loss {float(losses[0]):.3f} -> "
        f"{float(losses[-1]):.3f}  ({bpc:.2f} bits/char)  "
        f"{steps * batch * seq_len / dt:.0f} tok/s")
    return model, np.asarray(losses)


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu char-LM trainer")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--bit-width", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--text-file", type=str, default=None,
                   help="train on this file instead of the built-in corpus")
    p.add_argument("--no-scan", action="store_true",
                   help="one jit dispatch per step instead of a scanned epoch")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MXU operands via the exact-code path")
    a = p.parse_args(argv)
    text = _CORPUS
    if a.text_file:
        with open(a.text_file, "r", encoding="latin-1") as f:
            text = f.read()
    train(steps=a.steps, batch=a.batch, seq_len=a.seq_len, dim=a.dim,
          depth=a.depth, heads=a.heads, bit_width=a.bit_width, lr=a.lr,
          text=text, scan=not a.no_scan, bf16=a.bf16)


if __name__ == "__main__":
    main()
