"""Mixed-precision QAT search: learned bit-widths under a size penalty.

The reference ships the objective layer for this — learned bit-widths
(``core/bit_width/parameter.py:23``) and the weighted-bit-width losses
(``loss/weighted_bit_width.py:56,74``) — but no trainer that uses them.
This CLI closes the loop: every weight and activation quantizer starts at
8 bits with a trainable offset, and the task loss is regularized by the
size-weighted mean weight bit-width and the mean activation bit-width, so
gradient descent trades precision for accuracy per tensor.

The whole search runs in ONE jit per step: bit-widths are float-valued
parameters passed through round-STE (shapes stay static — SURVEY §7 hard
part 7), so XLA sees a fixed graph while the integer widths move.

Run (CPU)::

    python -m brevitas_tpu.examples.mixed_precision --epochs 20 \
        --weight-decay-bw 0.05 --act-decay-bw 0.01

Prints one JSON line: accuracy, mean weight/act bit-widths, and the
per-quantizer integer widths the search settled on.
"""

import argparse
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.examples.bnn_pynq import batches, load_digits_upscaled
from brevitas_tpu.losses import (
    act_bit_width_weighted_by_size,
    log_quantizer_bit_widths,
    weight_bit_width_weighted_by_size,
)
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


class MixedPrecisionMLP(nnx.Module):
    """3-layer MLP; every quantizer's bit-width is a trainable parameter."""

    def __init__(self, *, hidden=(256, 128), min_bit_width=2.0,
                 rngs: nnx.Rngs):
        wq = presets.Int8WeightPerTensorFloatLearnedBitWidth.let(
            min_bit_width=min_bit_width)
        aq = presets.Int8ActPerTensorFloatLearnedBitWidth.let(
            min_bit_width=min_bit_width, collect_stats_steps=30)
        uaq = aq.let(signed=False)
        self.inp = qnn.QuantIdentity(act_quant=aq.let())
        dims = (28 * 28,) + tuple(hidden)
        blocks = []
        for i in range(len(hidden)):
            blocks.append(qnn.QuantLinear(
                dims[i], dims[i + 1], weight_quant=wq.let(), rngs=rngs))
            blocks.append(qnn.QuantReLU(act_quant=uaq.let()))
        self.blocks = nnx.List(blocks)
        self.head = qnn.QuantLinear(dims[-1], 10, weight_quant=wq.let(),
                                    rngs=rngs)

    def __call__(self, x):
        x = self.inp(x.reshape(x.shape[0], -1))
        for blk in self.blocks:
            x = blk(x)
        return self.head(x)


def _accuracy(model, x, y, batch=512):
    hits = 0
    for i in range(0, len(x), batch):
        logits = model(jnp.asarray(x[i:i + batch]))
        hits += int(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(y[i:i + batch])))
    return hits / len(x)


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--bw-lr", type=float, default=2e-2,
                   help="learning rate for the bit-width offsets (Adam "
                        "normalizes gradients, so the offsets need their own "
                        "rate to cross rounding boundaries in finite time)")
    p.add_argument("--weight-decay-bw", type=float, default=0.05,
                   help="penalty on size-weighted mean weight bit-width")
    p.add_argument("--act-decay-bw", type=float, default=0.01,
                   help="penalty on mean activation bit-width")
    p.add_argument("--min-bit-width", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    x_train, y_train = load_digits_upscaled("train")
    x_test, y_test = load_digits_upscaled("test")

    model = MixedPrecisionMLP(min_bit_width=args.min_bit_width,
                              rngs=nnx.Rngs(args.seed))
    # the bit-width offsets train with their own (larger) rate: their
    # round-STE gradient is O(1) and Adam-normalized, so at the task lr
    # they would never cross a 0.5 rounding boundary within the run
    bw_filter = nnx.All(nnx.Param, nnx.PathContains("offset"))
    main_filter = nnx.All(nnx.Param, nnx.Not(nnx.PathContains("offset")))
    optimizer = nnx.Optimizer(model, optax.adam(args.lr), wrt=main_filter)
    bw_optimizer = nnx.Optimizer(model, optax.adam(args.bw_lr), wrt=bw_filter)

    @nnx.jit
    def step(model, optimizer, bw_optimizer, x, y):
        def loss_fn(m):
            logits = m(x)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            bw_w = weight_bit_width_weighted_by_size(m)
            bw_a = act_bit_width_weighted_by_size(m)
            return (ce + args.weight_decay_bw * bw_w
                    + args.act_decay_bw * bw_a), (ce, bw_w, bw_a)

        (_, aux), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
        optimizer.update(model, grads.filter(main_filter))
        bw_optimizer.update(model, grads.filter(bw_filter))
        return aux

    for epoch in range(args.epochs):
        for xb, yb in batches(x_train, y_train, args.batch_size,
                              args.seed + epoch):
            ce, bw_w, bw_a = step(model, optimizer, bw_optimizer,
                                  jnp.asarray(xb), jnp.asarray(yb))
        print(f"epoch {epoch}: ce {float(ce):.4f} "
              f"mean weight bw {float(bw_w):.2f} act bw {float(bw_a):.2f}")

    eval_mode(model)
    acc = _accuracy(model, x_test, y_test)
    widths = log_quantizer_bit_widths(model)
    result = {
        "test_acc": acc,
        "mean_weight_bit_width": float(weight_bit_width_weighted_by_size(model)),
        "mean_act_bit_width": float(act_bit_width_weighted_by_size(model)),
        "per_quantizer_bit_widths": widths,
        "weight_decay_bw": args.weight_decay_bw,
        "act_decay_bw": args.act_decay_bw,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
