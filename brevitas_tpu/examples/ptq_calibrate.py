"""Post-training-quantization calibration CLI — the full flexml-style flow.

Reference: the ``brevitas_flexml_imagenet_calibration`` console script the
reference registers (``setup.py:51``; the module itself is absent from the
snapshot) and the PTQ pipeline it names: ``preprocess_flexml`` +
``quantize_flexml`` (``src/brevitas/graph/target/flexml.py:381,398``)
followed by ``calibration_mode`` / ``bias_correction_mode``
(``src/brevitas/graph/calibrate.py:52,68``).

Flow: float train (or restore) → BN fusion → cross-layer equalization →
auto-quantize → activation calibration → bias correction → eval →
optional integer-serving conversion and ONNX export. Prints one JSON
summary line.

Run: python -m brevitas_tpu.examples.ptq_calibrate --model convnet \
       --train-epochs 3 --calib-batches 4 --convert-int
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.examples.bnn_pynq import load_digits_upscaled
from brevitas_tpu.graph.equalize import sequential_regions
from brevitas_tpu.graph.flexml import quantize_flexml
from brevitas_tpu.quant import presets


class FloatMLP(nnx.Module):
    """Plain float MLP (784-128-64-10) — PTQ target without BN."""

    EQUALIZE = sequential_regions(["l1", "l2", "l3"])
    BN_PAIRS = ()

    def __init__(self, rngs):
        self.l1 = nnx.Linear(784, 128, rngs=rngs)
        self.l2 = nnx.Linear(128, 64, rngs=rngs)
        self.l3 = nnx.Linear(64, 10, rngs=rngs)

    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(self.l1(x))
        x = jax.nn.relu(self.l2(x))
        return self.l3(x)


class FloatConvNet(nnx.Module):
    """Conv-BN-ReLU stack — exercises BN fusion before quantization."""

    EQUALIZE = ()  # conv/bn folding happens first; keep regions empty
    BN_PAIRS = (("c1", "bn1"), ("c2", "bn2"))

    def __init__(self, rngs):
        self.c1 = nnx.Conv(1, 16, (3, 3), strides=2, use_bias=True, rngs=rngs)
        self.bn1 = nnx.BatchNorm(16, use_running_average=True, rngs=rngs)
        self.c2 = nnx.Conv(16, 32, (3, 3), strides=2, use_bias=True, rngs=rngs)
        self.bn2 = nnx.BatchNorm(32, use_running_average=True, rngs=rngs)
        self.head = nnx.Linear(7 * 7 * 32, 10, rngs=rngs)

    def __call__(self, x):
        x = jax.nn.relu(self.bn1(self.c1(x)))
        x = jax.nn.relu(self.bn2(self.c2(x)))
        return self.head(x.reshape(x.shape[0], -1))


MODELS = {"mlp": FloatMLP, "convnet": FloatConvNet}


def _accuracy(model, x, y, batch=256):
    correct = 0
    for i in range(0, len(x), batch):
        logits = model(jnp.asarray(x[i:i + batch]))
        correct += int(jnp.sum(jnp.argmax(logits, -1)
                               == jnp.asarray(y[i:i + batch])))
    return correct / len(x)


def _train_float(model, x, y, epochs, lr, batch=128, bn_stats=False):
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    if bn_stats:
        for _, m in G.find_modules(model, nnx.BatchNorm):
            m.use_running_average = False

    @nnx.jit
    def step(m, o, xb, yb):
        loss, grads = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(xb), yb).mean())(m)
        o.update(m, grads)
        return loss

    for _ in range(epochs):
        for i in range(0, len(x) - batch + 1, batch):
            step(model, opt, jnp.asarray(x[i:i + batch]),
                 jnp.asarray(y[i:i + batch]))
    if bn_stats:
        for _, m in G.find_modules(model, nnx.BatchNorm):
            m.use_running_average = True


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu PTQ calibration")
    p.add_argument("--model", default="mlp", choices=list(MODELS))
    p.add_argument("--train-epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--bias-correct-batches", type=int, default=2)
    p.add_argument("--learned-round", action="store_true",
                   help="AdaRound learned weight rounding between "
                        "calibration and bias correction")
    p.add_argument("--learned-round-steps", type=int, default=1000)
    p.add_argument("--gptq", action="store_true",
                   help="GPTQ Hessian-based weight quantization between "
                        "calibration and bias correction")
    p.add_argument("--gpfq", action="store_true",
                   help="GPFQ greedy path-following weight quantization "
                        "(alternative to --gptq)")
    p.add_argument("--equalize-iterations", type=int, default=10)
    p.add_argument("--no-equalize", action="store_true")
    p.add_argument("--fixed-point", action="store_true",
                   help="flexml 8-bit power-of-two quantizers instead of "
                        "float-scale int8")
    p.add_argument("--per-channel", action="store_true",
                   help="per-output-channel weight scales (float-scale mode)")
    p.add_argument("--bit-width", type=int, default=8)
    p.add_argument("--convert-int", action="store_true",
                   help="also convert to integer-serving twins and re-eval")
    p.add_argument("--export", default=None, choices=["qcdq", "qonnx", "qop"])
    p.add_argument("--export-path", default="ptq_model.onnx")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.gptq and args.gpfq:
        p.error("--gptq and --gpfq are alternatives; pick one")

    x_train, y_train = load_digits_upscaled("train")
    x_test, y_test = load_digits_upscaled("test")

    model = MODELS[args.model](nnx.Rngs(args.seed))
    _train_float(model, x_train, y_train, args.train_epochs, args.lr,
                 args.batch_size, bn_stats=args.model == "convnet")
    float_acc = _accuracy(model, x_test, y_test)

    # preprocess: BN fusion + cross-layer equalization, AUTO-discovered
    # from one traced forward (graph/autograph.py) — the class-level
    # BN_PAIRS/EQUALIZE lists are no longer needed
    G.preprocess_flexml(model, x_test[:1],
                        equalize_regions=(() if args.no_equalize else None),
                        equalize_iterations=args.equalize_iterations)
    pre_acc = _accuracy(model, x_test, y_test)

    # auto-quantize
    calib_steps = max(args.calib_batches, 1)
    if args.fixed_point:
        quantize_flexml(model, collect_stats_steps=calib_steps)
    else:
        wq = (presets.Int8WeightPerChannelFloat if args.per_channel
              else presets.Int8WeightPerTensorFloat)
        G.quantize(
            model,
            weight_quant=wq.let(bit_width=args.bit_width),
            act_quant=presets.Int8ActPerTensorFloat.let(
                bit_width=args.bit_width, collect_stats_steps=calib_steps))

    # calibrate activation scales, then bias-correct
    bs = args.batch_size
    with G.calibration_mode(model):
        for i in range(args.calib_batches):
            lo = (i * bs) % max(len(x_train) - bs, 1)
            model(jnp.asarray(x_train[lo:lo + bs]))
    from brevitas_tpu.utils import eval_mode

    eval_mode(model)
    if args.learned_round or args.gptq or args.gpfq:
        calib = [jnp.asarray(x_train[(i * bs) % max(len(x_train) - bs, 1):
                                     (i * bs) % max(len(x_train) - bs, 1) + bs])
                 for i in range(args.calib_batches)]
        if args.gptq:
            G.apply_gptq(model, calib)
        if args.gpfq:
            G.apply_gpfq(model, calib)
        if args.learned_round:
            G.apply_learned_round(model, calib, steps=args.learned_round_steps)
    with G.bias_correction_mode(model):
        for i in range(args.bias_correct_batches):
            lo = (i * bs) % max(len(x_train) - bs, 1)
            model(jnp.asarray(x_train[lo:lo + bs]))

    ptq_acc = _accuracy(model, x_test, y_test)
    result = {"model": args.model, "float_acc": float_acc,
              "preprocessed_acc": pre_acc, "ptq_acc": ptq_acc,
              "bit_width": args.bit_width,
              "fixed_point": args.fixed_point,
              "learned_round": args.learned_round, "gptq": args.gptq,
              "gpfq": args.gpfq}

    if args.export:
        from brevitas_tpu import export as E

        fn = {"qcdq": E.export_onnx_qcdq, "qonnx": E.export_qonnx,
              "qop": E.export_onnx_qop}[args.export]
        example = jnp.asarray(x_test[:1])
        fn(model, example, args.export_path)
        result["exported"] = args.export_path

    if args.convert_int:
        G.convert_integer_inference(model)
        result["int_acc"] = _accuracy(model, x_test, y_test)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
