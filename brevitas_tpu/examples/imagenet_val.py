"""ImageNet classification eval CLI.

Reference: ``src/brevitas_examples/imagenet_classification/imagenet_val.py``
(top-1/top-5 loop over a pretrained quantized model; 4-bit MobileNetV1
baseline 71.14/90.10, BASELINE.md). This environment has no network egress
and no ImageNet on disk, so alongside a folder-of-npy loader there is a
synthetic mode for shape/throughput validation; accuracy regression against
the published numbers requires mounting real data via --data-dir.

Run: python -m brevitas_tpu.examples.imagenet_val --model mobilenet_v1_4b \
       --dataset synthetic --batches 4
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.models.mobilenetv1 import quant_mobilenet_v1
from brevitas_tpu.models.proxylessnas import quant_proxylessnas_mobile14
from brevitas_tpu.models.resnet import quant_resnet18, quant_resnet50
from brevitas_tpu.utils import eval_mode

MODELS = {
    "mobilenet_v1_4b": lambda rngs: quant_mobilenet_v1(bit_width=4, rngs=rngs),
    "mobilenet_v1_8b": lambda rngs: quant_mobilenet_v1(bit_width=8, rngs=rngs),
    "proxylessnas_mobile14_4b": lambda rngs: quant_proxylessnas_mobile14(
        bit_width=4, rngs=rngs),
    "resnet18_8b": lambda rngs: quant_resnet18(bit_width=8, rngs=rngs),
    "resnet18_4b": lambda rngs: quant_resnet18(bit_width=4, rngs=rngs),
    "resnet50_8b": lambda rngs: quant_resnet50(bit_width=8, rngs=rngs),
}


def load_npy_folder(data_dir, batch_size):
    """Yields (images NHWC float32 [0,1]-normalized, labels) from
    {data_dir}/images.npy + labels.npy."""
    x = np.load(os.path.join(data_dir, "images.npy"), mmap_mode="r")
    y = np.load(os.path.join(data_dir, "labels.npy"))
    for i in range(0, len(x) - batch_size + 1, batch_size):
        yield np.asarray(x[i:i + batch_size], np.float32), y[i:i + batch_size]


def synthetic_batches(batch_size, n_batches, num_classes):
    rng = np.random.default_rng(0)
    for _ in range(n_batches):
        yield (rng.random((batch_size, 224, 224, 3), dtype=np.float32),
               rng.integers(0, num_classes, batch_size))


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu imagenet eval")
    p.add_argument("--model", default="mobilenet_v1_4b", choices=list(MODELS))
    p.add_argument("--dataset", default="synthetic",
                   choices=["imagenet", "folder", "synthetic"],
                   help="'folder' = torchvision-ImageFolder layout of image "
                        "files, decoded + resized on host and "
                        "crop/normalized on device (brevitas_tpu.vision — "
                        "the reference's torchvision transform chain)")
    p.add_argument("--data-dir", default="./data/imagenet")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--num-classes", type=int, default=1000)
    args = p.parse_args(argv)

    model = MODELS[args.model](nnx.Rngs(0))
    if args.checkpoint:
        from brevitas_tpu.examples.bnn_pynq import load_checkpoint

        load_checkpoint(args.checkpoint, model)
    else:
        # finalize stats quantizers with a single synthetic pass so eval
        # runs on sane scales even without a trained checkpoint
        model(jnp.zeros((1, 224, 224, 3)))
    eval_mode(model)

    @nnx.jit
    def topk_correct(model, x, y):
        logits = model(x)
        top5 = jnp.argsort(logits, axis=-1)[:, -5:]
        top1 = top5[:, -1]
        return (jnp.sum(top1 == y),
                jnp.sum(jnp.any(top5 == y[:, None], axis=-1)))

    if args.dataset == "imagenet":
        it = load_npy_folder(args.data_dir, args.batch_size)
    elif args.dataset == "folder":
        from brevitas_tpu.vision import folder_batches

        it = folder_batches(args.data_dir, args.batch_size)
    else:
        it = synthetic_batches(args.batch_size, args.batches,
                               args.num_classes)
    c1 = c5 = n = 0
    t0 = time.time()
    for x, y in it:
        a, b = topk_correct(model, jnp.asarray(x), jnp.asarray(y))
        c1 += int(a)
        c5 += int(b)
        n += len(y)
    dt = time.time() - t0
    result = {"top1": c1 / max(n, 1), "top5": c5 / max(n, 1), "images": n,
              "images_per_sec": n / dt}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
