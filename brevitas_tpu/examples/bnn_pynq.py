"""bnn_pynq-style QAT trainer CLI.

Reference: ``src/brevitas_examples/bnn_pynq/`` (bnn_pynq_train.py argparse CLI,
trainer.py Trainer with train/eval loops, weight clipping, checkpointing,
models/losses.py SqrHingeLoss). The network x quantization matrix mirrors the
reference cfg/ directory: {TFC,SFC,LFC,CNV} x {1W1A,1W2A,2W2A}.

Datasets: this environment has no network egress, so alongside the MNIST/
CIFAR10 loaders (which read standard binary files from --data-dir when
present) there is a bundled ``digits`` dataset (sklearn 8x8 digits, upscaled)
and a ``synthetic`` generator for throughput work.

Run:  python -m brevitas_tpu.examples.bnn_pynq --network LFC_1W1A \
        --dataset digits --epochs 3
"""

import argparse
import gzip
import json
import os
import pickle
import struct
import time
from functools import partial
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from brevitas_tpu.models import cnv, lfc, sfc, tfc

NETWORKS = {
    "TFC": (tfc, "fc"), "SFC": (sfc, "fc"), "LFC": (lfc, "fc"),
    "CNV": (cnv, "cnv"),
}


def parse_network(name: str):
    """e.g. LFC_1W1A → (lfc builder, weight_bits=1, act_bits=1)."""
    arch, bits = name.upper().split("_")
    w_bits = int(bits[0])
    a_bits = int(bits[2])
    builder, kind = NETWORKS[arch]
    return builder, kind, w_bits, a_bits


def load_cfg(name_or_path: str):
    """Resolve a reference-style .ini config (bnn_pynq/cfg/*.ini): returns
    (model builder kwargs, kind, dataset). Accepts a bare name like
    'lfc_1w1a' (resolved against examples/cfg/) or a path."""
    import ast
    import configparser

    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "cfg", name_or_path.lower() + ".ini")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no cfg {name_or_path!r}")
    cfg = configparser.ConfigParser()
    cfg.read(path)
    arch = cfg["MODEL"]["ARCH"].strip().upper()
    kw = dict(weight_bit_width=cfg["QUANT"].getint("WEIGHT_BIT_WIDTH"),
              act_bit_width=cfg["QUANT"].getint("ACT_BIT_WIDTH"),
              in_bit_width=cfg["QUANT"].getint("IN_BIT_WIDTH"),
              num_classes=cfg["MODEL"].getint("NUM_CLASSES", 10))
    if arch == "FC":
        from brevitas_tpu.models.fc import FC

        feats = ast.literal_eval(cfg["MODEL"]["OUT_FEATURES"])
        builder = lambda **k: FC(out_features=tuple(feats), **k)
        kind = "fc"
    else:
        from brevitas_tpu.models.cnv import CNV

        builder = lambda **k: CNV(
            in_channels=cfg["MODEL"].getint("IN_CHANNELS", 3), **k)
        kind = "cnv"
    return builder, kw, kind, cfg["MODEL"].get("DATASET", "MNIST").lower()


def sqr_hinge_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Squared hinge on +-1 one-hot targets (reference SqrHingeLoss,
    bnn_pynq/models/losses.py)."""
    num_classes = logits.shape[-1]
    targets = 2.0 * jax.nn.one_hot(labels, num_classes) - 1.0
    return jnp.mean(jnp.maximum(0.0, 1.0 - targets * logits) ** 2)


def cross_entropy_loss(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">HBB", f.read(4))
        _, dtype_code, ndim = magic
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
        return data.reshape(dims)


def load_mnist(data_dir: str, split: str):
    prefix = "train" if split == "train" else "t10k"
    for ext in ("", ".gz"):
        img = os.path.join(data_dir, f"{prefix}-images-idx3-ubyte{ext}")
        lbl = os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte{ext}")
        if os.path.exists(img):
            x = _read_idx(img).astype(np.float32) / 255.0
            y = _read_idx(lbl).astype(np.int32)
            return x.reshape(-1, 28, 28, 1), y
    raise FileNotFoundError(f"MNIST idx files not found under {data_dir}")


def load_cifar10(data_dir: str, split: str):
    """CIFAR-10 python-version batches (data_batch_1..5 / test_batch pickles)
    from --data-dir, NHWC float32 in [0,1]."""
    import pickle as pkl

    files = ([f"data_batch_{i}" for i in range(1, 6)] if split == "train"
             else ["test_batch"])
    xs, ys = [], []
    for name in files:
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            path = os.path.join(data_dir, "cifar-10-batches-py", name)
        with open(path, "rb") as f:
            d = pkl.load(f, encoding="bytes")
        xs.append(np.asarray(d[b"data"], np.float32) / 255.0)
        ys.append(np.asarray(d[b"labels"], np.int32))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(x), np.concatenate(ys)


def load_digits_upscaled(split: str, image_size: int = 28):
    """sklearn 8x8 digits upscaled to MNIST geometry — the bundled
    no-egress stand-in for MNIST."""
    from sklearn.datasets import load_digits

    d = load_digits()
    x = d.images.astype(np.float32) / 16.0
    y = d.target.astype(np.int32)
    n_train = int(0.8 * len(x))
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(x))
    x, y = x[idx], y[idx]
    x = jax.image.resize(jnp.asarray(x)[..., None],
                         (len(x), image_size, image_size, 1), "nearest")
    x = np.asarray(x)
    if split == "train":
        return x[:n_train], y[:n_train]
    return x[n_train:], y[n_train:]


def load_synthetic(split: str, kind: str, n: int = 2048, seed: int = 0):
    rng = np.random.default_rng(seed if split == "train" else seed + 1)
    if kind == "cnv":
        x = rng.random((n, 32, 32, 3), dtype=np.float32)
    else:
        x = rng.random((n, 28, 28, 1), dtype=np.float32)
    y = rng.integers(0, 10, n).astype(np.int32)
    return x, y


def batches(x: np.ndarray, y: np.ndarray, batch_size: int, seed: int,
            drop_last: bool = True) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(x))
    n_full = len(x) // batch_size
    for i in range(n_full):
        sel = idx[i * batch_size:(i + 1) * batch_size]
        yield x[sel], y[sel]
    if not drop_last and len(x) % batch_size:
        sel = idx[n_full * batch_size:]
        yield x[sel], y[sel]


# ---------------------------------------------------------------------------
# trainer (reference bnn_pynq/trainer.py Trainer)
# ---------------------------------------------------------------------------

@nnx.jit(static_argnames=("loss_kind",))
def train_step(model, optimizer, x, y, loss_kind: str = "sqr_hinge"):
    loss_fn = sqr_hinge_loss if loss_kind == "sqr_hinge" else cross_entropy_loss

    def objective(model):
        return loss_fn(model(x), y)

    loss, grads = nnx.value_and_grad(objective)(model)
    optimizer.update(model, grads)
    model.clip_weights(-1.0, 1.0)
    return loss


def make_scanned_epoch(model, optimizer, loss_kind: str = "sqr_hinge"):
    """Whole-epoch lax.scan over batches inside one jit — ~4.5x over
    per-step dispatch on the axon relay (PERF.md). Returns
    ``epoch_fn(xs, ys) -> losses`` over stacked (steps, batch, ...) data."""
    loss_fn = sqr_hinge_loss if loss_kind == "sqr_hinge" else cross_entropy_loss
    graphdef, state = nnx.split((model, optimizer))
    state_holder = {"state": state}

    @jax.jit
    def epoch(state, xs, ys):
        def body(state, batch):
            x, y = batch
            m, opt = nnx.merge(graphdef, state)
            loss, grads = nnx.value_and_grad(lambda mm: loss_fn(mm(x), y))(m)
            opt.update(m, grads)
            m.clip_weights(-1.0, 1.0)
            _, state = nnx.split((m, opt))
            return state, loss

        return jax.lax.scan(body, state, (xs, ys))

    def run(xs, ys):
        state, losses = epoch(state_holder["state"], jnp.asarray(xs),
                              jnp.asarray(ys))
        state_holder["state"] = state
        return losses

    def sync():
        nnx.update((model, optimizer), state_holder["state"])

    run.sync = sync
    return run


@nnx.jit
def eval_step(model, x, y):
    logits = model(x)
    return jnp.sum(jnp.argmax(logits, -1) == y)


def evaluate(model, x, y, batch_size=256):
    """Top-1 accuracy over the FULL set (the tail batch is evaluated too —
    it compiles one extra shape)."""
    model.eval_mode()
    correct = 0
    for i in range(0, len(x), batch_size):
        xb, yb = x[i:i + batch_size], y[i:i + batch_size]
        correct += int(eval_step(model, jnp.asarray(xb), jnp.asarray(yb)))
    model.train_mode()
    return correct / max(len(x), 1)


def save_checkpoint(path, model, optimizer, epoch, best_acc):
    """Plain state-pytree checkpoint (reference trainer.py:190-198)."""
    state = nnx.state(model)
    opt_state = nnx.state(optimizer)
    with open(path, "wb") as f:
        # store the NEXT epoch to run so --resume doesn't replay this one
        pickle.dump({"state": jax.device_get(state),
                     "opt_state": jax.device_get(opt_state),
                     "epoch": epoch + 1, "best_val_acc": best_acc}, f)


def load_checkpoint(path, model, optimizer=None):
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    nnx.update(model, ckpt["state"])
    if optimizer is not None and "opt_state" in ckpt:
        nnx.update(optimizer, ckpt["opt_state"])
    return ckpt.get("epoch", 0), ckpt.get("best_val_acc", 0.0)


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu bnn_pynq trainer")
    p.add_argument("--network", default="LFC_1W1A",
                   help="{TFC,SFC,LFC,CNV}_{1W1A,1W2A,2W2A,...}")
    p.add_argument("--cfg", default=None,
                   help=".ini config (reference bnn_pynq/cfg format): a "
                        "name like lfc_1w1a or a path; overrides --network")
    p.add_argument("--dataset", default="digits",
                   choices=["mnist", "cifar10", "digits", "synthetic"])
    p.add_argument("--data-dir", default=os.environ.get("DATA_DIR", "./data"))
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--loss", default="sqr_hinge", choices=["sqr_hinge", "ce"])
    p.add_argument("--seed", type=int, default=123456)
    p.add_argument("--resume", default=None)
    p.add_argument("--ckpt-dir", default="./checkpoints")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--scan", action="store_true",
                   help="run each epoch as one jit (lax.scan over batches)")
    p.add_argument("--native-loader", action="store_true",
                   help="feed batches from the C++ prefetch loader "
                        "(csrc/data_loader.cc): host gather overlaps the "
                        "device step")
    args = p.parse_args(argv)

    rngs = nnx.Rngs(args.seed)
    if args.cfg:
        builder, model_kw, kind, _ds = load_cfg(args.cfg)
        model_kw["rngs"] = rngs
    else:
        builder, kind, w_bits, a_bits = parse_network(args.network)
        model_kw = dict(weight_bit_width=w_bits, act_bit_width=a_bits,
                        rngs=rngs)
        if kind == "fc":
            # reference cfgs set IN_BIT_WIDTH equal to the ACT bit width
            # (e.g. tfc_1w2a.ini: WEIGHT 1, ACT 2, IN 2)
            model_kw["in_bit_width"] = a_bits
    model = builder(**model_kw)

    if args.dataset == "mnist":
        x_train, y_train = load_mnist(args.data_dir, "train")
        x_test, y_test = load_mnist(args.data_dir, "test")
    elif args.dataset == "cifar10":
        x_train, y_train = load_cifar10(args.data_dir, "train")
        x_test, y_test = load_cifar10(args.data_dir, "test")
    elif args.dataset == "digits":
        x_train, y_train = load_digits_upscaled("train")
        x_test, y_test = load_digits_upscaled("test")
    else:
        x_train, y_train = load_synthetic("train", kind)
        x_test, y_test = load_synthetic("test", kind, n=512)

    optimizer = nnx.Optimizer(model, optax.adam(args.lr), wrt=nnx.Param)
    start_epoch, best_acc = 0, 0.0
    if args.resume:
        start_epoch, best_acc = load_checkpoint(args.resume, model, optimizer)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    model.train_mode()
    scanned = make_scanned_epoch(model, optimizer, args.loss) if args.scan else None
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        if scanned is not None:
            bs = list(batches(x_train, y_train, args.batch_size,
                              args.seed + epoch))
            xs = np.stack([b[0] for b in bs])
            ys = np.stack([b[1] for b in bs])
            losses = [float(l) for l in jax.device_get(scanned(xs, ys))]
            scanned.sync()
        elif args.native_loader:
            from brevitas_tpu.data import make_loader

            if epoch == start_epoch:
                loader = make_loader(x_train, y_train, args.batch_size,
                                     seed=args.seed)
            losses = []
            for bi in range(loader.batches_per_epoch):
                xb, yb = next(loader)
                loss = train_step(model, optimizer, jnp.asarray(xb),
                                  jnp.asarray(yb), loss_kind=args.loss)
                losses.append(float(loss))
                if bi % args.log_every == 0:
                    print(f"epoch {epoch} batch {bi}: loss {float(loss):.4f}")
        else:
            losses = []
            for bi, (xb, yb) in enumerate(
                    batches(x_train, y_train, args.batch_size, args.seed + epoch)):
                loss = train_step(model, optimizer, jnp.asarray(xb),
                                  jnp.asarray(yb), loss_kind=args.loss)
                losses.append(float(loss))
                if bi % args.log_every == 0:
                    print(f"epoch {epoch} batch {bi}: loss {float(loss):.4f}")
        acc = evaluate(model, x_test, y_test)
        dt = time.time() - t0
        imgs_per_sec = len(losses) * args.batch_size / dt
        print(f"epoch {epoch}: mean loss {np.mean(losses):.4f} "
              f"val acc {acc:.4f} ({imgs_per_sec:.0f} img/s)")
        if acc > best_acc:
            best_acc = acc
            save_checkpoint(os.path.join(args.ckpt_dir, "best.pkl"),
                            model, optimizer, epoch, best_acc)
    print(json.dumps({"best_val_acc": best_acc}))
    return best_acc


if __name__ == "__main__":
    main()
