"""Head-to-head accuracy parity: brevitas_tpu vs the reference Brevitas.

Trains the SAME topology (FC/CNV from the bnn_pynq family) on the SAME data
(sklearn digits upscaled to MNIST/CIFAR geometry — the in-image stand-in, no
egress) with the SAME bit-widths, loss (squared hinge), optimizer (Adam),
schedule and per-step weight clipping in BOTH frameworks, then reports the
top-1 delta. This measures the driver metric ("top-1 Δ vs Brevitas at equal
bit-width", BASELINE.json) directly.

Reference training recipe: `/root/reference/src/brevitas_examples/bnn_pynq/trainer.py:200-285`
(Adam + SqrHingeLoss + `model.clip_weights(-1, 1)` per step).

CLI::

    python -m parity.run_parity --configs tfc_1w1a,tfc_2w2a --epochs 20

prints one result line per config and a markdown table at the end.
"""

import argparse
import json
import time

import jax
import numpy as np

# This image's sitecustomize registers the axon TPU platform and IGNORES the
# JAX_PLATFORMS env var, so "CPU" invocations of this harness actually run on
# the TPU — where DEFAULT matmul/conv precision computes f32 via bf16 passes.
# That is fine for coarse 1-4-bit grids (scale 1.0) but injects noise
# comparable to the quant step for fine-grained per-channel 8-bit scaling
# (MobileNetV1's first layer), unfairly degrading the brevitas_tpu side of
# the head-to-head. Force full f32-equivalent precision for every conv/
# matmul in the harness; the torch side computes f32 on CPU.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# shared data
# ---------------------------------------------------------------------------

def digits_dataset(arch: str):
    """Deterministic train/test split of sklearn digits in each arch's input
    geometry. Returned as NHWC float32 in [0, 1] — the torch side transposes.

    FC consumes 28x28x1 (MNIST geometry); CNV consumes 32x32x3 (CIFAR
    geometry, grayscale replicated across channels).
    """
    from brevitas_tpu.examples.bnn_pynq import load_digits_upscaled

    size = 32 if arch == "cnv" else 28
    x_train, y_train = load_digits_upscaled("train", image_size=size)
    x_test, y_test = load_digits_upscaled("test", image_size=size)
    if arch == "cnv":
        x_train = np.repeat(x_train, 3, axis=-1)
        x_test = np.repeat(x_test, 3, axis=-1)
    return x_train, y_train, x_test, y_test


def epoch_batches(n: int, batch_size: int, seed: int):
    """The SAME batch index order for both frameworks."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    return [idx[i * batch_size:(i + 1) * batch_size]
            for i in range(n // batch_size)]


ARCH_HIDDEN = {"tfc": (64, 64, 64), "sfc": (256, 256, 256),
               "lfc": (1024, 1024, 1024)}

LSTM_HIDDEN = 64  # row-sequence MNIST-style classifier: 28 steps x 28 feats


# ---------------------------------------------------------------------------
# recurrent family (QuantLSTM head-to-head; no bnn_pynq analogue — the
# reference ships QuantLSTM as a layer only, so the shared task is digits
# rows-as-timesteps classification with a float linear head on both sides)
# ---------------------------------------------------------------------------

def _lstm_bit_kwargs_reference(w: int, a: int):
    """Prefixed bit-width overrides routed through the reference's
    act_kwargs_prefix mechanism (nn/quant_rnn.py:473-501)."""
    if w == 8 and a == 8:
        return {}
    return dict(weight_bit_width=w, io_bit_width=a, gate_acc_bit_width=a,
                sigmoid_bit_width=a, tanh_bit_width=a, cell_state_bit_width=a)


def build_reference_lstm(w: int, a: int, seed: int, kind: str = "lstm"):
    from parity.refbridge import import_reference_brevitas
    import_reference_brevitas()
    import torch
    torch.manual_seed(seed)
    from brevitas.nn import QuantLSTM, QuantRNN

    if kind == "lstm":
        rec = QuantLSTM(28, LSTM_HIDDEN, batch_first=True, bias_quant=None,
                        **_lstm_bit_kwargs_reference(w, a))
    else:
        kw = {} if (w == 8 and a == 8) else dict(
            weight_bit_width=w, io_bit_width=a,
            # the RNN cell uses a different act prefix than the LSTM cell
            # (quant_rnn.py:325 'gate_acc_quant_' vs :477 'gate_acc_')
            gate_acc_quant_bit_width=a)
        rec = QuantRNN(28, LSTM_HIDDEN, batch_first=True, bias_quant=None,
                       **kw)

    class RefRecurrentNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.rec = rec
            self.head = torch.nn.Linear(LSTM_HIDDEN, 10)

        def forward(self, x):  # (B, 1, 28, 28) NCHW -> rows as timesteps
            out, _ = self.rec(x[:, 0])
            return self.head(out[:, -1])

    return RefRecurrentNet()


def train_eval_reference_lstm(w, a, epochs, batch_size, lr, seed=42,
                              kind="lstm"):
    import torch

    x_train, y_train, x_test, y_test = digits_dataset("tfc")
    model = build_reference_lstm(w, a, seed, kind)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    crit = torch.nn.CrossEntropyLoss()
    xt = torch.from_numpy(np.transpose(x_train, (0, 3, 1, 2))).contiguous()
    yt = torch.from_numpy(y_train.astype(np.int64))

    model.train()
    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            sel = np.asarray(sel)
            loss = crit(model(xt[sel]), yt[sel])
            opt.zero_grad()
            loss.backward()
            opt.step()

    model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        pred = model(xe).argmax(-1).numpy()
    return float((pred == y_test).mean()), model


def build_tpu_lstm(w: int, a: int, seed: int, kind: str = "lstm"):
    from flax import nnx

    from brevitas_tpu.nn import QuantLSTM, QuantRNN
    from brevitas_tpu.quant.presets import (
        Int8ActPerTensorFloat, Int8WeightPerTensorFloat,
        Uint8ActPerTensorFloat)

    wq = Int8WeightPerTensorFloat.let(bit_width=float(w))
    aq = Int8ActPerTensorFloat.let(bit_width=float(a))
    uq = Uint8ActPerTensorFloat.let(bit_width=float(a))
    rngs = nnx.Rngs(seed)

    class TpuLSTMNet(nnx.Module):
        def __init__(self):
            if kind == "lstm":
                self.rec = QuantLSTM(28, LSTM_HIDDEN, weight_quant=wq,
                                     io_quant=aq, gate_acc_quant=aq,
                                     sigmoid_quant=uq, tanh_quant=aq,
                                     cell_state_quant=aq, rngs=rngs)
            else:
                self.rec = QuantRNN(28, LSTM_HIDDEN, weight_quant=wq,
                                    io_quant=aq, gate_acc_quant=aq,
                                    rngs=rngs)
            self.head = nnx.Linear(LSTM_HIDDEN, 10, rngs=rngs)

        def __call__(self, x):  # (B, 28, 28, 1) NHWC -> rows as timesteps
            out, _ = self.rec(x[..., 0])
            return self.head(out[:, -1])

        def train_mode(self):
            from brevitas_tpu.utils import train_mode
            train_mode(self)

        def eval_mode(self):
            from brevitas_tpu.utils import eval_mode
            eval_mode(self)

    return TpuLSTMNet()


def train_eval_tpu_lstm(w, a, epochs, batch_size, lr, seed=42, kind="lstm"):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    x_train, y_train, x_test, y_test = digits_dataset("tfc")
    model = build_tpu_lstm(w, a, seed, kind)
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    model.train_mode()

    @nnx.jit
    def step(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            step(model, opt, jnp.asarray(x_train[sel]),
                 jnp.asarray(y_train[sel]))

    model.eval_mode()
    pred = np.asarray(jnp.argmax(model(jnp.asarray(x_test)), -1))
    return float((pred == y_test).mean()), model


# ---------------------------------------------------------------------------
# MobileNetV1 family (the remaining BASELINE config: depthwise-separable
# ImageNet recipe at reduced scale — width 0.25 at 32px on the digits
# stand-in, 4W4A per-channel with the recipe's 8-bit first layer)
# ---------------------------------------------------------------------------

MOBILENET_WIDTH = 0.25
MOBILENET_CHANNELS = [[32], [64], [128, 128], [256, 256],
                      [512] * 6, [1024, 1024]]


def build_reference_mobilenet(bit_width: int, seed: int):
    """Reduced-width reference MobileNetV1 (the REAL reference class,
    imagenet_classification/models/mobilenetv1.py:117), final pool resized
    for the 32px stand-in (feature map reaches the pool at 1x1, not 7x7)."""
    from parity.refbridge import import_reference_brevitas
    import_reference_brevitas()
    import torch
    torch.manual_seed(seed)
    from brevitas.nn import QuantAvgPool2d
    from brevitas_examples.imagenet_classification.models.mobilenetv1 import (
        MobileNet,
    )

    channels = [[int(c * MOBILENET_WIDTH) for c in stage]
                for stage in MOBILENET_CHANNELS]
    net = MobileNet(channels=channels, first_stage_stride=False,
                    bit_width=bit_width, num_classes=10)
    net.final_pool = QuantAvgPool2d(kernel_size=1, stride=1,
                                    bit_width=bit_width)
    return net


def train_eval_reference_mobilenet(bit_width, epochs, batch_size, lr,
                                   seed=42):
    import torch

    x_train, y_train, x_test, y_test = digits_dataset("cnv")
    model = build_reference_mobilenet(bit_width, seed)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    crit = torch.nn.CrossEntropyLoss()
    xt = torch.from_numpy(np.transpose(x_train, (0, 3, 1, 2))).contiguous()
    yt = torch.from_numpy(y_train.astype(np.int64))

    model.train()
    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            sel = np.asarray(sel)
            loss = crit(model(xt[sel]), yt[sel])
            opt.zero_grad()
            loss.backward()
            opt.step()

    model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        preds = []
        for i in range(0, len(xe), 256):
            preds.append(model(xe[i:i + 256]).argmax(-1).numpy())
        pred = np.concatenate(preds)
    return float((pred == y_test).mean()), model


def build_tpu_mobilenet(bit_width: int, seed: int):
    from flax import nnx

    from brevitas_tpu.models import quant_mobilenet_v1

    return quant_mobilenet_v1(bit_width=bit_width,
                              width_scale=MOBILENET_WIDTH, num_classes=10,
                              pool_size=1, rngs=nnx.Rngs(seed))


def train_eval_tpu_mobilenet(bit_width, epochs, batch_size, lr, seed=42):
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.utils import eval_mode, train_mode

    x_train, y_train, x_test, y_test = digits_dataset("cnv")
    model = build_tpu_mobilenet(bit_width, seed)
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    train_mode(model)

    @nnx.jit
    def step(model, opt, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            step(model, opt, jnp.asarray(x_train[sel]),
                 jnp.asarray(y_train[sel]))

    eval_mode(model)

    @nnx.jit
    def infer(model, x):
        return jnp.argmax(model(x), -1)

    preds = []
    for i in range(0, len(x_test), 256):
        preds.append(np.asarray(infer(model, jnp.asarray(x_test[i:i + 256]))))
    pred = np.concatenate(preds)
    return float((pred == y_test).mean()), model


def mobilenet_logits_parity(bit_width, ref_model):
    """Import the reference-trained MobileNetV1 state dict into the twin and
    compare logits/top-1 on the test set."""
    import jax.numpy as jnp
    import torch

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.utils import eval_mode

    _, _, x_test, y_test = digits_dataset("cnv")
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    model = build_tpu_mobilenet(bit_width, seed=0)
    import_torch_state_dict(model, sd)
    eval_mode(model)
    logits_tpu = np.asarray(model(jnp.asarray(x_test)))
    ref_model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        logits_ref = ref_model(xe).numpy()
    max_delta = float(np.abs(logits_tpu - logits_ref).max())
    agree = float((logits_tpu.argmax(-1) == logits_ref.argmax(-1)).mean())
    return max_delta, agree


# ---------------------------------------------------------------------------
# ProxylessNAS family (reference accuracy-table family, README.md:11-13:
# 4-bit 74.42 / 4-bit Hadamard 73.52 / 4b5b 75.01 — reduced-scale stand-in
# on the digits set, same pattern as MobileNetV1: REAL reference class at a
# shrunken NAS topology, CE loss, Adam, same batch order)
# ---------------------------------------------------------------------------

PROXY_TOPOLOGY = dict(
    channels=((8,), (12, 12), (16, 16), (24, 24), (32,)),
    residuals=((1,), (1, 1), (1, 1), (1, 1), (1,)),
    shortcuts=((0,), (0, 1), (0, 1), (0, 1), (0,)),
    kernels=((3,), (5, 3), (7, 3), (5, 5), (7,)),
    expansions=((1,), (3, 3), (3, 3), (6, 3), (6,)),
    init_channels=8, final_channels=64)


def build_reference_proxyless(bit_width: int, seed: int,
                              hadamard: bool = False,
                              depthwise_bit_width=None):
    """Reduced-topology reference ProxylessNAS (the REAL reference class,
    imagenet_classification/models/proxylessnas.py:191), final pool resized
    for the 32px stand-in (feature map reaches the pool at 1x1, not 7x7)."""
    from parity.refbridge import import_reference_brevitas
    import_reference_brevitas()
    import torch
    torch.manual_seed(seed)
    from brevitas.nn import QuantAvgPool2d
    from brevitas_examples.imagenet_classification.models.proxylessnas import (
        ProxylessNAS,
    )

    t = PROXY_TOPOLOGY
    net = ProxylessNAS(
        channels=[list(s) for s in t["channels"]],
        init_block_channels=t["init_channels"],
        final_block_channels=t["final_channels"],
        residuals=[list(s) for s in t["residuals"]],
        shortcuts=[list(s) for s in t["shortcuts"]],
        kernel_sizes=[list(s) for s in t["kernels"]],
        expansions=[list(s) for s in t["expansions"]],
        bit_width=bit_width,
        depthwise_bit_width=depthwise_bit_width or bit_width,
        first_layer_weight_bit_width=8,
        hadamard_classifier=hadamard,
        num_classes=10)
    net.final_pool = QuantAvgPool2d(kernel_size=1, stride=1,
                                    bit_width=bit_width)
    return net


def build_tpu_proxyless(bit_width: int, seed: int, hadamard: bool = False,
                        depthwise_bit_width=None):
    from flax import nnx

    from brevitas_tpu.models.proxylessnas import ProxylessNAS

    return ProxylessNAS(bit_width=bit_width,
                        depthwise_bit_width=depthwise_bit_width,
                        hadamard_classifier=hadamard, num_classes=10,
                        pool_size=1, rngs=nnx.Rngs(seed),
                        **PROXY_TOPOLOGY)


def _train_eval_torch_ce(model, epochs, batch_size, lr, arch="cnv"):
    """Shared CE-loss torch training loop (mobilenet/proxyless families)."""
    import torch

    x_train, y_train, x_test, y_test = digits_dataset(arch)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    crit = torch.nn.CrossEntropyLoss()
    xt = torch.from_numpy(np.transpose(x_train, (0, 3, 1, 2))).contiguous()
    yt = torch.from_numpy(y_train.astype(np.int64))

    def unwrap(out):  # Hadamard heads return QuantTensor
        return out.value if hasattr(out, "value") else out

    model.train()
    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            sel = np.asarray(sel)
            loss = crit(unwrap(model(xt[sel])), yt[sel])
            opt.zero_grad()
            loss.backward()
            opt.step()

    model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        preds = []
        for i in range(0, len(xe), 256):
            preds.append(unwrap(model(xe[i:i + 256])).argmax(-1).numpy())
        pred = np.concatenate(preds)
    return float((pred == y_test).mean()), model


def _train_eval_tpu_ce(model, epochs, batch_size, lr, arch="cnv"):
    """Shared CE-loss nnx training loop (mobilenet/proxyless families)."""
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.utils import eval_mode, train_mode

    x_train, y_train, x_test, y_test = digits_dataset(arch)
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    train_mode(model)

    @nnx.jit
    def step(model, opt, x, y):
        def loss_fn(m):
            out = m(x)
            out = getattr(out, "value", out)  # Hadamard heads -> QuantTensor
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            step(model, opt, jnp.asarray(x_train[sel]),
                 jnp.asarray(y_train[sel]))

    eval_mode(model)

    @nnx.jit
    def infer(model, x):
        out = model(x)
        return jnp.argmax(getattr(out, "value", out), -1)

    preds = []
    for i in range(0, len(x_test), 256):
        preds.append(np.asarray(infer(model, jnp.asarray(x_test[i:i + 256]))))
    pred = np.concatenate(preds)
    return float((pred == y_test).mean()), model


def proxyless_logits_parity(bit_width, ref_model, hadamard=False,
                            depthwise_bit_width=None):
    """Import the reference-trained ProxylessNAS state dict (incl. the
    Hadamard head's scale parameter) into the twin and compare logits."""
    import jax.numpy as jnp
    import torch

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.utils import eval_mode

    _, _, x_test, y_test = digits_dataset("cnv")
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    model = build_tpu_proxyless(bit_width, seed=0, hadamard=hadamard,
                                depthwise_bit_width=depthwise_bit_width)
    import_torch_state_dict(model, sd)
    eval_mode(model)
    out = model(jnp.asarray(x_test))
    logits_tpu = np.asarray(getattr(out, "value", out))
    ref_model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        out_ref = ref_model(xe)
        logits_ref = (out_ref.value if hasattr(out_ref, "value")
                      else out_ref).numpy()
    max_delta = float(np.abs(logits_tpu - logits_ref).max())
    agree = float((logits_tpu.argmax(-1) == logits_ref.argmax(-1)).mean())
    return max_delta, agree


# ---------------------------------------------------------------------------
# QuartzNet family (CTC head-to-head on synthetic phone sequences — the
# remaining BASELINE speech config; the reference's REAL JasperEncoder +
# JasperDecoderForCTC at reduced scale, WER via greedy CTC decode)
# ---------------------------------------------------------------------------

QN_FEATS = 32
QN_VOCAB = 10           # phone classes; blank is class QN_VOCAB
QN_FRAMES_PER_PHONE = 6
QN_LABELS_PER_SEQ = 4
QN_TOPOLOGY = ((32, 1, 5, 2, 1, False, True),
               (32, 2, 5, 1, 1, True, True),
               (64, 1, 1, 1, 1, False, False))


def ctc_dataset(n_train=512, n_test=128, seed=0):
    """Synthetic CTC data: each phone class has a fixed random feature
    template; a sequence concatenates QN_LABELS_PER_SEQ phones
    (QN_FRAMES_PER_PHONE frames each) plus noise."""
    rng = np.random.default_rng(seed)
    templates = rng.standard_normal((QN_VOCAB, QN_FEATS)).astype(np.float32)

    def make(n, r):
        labels = r.integers(0, QN_VOCAB,
                            (n, QN_LABELS_PER_SEQ)).astype(np.int32)
        feats = templates[labels]                      # (n, L, F)
        feats = np.repeat(feats, QN_FRAMES_PER_PHONE, axis=1)
        feats = feats + 0.3 * r.standard_normal(feats.shape).astype(
            np.float32)
        return feats.astype(np.float32), labels

    x_tr, y_tr = make(n_train, np.random.default_rng(seed + 1))
    x_te, y_te = make(n_test, np.random.default_rng(seed + 2))
    return x_tr, y_tr, x_te, y_te


def _greedy_wer(log_probs, labels, blank):
    """Token error rate of greedy CTC decoding (collapse repeats, drop
    blanks), averaged edit distance / label length."""
    def edit(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    total = errs = 0
    pred_ids = np.argmax(log_probs, axis=-1)
    for p, ref in zip(pred_ids, labels):
        seq = []
        last = -1
        for t in p:
            if t != last and t != blank:
                seq.append(int(t))
            last = t
        errs += edit(seq, list(ref))
        total += len(ref)
    return errs / total


def build_reference_quartznet(bit_width: int, seed: int):
    from parity.refbridge import import_reference_quartznet
    qn = import_reference_quartznet()
    import torch
    torch.manual_seed(seed)
    JasperEncoder, JasperDecoderForCTC = qn.JasperEncoder, qn.JasperDecoderForCTC

    jasper = []
    for filters, repeat, kernel, stride, dilation, residual, separable \
            in QN_TOPOLOGY:
        jasper.append(dict(filters=filters, repeat=repeat, kernel=[kernel],
                           stride=[stride], dilation=[dilation], dropout=0.0,
                           residual=residual, separable=separable))
    enc = JasperEncoder(
        jasper=jasper, outer_bit_width=bit_width,
        inner_bit_width=bit_width, weight_scaling_per_output_channel=True,
        absolute_act_val=1.0,
        activation_inner_scaling_per_output_channel=False,
        activation_other_scaling_per_output_channel=False,
        activation="relu", feat_in=QN_FEATS, conv_mask=False)
    dec = JasperDecoderForCTC(feat_in=QN_TOPOLOGY[-1][0],
                              num_classes=QN_VOCAB, bit_width=bit_width,
                              weight_scaling_per_channel=True)

    class RefQN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = enc
            self.decoder = dec

        def forward(self, x):   # (B, F, T) -> (B, T', C) log-probs
            return self.decoder(encoder_output=self.encoder(x))

    return RefQN()


def train_eval_reference_quartznet(bit_width, epochs, batch_size, lr,
                                   seed=42):
    import torch

    x_tr, y_tr, x_te, y_te = ctc_dataset()
    model = build_reference_quartznet(bit_width, seed)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    ctc = torch.nn.CTCLoss(blank=QN_VOCAB)
    xt = torch.from_numpy(np.transpose(x_tr, (0, 2, 1))).contiguous()
    yt = torch.from_numpy(y_tr.astype(np.int64))

    model.train()
    for ep in range(epochs):
        for sel in epoch_batches(len(x_tr), batch_size, seed=ep):
            sel = np.asarray(sel)
            logp = model(xt[sel])            # (B, T', C)
            t_len = torch.full((len(sel),), logp.shape[1], dtype=torch.long)
            l_len = torch.full((len(sel),), QN_LABELS_PER_SEQ,
                               dtype=torch.long)
            loss = ctc(logp.transpose(0, 1), yt[sel], t_len, l_len)
            opt.zero_grad()
            loss.backward()
            opt.step()

    model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_te, (0, 2, 1))).contiguous()
        logp = model(xe).numpy()
    return _greedy_wer(logp, y_te, blank=QN_VOCAB), model


def build_tpu_quartznet(bit_width: int, seed: int):
    from flax import nnx

    from brevitas_tpu.models.quartznet import QuartzNet

    return QuartzNet(num_features=QN_FEATS, vocab_size=QN_VOCAB + 1,
                     bit_width=bit_width, topology=QN_TOPOLOGY,
                     rngs=nnx.Rngs(seed))


def train_eval_tpu_quartznet(bit_width, epochs, batch_size, lr, seed=42):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.utils import eval_mode, train_mode

    x_tr, y_tr, x_te, y_te = ctc_dataset()
    model = build_tpu_quartznet(bit_width, seed)
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    train_mode(model)

    @nnx.jit
    def step(model, opt, x, y):
        def loss_fn(m):
            logits = m(x)
            logits = getattr(logits, "value", logits)    # (B, T', C)
            loss = optax.ctc_loss(
                logits, jnp.zeros(logits.shape[:2], jnp.float32), y,
                jnp.zeros(y.shape, jnp.float32), blank_id=QN_VOCAB)
            return loss.mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for ep in range(epochs):
        for sel in epoch_batches(len(x_tr), batch_size, seed=ep):
            step(model, opt, jnp.asarray(x_tr[sel]),
                 jnp.asarray(y_tr[sel]))

    eval_mode(model)
    logits = model(jnp.asarray(x_te))
    logits = np.asarray(getattr(logits, "value", logits))
    return _greedy_wer(logits, y_te, blank=QN_VOCAB), model


def quartznet_logits_parity(bit_width, ref_model):
    """Import the reference-trained encoder+decoder into the twin and
    compare log-prob outputs + greedy decodes on the test set."""
    import jax.numpy as jnp
    import torch

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.utils import eval_mode

    _, _, x_te, _ = ctc_dataset()
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    model = build_tpu_quartznet(bit_width, seed=0)
    import_torch_state_dict(model, sd)
    eval_mode(model)
    logits = model(jnp.asarray(x_te))
    logits = np.asarray(getattr(logits, "value", logits))
    ours_logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ref_model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_te, (0, 2, 1))).contiguous()
        ref_logp = ref_model(xe).numpy()
    max_delta = float(np.abs(ours_logp - ref_logp).max())
    agree = float((ours_logp.argmax(-1) == ref_logp.argmax(-1)).mean())
    return max_delta, agree


# ---------------------------------------------------------------------------
# reference side (torch)
# ---------------------------------------------------------------------------

def build_reference_model(arch: str, w: int, a: int, in_bw: int, seed: int):
    from parity.refbridge import import_reference_brevitas
    import_reference_brevitas()
    import torch
    torch.manual_seed(seed)
    if arch == "cnv":
        from brevitas_examples.bnn_pynq.models.CNV import CNV
        return CNV(num_classes=10, weight_bit_width=w, act_bit_width=a,
                   in_bit_width=in_bw, in_ch=3)
    from brevitas_examples.bnn_pynq.models.FC import FC
    return FC(num_classes=10, weight_bit_width=w, act_bit_width=a,
              in_bit_width=in_bw, in_channels=1,
              out_features=list(ARCH_HIDDEN[arch]), in_features=(28, 28))


def train_eval_reference(arch, w, a, in_bw, epochs, batch_size, lr, seed=42):
    """Train the reference model; returns (top1, model)."""
    from parity.refbridge import import_reference_brevitas
    import_reference_brevitas()
    import torch
    from brevitas_examples.bnn_pynq.models.losses import SqrHingeLoss

    x_train, y_train, x_test, y_test = digits_dataset(arch)
    model = build_reference_model(arch, w, a, in_bw, seed)
    criterion = SqrHingeLoss()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    xt = torch.from_numpy(np.transpose(x_train, (0, 3, 1, 2))).contiguous()
    yt_onehot = torch.full((len(y_train), 10), -1.0)
    yt_onehot[np.arange(len(y_train)), y_train] = 1.0

    model.train()
    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            sel = np.asarray(sel)
            out = model(xt[sel])
            loss = criterion(out, yt_onehot[sel])
            opt.zero_grad()
            loss.backward()
            opt.step()
            model.clip_weights(-1.0, 1.0)

    model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        pred = model(xe).argmax(-1).numpy()
    return float((pred == y_test).mean()), model


# ---------------------------------------------------------------------------
# tpu side (brevitas_tpu)
# ---------------------------------------------------------------------------

def build_tpu_model(arch: str, w: int, a: int, in_bw: int, seed: int,
                    dropout: float = 0.2):
    from flax import nnx

    from brevitas_tpu.models import cnv
    if arch == "cnv":
        return cnv(w, a, in_bw, rngs=nnx.Rngs(seed))
    from brevitas_tpu.models.fc import FC
    return FC(out_features=ARCH_HIDDEN[arch], weight_bit_width=w,
              act_bit_width=a, in_bit_width=in_bw, dropout=dropout,
              rngs=nnx.Rngs(seed))


def train_eval_tpu(arch, w, a, in_bw, epochs, batch_size, lr, seed=42):
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.examples.bnn_pynq import evaluate, train_step

    x_train, y_train, x_test, y_test = digits_dataset(arch)
    model = build_tpu_model(arch, w, a, in_bw, seed)
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    model.train_mode()
    for ep in range(epochs):
        for sel in epoch_batches(len(x_train), batch_size, seed=ep):
            train_step(model, opt, jnp.asarray(x_train[sel]),
                       jnp.asarray(y_train[sel]))
    return evaluate(model, x_test, y_test, batch_size=256), model


# ---------------------------------------------------------------------------
# eval parity on an imported reference checkpoint
# ---------------------------------------------------------------------------

def logits_parity(arch, w, a, in_bw, ref_model, atol_report=True):
    """Import the reference-trained state dict into the twin brevitas_tpu
    model and return the max |logit delta| + top-1 agreement on the test set.
    """
    import jax.numpy as jnp
    import torch

    from brevitas_tpu.interop.torch_import import import_torch_state_dict

    _, _, x_test, y_test = digits_dataset(arch)
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    model = build_tpu_model(arch, w, a, in_bw, seed=0)
    import_torch_state_dict(model, sd)
    model.eval_mode()
    logits_tpu = np.asarray(model(jnp.asarray(x_test)))
    ref_model.eval()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2))).contiguous()
        logits_ref = ref_model(xe).numpy()
    max_delta = float(np.abs(logits_tpu - logits_ref).max())
    agree = float((logits_tpu.argmax(-1) == logits_ref.argmax(-1)).mean())
    return max_delta, agree


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

DEFAULT_CONFIGS = ["tfc_1w1a", "tfc_1w2a", "tfc_2w2a", "tfc_4w4a", "cnv_1w1a"]


def parse_config(name: str):
    arch, bits = name.split("_")
    w = int(bits[0])
    a = int(bits[2])
    # published .ini pattern: CNV quantizes inputs at 8 bits, the FC family
    # at the ACT bit width (tfc_1w2a.ini IN_BIT_WIDTH: 2)
    in_bw = 8 if arch == "cnv" else a
    return arch, w, a, in_bw


def run_config(name, epochs, batch_size, lr, seed=42, with_logits=True):
    arch, w, a, in_bw = parse_config(name)
    if arch == "quartznet":
        qn_lr = min(lr, 0.003)
        t0 = time.time()
        wer_ref, ref_model = train_eval_reference_quartznet(
            w, epochs, batch_size, qn_lr, seed)
        t_ref = time.time() - t0
        t0 = time.time()
        wer_tpu, _ = train_eval_tpu_quartznet(
            w, epochs, batch_size, qn_lr, seed)
        row = {"config": name, "epochs": epochs,
               "ref_wer": round(wer_ref, 4), "tpu_wer": round(wer_tpu, 4),
               "delta_wer": round(wer_tpu - wer_ref, 4),
               "ref_s": round(t_ref, 1), "tpu_s": round(time.time() - t0, 1)}
        if with_logits:
            max_delta, agree = quartznet_logits_parity(w, ref_model)
            row["import_logprob_maxdiff"] = round(max_delta, 5)
            row["import_argmax_agreement"] = round(agree, 4)
        return row
    if arch in ("proxyless", "proxylesshad", "proxyless4w5a"):
        # NAS family: CE loss, Adam, no weight clipping; the three published
        # configs (4-bit / 4-bit Hadamard / 4b5b, README.md:11-13)
        hadamard = arch == "proxylesshad"
        dwbw = 5 if arch == "proxyless4w5a" else None
        px_lr = min(lr, 0.002)
        t0 = time.time()
        ref_model = build_reference_proxyless(w, seed, hadamard, dwbw)
        acc_ref, ref_model = _train_eval_torch_ce(
            ref_model, epochs, batch_size, px_lr)
        t_ref = time.time() - t0
        t0 = time.time()
        tpu_model = build_tpu_proxyless(w, seed, hadamard, dwbw)
        acc_tpu, _ = _train_eval_tpu_ce(tpu_model, epochs, batch_size, px_lr)
        row = {"config": name, "epochs": epochs,
               "ref_top1": round(acc_ref, 4), "tpu_top1": round(acc_tpu, 4),
               "delta": round(acc_tpu - acc_ref, 4),
               "ref_s": round(t_ref, 1), "tpu_s": round(time.time() - t0, 1)}
        if with_logits:
            max_delta, agree = proxyless_logits_parity(
                w, ref_model, hadamard, dwbw)
            row["import_logit_maxdiff"] = round(max_delta, 5)
            row["import_top1_agreement"] = round(agree, 4)
        return row
    if arch == "mobilenet":
        # depthwise-separable family: CE loss, Adam, no weight clipping
        mob_lr = min(lr, 0.002)
        t0 = time.time()
        acc_ref, ref_model = train_eval_reference_mobilenet(
            w, epochs, batch_size, mob_lr, seed)
        t_ref = time.time() - t0
        t0 = time.time()
        acc_tpu, _ = train_eval_tpu_mobilenet(
            w, epochs, batch_size, mob_lr, seed)
        row = {"config": name, "epochs": epochs,
               "ref_top1": round(acc_ref, 4), "tpu_top1": round(acc_tpu, 4),
               "delta": round(acc_tpu - acc_ref, 4),
               "ref_s": round(t_ref, 1), "tpu_s": round(time.time() - t0, 1)}
        if with_logits:
            max_delta, agree = mobilenet_logits_parity(w, ref_model)
            row["import_logit_maxdiff"] = round(max_delta, 5)
            row["import_top1_agreement"] = round(agree, 4)
        return row
    if arch in ("lstm", "rnn"):
        # recurrent family: CE loss, no weight clipping, float head
        lstm_lr = min(lr, 0.005)  # bnn default 0.02 diverges recurrences
        t0 = time.time()
        acc_ref, _ = train_eval_reference_lstm(
            w, a, epochs, batch_size, lstm_lr, seed, kind=arch)
        t_ref = time.time() - t0
        t0 = time.time()
        acc_tpu, _ = train_eval_tpu_lstm(
            w, a, epochs, batch_size, lstm_lr, seed, kind=arch)
        return {"config": name, "epochs": epochs,
                "ref_top1": round(acc_ref, 4), "tpu_top1": round(acc_tpu, 4),
                "delta": round(acc_tpu - acc_ref, 4),
                "ref_s": round(t_ref, 1),
                "tpu_s": round(time.time() - t0, 1)}
    t0 = time.time()
    acc_ref, ref_model = train_eval_reference(
        arch, w, a, in_bw, epochs, batch_size, lr, seed)
    t_ref = time.time() - t0
    t0 = time.time()
    acc_tpu, _ = train_eval_tpu(arch, w, a, in_bw, epochs, batch_size, lr, seed)
    t_tpu = time.time() - t0
    row = {"config": name, "epochs": epochs,
           "ref_top1": round(acc_ref, 4), "tpu_top1": round(acc_tpu, 4),
           "delta": round(acc_tpu - acc_ref, 4),
           "ref_s": round(t_ref, 1), "tpu_s": round(t_tpu, 1)}
    if with_logits:
        max_delta, agree = logits_parity(arch, w, a, in_bw, ref_model)
        row["import_logit_maxdiff"] = round(max_delta, 5)
        row["import_top1_agreement"] = round(agree, 4)
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-logits", action="store_true")
    args = p.parse_args(argv)

    rows = []
    for name in args.configs.split(","):
        row = run_config(name.strip(), args.epochs, args.batch_size, args.lr,
                         args.seed, with_logits=not args.no_logits)
        print(json.dumps(row))
        rows.append(row)

    print("\n| config | epochs | reference | brevitas_tpu | Δ |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "ref_wer" in r:   # WER rows (lower is better)
            print(f"| {r['config']} (WER) | {r['epochs']} | {r['ref_wer']:.4f} "
                  f"| {r['tpu_wer']:.4f} | {r['delta_wer']:+.4f} |")
        else:
            print(f"| {r['config']} | {r['epochs']} | {r['ref_top1']:.4f} "
                  f"| {r['tpu_top1']:.4f} | {r['delta']:+.4f} |")
    return rows


if __name__ == "__main__":
    main()
