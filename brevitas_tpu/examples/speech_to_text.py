"""QuartzNet speech-to-text eval CLI.

Reference: ``src/brevitas_examples/speech_to_text/quartznet_val.py`` (loads
a pretrained INT8/INT4 QuartzNet, runs LibriSpeech dev-other, reports WER;
baselines 11.03/10.98/12.00, BASELINE.md). No egress in this image: the CLI
evaluates precomputed log-mel features from .npy files or synthetic inputs,
and reports greedy-CTC decodes + WER when transcripts are provided.
"""

import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.models.quartznet import (
    QUARTZNET_15x5,
    QuartzNet,
    quartznet_15x5,
    quartznet_15x5_4b,
)
from brevitas_tpu.utils import eval_mode

BLANK = 28
LABELS = list(" abcdefghijklmnopqrstuvwxyz'") + ["_"]


def greedy_ctc_decode(logits: np.ndarray) -> str:
    """Collapse-repeats-then-drop-blank greedy decoder (reference
    greedy_ctc_decoder.py)."""
    ids = logits.argmax(-1)
    out, prev = [], -1
    for i in ids:
        if i != prev and i != BLANK:
            out.append(LABELS[int(i)])
        prev = i
    return "".join(out)


def word_error_rate(hyp: str, ref: str) -> float:
    h, r = hyp.split(), ref.split()
    d = np.zeros((len(h) + 1, len(r) + 1), np.int32)
    d[:, 0] = np.arange(len(h) + 1)
    d[0, :] = np.arange(len(r) + 1)
    for i in range(1, len(h) + 1):
        for j in range(1, len(r) + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (h[i - 1] != r[j - 1]))
    return d[-1, -1] / max(len(r), 1)


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu quartznet eval")
    p.add_argument("--model", default="quartznet_8b",
                   choices=["quartznet_8b", "quartznet_4b", "tiny"])
    p.add_argument("--features", default=None,
                   help=".npy of (N, T, 64) log-mel features")
    p.add_argument("--wavs", nargs="*", default=None,
                   help="16 kHz PCM .wav files; log-mel features are "
                        "computed on-device (audio.filterbank_features, the "
                        "reference FilterbankFeatures pipeline)")
    p.add_argument("--transcripts", default=None,
                   help="text file, one reference transcript per line")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batches", type=int, default=2)
    args = p.parse_args(argv)

    rngs = nnx.Rngs(0)
    if args.model == "quartznet_8b":
        model = quartznet_15x5(rngs=rngs)
    elif args.model == "quartznet_4b":
        model = quartznet_15x5_4b(rngs=rngs)
    else:
        topo = ((32, 1, 33, 2, 1, False, True), (32, 2, 33, 1, 1, True, True),
                (64, 1, 1, 1, 1, False, False))
        model = QuartzNet(num_features=64, bit_width=8, topology=topo,
                          rngs=rngs)
    if args.checkpoint:
        from brevitas_tpu.examples.bnn_pynq import load_checkpoint

        load_checkpoint(args.checkpoint, model)
    else:
        model(jnp.zeros((1, 128, 64)))  # settle act stats
    eval_mode(model)

    @nnx.jit
    def infer(model, x):
        return model(x)

    if args.wavs:
        from brevitas_tpu import audio

        cfg = audio.FilterbankConfig()
        feats = []
        for path in args.wavs:
            wav, rate = audio.load_wav(path)
            if rate != cfg.sample_rate:
                wav = np.asarray(audio.resample_linear(
                    jnp.asarray(wav), rate, cfg.sample_rate))
            f, n = audio.filterbank_features(
                jnp.asarray(wav[None]), jnp.asarray([len(wav)]), cfg)
            feats.append(np.asarray(f)[0, : int(n[0])])
        t_max = max(f.shape[0] for f in feats)
        t_max += (-t_max) % 16
        feats = np.stack([np.pad(f, ((0, t_max - f.shape[0]), (0, 0)))
                          for f in feats])
    elif args.features:
        feats = np.load(args.features)
    else:
        feats = np.random.default_rng(0).standard_normal(
            (args.batches, 256, 64)).astype(np.float32)
    refs = None
    if args.transcripts:
        refs = open(args.transcripts).read().splitlines()

    t0 = time.time()
    decodes, wers = [], []
    for i in range(len(feats)):
        logits = np.asarray(infer(model, jnp.asarray(feats[i:i + 1])))[0]
        hyp = greedy_ctc_decode(logits)
        decodes.append(hyp)
        if refs and i < len(refs):
            wers.append(word_error_rate(hyp, refs[i]))
    out = {"utterances": len(decodes),
           "sec_per_utt": (time.time() - t0) / max(len(decodes), 1)}
    if wers:
        out["wer"] = float(np.mean(wers))
    print(json.dumps(out))
    return out


def train(steps: int = 60, batch: int = 8, n_mels: int = 64,
          frames: int = 64, bit_width: int = 8, lr: float = 3e-3,
          spec_augment: bool = True, seed: int = 0, log=None):
    """QAT CTC training loop (reference trains QuartzNet with CTCLossNM,
    quartznet/losses.py:22; here the whole step — SpecAugment, QuartzNet
    forward with fake-quant, optax.ctc_loss, adam — is ONE jitted program).

    Synthetic task: each utterance is a sequence of per-frame one-hot-ish
    mel patterns, each pattern deterministically tied to a target letter, so
    the net must learn pattern->letter alignment through CTC. Returns
    (model, losses).
    """
    import jax
    import optax

    from brevitas_tpu import audio

    rng = np.random.default_rng(seed)
    topo = ((32, 1, 9, 1, 1, False, True), (32, 2, 9, 1, 1, True, True),
            (64, 1, 1, 1, 1, False, False))
    model = QuartzNet(num_features=n_mels, bit_width=bit_width,
                      topology=topo, rngs=nnx.Rngs(seed))
    optimizer = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)

    n_sym = 4  # letters a-d
    protos = rng.standard_normal((n_sym, n_mels)).astype(np.float32) * 2

    def make_batch():
        tgt = rng.integers(1, 1 + n_sym, (batch, frames // 8))
        feats = np.zeros((batch, frames, n_mels), np.float32)
        for b in range(batch):
            for j, s in enumerate(tgt[b]):
                feats[b, j * 8: (j + 1) * 8] = protos[s - 1]
        feats += rng.standard_normal(feats.shape).astype(np.float32) * 0.1
        pad = np.zeros((batch, frames // 8), np.int32)  # no padding
        return (jnp.asarray(feats), jnp.asarray(tgt.astype(np.int32)),
                jnp.asarray(pad))

    @nnx.jit
    def step(model, optimizer, feats, targets, tgt_pad, key):
        def objective(m):
            x = audio.spec_augment(key, feats, freq_masks=1, time_masks=1,
                                   freq_width=4, time_width=4) \
                if spec_augment else feats
            logits = m(x)
            logp = jax.nn.log_softmax(logits)
            pad_lp = jnp.zeros(logp.shape[:2])
            return optax.ctc_loss(logp, pad_lp, targets, tgt_pad,
                                  blank_id=0).mean()

        loss, grads = nnx.value_and_grad(objective)(model)
        optimizer.update(model, grads)
        return loss

    losses = []
    key = jax.random.key(seed)
    for i in range(steps):
        key, sub = jax.random.split(key)
        feats, targets, tgt_pad = make_batch()
        loss = step(model, optimizer, feats, targets, tgt_pad, sub)
        losses.append(float(loss))
        if log and i % 10 == 0:
            log(f"step {i} ctc loss {losses[-1]:.4f}")
    return model, losses


if __name__ == "__main__":
    main()
