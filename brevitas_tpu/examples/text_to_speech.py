"""MelGAN vocoder eval CLI.

Reference: ``src/brevitas_examples/text_to_speech/melgan_val.py`` (loads the
8-bit MelGAN generator, synthesizes audio from mel spectrograms). The CLI
consumes (N, T, 80) mel .npy files (or synthetic), emits int16 PCM .npy
waveforms, and reports realtime factor.
"""

import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu.models.melgan import MAX_WAV_VALUE, melgan_8b
from brevitas_tpu.utils import eval_mode

SAMPLE_RATE = 22050
HOP = 256


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu melgan eval")
    p.add_argument("--mels", default=None, help=".npy of (N, T, 80) mels")
    p.add_argument("--preprocess-wavs", nargs="*", default=None,
                   help="22.05 kHz .wav files: extract Tacotron mels "
                        "(audio.tacotron_mel — reference "
                        "preprocess_dataset.py) to --out-dir and exit")
    p.add_argument("--out-dir", default="./melgan_out")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--mel-frames", type=int, default=64)
    args = p.parse_args(argv)

    if args.preprocess_wavs:
        from brevitas_tpu import audio

        cfg = audio.TacotronSTFTConfig()
        os.makedirs(args.out_dir, exist_ok=True)
        written = []
        for path in args.preprocess_wavs:
            wav, rate = audio.load_wav(path)
            if rate != cfg.sampling_rate:
                wav = np.asarray(audio.resample_linear(
                    jnp.asarray(wav), rate, cfg.sampling_rate))
            mel = np.asarray(audio.tacotron_mel(jnp.asarray(wav[None]),
                                                cfg))[0]
            out = os.path.join(
                args.out_dir,
                os.path.splitext(os.path.basename(path))[0] + "_mel.npy")
            np.save(out, mel)
            written.append(out)
        print(json.dumps({"mels_written": written}))
        return {"mels_written": written}

    model = melgan_8b(mel_channels=80, rngs=nnx.Rngs(0))
    if args.checkpoint:
        from brevitas_tpu.examples.bnn_pynq import load_checkpoint

        load_checkpoint(args.checkpoint, model)
    else:
        model(jnp.zeros((1, 8, 80)))
    eval_mode(model)

    @nnx.jit
    def synth(model, mel):
        return model(mel)

    if args.mels:
        mels = np.load(args.mels).astype(np.float32)
    else:
        mels = np.random.default_rng(0).standard_normal(
            (args.batches, args.mel_frames, 80)).astype(np.float32) - 5.0

    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.time()
    total_samples = 0
    for i in range(len(mels)):
        wav = np.asarray(synth(model, jnp.asarray(mels[i:i + 1])))[0, :, 0]
        pcm = (np.clip(wav, -1, 1) * MAX_WAV_VALUE).astype(np.int16)
        np.save(os.path.join(args.out_dir, f"wav_{i}.npy"), pcm)
        total_samples += len(pcm)
    dt = time.time() - t0
    out = {"waveforms": len(mels), "samples": total_samples,
           "realtime_factor": (total_samples / SAMPLE_RATE) / dt}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
