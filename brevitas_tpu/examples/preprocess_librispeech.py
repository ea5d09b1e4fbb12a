"""LibriSpeech-style data preprocessing CLI.

Reference: ``src/brevitas_examples/speech_to_text/get_librispeech_data.py``
(downloads LibriSpeech tarballs, converts flac to wav, writes a JSON-lines
manifest of ``{audio_filepath, duration, text}`` entries consumed by the eval
data layer). This image has no egress, so the download stage is out of scope;
this CLI covers the conversion stages on local data:

1. Walk ``--data-dir`` for ``*.trans.txt`` transcript files (LibriSpeech
   layout: ``<utt-id> <TEXT>`` per line, audio ``<utt-id>.wav`` beside it) or,
   absent those, pair each ``*.wav`` with a same-stem ``*.txt``.
2. Write the reference-format JSON-lines manifest.
3. Optionally (``--features-out``) run the QuartzNet featurizer
   (``brevitas_tpu.audio.filterbank_features`` — the reference
   FilterbankFeatures pipeline) over all utterances in one padded batch on
   device, saving ``(N, T, 64)`` log-mel features + lengths + transcripts
   ready for ``brevitas_tpu.examples.speech_to_text --features``.
"""

import argparse
import json
import os

import numpy as np


def collect_utterances(data_dir: str):
    """Yield (wav_path, transcript) pairs from a LibriSpeech-style tree."""
    pairs = []
    for root, _dirs, files in os.walk(data_dir):
        trans = [f for f in files if f.endswith(".trans.txt")]
        for tf in trans:
            for line in open(os.path.join(root, tf), encoding="utf-8"):
                utt_id, _, text = line.partition(" ")
                wav = os.path.join(root, utt_id + ".wav")
                if os.path.exists(wav):
                    pairs.append((wav, text.lower().strip()))
        if not trans:
            for f in files:
                if f.endswith(".wav"):
                    txt = os.path.join(root, f[:-4] + ".txt")
                    text = (open(txt, encoding="utf-8").read().lower().strip()
                            if os.path.exists(txt) else "")
                    pairs.append((os.path.join(root, f), text))
    return sorted(pairs)


def main(argv=None):
    p = argparse.ArgumentParser("brevitas_tpu librispeech preprocessing")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--manifest", required=True,
                   help="output JSON-lines manifest path")
    p.add_argument("--features-out", default=None,
                   help="optional .npz of log-mel features for the eval CLI")
    args = p.parse_args(argv)

    from brevitas_tpu import audio

    pairs = collect_utterances(args.data_dir)
    if not pairs:
        raise SystemExit(f"no wav files under {args.data_dir}")

    entries = []
    wavs = []
    cfg = audio.FilterbankConfig()
    for wav_path, text in pairs:
        wav, rate = audio.load_wav(wav_path)
        if rate != cfg.sample_rate:
            import jax.numpy as jnp

            wav = np.asarray(audio.resample_linear(
                jnp.asarray(wav), rate, cfg.sample_rate))
        wavs.append(wav)
        entries.append({"audio_filepath": os.path.abspath(wav_path),
                        "duration": len(wav) / cfg.sample_rate,
                        "text": text})

    os.makedirs(os.path.dirname(os.path.abspath(args.manifest)),
                exist_ok=True)
    with open(args.manifest, "w") as fout:
        for m in entries:
            fout.write(json.dumps(m) + "\n")
    print(f"wrote {len(entries)} utterances to {args.manifest}")

    if args.features_out:
        import jax.numpy as jnp

        n_max = max(len(w) for w in wavs)
        batch = np.stack([np.pad(w, (0, n_max - len(w))) for w in wavs])
        seq = np.asarray([len(w) for w in wavs], np.int32)
        feats, lens = audio.filterbank_features(
            jnp.asarray(batch), jnp.asarray(seq), cfg)
        np.savez(args.features_out, features=np.asarray(feats),
                 lengths=np.asarray(lens),
                 transcripts=np.asarray([m["text"] for m in entries]))
        print(f"wrote features {tuple(np.asarray(feats).shape)} to "
              f"{args.features_out}")
    return entries


if __name__ == "__main__":
    main()
