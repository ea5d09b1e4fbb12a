"""Tutorial 10 — end-to-end quantized speech pipeline.

The reference ships QuartzNet eval plus a NeMo-derived preprocessing stack
(``speech_to_text/quartznet/parts/features.py`` FilterbankFeatures,
``spectr_augment.py`` SpecAugment, ``get_librispeech_data.py``). This
tutorial runs the whole TPU-native equivalent in one file:

1. synthesize a wav and extract log-mel features ON DEVICE
   (``brevitas_tpu.audio.filterbank_features`` — dither, preemphasis, STFT,
   Slaney mel banks, masked per-feature normalization, one jitted program);
2. QAT-train a small QuartzNet with SpecAugment + CTC loss;
3. greedy-CTC decode and score WER;
4. convert to the int8 integer-serving twins and decode again.

Run: python notebooks/10_speech_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from flax import nnx

from brevitas_tpu import audio

# ---------------------------------------------------------------------------
# 1. Waveform -> log-mel features, all on device
# ---------------------------------------------------------------------------
print("== featurizer ==")
sr = 16000
t = np.arange(sr, dtype=np.float32) / sr
wav = (0.4 * np.sin(2 * np.pi * 440 * t)
       + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)

cfg = audio.FilterbankConfig()  # reference defaults: 20ms/10ms, 64 mels
feats, lens = jax.jit(lambda x, s: audio.filterbank_features(x, s, cfg))(
    jnp.asarray(wav[None]), jnp.asarray([len(wav)]))
print(f"wav {wav.shape} -> features {tuple(feats.shape)}, "
      f"{int(lens[0])} valid frames")

# SpecAugment is a jittable masking op driven by an explicit key
aug = audio.spec_augment(jax.random.key(0), feats, freq_masks=2,
                         time_masks=2, freq_width=8, time_width=10)
print(f"spec_augment zeroed {float((aug == 0).mean()):.1%} of cells")

# ---------------------------------------------------------------------------
# 2. QAT: QuartzNet + CTC on a synthetic pattern->letter task
# ---------------------------------------------------------------------------
print("\n== QAT with CTC ==")
from brevitas_tpu.examples.speech_to_text import (greedy_ctc_decode, train,
                                                  word_error_rate)

model, losses = train(steps=40, batch=8, frames=64, bit_width=8, log=print)
print(f"ctc loss {losses[0]:.1f} -> {losses[-1]:.2f}")

# ---------------------------------------------------------------------------
# 3. Greedy decode + WER
# ---------------------------------------------------------------------------
print("\n== decode ==")
from brevitas_tpu.utils import eval_mode

eval_mode(model)
rng = np.random.default_rng(0)
protos = rng.standard_normal((4, 64)).astype(np.float32) * 2
tgt = [1, 3, 2, 4, 1, 2, 3, 1]
x = np.zeros((1, 64, 64), np.float32)
for j, s in enumerate(tgt):
    x[0, j * 8: (j + 1) * 8] = protos[s - 1]
logits = np.asarray(model(jnp.asarray(x)))[0]
# train() uses blank_id=0 and symbols 1..4; map to letters for display
ids = logits.argmax(-1)
hyp = "".join("abcd"[i - 1] for k, i in enumerate(ids)
              if i != 0 and (k == 0 or i != ids[k - 1]))
ref = "".join("abcd"[s - 1] for s in tgt)
print(f"ref {ref!r} hyp {hyp!r} "
      f"cer-ish {word_error_rate(' '.join(hyp), ' '.join(ref)):.2f}")

# ---------------------------------------------------------------------------
# 4. Integer serving twins
# ---------------------------------------------------------------------------
print("\n== int8 serving ==")
from brevitas_tpu.graph.convert_int import convert_integer_inference

served = convert_integer_inference(model)
slog = np.asarray(served(jnp.asarray(x)))[0]
sids = slog.argmax(-1)
shyp = "".join("abcd"[i - 1] for k, i in enumerate(sids)
               if i != 0 and (k == 0 or i != sids[k - 1]))
print(f"int8-served hyp {shyp!r} (fake-quant hyp {hyp!r})")
assert shyp == hyp, "integer serving must decode identically"
print("OK")
