"""TPU-native audio feature front end (STFT, log-mel, SpecAugment).

Capability parity with the reference's audio preprocessing:

- QuartzNet featurizer ``FilterbankFeatures``
  (``src/brevitas_examples/speech_to_text/quartznet/parts/features.py:122``):
  dither -> preemphasis -> STFT power spectrum -> mel filterbank -> log with
  zero guard -> frame splicing -> masked per-feature normalization -> pad.
- SpecAugment / SpecCutout
  (``src/brevitas_examples/speech_to_text/quartznet/parts/spectr_augment.py``).
- Speed perturbation (``.../parts/perturb.py`` SpeedPerturbation, which
  resamples the waveform).
- MelGAN/Tacotron mel extraction + dynamic range compression
  (``src/brevitas_examples/text_to_speech/utilities/stft.py:45``,
  ``utilities/audio_processing.py:96``), including the inverse STFT with the
  window sum-square envelope (``audio_processing.py:39``).

TPU-first design notes:

- Everything here is pure ``jnp`` and jittable with static shapes: framing is
  one gather, the STFT is a batched ``rfft`` (XLA lowers FFTs natively), the
  mel projection is a single matmul on the MXU, and the masked normalization
  replaces the reference's per-sample Python loop
  (``features.py normalize_batch:37``) with a masked reduction, so a whole
  batch of utterances runs as one fused program.
- Randomness (dither, SpecAugment, speed perturb) takes an explicit
  ``jax.random`` key instead of global torch RNG state.
- Features come out in ``(B, T, n_mels)`` layout (time-major, channels-last)
  to feed QuantConv1d directly; the reference uses ``(B, n_mels, T)``.
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CONSTANT = 1e-5  # features.py:34 — dither scale + std guard


# ---------------------------------------------------------------------------
# Windows (closed forms; symmetric by default like torch's periodic=False)
# ---------------------------------------------------------------------------


def _cosine_window(coeffs, n: int, periodic: bool) -> np.ndarray:
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    w = np.zeros(n, dtype=np.float64)
    for i, a in enumerate(coeffs):
        w += a * np.cos(2.0 * math.pi * i * k / denom) * (-1.0) ** i
    return w


def hann_window(n: int, periodic: bool = False) -> np.ndarray:
    return _cosine_window([0.5, 0.5], n, periodic)


def hamming_window(n: int, periodic: bool = False) -> np.ndarray:
    return _cosine_window([0.54, 0.46], n, periodic)


def blackman_window(n: int, periodic: bool = False) -> np.ndarray:
    return _cosine_window([0.42, 0.5, 0.08], n, periodic)


def bartlett_window(n: int, periodic: bool = False) -> np.ndarray:
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return 1.0 - np.abs(2.0 * k / denom - 1.0)


WINDOWS = {
    "hann": hann_window,
    "hamming": hamming_window,
    "blackman": blackman_window,
    "bartlett": bartlett_window,
    "none": None,
}


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible: Slaney scale + Slaney area norm by
# default, HTK optional) — the reference builds its banks with
# ``librosa.filters.mel`` (features.py:216) so these must match bit-for-bit
# at f64 precision.
# ---------------------------------------------------------------------------


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_hz / f_sp + np.log(np.maximum(f, min_log_hz)
                                               / min_log_hz) / logstep,
                    mels)


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_mel = 1000.0 / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    1000.0 * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int = 64,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   htk: bool = False, norm: Optional[str] = "slaney",
                   ) -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_mels, 1 + n_fft // 2)``."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk),
                          n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unsupported mel norm {norm!r}")
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + STFT
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int,
                 center: bool = True, pad_mode: str = "reflect",
                 ) -> jnp.ndarray:
    """Slice ``(..., N)`` into overlapping frames ``(..., T, frame_length)``.

    One gather — XLA keeps it fused with the windowing that follows.
    """
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(frame_length // 2,) * 2]
        x = jnp.pad(x, pad, mode=pad_mode)
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return x[..., idx]


def stft(x: jnp.ndarray, n_fft: int, hop_length: int,
         win_length: Optional[int] = None, window: str = "hann",
         center: bool = True, periodic_window: bool = False,
         ) -> jnp.ndarray:
    """Complex STFT of ``(..., N)`` -> ``(..., T, 1 + n_fft // 2)``.

    Matches ``torch.stft`` (features.py:199-204): a ``win_length`` window is
    zero-padded symmetrically to ``n_fft``, frames are ``n_fft`` long with
    reflect center padding.
    """
    win_length = win_length or n_fft
    frames = frame_signal(x, n_fft, hop_length, center=center)
    win_fn = WINDOWS.get(window)
    if win_fn is not None:
        w = win_fn(win_length, periodic=periodic_window)
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
        frames = frames * jnp.asarray(w, dtype=x.dtype)
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def stft_magsq(x: jnp.ndarray, n_fft: int, hop_length: int,
               win_length: Optional[int] = None, window: str = "hann",
               center: bool = True, mag_power: float = 2.0,
               periodic_window: bool = False) -> jnp.ndarray:
    """|STFT|^mag_power — the reference's ``x.pow(2).sum(-1)``
    (features.py:276-279) on the real/imag parts."""
    z = stft(x, n_fft, hop_length, win_length, window, center,
             periodic_window)
    magsq = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    if mag_power == 2.0:
        return magsq
    return magsq ** (mag_power / 2.0)


def istft(z: jnp.ndarray, n_fft: int, hop_length: int,
          win_length: Optional[int] = None, window: str = "hann",
          center: bool = True, length: Optional[int] = None,
          periodic_window: bool = True) -> jnp.ndarray:
    """Inverse STFT via overlap-add with the window sum-square envelope.

    Mirrors the reference MelGAN inverse transform
    (``utilities/stft.py:96`` + ``audio_processing.py window_sumsquare:39``):
    synthesize windowed frames, overlap-add, divide by the summed squared
    window where it is non-negligible.
    """
    win_length = win_length or n_fft
    n_frames = z.shape[-2]
    frames = jnp.fft.irfft(z, n=n_fft, axis=-1)
    win_fn = WINDOWS.get(window)
    w = (win_fn(win_length, periodic=periodic_window) if win_fn is not None
         else np.ones(win_length))
    lpad = (n_fft - win_length) // 2
    w = np.pad(w, (lpad, n_fft - win_length - lpad))
    frames = frames * jnp.asarray(w, dtype=frames.dtype)

    out_len = n_fft + hop_length * (n_frames - 1)
    # overlap-add as one scatter-add
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape(batch_shape + (-1,))
    out = jnp.zeros(batch_shape + (out_len,), frames.dtype)
    out = out.at[..., idx].add(flat)

    wss = np.zeros(out_len)
    base = np.asarray(w) ** 2
    for i in range(n_frames):
        s = i * hop_length
        wss[s: s + n_fft] += base
    nz = wss > np.finfo(np.float32).tiny
    out = jnp.where(jnp.asarray(nz), out / jnp.asarray(
        np.where(nz, wss, 1.0), dtype=out.dtype), out)
    if center:
        out = out[..., n_fft // 2:]
        if length is not None:
            out = out[..., :length]
    elif length is not None:
        out = out[..., :length]
    return out


# ---------------------------------------------------------------------------
# QuartzNet featurizer
# ---------------------------------------------------------------------------


def preemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """y[0] = x[0]; y[t] = x[t] - coeff * x[t-1] (features.py:268-271)."""
    return jnp.concatenate(
        [x[..., :1], x[..., 1:] - coeff * x[..., :-1]], axis=-1)


def normalize_batch(x: jnp.ndarray, seq_len: jnp.ndarray,
                    normalize_type: str = "per_feature") -> jnp.ndarray:
    """Masked per-utterance normalization of ``(B, T, F)`` features.

    ``per_feature``: mean/std per (utterance, mel-bin) over valid frames;
    ``all_features``: one mean/std per utterance. Uses Bessel-corrected std
    like ``torch.std`` (features.py normalize_batch:37-58), with the same
    ``+= 1e-5`` zero guard. Vectorized masked reduction instead of the
    reference's per-sample loop.
    """
    t = x.shape[1]
    valid = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(x.dtype)
    n = jnp.maximum(seq_len.astype(x.dtype), 1.0)
    if normalize_type == "per_feature":
        m = valid[..., None]
        mean = jnp.sum(x * m, axis=1) / n[:, None]
        var = jnp.sum(m * (x - mean[:, None, :]) ** 2, axis=1) \
            / jnp.maximum(n - 1.0, 1.0)[:, None]
        std = jnp.sqrt(var) + CONSTANT
        return (x - mean[:, None, :]) / std[:, None, :]
    if normalize_type == "all_features":
        f = x.shape[2]
        m = valid[..., None]
        cnt = jnp.maximum(n * f, 1.0)
        mean = jnp.sum(x * m, axis=(1, 2)) / cnt
        var = jnp.sum(m * (x - mean[:, None, None]) ** 2, axis=(1, 2)) \
            / jnp.maximum(cnt - 1.0, 1.0)
        std = jnp.sqrt(var) + CONSTANT
        return (x - mean[:, None, None]) / std[:, None, None]
    return x


def splice_frames(x: jnp.ndarray, frame_splicing: int) -> jnp.ndarray:
    """Stack shifted copies along the feature dim (features.py:62-74).

    ``(B, T, F) -> (B, T, F * frame_splicing)``; copy ``n`` is the features
    rolled so frame ``t`` sees frame ``t + n`` (edge frames wrap like the
    reference's concat-of-slices)."""
    seq = [x]
    for n in range(1, frame_splicing):
        seq.append(jnp.concatenate([x[:, n:], x[:, :n]], axis=1))
    return jnp.concatenate(seq, axis=2)


@dataclass(frozen=True)
class FilterbankConfig:
    """Defaults = reference ``FilterbankFeatures`` / quartznet15x5.yaml
    (features.py:126-149)."""
    sample_rate: int = 16000
    n_window_size: int = 320          # 20 ms
    n_window_stride: int = 160        # 10 ms
    window: str = "hann"
    normalize: str = "per_feature"
    n_fft: Optional[int] = None
    preemph: Optional[float] = 0.97
    nfilt: int = 64
    lowfreq: float = 0.0
    highfreq: Optional[float] = None
    log: bool = True
    log_zero_guard_type: str = "add"
    log_zero_guard_value: float = 2.0 ** -24
    dither: float = CONSTANT
    pad_to: int = 16
    frame_splicing: int = 1
    pad_value: float = 0.0
    mag_power: float = 2.0

    @property
    def fft_size(self) -> int:
        return self.n_fft or 2 ** math.ceil(math.log2(self.n_window_size))


def filterbank_features(x: jnp.ndarray, seq_len: jnp.ndarray,
                        cfg: FilterbankConfig = FilterbankConfig(),
                        rng: Optional[jax.Array] = None,
                        training: bool = False,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform ``(B, N)`` + lengths ``(B,)`` -> log-mel ``(B, T, nfilt)``.

    The full reference forward (features.py:260-321), jittable end-to-end.
    Returns ``(features, feature_lengths)``. Dither only applies when
    ``training`` and ``rng`` is given.
    """
    n_fft = cfg.fft_size
    out_len = jnp.ceil(seq_len.astype(jnp.float32)
                       / cfg.n_window_stride).astype(jnp.int32)

    if training and rng is not None and cfg.dither > 0:
        x = x + cfg.dither * jax.random.normal(rng, x.shape, x.dtype)
    if cfg.preemph is not None:
        x = preemphasis(x, cfg.preemph)

    spec = stft_magsq(x, n_fft, cfg.n_window_stride, cfg.n_window_size,
                      cfg.window, center=True, mag_power=cfg.mag_power)
    fb = mel_filterbank(cfg.sample_rate, n_fft, cfg.nfilt, cfg.lowfreq,
                        cfg.highfreq)
    feats = spec @ jnp.asarray(fb.T)  # (B, T, nfilt) — one MXU matmul

    if cfg.log:
        if cfg.log_zero_guard_type == "add":
            feats = jnp.log(feats + cfg.log_zero_guard_value)
        elif cfg.log_zero_guard_type == "clamp":
            feats = jnp.log(jnp.maximum(feats, cfg.log_zero_guard_value))
        else:
            raise ValueError(cfg.log_zero_guard_type)

    if cfg.frame_splicing > 1:
        feats = splice_frames(feats, cfg.frame_splicing)
    if cfg.normalize:
        feats = normalize_batch(feats, out_len, cfg.normalize)

    # zero everything past each utterance's length, pad frames to pad_to
    t = feats.shape[1]
    mask = jnp.arange(t)[None, :, None] < out_len[:, None, None]
    feats = jnp.where(mask, feats, cfg.pad_value)
    pad_to = cfg.pad_to if training else 16
    if pad_to > 0 and t % pad_to != 0:
        feats = jnp.pad(feats, ((0, 0), (0, pad_to - t % pad_to), (0, 0)),
                        constant_values=cfg.pad_value)
    return feats, out_len


# ---------------------------------------------------------------------------
# SpecAugment / SpecCutout (spectr_augment.py) — jittable masking
# ---------------------------------------------------------------------------


def spec_augment(rng: jax.Array, x: jnp.ndarray, freq_masks: int = 0,
                 time_masks: int = 0, freq_width: int = 10,
                 time_width: int = 10, mask_value: float = 0.0,
                 ) -> jnp.ndarray:
    """SpecAugment (arXiv:1904.08779) on ``(B, T, F)`` features.

    Per utterance: ``freq_masks`` bands of width <= ``freq_width`` zeroed on
    the mel axis, ``time_masks`` spans of width <= ``time_width`` on the time
    axis (spectr_augment.py SpecAugment.forward). Static shapes: each mask is
    a comparison against a sampled (start, width)."""
    b, t, f = x.shape

    def axis_mask(key, n_masks, axis_len, max_w):
        ks, kw = jax.random.split(key)
        starts = jax.random.randint(ks, (b, n_masks), 0, axis_len)
        widths = jax.random.randint(kw, (b, n_masks), 0, max_w + 1)
        pos = jnp.arange(axis_len)[None, None, :]
        hit = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
        return jnp.any(hit, axis=1)  # (B, axis_len)

    keep = jnp.ones((b, t, f), bool)
    kf, kt = jax.random.split(rng)
    if freq_masks > 0:
        keep &= ~axis_mask(kf, freq_masks, f, freq_width)[:, None, :]
    if time_masks > 0:
        keep &= ~axis_mask(kt, time_masks, t, time_width)[:, :, None]
    return jnp.where(keep, x, mask_value)


def spec_cutout(rng: jax.Array, x: jnp.ndarray, rect_masks: int = 0,
                rect_time: int = 5, rect_freq: int = 20,
                mask_value: float = 0.0) -> jnp.ndarray:
    """SpecCutout (arXiv:1708.04552): ``rect_masks`` fixed-size rectangles
    zeroed per utterance (spectr_augment.py SpecCutout.forward)."""
    if rect_masks <= 0:
        return x
    b, t, f = x.shape
    kt, kf = jax.random.split(rng)
    ts = jax.random.randint(kt, (b, rect_masks), 0, max(t - rect_time, 1))
    fs = jax.random.randint(kf, (b, rect_masks), 0, max(f - rect_freq, 1))
    tpos = jnp.arange(t)[None, None, :]
    fpos = jnp.arange(f)[None, None, :]
    thit = (tpos >= ts[..., None]) & (tpos < ts[..., None] + rect_time)
    fhit = (fpos >= fs[..., None]) & (fpos < fs[..., None] + rect_freq)
    hit = jnp.any(thit[:, :, :, None] & fhit[:, :, None, :], axis=1)
    return jnp.where(hit, mask_value, x)


# ---------------------------------------------------------------------------
# Speed perturbation (perturb.py SpeedPerturbation) via linear resample
# ---------------------------------------------------------------------------


def resample_linear(x: jnp.ndarray, orig_sr: float, target_sr: float,
                    ) -> jnp.ndarray:
    """Linear-interpolation resample of ``(..., N)`` — the waveform-level
    speed perturbation the reference applies with librosa (perturb.py)."""
    n = x.shape[-1]
    out_n = int(round(n * target_sr / orig_sr))
    pos = jnp.arange(out_n) * (orig_sr / target_sr)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1 - frac) + x[..., hi] * frac


def speed_perturb(rng: jax.Array, x: jnp.ndarray, sample_rate: int,
                  min_rate: float = 0.85, max_rate: float = 1.15,
                  ) -> jnp.ndarray:
    """Random-rate speed perturbation. NOTE: output length depends on the
    sampled rate, so call this outside jit (data pipeline), as the reference
    does on the host side."""
    rate = float(jax.random.uniform(rng, (), minval=min_rate,
                                    maxval=max_rate))
    return resample_linear(x, sample_rate, sample_rate / rate)


# ---------------------------------------------------------------------------
# MelGAN / Tacotron mel extraction (text_to_speech parity)
# ---------------------------------------------------------------------------


def dynamic_range_compression(x: jnp.ndarray, c: float = 1.0,
                              clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip_val) * C) (audio_processing.py:96)."""
    return jnp.log(jnp.maximum(x, clip_val) * c)


def dynamic_range_decompression(x: jnp.ndarray, c: float = 1.0,
                                ) -> jnp.ndarray:
    return jnp.exp(x) / c


@dataclass(frozen=True)
class TacotronSTFTConfig:
    """Defaults = reference TacotronSTFT (utilities/stft.py:119) /
    text_to_speech cfg."""
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    sampling_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0


def tacotron_mel(wav: jnp.ndarray,
                 cfg: TacotronSTFTConfig = TacotronSTFTConfig(),
                 ) -> jnp.ndarray:
    """Waveform ``(B, N)`` in [-1, 1] -> compressed mel ``(B, T, n_mels)``.

    Reference TacotronSTFT.mel_spectrogram (utilities/stft.py:151): magnitude
    STFT (power 1) with a periodic hann window -> mel -> dynamic range
    compression."""
    z = stft(wav, cfg.filter_length, cfg.hop_length, cfg.win_length,
             window="hann", center=True, periodic_window=True)
    mag = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2)
    fb = mel_filterbank(cfg.sampling_rate, cfg.filter_length,
                        cfg.n_mel_channels, cfg.mel_fmin, cfg.mel_fmax)
    return dynamic_range_compression(mag @ jnp.asarray(fb.T))


# ---------------------------------------------------------------------------
# Host-side WAV IO (stdlib wave; the image has no soundfile/librosa)
# ---------------------------------------------------------------------------


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 mono waveform in [-1, 1], rate)."""
    import wave

    with wave.open(path, "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2 ** 31
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, rate


def save_wav(path: str, wav: np.ndarray, rate: int) -> None:
    """Write float32 [-1, 1] mono to 16-bit PCM WAV."""
    import wave

    pcm = np.clip(np.asarray(wav), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
