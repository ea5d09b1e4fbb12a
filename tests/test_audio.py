"""Audio front-end tests (brevitas_tpu/audio.py).

Oracle strategy: torch (CPU) provides the STFT ground truth the reference
featurizer is built on (features.py uses torch.stft); mel/normalize/augment
are checked against hand-computed numpy replicas of the reference math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from brevitas_tpu import audio


def test_windows_match_torch():
    for name, tfn in [("hann", torch.hann_window),
                      ("hamming", torch.hamming_window),
                      ("blackman", torch.blackman_window),
                      ("bartlett", torch.bartlett_window)]:
        ours = audio.WINDOWS[name](320, periodic=False)
        ref = tfn(320, periodic=False).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6), name
        ours_p = audio.WINDOWS[name](320, periodic=True)
        ref_p = tfn(320, periodic=True).numpy()
        np.testing.assert_allclose(ours_p, ref_p, atol=1e-6)


def test_stft_power_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    n_fft, hop, win = 512, 160, 320
    ours = np.asarray(audio.stft_magsq(jnp.asarray(x), n_fft, hop, win,
                                       "hann", center=True))
    w = torch.hann_window(win, periodic=False)
    ref = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                     win_length=win, window=w, center=True,
                     return_complex=True)
    ref = (ref.real ** 2 + ref.imag ** 2).numpy()  # (B, F, T)
    assert ours.shape == (2, ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1),
                               rtol=1e-3, atol=1e-3)


def test_istft_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    z = audio.stft(jnp.asarray(x), 512, 128, 512, "hann",
                   periodic_window=True)
    y = audio.istft(z, 512, 128, 512, "hann", length=2048,
                    periodic_window=True)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_mel_scale_known_points():
    # HTK: mel(1000 Hz) = 1000 mel by construction
    assert abs(audio.hz_to_mel(1000.0, htk=True) - 1000.0) < 0.05
    # Slaney: linear region f / (200/3); mel(1000) = 15
    assert abs(audio.hz_to_mel(1000.0) - 15.0) < 1e-9
    assert abs(audio.hz_to_mel(500.0) - 7.5) < 1e-9
    # inverses
    for htk in (False, True):
        f = np.array([10.0, 440.0, 999.0, 1001.0, 4000.0, 7999.0])
        np.testing.assert_allclose(
            audio.mel_to_hz(audio.hz_to_mel(f, htk), htk), f, rtol=1e-10)


def test_mel_filterbank_properties():
    sr, n_fft, n_mels = 16000, 512, 64
    fb = audio.mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all()
    # every filter has support, and peak bin positions increase monotonically
    assert (fb.sum(1) > 0).all()
    peaks = fb.argmax(1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney norm: triangle i has area 1/2 * base * height = 1 in continuous
    # Hz, so the discrete Riemann sum (bin spacing sr/n_fft) is ~1
    area = fb.sum(1) * (sr / n_fft)
    assert (np.abs(area[5:-1] - 1.0) < 0.1).all()
    # unnormalized version peaks at 1
    fb_raw = audio.mel_filterbank(sr, n_fft, n_mels, norm=None)
    assert fb_raw.max() <= 1.0 + 1e-6
    assert fb_raw.max() > 0.9


def test_preemphasis_matches_reference_formula():
    x = np.arange(10, dtype=np.float32)[None]
    y = np.asarray(audio.preemphasis(jnp.asarray(x), 0.97))
    expect = np.concatenate([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]], 1)
    np.testing.assert_allclose(y, expect, rtol=1e-6)


def test_normalize_batch_masked_per_feature():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 20, 5)).astype(np.float32) * 4 + 7
    seq = np.array([20, 12, 1], np.int32)
    y = np.asarray(audio.normalize_batch(jnp.asarray(x), jnp.asarray(seq)))
    # replicate the reference loop (features.py:37-48, torch.std = ddof 1)
    for i, n in enumerate(seq):
        valid = x[i, :n]
        mean = valid.mean(0)
        std = valid.std(0, ddof=1) if n > 1 else np.zeros(5)
        expect = (x[i] - mean) / (std + audio.CONSTANT)
        np.testing.assert_allclose(y[i], expect, rtol=2e-4, atol=2e-4)
    # valid region is ~zero-mean unit-std
    assert abs(y[0].mean()) < 1e-3


def test_normalize_batch_all_features():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 4)).astype(np.float32) * 3 - 1
    seq = np.array([16, 9], np.int32)
    y = np.asarray(audio.normalize_batch(jnp.asarray(x), jnp.asarray(seq),
                                         "all_features"))
    for i, n in enumerate(seq):
        valid = x[i, :n].reshape(-1)
        expect = (x[i] - valid.mean()) / (valid.std(ddof=1) + audio.CONSTANT)
        np.testing.assert_allclose(y[i], expect, rtol=2e-4, atol=2e-4)


def test_splice_frames_shape_and_content():
    x = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    y = audio.splice_frames(x, 2)
    assert y.shape == (2, 6, 6)
    np.testing.assert_allclose(y[:, 0, 3:], x[:, 1, :])  # shifted copy


def test_filterbank_features_end_to_end():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    batch = np.stack([tone, np.zeros_like(tone)])
    seq = np.array([sr, sr // 2], np.int32)
    cfg = audio.FilterbankConfig()
    feats, lens = jax.jit(
        lambda x, s: audio.filterbank_features(x, s, cfg))(
            jnp.asarray(batch), jnp.asarray(seq))
    feats = np.asarray(feats)
    assert feats.shape[2] == 64
    assert feats.shape[1] % 16 == 0  # pad_to
    np.testing.assert_array_equal(np.asarray(lens),
                                  np.ceil(seq / 160).astype(np.int64))
    # frames past each utterance's length are exactly pad_value
    assert np.all(feats[1, int(lens[1]):] == 0.0)
    # the 440 Hz tone concentrates energy in a low mel bin: the peak of the
    # UN-normalized features should be where 440 Hz lives
    fb = audio.mel_filterbank(sr, cfg.fft_size, 64)
    expect_bin = fb[:, int(round(440 / (sr / cfg.fft_size)))].argmax()
    cfg_raw = audio.FilterbankConfig(normalize="", dither=0.0)
    raw, _ = audio.filterbank_features(jnp.asarray(batch), jnp.asarray(seq),
                                       cfg_raw)
    peak_bin = np.asarray(raw)[0, 10].argmax()
    assert abs(int(peak_bin) - int(expect_bin)) <= 1


def test_filterbank_features_dither_only_in_training():
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 3200)).astype(np.float32))
    seq = jnp.asarray([3200])
    f1, _ = audio.filterbank_features(x, seq, rng=jax.random.key(0),
                                      training=False)
    f2, _ = audio.filterbank_features(x, seq)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    f3, _ = audio.filterbank_features(x, seq, rng=jax.random.key(0),
                                      training=True)
    assert not np.allclose(np.asarray(f1), np.asarray(f3))


def test_spec_augment_masks():
    x = jnp.ones((2, 50, 64))
    y = np.asarray(audio.spec_augment(jax.random.key(0), x, freq_masks=2,
                                      time_masks=2, freq_width=6,
                                      time_width=5))
    assert set(np.unique(y)) <= {0.0, 1.0}
    # masked freq bins: at most 2 bands of width <= 6 each
    zero_freqs = (y[0] == 0).all(0).sum()
    assert 0 <= zero_freqs <= 12
    zero_times = (y[0] == 0).all(1).sum()
    assert 0 <= zero_times <= 10
    # something was actually masked somewhere in the batch
    assert (y == 0).sum() > 0


def test_spec_cutout_rectangles():
    x = jnp.ones((1, 40, 64))
    y = np.asarray(audio.spec_cutout(jax.random.key(1), x, rect_masks=3,
                                     rect_time=5, rect_freq=10))
    n_zero = (y == 0).sum()
    assert 0 < n_zero <= 3 * 5 * 10


def test_resample_preserves_tone():
    sr = 16000
    t = np.arange(sr // 4, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)
    up = np.asarray(audio.resample_linear(jnp.asarray(tone), sr, 2 * sr))
    assert abs(len(up) - 2 * len(tone)) <= 1
    # resampled tone still crosses zero ~2x200 times per second of audio
    crossings = np.sum(np.diff(np.signbit(up[:2 * sr // 4])))
    assert abs(int(crossings) - 2 * 200 // 4) <= 2


def test_speed_perturb_changes_length():
    x = jnp.ones(16000)
    y = audio.speed_perturb(jax.random.key(2), x, 16000,
                            min_rate=1.1, max_rate=1.15)
    assert y.shape[-1] < 16000  # faster speech = fewer samples


def test_tacotron_mel_shape_and_compression():
    wav = jnp.asarray(np.random.default_rng(5).uniform(
        -0.5, 0.5, (2, 22050)).astype(np.float32))
    mel = np.asarray(audio.tacotron_mel(wav))
    assert mel.shape[0] == 2 and mel.shape[2] == 80
    # dynamic range compression: log of clamped magnitude >= log(1e-5)
    assert mel.min() >= np.log(1e-5) - 1e-5


def test_wav_roundtrip(tmp_path):
    sr = 16000
    wav = np.sin(np.linspace(0, 100, sr)).astype(np.float32) * 0.7
    path = str(tmp_path / "t.wav")
    audio.save_wav(path, wav, sr)
    back, rate = audio.load_wav(path)
    assert rate == sr
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_quartznet_cli_from_wavs(tmp_path):
    """wav -> on-device featurizer -> QuartzNet CTC decode, one CLI call."""
    from brevitas_tpu.examples.speech_to_text import main

    sr = 16000
    rng = np.random.default_rng(7)
    paths = []
    for i, n in enumerate([sr // 2, sr // 3]):
        wav = (0.3 * np.sin(2 * np.pi * (200 + 100 * i)
                            * np.arange(n) / sr)).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        audio.save_wav(p, wav, sr)
        paths.append(p)
    res = main(["--model", "tiny", "--wavs", *paths])
    assert res["utterances"] == 2


def test_librispeech_preprocess_cli(tmp_path):
    from brevitas_tpu.examples.preprocess_librispeech import main

    sr = 16000
    d = tmp_path / "data" / "spk" / "chap"
    d.mkdir(parents=True)
    for i in range(2):
        wav = np.zeros(sr // 4, np.float32)
        audio.save_wav(str(d / f"spk-chap-{i:04d}.wav"), wav, sr)
    (d / "spk-chap.trans.txt").write_text(
        "spk-chap-0000 HELLO WORLD\nspk-chap-0001 GOOD DAY\n")
    manifest = str(tmp_path / "dev.json")
    feats_out = str(tmp_path / "feats.npz")
    entries = main(["--data-dir", str(tmp_path / "data"),
                    "--manifest", manifest, "--features-out", feats_out])
    assert [e["text"] for e in entries] == ["hello world", "good day"]
    assert all(abs(e["duration"] - 0.25) < 1e-6 for e in entries)
    z = np.load(feats_out)
    assert z["features"].shape[0] == 2 and z["features"].shape[2] == 64
    assert list(z["transcripts"]) == ["hello world", "good day"]
    lines = [__import__("json").loads(l) for l in open(manifest)]
    assert len(lines) == 2 and "audio_filepath" in lines[0]


def test_melgan_preprocess_cli(tmp_path):
    from brevitas_tpu.examples.text_to_speech import main

    wav = (0.4 * np.sin(2 * np.pi * 440 * np.arange(22050 // 4) / 22050)
           ).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio.save_wav(p, wav, 22050)
    res = main(["--preprocess-wavs", p, "--out-dir", str(tmp_path)])
    mel = np.load(res["mels_written"][0])
    assert mel.shape[1] == 80
    assert mel.min() >= np.log(1e-5) - 1e-5


def test_quartznet_ctc_qat_training_learns():
    """SpecAugment + QuartzNet fake-quant forward + optax CTC in one jitted
    step: loss must collapse on the synthetic pattern->letter task."""
    from brevitas_tpu.examples.speech_to_text import train

    model, losses = train(steps=30, batch=4, frames=32, log=None)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
