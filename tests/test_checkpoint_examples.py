"""Orbax checkpoint semantics + speech/TTS CLI smoke tests."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu import checkpoint as ckpt
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


def make_model():
    return qnn.QuantLinear(
        8, 4, rngs=nnx.Rngs(0),
        weight_quant=presets.Int8WeightPerTensorFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=2))


def test_orbax_roundtrip_with_quantizer_state(tmp_path, rng):
    m = make_model()
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    m(x)  # advance counter to 1 (mid-collection)
    assert int(m.input_quant.scaling.counter[...]) == 1
    path = str(tmp_path / "ckpt1")
    ckpt.save(path, m, step=7)

    m2 = make_model()
    step = ckpt.restore(path, m2)
    assert step == 7
    # two-phase counter and EMA buffer round-trip (the state the reference
    # needs custom state_dict surgery for)
    assert int(m2.input_quant.scaling.counter[...]) == 1
    np.testing.assert_allclose(np.asarray(m2.input_quant.scaling.buffer[...]),
                               np.asarray(m.input_quant.scaling.buffer[...]))
    eval_mode(m)
    eval_mode(m2)
    np.testing.assert_allclose(m2(x), m(x))


def test_restore_ignore_missing_float_to_quant(tmp_path, rng):
    """Float checkpoint into a quant model: weights restore, quantizer state
    keeps init (BREVITAS_IGNORE_MISSING_KEYS semantics)."""

    class FloatNet(nnx.Module):
        def __init__(self):
            self.weight = nnx.Param(jnp.full((8, 4), 0.5))
            self.bias = nnx.Param(jnp.zeros(4))

    f = FloatNet()
    path = str(tmp_path / "float_ckpt")
    ckpt.save(path, f)

    q = make_model()
    ckpt.restore(path, q, ignore_missing=True)
    np.testing.assert_allclose(np.asarray(q.weight[...]), 0.5)
    # quantizer state untouched
    assert int(q.input_quant.scaling.counter[...]) == 0


def test_quartznet_cli_smoke(tmp_path):
    from brevitas_tpu.examples.speech_to_text import main

    res = main(["--model", "tiny", "--batches", "1"])
    assert res["utterances"] == 1


def test_melgan_cli_smoke(tmp_path):
    from brevitas_tpu.examples.text_to_speech import main

    res = main(["--batches", "1", "--mel-frames", "16",
                "--out-dir", str(tmp_path)])
    assert res["waveforms"] == 1 and res["samples"] == 16 * 256


def test_ctc_decoder_and_wer():
    from brevitas_tpu.examples.speech_to_text import (
        BLANK,
        greedy_ctc_decode,
        word_error_rate,
    )

    # "ab" with repeats and blanks: a a _ b
    logits = np.full((4, 29), -10.0)
    for t, c in enumerate([1, 1, BLANK, 2]):
        logits[t, c] = 10.0
    assert greedy_ctc_decode(logits) == "ab"
    assert word_error_rate("the cat", "the cat") == 0.0
    assert word_error_rate("the bat", "the cat") == 0.5


def test_serve_demo_continuous_batching():
    from brevitas_tpu.examples.serve import ContinuousBatcher, main

    b = ContinuousBatcher(4, (3,))
    for i in range(10):
        b.submit(np.full((3,), float(i), np.float32))
    batches = list(b.batches())
    assert [n for _, n in batches] == [4, 4, 2]
    assert batches[-1][0].shape == (4, 3)  # padded tail

    res = main(["--requests", "24", "--batch-size", "8"])
    assert res["requests"] == 24 and res["batches"] == 3


def test_lm_trainer_learns():
    from brevitas_tpu.examples.lm import train

    logs = []
    model, losses = train(steps=60, batch=16, seq_len=32, dim=64, depth=1,
                          heads=2, bit_width=8, log=logs.append)
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert logs and "bits/char" in logs[0]


def test_checkpoint_roundtrip_a2q_and_frozen_scale(tmp_path, rng):
    """New quantizer state survives save/restore: the A2Q l1 target `g` and
    a GPTQ/AdaRound-frozen ParameterScaling threshold."""
    import jax.numpy as jnp
    from flax import nnx

    import brevitas_tpu.nn as qnn
    from brevitas_tpu import checkpoint as ckpt
    from brevitas_tpu.graph.learned_round import freeze_weight_scale
    from brevitas_tpu.quant import presets
    from brevitas_tpu.utils import eval_mode

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.a2q = qnn.QuantLinear(
                32, 8,
                weight_quant=presets.Int8AccumulatorAwareWeightPerChannelFloat
                .let(accumulator_bit_width=16),
                input_quant=presets.Uint8ActPerTensorFloat.let(
                    collect_stats_steps=1), rngs=rngs)
            self.lin = qnn.QuantLinear(
                8, 4, weight_quant=presets.Int8WeightPerChannelFloat,
                rngs=rngs)

        def __call__(self, x):
            return self.lin(self.a2q(x))

    m = Net(nnx.Rngs(0))
    x = jnp.abs(jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)))
    m(x)
    freeze_weight_scale(m.lin)  # what GPTQ/AdaRound do before baking
    m.a2q.weight_quant.g[...] = m.a2q.weight_quant.g[...] * 0.7  # "trained"
    eval_mode(m)
    y_ref = m(x)

    path = str(tmp_path / "ptq_ckpt")
    ckpt.save(path, m)
    m2 = Net(nnx.Rngs(1))
    freeze_weight_scale(m2.lin)  # same structure, different values
    ckpt.restore(path, m2)
    eval_mode(m2)
    np.testing.assert_allclose(np.asarray(m2(x)), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2.a2q.weight_quant.g[...]),
                               np.asarray(m.a2q.weight_quant.g[...]))


def test_serve_demo_decode_mode():
    """Token-generation serving: int twins + packed int4 KV cache decode."""
    from brevitas_tpu.examples.serve import main

    r8 = main(["--decode", "--decode-tokens", "12", "--decode-batch", "2",
               "--decode-dim", "32"])
    r4 = main(["--decode", "--decode-tokens", "12", "--decode-batch", "2",
               "--decode-dim", "32", "--kv-bits", "4"])
    assert r8["tokens"] == r4["tokens"] == 24
    assert r8["tokens_per_sec"] > 0 and r4["tokens_per_sec"] > 0
    # nibble packing halves the cache allocation
    assert r4["kv_cache_bytes"] * 2 == r8["kv_cache_bytes"]


def test_bnn_pynq_cfg_matrix_loads():
    """The reference cfg/*.ini matrix (11 configs) resolves to the right
    architectures and bit widths."""
    from brevitas_tpu.examples.bnn_pynq import load_cfg

    import os
    cfg_dir = os.path.join(os.path.dirname(os.path.abspath(
        __import__("brevitas_tpu.examples.bnn_pynq",
                   fromlist=["__file__"]).__file__)), "cfg")
    names = sorted(f[:-4] for f in os.listdir(cfg_dir) if f.endswith(".ini"))
    assert len(names) == 11
    for name in names:
        builder, kw, kind, ds = load_cfg(name)
        fam, tag = name.split("_")
        assert kw["weight_bit_width"] == int(tag[0])
        assert kw["act_bit_width"] == int(tag[2])
        if fam == "cnv":
            assert kind == "cnv" and ds == "cifar10"
            assert kw["in_bit_width"] == 8
        else:
            assert kind == "fc" and ds == "mnist"
            assert kw["in_bit_width"] == int(tag[2])
    # ini bit widths drive the built model
    from flax import nnx
    b, kw, _, _ = load_cfg("sfc_2w2a")
    m = b(rngs=nnx.Rngs(0), **kw)
    assert m.hidden[0].weight[...].shape == (28 * 28, 256)
