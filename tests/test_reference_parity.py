"""Head-to-head parity vs the ACTUAL reference (imported from
/root/reference/src via parity.refbridge).

This is the driver metric made into tests: same topology, same data, same
bit-widths, same optimizer/loss/schedule in both frameworks, assert the top-1
delta. Measured full-matrix results live in PARITY.md §"Measured head-to-head"
(run via ``python -m parity.run_parity``).

Reference recipe matched: `/root/reference/src/brevitas_examples/bnn_pynq/trainer.py:200-285`.
"""

import numpy as np
import pytest

from parity.refbridge import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not importable")


def test_reference_imports_and_runs():
    """The dependency-injection shim resolves real reference quantizers."""
    import torch

    from brevitas.nn import QuantLinear
    from brevitas.quant.scaled_int import Int8WeightPerChannelFloat

    layer = QuantLinear(8, 4, bias=True, weight_bit_width=4)
    out = layer(torch.randn(2, 8))
    assert out.shape == (2, 4)
    layer_pc = QuantLinear(8, 4, bias=False,
                           weight_quant=Int8WeightPerChannelFloat)
    assert tuple(layer_pc.quant_weight().scale.shape) == (4, 1)
    loss = layer(torch.randn(2, 8)).sum()
    loss.backward()
    assert float(layer.weight.grad.norm()) > 0  # STE passes gradients


@pytest.mark.slow
@pytest.mark.parametrize("config,tol", [("tfc_1w1a", 0.04), ("tfc_2w2a", 0.04)])
def test_tfc_accuracy_parity(config, tol):
    """Train the same TFC in both frameworks for 10 epochs on the same data
    with the same batch order; top-1 within ``tol`` (full 20-epoch matrix in
    PARITY.md measured |delta| <= 0.014)."""
    from parity.run_parity import run_config

    row = run_config(config, epochs=10, batch_size=64, lr=0.02,
                     with_logits=False)
    assert abs(row["delta"]) <= tol, row


@pytest.mark.slow
def test_lstm_accuracy_parity():
    """Recurrent family head-to-head: the same QuantLSTM row-sequence
    classifier (28 steps x 28 features digits, float linear head, CE loss)
    trained in both frameworks; top-1 within 8 points at 3 epochs (short
    schedule + recurrent quant noise needs a wider band than the MLP rows)."""
    from parity.run_parity import run_config

    row = run_config("lstm_8w8a", epochs=3, batch_size=64, lr=0.005,
                     with_logits=False)
    assert row["tpu_top1"] > 0.6, row
    assert abs(row["delta"]) <= 0.08, row


@pytest.mark.slow
def test_lstm_checkpoint_import_logit_parity():
    """Import a briefly-trained reference QuantLSTM state dict into our
    twin: every tensor (packed gate weights, biases, all 12 act-quant
    scales, float head) must land, and eval logits must agree closely.
    Exact bit-parity is not expected here: the reference sums
    (x@W + h@U) + b per gate per timestep while we hoist (x@W + b) out of
    the scan, so f32 addition order differs and quant-grid boundary
    crossings amplify it over 28 recurrent steps (measured ~6e-3)."""
    import jax.numpy as jnp
    import torch

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from parity.run_parity import (
        build_reference_lstm,
        build_tpu_lstm,
        digits_dataset,
        epoch_batches,
    )

    x_train, y_train, x_test, y_test = digits_dataset("tfc")
    ref = build_reference_lstm(8, 8, seed=0)
    opt = torch.optim.Adam(ref.parameters(), lr=0.005)
    crit = torch.nn.CrossEntropyLoss()
    xt = torch.from_numpy(np.transpose(x_train, (0, 3, 1, 2)).copy())
    yt = torch.from_numpy(y_train.astype(np.int64))
    ref.train()
    for sel in epoch_batches(len(x_train), 64, seed=0)[:8]:
        sel = np.asarray(sel)
        loss = crit(ref(xt[sel]), yt[sel])
        opt.zero_grad()
        loss.backward()
        opt.step()
    ref.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    model = build_tpu_lstm(8, 8, seed=1)
    rep = import_torch_state_dict(model, sd)
    assert not rep.skipped and not rep.unmatched_torch \
        and not rep.unmatched_ours, str(rep)
    assert len(rep.loaded) >= 26, rep.loaded
    model.eval_mode()
    with torch.no_grad():
        xe = torch.from_numpy(np.transpose(x_test, (0, 3, 1, 2)).copy())
        logits_ref = ref(xe).numpy()
    logits_tpu = np.asarray(model(jnp.asarray(x_test)))
    assert float(np.abs(logits_tpu - logits_ref).max()) < 0.05
    agree = float((logits_tpu.argmax(-1) == logits_ref.argmax(-1)).mean())
    assert agree > 0.9, agree


@pytest.mark.slow
def test_reference_checkpoint_import_logit_parity():
    """Train the reference TFC_1W2A briefly, import its state dict into the
    brevitas_tpu twin, and require (near-)bit-exact eval logits."""
    from parity.run_parity import (
        logits_parity,
        parse_config,
        train_eval_reference,
    )

    arch, w, a, in_bw = parse_config("tfc_1w2a")
    _, ref_model = train_eval_reference(arch, w, a, in_bw, epochs=3,
                                        batch_size=64, lr=0.02)
    max_delta, agree = logits_parity(arch, w, a, in_bw, ref_model)
    # binary weights + 2-bit acts import bit-exactly (measured 0.0)
    assert max_delta <= 1e-4, max_delta
    assert agree == 1.0


@pytest.mark.slow
def test_reference_quant_weight_numerics_match():
    """The two frameworks' INT weight fake-quant laws agree on the same
    tensor: build a reference QuantLinear, copy its weight into the twin,
    compare quant_weight() elementwise (per-tensor and per-channel)."""
    import jax.numpy as jnp
    import torch
    from flax import nnx

    from brevitas.nn import QuantLinear as RefQuantLinear
    from brevitas.quant.scaled_int import (
        Int8WeightPerChannelFloat,
        Int8WeightPerTensorFloat,
    )

    from brevitas_tpu.nn import QuantLinear
    from brevitas_tpu.quant import presets

    for ref_q, tpu_q in [(Int8WeightPerTensorFloat,
                          presets.Int8WeightPerTensorFloat),
                         (Int8WeightPerChannelFloat,
                          presets.Int8WeightPerChannelFloat)]:
        torch.manual_seed(0)
        ref = RefQuantLinear(16, 8, bias=False, weight_quant=ref_q)
        qw_ref = ref.quant_weight().value.detach().numpy()  # (out, in)
        tpu = QuantLinear(16, 8, use_bias=False, weight_quant=tpu_q,
                          rngs=nnx.Rngs(0))
        tpu.weight[...] = jnp.asarray(ref.weight.detach().numpy().T)
        qw_tpu = np.asarray(tpu.quant_weight().value).T
        np.testing.assert_allclose(qw_tpu, qw_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("hadamard", [False, True])
def test_proxylessnas_checkpoint_import_logit_parity(hadamard):
    """Reduced-topology ProxylessNAS (incl. the Hadamard head): the
    reference-initialized checkpoint imports into the twin with logits
    matching to quant-tie noise (round-3 verdict #3)."""
    import torch

    import jax.numpy as jnp

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.utils import eval_mode
    from parity.run_parity import (
        build_reference_proxyless,
        build_tpu_proxyless,
        digits_dataset,
    )

    ref = build_reference_proxyless(4, seed=7, hadamard=hadamard)
    tpu = build_tpu_proxyless(4, seed=0, hadamard=hadamard)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    import_torch_state_dict(tpu, sd)
    eval_mode(tpu)
    ref.eval()

    _, _, x_test, _ = digits_dataset("cnv")
    x = x_test[:64]
    with torch.no_grad():
        l_ref = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))).contiguous())
        l_ref = (l_ref.value if hasattr(l_ref, "value") else l_ref).numpy()
    l_tpu = tpu(jnp.asarray(x))
    l_tpu = np.asarray(getattr(l_tpu, "value", l_tpu))
    span = float(np.abs(l_ref).max()) + 1e-9
    assert np.abs(l_ref - l_tpu).max() < 0.05 * span + 1e-4, (
        hadamard, float(np.abs(l_ref - l_tpu).max()), span)


@pytest.mark.slow
def test_melgan_checkpoint_import_waveform_parity():
    """Reference 8-bit MelGAN generator imports into the twin; waveforms
    agree to quant-tie noise (round-3 verdict #8; full metric table in
    PARITY.md via parity/melgan_parity.py)."""
    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from parity.melgan_parity import (
        build_reference_generator,
        build_tpu_generator,
        forward_ref,
        forward_tpu,
        synth_mels,
    )

    ref = build_reference_generator()
    tpu = build_tpu_generator()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    import_torch_state_dict(tpu, sd)

    mel = synth_mels(2, 16, np.random.default_rng(3))
    wav_ref = forward_ref(ref, mel)
    wav_tpu = forward_tpu(tpu, mel)
    n = min(wav_ref.shape[-1], wav_tpu.shape[-1])
    a, b = wav_ref[..., :n], wav_tpu[..., :n]
    rel_l2 = float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12))
    assert rel_l2 < 0.15, rel_l2
