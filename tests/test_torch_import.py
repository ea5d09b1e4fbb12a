"""Reference-checkpoint import bridge (brevitas_tpu/interop/torch_import.py).

Oracle: torch (CPU) layers with the same weights — after import, our layers
must reproduce torch's float forward exactly (layout transforms are the thing
under test), and reference-layout quantizer-state keys must land in our
quantizer state machines.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from flax import nnx

import brevitas_tpu.nn as qnn
from brevitas_tpu.interop import import_torch_state_dict, load_torch_checkpoint
from brevitas_tpu.quant import presets
from brevitas_tpu.quant.config import ScalingImplType
from brevitas_tpu.utils import eval_mode

NONE = dict(weight_quant=presets.NoneWeightQuant,
            input_quant=presets.NoneActQuant)


def _sd(module: torch.nn.Module, prefix=""):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


def test_linear_layout_matches_torch():
    t = torch.nn.Linear(6, 4)
    ours = qnn.QuantLinear(6, 4, rngs=nnx.Rngs(0), **NONE)
    rep = import_torch_state_dict(ours, _sd(t, "lin."))
    assert any("weight" in k for k in rep.loaded)
    x = np.random.default_rng(0).standard_normal((3, 6)).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(ours(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_and_grouped_conv1d_layouts():
    t2 = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)
    ours2 = qnn.QuantConv2d(3, 8, 3, stride=2, padding=[(1, 1), (1, 1)],
                            rngs=nnx.Rngs(0), **NONE)
    import_torch_state_dict(ours2, _sd(t2))
    x = np.random.default_rng(1).standard_normal((2, 3, 9, 9)).astype(
        np.float32)
    want = t2(torch.from_numpy(x)).detach().numpy()       # NCHW
    got = np.asarray(ours2(jnp.asarray(x.transpose(0, 2, 3, 1))))  # NHWC
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)

    t1 = torch.nn.Conv1d(4, 4, 5, padding=2, groups=4)  # depthwise
    ours1 = qnn.QuantConv1d(4, 4, 5, padding=[(2, 2)], groups=4,
                            rngs=nnx.Rngs(0), **NONE)
    import_torch_state_dict(ours1, _sd(t1))
    x1 = np.random.default_rng(2).standard_normal((2, 4, 16)).astype(
        np.float32)
    want1 = t1(torch.from_numpy(x1)).detach().numpy()
    got1 = np.asarray(ours1(jnp.asarray(x1.transpose(0, 2, 1))))
    np.testing.assert_allclose(got1.transpose(0, 2, 1), want1,
                               rtol=1e-4, atol=1e-4)


def test_convtranspose_layout():
    t = torch.nn.ConvTranspose1d(3, 5, 4, stride=2, padding=1)
    ours = qnn.QuantConvTranspose1d(3, 5, 4, stride=2, padding=[(1, 1)],
                                    rngs=nnx.Rngs(0), **NONE)
    import_torch_state_dict(ours, _sd(t))
    x = np.random.default_rng(3).standard_normal((2, 3, 8)).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(ours(jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_and_tensornorm_import():
    t = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        t.weight.mul_(1.7)
        t.bias.add_(0.3)
        t.running_mean.add_(0.5)
        t.running_var.mul_(2.0)
    t.eval()

    class M(nnx.Module):
        def __init__(self):
            self.bn = nnx.BatchNorm(6, use_running_average=True,
                                    rngs=nnx.Rngs(0))

    m = M()
    rep = import_torch_state_dict(m, _sd(t, "bn."))
    assert len([k for k in rep.loaded]) == 4
    x = np.random.default_rng(4).standard_normal((2, 6, 4, 4)).astype(
        np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(m.bn(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_act_scaling_value_import_sets_scale_and_counter():
    """A trained reference act scale (ParameterFromRuntimeStats .value key)
    must become our eval-time scale, with collection fast-forwarded."""
    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=10)
    ours = qnn.QuantLinear(4, 4, rngs=nnx.Rngs(0),
                           weight_quant=presets.NoneWeightQuant,
                           input_quant=act)
    sd = {
        "fc.weight": np.eye(4, dtype=np.float32),
        "fc.input_quant.fused_activation_quant_proxy.tensor_quant."
        "scaling_impl.value": np.asarray(2.54, np.float32),
    }
    rep = import_torch_state_dict(ours, sd)
    assert any("input_quant.scaling.value" in k for k in rep.loaded)
    assert int(ours.input_quant.scaling.counter[...]) > 10  # handoff done
    eval_mode(ours)
    x = jnp.full((1, 4), 10.0)  # way past the 2.54 threshold -> clamps
    y = np.asarray(ours(x))
    # non-narrow signed int8: scale = 2.54 / 128, clamp at 127 * scale
    np.testing.assert_allclose(y, 2.54 * 127 / 128, rtol=1e-5)


def test_runtime_stats_buffer_import():
    act = presets.Int8ActPerTensorFloat.let(
        scaling_impl=ScalingImplType.STATS)
    ours = qnn.QuantIdentity(act)
    sd = {"q.act_quant.fused_activation_quant_proxy.tensor_quant."
          "scaling_impl.runtime_stats.running_stats":
          np.asarray(1.27, np.float32)}
    rep = import_torch_state_dict(ours, sd)
    assert any("scaling.buffer" in k for k in rep.loaded)
    eval_mode(ours)
    y = np.asarray(ours(jnp.full((1, 4), 99.0)))
    np.testing.assert_allclose(y, 1.27 * 127 / 128, rtol=1e-5)


def test_weight_param_scaling_and_per_channel_reshape():
    wq = presets.Int8WeightPerChannelFloat.let(
        scaling_impl=ScalingImplType.PARAMETER)
    ours = qnn.QuantLinear(3, 2, rngs=nnx.Rngs(0), weight_quant=wq)
    # reference per-channel value shape (O, 1) -> ours (1, O)
    sd = {"l.weight": np.ones((2, 3), np.float32),
          "l.weight_quant.tensor_quant.scaling_impl.value":
          np.asarray([[0.5], [2.0]], np.float32)}
    rep = import_torch_state_dict(ours, sd)
    assert any("weight_quant.scaling.value" in k for k in rep.loaded)
    np.testing.assert_allclose(
        np.asarray(ours.weight_quant.scaling.value[...]), [[0.5, 2.0]])


def test_full_model_order_matching():
    """conv-bn-relu-linear with arbitrary reference names: order-by-kind
    matching wires everything without a name map."""
    tconv = torch.nn.Conv2d(1, 4, 3, padding=1)
    tbn = torch.nn.BatchNorm2d(4)
    tlin = torch.nn.Linear(4, 2)
    tbn.eval()
    sd = {}
    sd.update(_sd(tconv, "features.0."))
    sd.update(_sd(tbn, "features.1."))
    sd.update({"features.2.act_quant.fused_activation_quant_proxy."
               "tensor_quant.scaling_impl.value":
               np.asarray(3.0, np.float32)})
    sd.update(_sd(tlin, "classifier.0."))

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.conv = qnn.QuantConv2d(1, 4, 3, padding=[(1, 1), (1, 1)],
                                        rngs=rngs, **NONE)
            self.bn = nnx.BatchNorm(4, use_running_average=True, rngs=rngs)
            self.relu = qnn.QuantReLU(
                presets.Uint8ActPerTensorFloat.let(collect_stats_steps=2))
            self.lin = qnn.QuantLinear(4, 2, rngs=rngs, **NONE)

        def __call__(self, x):
            h = self.relu(self.bn(self.conv(x)))
            return self.lin(h.mean(axis=(1, 2)))

    m = Net(nnx.Rngs(0))
    rep = import_torch_state_dict(m, sd)
    assert not rep.unmatched_torch and not rep.unmatched_ours, str(rep)
    x = np.random.default_rng(5).standard_normal((2, 1, 6, 6)).astype(
        np.float32)
    with torch.no_grad():
        h = torch.relu(tbn(tconv(torch.from_numpy(x)))).clamp(max=3.0)
        want = tlin(h.mean(dim=(2, 3))).numpy()
    eval_mode(m)
    got = np.asarray(m(jnp.asarray(x.transpose(0, 2, 3, 1))))
    # our ReLU is quantized at threshold 3.0 -> small grid error only
    np.testing.assert_allclose(got, want, atol=0.1)


def test_load_torch_checkpoint_envelope(tmp_path):
    t = torch.nn.Linear(3, 3)
    path = str(tmp_path / "ref.pth")
    torch.save({"state_dict": {"module.fc." + k: v for k, v in
                               t.state_dict().items()},
                "epoch": 7}, path)
    sd = load_torch_checkpoint(path)
    assert set(sd) == {"fc.weight", "fc.bias"}
    ours = qnn.QuantLinear(3, 3, rngs=nnx.Rngs(0), **NONE)
    import_torch_state_dict(ours, sd)
    np.testing.assert_allclose(np.asarray(ours.weight[...]),
                               t.weight.detach().numpy().T)


def test_strict_raises_on_unmatched_weights():
    ours = qnn.QuantLinear(3, 3, rngs=nnx.Rngs(0), **NONE)
    sd = {"a.weight": np.ones((3, 3), np.float32),
          "b.weight": np.ones((3, 3), np.float32)}
    import pytest

    with pytest.raises(ValueError, match="unmatched"):
        import_torch_state_dict(ours, sd)
    rep = import_torch_state_dict(ours, sd, strict=False)
    assert rep.unmatched_torch == ["b"]


def test_recurrent_lstm_import_synthetic():
    """Reference QuantLSTM key layout (per-gate GateParams + cell quantizer
    scales, nn/quant_rnn.py:444-546) lands in our packed-gate layer: gate
    column blocks in (i, f, g, o) order, transposed weights, act scales."""
    H, I = 4, 3
    rng = np.random.default_rng(0)
    sd = {}
    gates = ("input", "forget", "cell", "output")
    for name in gates:
        p = f"rnn.layers.0.0.{name}_gate_params"
        sd[f"{p}.input_weight.weight"] = rng.standard_normal(
            (H, I)).astype(np.float32)
        sd[f"{p}.hidden_weight.weight"] = rng.standard_normal(
            (H, H)).astype(np.float32)
        sd[f"{p}.bias"] = rng.standard_normal((H,)).astype(np.float32)
    act = "fused_activation_quant_proxy.tensor_quant.scaling_impl.value"
    sd[f"rnn.layers.0.0.io_quant.{act}"] = np.float32(0.5)
    sd[f"rnn.layers.0.0.cell.input_acc_quant.{act}"] = np.float32(2.0)
    sd[f"rnn.layers.0.0.cell.cell_state_quant.{act}"] = np.float32(1.5)

    lstm = qnn.QuantLSTM(I, H, rngs=nnx.Rngs(0))
    rep = import_torch_state_dict(lstm, sd)
    assert not rep.unmatched_torch and not rep.unmatched_ours, str(rep)
    layer = lstm.layers[0]
    for g, name in enumerate(gates):
        np.testing.assert_array_equal(
            np.asarray(layer.w_ih[...][:, g * H:(g + 1) * H]),
            sd[f"rnn.layers.0.0.{name}_gate_params.input_weight.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(layer.w_hh[...][:, g * H:(g + 1) * H]),
            sd[f"rnn.layers.0.0.{name}_gate_params.hidden_weight.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(layer.bias[...][g * H:(g + 1) * H]),
            sd[f"rnn.layers.0.0.{name}_gate_params.bias"])
    # io scale reaches both the input quant and the shared hidden-state quant
    assert float(layer.input_quant.scaling.value[...]) == 0.5
    assert float(layer.quants.hidden_state.scaling.value[...]) == 0.5
    assert float(layer.quants.gate_acc.scaling.value[...]) == 2.0
    assert float(layer.quants.cell_state.scaling.value[...]) == 1.5


def test_import_cli_tfc_roundtrip(tmp_path):
    """Fake reference TFC_1W1A checkpoint (the reference trainer's envelope +
    key layout) -> import CLI -> orbax checkpoint -> restored model serves."""
    import jax.numpy as jnp

    from brevitas_tpu import checkpoint as ckpt
    from brevitas_tpu.examples.import_torch import build_arch, main

    g = torch.Generator().manual_seed(0)
    sd = {}
    dims = [(28 * 28, 64), (64, 64), (64, 64), (64, 10)]
    for i, (fi, fo) in enumerate(dims):
        w = torch.empty(fo, fi).uniform_(-1, 1, generator=g)
        sd[f"features.{3 * i + 2}.weight"] = w
    for i, f in enumerate([64, 64, 64]):
        p = f"features.{3 * i + 3}."
        sd[p + "weight"] = torch.ones(f) * 1.5
        sd[p + "bias"] = torch.zeros(f) + 0.1
        sd[p + "running_mean"] = torch.zeros(f) + 0.05
        sd[p + "running_var"] = torch.ones(f) * 0.9
        sd[p + "num_batches_tracked"] = torch.tensor(100)
    for k in ["weight", "bias", "running_mean", "running_var"]:
        sd[f"features.14.{k}"] = (torch.ones(()) if "var" in k or k == "weight"
                                  else torch.zeros(()))
    path = str(tmp_path / "tfc_1w1a.tar")
    torch.save({"state_dict": sd, "epoch": 999, "best_val_acc": 93.17}, path)

    out_dir = str(tmp_path / "ours")
    res = main(["--checkpoint", path, "--arch", "tfc_1w1a", "--out", out_dir])
    assert not res["unmatched_torch"], res

    m = build_arch("tfc_1w1a")
    ckpt.restore(out_dir, m)
    eval_mode(m)
    # imported BN state is live in the forward
    np.testing.assert_allclose(
        np.asarray(m.hidden[1].scale[...]), 1.5)
    w0 = sd["features.2.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(m.hidden[0].weight[...]), w0)
    x = jnp.asarray(np.random.default_rng(0).random((4, 28, 28, 1)),
                    dtype=jnp.float32)
    y = np.asarray(m(x))
    assert y.shape == (4, 10) and np.isfinite(y).all()
