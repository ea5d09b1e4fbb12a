"""End-to-end: QAT training converges; entry points compile and run
(mirror of reference tests/brevitas_end_to_end + examples smoke tests)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx


def test_tfc_trains_on_digits(tmp_path):
    from brevitas_tpu.examples.bnn_pynq import main

    acc = main(["--network", "TFC_1W1A", "--dataset", "digits",
                "--epochs", "2", "--batch-size", "64", "--log-every", "1000",
                "--ckpt-dir", str(tmp_path)])
    assert acc > 0.3  # far above 10% chance after 2 epochs on tiny data


def test_tfc_int4_loss_decreases(rng):
    from brevitas_tpu.examples.bnn_pynq import sqr_hinge_loss
    from brevitas_tpu.models import tfc

    model = tfc(4, 4, 4, dropout=0.0, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, optax.adam(0.01), wrt=nnx.Param)
    x = jnp.asarray(rng.random((64, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 64).astype(np.int32))

    @nnx.jit
    def step(model, optimizer, x, y):
        loss, grads = nnx.value_and_grad(
            lambda m: sqr_hinge_loss(m(x), y))(model)
        optimizer.update(model, grads)
        model.clip_weights(-1.0, 1.0)
        return loss

    losses = [float(step(model, optimizer, x, y)) for _ in range(20)]
    assert losses[-1] < losses[0] * 0.7, losses


def test_cnv_forward_shapes():
    from brevitas_tpu.models import cnv

    model = cnv(1, 1, 8, rngs=nnx.Rngs(0))
    model.eval_mode()
    x = jnp.zeros((2, 32, 32, 3))
    y = model(x)
    assert y.shape == (2, 10)


def test_checkpoint_roundtrip(tmp_path, rng):
    from brevitas_tpu.examples.bnn_pynq import load_checkpoint, save_checkpoint
    from brevitas_tpu.models import tfc

    model = tfc(4, 4, 4, dropout=0.0, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(model, optax.adam(0.01), wrt=nnx.Param)
    x = jnp.asarray(rng.random((8, 28, 28, 1)).astype(np.float32))
    model.eval_mode()
    y_before = model(x)
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, model, optimizer, epoch=3, best_acc=0.5)

    model2 = tfc(4, 4, 4, dropout=0.0, rngs=nnx.Rngs(42))
    optimizer2 = nnx.Optimizer(model2, optax.adam(0.01), wrt=nnx.Param)
    epoch, best = load_checkpoint(path, model2, optimizer2)
    model2.eval_mode()
    np.testing.assert_allclose(model2(x), y_before, rtol=1e-6)
    assert epoch == 4 and best == 0.5  # stored epoch+1: resume starts AFTER


def test_graft_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 10)


def test_dryrun_multichip_8dev():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_ptq_calibrate_cli_mlp(tmp_path):
    """Full PTQ CLI: float train -> equalize -> quantize -> calibrate ->
    bias-correct -> QCDQ export -> integer serving (reference's flexml
    imagenet-calibration entry point, setup.py:51)."""
    from brevitas_tpu.examples.ptq_calibrate import main

    out = main(["--model", "mlp", "--train-epochs", "3",
                "--calib-batches", "2", "--bias-correct-batches", "1",
                "--export", "qcdq",
                "--export-path", str(tmp_path / "m.onnx"),
                "--convert-int"])
    assert out["float_acc"] > 0.8
    assert out["ptq_acc"] > out["float_acc"] - 0.05
    assert out["int_acc"] > out["float_acc"] - 0.05
    assert (tmp_path / "m.onnx").exists()


@pytest.mark.slow
def test_ptq_calibrate_cli_convnet_fixed_point():
    """Conv/BN variant: BN folds into float convs pre-quantization, then the
    flexml 8-bit power-of-two pipeline holds accuracy."""
    from brevitas_tpu.examples.ptq_calibrate import main

    out = main(["--model", "convnet", "--train-epochs", "3",
                "--fixed-point", "--calib-batches", "2",
                "--bias-correct-batches", "1"])
    assert out["float_acc"] > 0.75
    assert out["preprocessed_acc"] == pytest.approx(out["float_acc"], abs=0.02)
    assert out["ptq_acc"] > out["float_acc"] - 0.06
