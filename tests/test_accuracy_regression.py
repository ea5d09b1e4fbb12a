"""Accuracy regression tier (the analogue of reference
tests/brevitas_examples/test_pretrained_accuracy.py — no pretrained downloads
in this image, so regression = short QAT runs must clear convergence bars on
the bundled digits dataset across the bit-width matrix)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from brevitas_tpu.examples.bnn_pynq import sqr_hinge_loss, train_step
from brevitas_tpu.models import cnv, tfc


def _train_digits(model, epochs=3, batch=64, lr=0.02):
    from brevitas_tpu.examples.bnn_pynq import batches, evaluate, load_digits_upscaled

    x_train, y_train = load_digits_upscaled("train")
    x_test, y_test = load_digits_upscaled("test")
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)
    model.train_mode()
    for ep in range(epochs):
        for xb, yb in batches(x_train, y_train, batch, seed=ep):
            train_step(model, opt, jnp.asarray(xb), jnp.asarray(yb))
    return evaluate(model, x_test, y_test, batch_size=128)


# Floors derived from MEASURED 10-epoch values (round 3, post-BN-momentum
# fix): over seeds {0,1,2} single-device CPU — 1W1A 0.883-0.919,
# 1W2A 0.892-0.911, 2W2A 0.961-0.972, 4W4A 0.986-0.989 — and under the
# test env's 8-virtual-device XLA config the 2W2A trajectory lands at
# 0.933 (low-bit training is chaotic across backend configs, ±4 points).
# Floor = min observed − 3 points: tight enough to catch a real semantics
# regression (the round-2 BN-momentum defect cost ~4-6 eval points at
# these budgets), honest about cross-environment variance.
TEN_EPOCH_FLOORS = {(1, 1): 0.853, (1, 2): 0.862, (2, 2): 0.903,
                    (4, 4): 0.956}


@pytest.mark.slow
@pytest.mark.parametrize("w,a", [(1, 1), (1, 2), (2, 2), (4, 4)])
def test_tfc_bit_width_matrix_converges(w, a):
    model = tfc(w, a, in_bit_width=w, dropout=0.0, rngs=nnx.Rngs(0))
    acc = _train_digits(model, epochs=10)
    assert acc > TEN_EPOCH_FLOORS[(w, a)], f"TFC_{w}W{a}A accuracy {acc}"


@pytest.mark.slow
def test_higher_precision_not_worse():
    acc1 = _train_digits(tfc(1, 1, 1, dropout=0.0, rngs=nnx.Rngs(0)), epochs=10)
    acc4 = _train_digits(tfc(4, 4, 4, dropout=0.0, rngs=nnx.Rngs(0)), epochs=10)
    assert acc4 >= acc1 - 0.03


@pytest.mark.slow
def test_cnv_trains_on_synthetic_cifar():
    model = cnv(1, 1, 8, rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(0.01), wrt=nnx.Param)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, 16).astype(np.int32))
    losses = [float(train_step(model, opt, x, y)) for _ in range(10)]
    assert losses[-1] < losses[0], losses  # memorizes a tiny batch
