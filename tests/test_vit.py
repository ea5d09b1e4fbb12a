"""Quantized Vision Transformer (models/vit.py)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.models import QuantViT, vit_smoothquant_regions, vit_tiny
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def _tiny(bit_width=8, depth=1):
    return vit_tiny(bit_width=bit_width, dim=32, depth=depth, num_heads=2,
                    rngs=nnx.Rngs(0))


def test_vit_forward_shape(rng):
    m = _tiny()
    x = jnp.asarray(rng.random((4, 28, 28, 1), dtype=np.float32))
    y = m(x)
    assert y.shape == (4, 10)
    assert np.all(np.isfinite(np.asarray(y)))


def test_vit_first_layer_stays_8bit():
    m = _tiny(bit_width=4)
    assert float(m.patch.weight_quant.bit_width_impl()) == 8.0
    assert float(m.blocks[0].fc1.weight_quant.bit_width_impl()) == 4.0
    assert float(m.head.weight_quant.bit_width_impl()) == 4.0


def test_vit_qat_loss_decreases(rng):
    m = _tiny()
    opt = nnx.Optimizer(m, optax.adam(1e-3), wrt=nnx.Param)
    x = jnp.asarray(rng.random((32, 28, 28, 1), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, 32).astype(np.int32))

    @nnx.jit
    def step(m, opt, x, y):
        def loss_fn(mm):
            return optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean()
        loss, grads = nnx.value_and_grad(loss_fn)(m)
        opt.update(m, grads)
        return loss

    losses = [float(step(m, opt, x, y)) for _ in range(25)]
    assert losses[-1] < losses[0]


def test_vit_smoothquant_regions_resolve():
    m = _tiny(depth=2)
    regions = vit_smoothquant_regions(m)
    assert len(regions) == 4  # 2 per block
    for srcs, dsts in regions:
        for p in srcs + dsts:
            G.get_module(m, p)  # raises if the path is wrong


def test_vit_ptq_calibrate_and_serve(rng):
    m = _tiny()
    calib = [jnp.asarray(rng.random((16, 28, 28, 1), dtype=np.float32))
             for _ in range(2)]
    G.apply_act_equalization(m, vit_smoothquant_regions(m), calib)
    with G.calibration_mode(m):
        for b in calib:
            m(b)
    eval_mode(m)
    y_fake = m(calib[0])
    G.convert_integer_inference(m)
    twins = (G.find_modules(m, G.Int8InferenceLinear)
             + G.find_modules(m, G.Int8InferenceConv)
             + G.find_modules(m, G.Int8InferenceAttention))
    assert len(twins) > 0
    y_int = m(calib[0])
    # integer serving reproduces the fake-quant model's decisions
    agree = np.mean(np.argmax(np.asarray(y_fake), -1)
                    == np.argmax(np.asarray(y_int), -1))
    assert agree >= 0.9
    err = float(jnp.max(jnp.abs(y_fake - y_int)))
    scale = float(jnp.max(jnp.abs(y_fake))) + 1e-6
    assert err / scale < 0.15
