"""Full PTQ pipeline end-to-end: float training → auto-quantize → calibrate
→ bias-correct → integer serving, with accuracy preserved (the reference's
tests/brevitas_end_to_end analogue, using digits instead of torchvision)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.examples.bnn_pynq import load_digits_upscaled
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode, train_mode


class FloatMLP(nnx.Module):
    def __init__(self, rngs):
        self.l1 = nnx.Linear(784, 128, rngs=rngs)
        self.l2 = nnx.Linear(128, 64, rngs=rngs)
        self.l3 = nnx.Linear(64, 10, rngs=rngs)

    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(self.l1(x))
        x = jax.nn.relu(self.l2(x))
        return self.l3(x)


def _accuracy(model, x, y):
    logits = model(jnp.asarray(x))
    return float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(y)))


@pytest.mark.slow
def test_ptq_pipeline_preserves_accuracy():
    x_train, y_train = load_digits_upscaled("train")
    x_test, y_test = load_digits_upscaled("test")

    # 1. float training
    model = FloatMLP(nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(m, o, x, y):
        loss, grads = nnx.value_and_grad(
            lambda mm: optax.softmax_cross_entropy_with_integer_labels(
                mm(x), y).mean())(m)
        o.update(m, grads)
        return loss

    for ep in range(5):
        for i in range(0, len(x_train) - 128, 128):
            step(model, opt, jnp.asarray(x_train[i:i + 128]),
                 jnp.asarray(y_train[i:i + 128]))
    float_acc = _accuracy(model, x_test, y_test)
    assert float_acc > 0.8, float_acc

    # 2. PTQ: quantize + calibrate + bias-correct
    G.quantize(model,
               weight_quant=presets.Int8WeightPerChannelFloat,
               act_quant=presets.Int8ActPerTensorFloat.let(
                   collect_stats_steps=4))
    with G.calibration_mode(model):
        for i in range(0, 512, 128):
            model(jnp.asarray(x_train[i:i + 128]))
    eval_mode(model)
    with G.bias_correction_mode(model):
        for i in range(0, 256, 128):
            model(jnp.asarray(x_train[i:i + 128]))
    ptq_acc = _accuracy(model, x_test, y_test)
    assert ptq_acc > float_acc - 0.03, (float_acc, ptq_acc)

    # 3. integer serving twins
    G.convert_integer_inference(model)
    assert isinstance(model.l1, G.Int8InferenceLinear)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        int_acc = _accuracy(model, x_test[:128], y_test[:128])
    # compare against fake-quant accuracy on the same slice
    assert int_acc > 0.7, int_acc
