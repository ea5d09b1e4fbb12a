"""Mixed-precision bit-width search example (examples/mixed_precision.py)."""

import numpy as np

from brevitas_tpu.examples.mixed_precision import main


def test_mixed_precision_search_reduces_bit_widths():
    r = main(["--epochs", "6", "--bw-lr", "0.06",
              "--weight-decay-bw", "0.15", "--act-decay-bw", "0.05"])
    # the penalty pulls precision below the 8-bit start...
    assert r["mean_weight_bit_width"] < 8.0
    assert r["mean_act_bit_width"] < 8.0
    # ...while every width stays on the legal integer grid
    for path, bw in r["per_quantizer_bit_widths"].items():
        assert 2.0 <= bw <= 8.0 and bw == round(bw), (path, bw)
    # and the task still trains (digits is easy; loose floor)
    assert r["test_acc"] > 0.85


def test_mixed_precision_no_penalty_keeps_eight_bits():
    r = main(["--epochs", "2", "--weight-decay-bw", "0.0",
              "--act-decay-bw", "0.0"])
    assert r["mean_weight_bit_width"] == 8.0
    assert r["mean_act_bit_width"] == 8.0


def test_quant_grid_regularizer_pulls_weights_to_grid(rng):
    """Adding the grid regularizer to a frozen-task objective shrinks the
    rounding residual (PARQ-style soft quantization)."""
    import optax

    from flax import nnx

    from brevitas_tpu.losses import quant_grid_regularizer
    from brevitas_tpu.quant import presets
    import brevitas_tpu.nn as qnn

    m = qnn.QuantLinear(16, 8, use_bias=False, rngs=nnx.Rngs(0),
                        weight_quant=presets.Int8WeightPerTensorFloat.let(
                            bit_width=4.0))
    r0 = float(quant_grid_regularizer(m))
    assert r0 > 0.01  # random weights sit off-grid
    opt = nnx.Optimizer(m, optax.sgd(0.05), wrt=nnx.Param)

    @nnx.jit
    def step(m, opt):
        loss, grads = nnx.value_and_grad(quant_grid_regularizer)(m)
        opt.update(m, grads)
        return loss

    for _ in range(50):
        step(m, opt)
    r1 = float(quant_grid_regularizer(m))
    assert r1 < 0.3 * r0, (r0, r1)
