"""AWQ activation-aware weight quantization (graph/awq.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.graph.calibrate import _set_disable_quant
from brevitas_tpu.nn import QuantLinear
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


class _NormLinear(nnx.Module):
    def __init__(self, din, dout, rngs, *, weight_bits=4.0, act_quant=True):
        self.norm = nnx.RMSNorm(din, rngs=rngs)
        self.lin = QuantLinear(
            din, dout, use_bias=False,
            weight_quant=presets.Int8WeightPerTensorFloat.let(
                bit_width=weight_bits),
            input_quant=presets.Int8ActPerTensorFloat.let(
                collect_stats_steps=2) if act_quant else None,
            rngs=rngs)

    def __call__(self, x):
        return self.lin(self.norm(x))


def _spiky_inputs(rng, n=256, d=32):
    """A few channels carry 20x-larger activations — the regime AWQ targets
    (salient channels dominate the weight-quant output error)."""
    x = rng.standard_normal((n, d)).astype(np.float32)
    x[:, :4] *= 20.0
    return jnp.asarray(x)


def test_awq_function_preserving_in_float(rng):
    m = _NormLinear(32, 16, nnx.Rngs(0))
    x = _spiky_inputs(rng)
    m(x)
    eval_mode(m)
    _set_disable_quant(m, True)
    y0 = np.asarray(m(x))
    G.apply_awq(m, [(["norm"], ["lin"])], [x], forward_fn=lambda mm, b: mm(b))
    _set_disable_quant(m, True)
    y1 = np.asarray(m(x))
    _set_disable_quant(m, False)
    np.testing.assert_allclose(y1, y0, rtol=1e-3, atol=1e-4)


def test_awq_reduces_weight_quant_error_on_spiky_acts(rng):
    """Weight-only 4-bit (the w4a16 regime AWQ targets): with salient
    activation channels the alpha search must engage (alpha > 0) and the
    migrated model must reconstruct the float output no worse — and, on this
    fixed seed, measurably better — than plain per-tensor quantization.
    (alpha=0 is in the grid, so AWQ can never lose on its search data.)"""
    x = _spiky_inputs(rng)

    def quant_err(apply_awq: bool):
        m = _NormLinear(32, 16, nnx.Rngs(0), act_quant=False)
        m(x)
        eval_mode(m)
        _set_disable_quant(m, True)
        y_float = np.asarray(m(x))
        alpha = None
        if apply_awq:
            res = G.apply_awq(m, [(["norm"], ["lin"])], [x],
                              forward_fn=lambda mm, b: mm(b))
            alpha = res[0][0]
        _set_disable_quant(m, False)
        eval_mode(m)
        y_q = np.asarray(m(x))
        return float(np.mean((y_q - y_float) ** 2)), alpha

    err_plain, _ = quant_err(False)
    err_awq, alpha = quant_err(True)
    assert alpha is not None and alpha > 0.0
    assert err_awq < err_plain * 0.99, (err_awq, err_plain)


def test_awq_on_llama_regions(rng):
    from brevitas_tpu.models import QuantLlama, llama_smoothquant_regions

    m = QuantLlama(vocab_size=64, dim=32, depth=1, num_heads=2, bit_width=4,
                   rngs=nnx.Rngs(0))
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)))
    res = G.apply_awq(m, llama_smoothquant_regions(m), [ids],
                      forward_fn=lambda mm, b: mm(b))
    assert set(res) == {0, 1}
    alphas = [a for a, _ in res.values()]
    assert all(0.0 <= a <= 1.0 for a in alphas)
    with G.calibration_mode(m):
        m(ids)
        m(ids[:, ::-1])
    eval_mode(m)
    logits = m(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_llm_ptq_cli_awq_smoke():
    from brevitas_tpu.examples.llm_ptq import main

    res = main(["--arch", "llama", "--train-steps", "8", "--batch", "8",
                "--seq-len", "24", "--dim", "32", "--depth", "1",
                "--heads", "2", "--calib-batches", "2", "--awq",
                "--bit-width", "4"])
    assert res["awq"] and not res["smoothquant"]
    assert np.isfinite(res["quant_bpc"])
