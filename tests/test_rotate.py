"""QuaRot-style rotation fusion (graph/rotate.py). No reference analogue
(later Brevitas ships rotation equalization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import brevitas_tpu.graph as G
from brevitas_tpu.models.transformer import QuantTransformer
from brevitas_tpu.quant import presets
from brevitas_tpu.utils import eval_mode


@pytest.fixture
def rng():
    return np.random.default_rng(123456)


def test_random_hadamard_is_orthogonal():
    for n in (4, 32, 128):
        r = G.random_hadamard(n, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(r @ r.T), np.eye(n), atol=1e-5)
    with pytest.raises(ValueError, match="power of two"):
        G.hadamard_matrix(12)


def test_rotation_preserves_linear_pair_function(rng):
    class Pair(nnx.Module):
        def __init__(self, rngs):
            self.a = nnx.Linear(16, 64, rngs=rngs)
            self.b = nnx.Linear(64, 8, rngs=rngs)

        def __call__(self, x):
            return self.b(self.a(x))  # linear connection: rotation is exact

    m = Pair(nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    y0 = m(x)
    G.apply_rotation(m, [("a", "b")])
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    # block-diagonal variant also exact
    G.apply_rotation(m, [("a", "b")], block_size=16)
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)


def test_rotation_through_attention_heads(rng):
    """v_proj → out_proj rotation commutes through softmax attention when
    block-diagonal per head — verified on the real transformer in float
    mode."""
    m = QuantTransformer(
        vocab_size=50, dim=32, depth=2, num_heads=4, max_len=16,
        weight_quant=presets.NoneWeightQuant, act_quant=presets.NoneActQuant,
        uact_quant=presets.NoneActQuant, rngs=nnx.Rngs(0))
    eval_mode(m)
    ids = jnp.asarray(rng.integers(0, 50, (2, 16)).astype(np.int32))
    y0 = m(ids)
    pairs, bs = G.transformer_rotation_pairs(m)
    assert bs == 8
    G.apply_rotation(m, pairs, block_size=bs)
    np.testing.assert_allclose(np.asarray(m(ids)), np.asarray(y0),
                               rtol=2e-3, atol=2e-4)
    # full-dim rotation would NOT commute through per-head attention:
    y_rot = m(ids)
    G.apply_rotation(m, pairs[:1])  # block_size = embed_dim
    assert float(jnp.max(jnp.abs(m(ids) - y_rot))) > 1e-3


def test_rotation_spreads_outliers_and_helps_quant(rng):
    """A source with a few huge output channels: rotation flattens the
    intermediate distribution and cuts per-tensor quant error."""
    class Pair(nnx.Module):
        def __init__(self, rngs):
            self.a = nnx.Linear(16, 64, rngs=rngs)
            self.b = nnx.Linear(64, 8, rngs=rngs)

        def __call__(self, x):
            return self.b(self.a(x))

    def build():
        m = Pair(nnx.Rngs(0))
        scale = jnp.ones((64,)).at[3].set(50.0).at[41].set(30.0)
        m.a.kernel[...] = m.a.kernel[...] * scale[None, :]
        return m

    x = jnp.asarray(rng.standard_normal((128, 16)).astype(np.float32))

    def peak_to_rms(h):
        return float(jnp.max(jnp.abs(h)) / jnp.sqrt(jnp.mean(h ** 2)))

    m = build()
    h_before = m.a(x)
    m_rot = build()
    G.apply_rotation(m_rot, [("a", "b")])
    h_after = m_rot.a(x)
    assert peak_to_rms(h_after) < peak_to_rms(h_before) / 3

    def ptq_err(m):
        y_float = m(x)
        G.quantize(m, act_quant=presets.Int8ActPerTensorFloat.let(
            collect_stats_steps=1, bit_width=6))
        with G.calibration_mode(m):
            m(x)
        eval_mode(m)
        return float(jnp.mean((m(x) - y_float) ** 2))

    assert ptq_err(m_rot) < ptq_err(build())
