"""QuantMoE + expert/sequence parallelism tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from brevitas_tpu.nn import QuantMoE
from brevitas_tpu.parallel import (
    make_mesh,
    shard_model_by_rules,
    shard_sequence,
)
from brevitas_tpu.parallel.rules import expert_parallel_rules
from brevitas_tpu.quant import presets

W8 = presets.Int8WeightPerChannelFloat
A8 = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)
U8 = presets.Uint8ActPerTensorFloat.let(collect_stats_steps=1)


def make_moe(**kw):
    kw.setdefault("top_k", 2)
    kw.setdefault("weight_quant", W8)
    return QuantMoE(16, 32, 4, rngs=nnx.Rngs(0), **kw)


def test_moe_forward_shapes_and_jit():
    moe = make_moe(input_quant=A8, hidden_act_quant=U8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 16)).astype(np.float32))
    y, aux = moe(x, return_aux_loss=True)
    assert y.shape == x.shape
    assert np.isfinite(float(aux)) and float(aux) > 0

    @nnx.jit
    def fwd(m, x):
        return m(x)

    yj = fwd(moe, x)
    assert yj.shape == x.shape


def test_moe_matches_dense_expert_compute_with_big_capacity():
    """With capacity >= T (no drops), routed output must equal explicitly
    computing every expert densely and combining with renormalized top-k
    gates."""
    moe = make_moe(capacity_factor=100.0, use_bias=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
    y = moe(x)

    from brevitas_tpu.nn.moe import _fold, _unfold

    probs = jax.nn.softmax(moe.router(x), axis=-1)
    gv, gi = jax.lax.top_k(probs, moe.top_k)
    gv = gv / (jnp.sum(gv, -1, keepdims=True) + 1e-9)
    w1 = _unfold(moe.w1_quant(_fold(moe.w1[...])).value, 4)
    w2 = _unfold(moe.w2_quant(_fold(moe.w2[...])).value, 4)
    # dense: every expert on every token
    h = jax.nn.relu(jnp.einsum("td,edh->eth", x, w1) + moe.b1[...])
    dense = jnp.einsum("eth,ehd->etd", h, w2) + moe.b2[...]  # (E,T,D)
    expect = jnp.zeros_like(x)
    for j in range(moe.top_k):
        expect = expect + gv[:, j, None] * jnp.take_along_axis(
            jnp.moveaxis(dense, 0, 1), gi[:, j, None, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_moe_capacity_drops_tokens():
    """Tiny capacity must drop overflow tokens (zeros from the FFN path)
    rather than corrupt shapes or crash."""
    moe = make_moe(capacity_factor=0.05, top_k=1, use_bias=False)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (32, 16)).astype(np.float32))
    y = moe(x)
    # capacity = ceil(32/4*0.05) = 1 slot/expert -> at most 4 tokens served
    served = np.sum(np.any(np.asarray(y) != 0, axis=-1))
    assert served <= 4


def test_moe_per_expert_per_channel_scales():
    moe = make_moe()
    from brevitas_tpu.nn.moe import _fold

    qw = moe.w1_quant(_fold(moe.w1[...]))
    assert qw.scale.shape == (1, 4 * 32)
    scales = np.asarray(qw.scale).reshape(4, 32)
    # independent experts should not share scales
    assert not np.allclose(scales[0], scales[1])


def test_moe_trains():
    moe = make_moe(input_quant=A8, hidden_act_quant=U8)
    opt = nnx.Optimizer(moe, optax.adam(1e-2), wrt=nnx.Param)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))

    @nnx.jit
    def step(m, o, x, tgt):
        def loss_fn(mm):
            y, aux = mm(x, return_aux_loss=True)
            return jnp.mean((y - tgt) ** 2) + 0.01 * aux

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        o.update(m, grads)
        return loss

    losses = [float(step(moe, opt, x, tgt)) for _ in range(20)]
    assert losses[-1] < losses[0]
    # router must receive gradient through the gates
    assert float(jnp.sum(jnp.abs(moe.router.kernel[...]))) > 0


def test_moe_expert_parallel_matches_single_device():
    mesh = make_mesh((("expert", 4), ("data", 2)))
    moe = make_moe(capacity_factor=4.0)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (16, 16)).astype(np.float32))
    y_ref = moe(x)
    used = shard_model_by_rules(moe, mesh, expert_parallel_rules("expert"))
    assert any("w1" in p for p in used)
    state = nnx.state(moe, nnx.Param)
    w1_shard = state["w1"].get_value().sharding
    assert w1_shard.spec == jax.sharding.PartitionSpec("expert", None, None)

    @nnx.jit
    def fwd(m, x):
        return m(x)

    y_sharded = fwd(moe, x)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_sequence_parallel_forward_matches_unsharded():
    from brevitas_tpu.models.transformer import quant_transformer_tiny
    from brevitas_tpu.utils import eval_mode

    model = quant_transformer_tiny(vocab_size=64, max_len=32,
                                   rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.default_rng(5).integers(
        0, 64, (2, 16)).astype(np.int32))
    model(ids)  # collect stats
    eval_mode(model)
    y_ref = model(ids)

    mesh = make_mesh((("seq", 8),))
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, ids):
        m = nnx.merge(graphdef, state)
        x = m.embed(ids) + m.pos[...][: ids.shape[1]]
        x = shard_sequence(x, mesh, "seq")
        for blk in m.blocks:
            x = shard_sequence(blk(x, causal=True), mesh, "seq")
        return m.head(m.ln_f(x))

    y_seq = fwd(state, ids)
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_moe_top_k_validation():
    with pytest.raises(ValueError):
        QuantMoE(8, 16, 4, top_k=5, weight_quant=W8, rngs=nnx.Rngs(0))


def test_moe_integer_bias_quant():
    """Regression: (E,1,B) accumulator scale must not be flattened inside
    BiasQuantizer (broke every requires_input_scale bias config)."""
    moe = make_moe(input_quant=A8, hidden_act_quant=U8,
                   bias_quant=presets.Int32Bias)
    moe.b1[...] = jnp.asarray(np.random.default_rng(0).standard_normal(
        moe.b1.shape).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (8, 16)).astype(np.float32))
    y = moe(x)
    assert y.shape == (8, 16)
    assert bool(np.isfinite(np.asarray(y)).all())


def test_expert_rules_with_prefix():
    """Regression: a scoped prefix ('blocks/0/moe/') must still match the
    top-of-module w1/w2/b1/b2 leaves."""
    import re

    rules = expert_parallel_rules("expert", prefix="blocks/0/moe/")
    pats = [r[0] for r in rules]
    assert any(re.search(p, "blocks/0/moe/w1") for p in pats)
    assert any(re.search(p, "blocks/0/moe/b2") for p in pats)
    # no substring false positives
    plain = [r[0] for r in expert_parallel_rules("expert")]
    assert not any(re.search(p, "raw1") for p in plain)


def test_sharded_paths_excludes_degraded_specs():
    """Regression: a rule that degrades to full replication (axis size does
    not divide the dim) must not be reported as sharded."""
    mesh = make_mesh((("expert", 3),))  # 4 experts % 3 != 0
    moe = make_moe()
    used = shard_model_by_rules(moe, mesh, expert_parallel_rules("expert"))
    assert "w1" not in used and "w2" not in used
