"""Parallelism tests on the 8-virtual-device CPU mesh — the tier the
reference cannot have (single-device library, SURVEY §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

import brevitas_tpu.nn as qnn
from brevitas_tpu.parallel import make_mesh, shard_model_by_rules
from brevitas_tpu.parallel.data import make_data_parallel_step, shard_batch
from brevitas_tpu.parallel.rules import (
    tensor_parallel_conv_rules,
    tensor_parallel_linear_rules,
)
from brevitas_tpu.quant import presets


def test_make_mesh():
    mesh = make_mesh([("data", 4), ("model", 2)])
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_shard_model_rules_places_weights():
    mesh = make_mesh([("data", 4), ("model", 2)])
    layer = qnn.QuantLinear(16, 8, rngs=nnx.Rngs(0),
                            weight_quant=presets.Int8WeightPerChannelFloat)
    shard_model_by_rules(layer, mesh, tensor_parallel_linear_rules())
    sharding = layer.weight[...].sharding
    assert sharding.spec == P(None, "model")
    # bias (8,) shards over model too
    assert layer.bias[...].sharding.spec == P("model")


def test_data_parallel_step_runs_and_reduces():
    mesh = make_mesh([("data", 8)])
    model = qnn.QuantLinear(
        16, 4, rngs=nnx.Rngs(0),
        weight_quant=presets.Int8WeightPerTensorFloat,
        input_quant=presets.Int8ActPerTensorFloat.let(collect_stats_steps=2))
    opt = nnx.Optimizer(model, optax.sgd(0.1), wrt=nnx.Param)

    def loss_fn(m, batch):
        x, y = batch
        return jnp.mean((m(x) - y) ** 2)

    step = make_data_parallel_step(loss_fn, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    y = rng.standard_normal((32, 4)).astype(np.float32)
    l0 = float(step(model, opt, (x, y)))
    l1 = float(step(model, opt, (x, y)))
    assert np.isfinite(l0) and l1 < l0


def test_distributed_act_stats_agree_across_shards():
    """Two-phase act scaling under shard_map with stats_reduce_mesh_axis:
    every shard must land on the SAME scale despite different local data."""
    from jax import shard_map

    mesh = make_mesh([("data", 4)])
    cfg = presets.Int8ActPerTensorFloat.let(
        collect_stats_steps=1, scaling_stats_op="max",
        stats_reduce_mesh_axis="data")
    from brevitas_tpu.quant.quantizers import ActQuantizer

    quant = ActQuantizer(cfg)
    graphdef, state = nnx.split(quant)

    # shards see very different magnitudes
    x = jnp.concatenate([jnp.full((4, 64), float(i + 1)) for i in range(4)])

    def per_shard(state, xs):
        q = nnx.merge(graphdef, state)
        out = q(xs)
        _, new_state = nnx.split(q)
        return out.value, out.scale, new_state

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P("data", None)),
        out_specs=(P("data", None), P(), P()),
        check_vma=False)
    _, scale, new_state = fn(state, x)
    nnx.update(quant, new_state)
    # global absmax is 4.0 → every shard's threshold must be 4.0
    buf = float(quant.scaling.buffer[...])
    np.testing.assert_allclose(buf, 4.0, rtol=1e-6)


def test_shard_batch_layout():
    mesh = make_mesh([("data", 8)])
    x = np.ones((16, 3), np.float32)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data", None)


def test_combined_tp_rules_leave_conv_kernels_alone():
    """Review finding: rank-2 linear rules must not grab rank-4 conv kernels."""
    from brevitas_tpu.parallel.rules import (
        tensor_parallel_conv_rules,
        tensor_parallel_linear_rules,
    )

    mesh = make_mesh([("data", 4), ("model", 2)])

    class M(nnx.Module):
        def __init__(self):
            r = nnx.Rngs(0)
            self.lin = qnn.QuantLinear(16, 8, weight_quant=None, rngs=r)
            self.conv = qnn.QuantConv2d(4, 8, 2, weight_quant=None, rngs=r)

        def __call__(self, x):
            return x

    m = M()
    shard_model_by_rules(
        m, mesh,
        tensor_parallel_linear_rules() + tensor_parallel_conv_rules())
    assert m.lin.weight[...].sharding.spec == P(None, "model")
    # conv kernel (2,2,4,8): model axis on OUTPUT channels only
    assert m.conv.weight[...].sharding.spec == P(None, None, None, "model")


def test_rules_with_missing_axis_replicate():
    mesh = make_mesh([("data", 8)])  # no "model" axis
    layer = qnn.QuantLinear(16, 8, weight_quant=None, rngs=nnx.Rngs(0))
    shard_model_by_rules(layer, mesh, tensor_parallel_linear_rules())
    assert layer.weight[...].sharding.spec in (P(), P(None, None))


def test_host_eval_batches_rejects_indivisible():
    from brevitas_tpu.parallel.data import host_eval_batches

    x = np.ones((100, 3), np.float32)
    y = np.ones((100,), np.int32)
    with np.testing.assert_raises(ValueError):
        list(host_eval_batches(x, y, global_batch=10, process_index=0,
                               process_count=3))


def test_pipeline_parallel_matches_sequential(rng):
    """4-stage quantized MLP pipeline over the mesh equals sequential
    application (closes the PP row absent from the reference)."""
    import jax.numpy as jnp2

    from brevitas_tpu.core import quant as Q
    from brevitas_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

    mesh = make_mesh([("stage", 4)])
    d = 16

    def stage_fn(params, x):
        w, b = params["w"], params["b"]
        # int8 fake-quant weights inside the stage
        scale = jnp2.max(jnp2.abs(w)) / 127.0
        wq = Q.int_quant(w, scale, jnp2.asarray(0.0), jnp2.asarray(8.0),
                         signed=True, narrow_range=True)
        return jnp2.tanh(x @ wq + b)

    params_list = [
        {"w": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)) * 0.5,
         "b": jnp.asarray(rng.standard_normal(d).astype(np.float32)) * 0.1}
        for _ in range(4)]
    x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))

    y_seq = x
    for p_i in params_list:
        y_seq = stage_fn(p_i, y_seq)

    stacked = stack_stage_params(params_list)
    from jax.sharding import NamedSharding

    stacked = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P("stage"))), stacked)
    y_pipe = pipeline_apply(stage_fn, stacked, x, n_micro=4, mesh=mesh)
    np.testing.assert_allclose(y_pipe, y_seq, rtol=1e-5, atol=1e-5)


def test_tensor_parallel_int8_serving_matches_unsharded(rng):
    """Integer-serving twins shard column-parallel over the model axis
    (w_int over output channels; dequant scale + folded bias follow) and
    the sharded jit output equals the single-device serving output."""
    import brevitas_tpu.graph as G
    from brevitas_tpu.parallel.rules import tensor_parallel_int_serving_rules
    from brevitas_tpu.utils import eval_mode

    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)

    class MLP(nnx.Module):
        def __init__(self, rngs):
            self.l1 = qnn.QuantLinear(
                32, 64, use_bias=True, rngs=rngs,
                weight_quant=presets.Int8WeightPerChannelFloat,
                input_quant=act)
            self.l2 = qnn.QuantLinear(
                64, 16, use_bias=True, rngs=rngs,
                weight_quant=presets.Int8WeightPerChannelFloat,
                input_quant=act.let())

        def __call__(self, x):
            return self.l2(jax.nn.relu(self.l1(x)))

    m = MLP(nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    m(x)  # collect act stats
    eval_mode(m)
    G.convert_integer_inference(m)
    assert type(m.l1).__name__ == "Int8InferenceLinear"

    graphdef, state = nnx.split(m)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    y_ref = np.asarray(jax.jit(fwd)(state, x))

    mesh = make_mesh([("model", 8)])
    sharded = shard_model_by_rules(m, mesh, tensor_parallel_int_serving_rules())
    assert any(p.endswith("w_int") for p in sharded), sharded
    assert any(p.endswith("w_scale") for p in sharded), sharded
    _, state_sh = nnx.split(m)
    y_tp = np.asarray(jax.jit(fwd)(state_sh, x))
    np.testing.assert_allclose(y_tp, y_ref, rtol=1e-6, atol=1e-6)


def test_tensor_parallel_int8_conv_serving_matches_unsharded(rng):
    """Conv serving twins: HWIO int8 kernels shard over O with their
    per-channel scales; sharded == unsharded."""
    import brevitas_tpu.graph as G
    from brevitas_tpu.parallel.rules import tensor_parallel_int_serving_rules
    from brevitas_tpu.utils import eval_mode

    act = presets.Int8ActPerTensorFloat.let(collect_stats_steps=1)

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.c1 = qnn.QuantConv2d(
                3, 16, 3, padding=[(1, 1), (1, 1)], use_bias=True, rngs=rngs,
                weight_quant=presets.Int8WeightPerChannelFloat,
                input_quant=act)
            self.c2 = qnn.QuantConv2d(
                16, 8, 1, use_bias=False, rngs=rngs,
                weight_quant=presets.Int8WeightPerChannelFloat,
                input_quant=act.let())

        def __call__(self, x):
            return self.c2(jax.nn.relu(self.c1(x)))

    m = Net(nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    m(x)
    eval_mode(m)
    G.convert_integer_inference(m)
    assert type(m.c1).__name__ == "Int8InferenceConv"

    graphdef, state = nnx.split(m)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    y_ref = np.asarray(jax.jit(fwd)(state, x))
    mesh = make_mesh([("model", 8)])
    sharded = shard_model_by_rules(m, mesh, tensor_parallel_int_serving_rules())
    assert any(p.endswith("w_int") for p in sharded), sharded
    _, state_sh = nnx.split(m)
    y_tp = np.asarray(jax.jit(fwd)(state_sh, x))
    np.testing.assert_allclose(y_tp, y_ref, rtol=1e-6, atol=1e-6)


def test_head_parallel_int8_attention_serving_matches_unsharded(rng):
    """Int8InferenceAttention shards head-parallel (q/k/v column-parallel
    head-major, out_proj row-parallel) and stays bit-equal: the int32
    out_proj accumulation is psum'd before the fp32 dequant epilogue."""
    import brevitas_tpu.graph as G
    from brevitas_tpu.graph.convert_int import Int8InferenceAttention
    from brevitas_tpu.nn import QuantMultiheadAttention
    from brevitas_tpu.parallel.rules import (
        tensor_parallel_attention_serving_rules,
    )
    from brevitas_tpu.utils import eval_mode

    E, H = 64, 8  # one head per device on the 8-way mesh
    a8 = presets.Int8ActPerTensorFloat.let(collect_stats_steps=2)
    mha = QuantMultiheadAttention(
        E, H, weight_quant=presets.Int8WeightPerChannelFloat,
        in_proj_input_quant=a8.let(), q_quant=a8.let(),
        k_quant=a8.let(), v_quant=a8.let(),
        attn_probs_quant=presets.Uint8ActPerTensorFloat.let(
            collect_stats_steps=2),
        out_proj_input_quant=a8.let(), rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.standard_normal((2, 12, E)).astype(np.float32))
    with G.calibration_mode(mha):
        mha(x, causal=True)
        mha(x * 0.7, causal=True)
    eval_mode(mha)
    twin = Int8InferenceAttention(mha)

    graphdef, state = nnx.split(twin)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x, causal=True)

    y_ref = np.asarray(jax.jit(fwd)(state, x))

    mesh = make_mesh([("model", 8)])
    sharded = shard_model_by_rules(
        twin, mesh, tensor_parallel_attention_serving_rules())
    assert any("q_proj/w_int" in p for p in sharded), sharded
    assert any("out_proj/w_int" in p for p in sharded), sharded
    _, state_sh = nnx.split(twin)
    y_tp = np.asarray(jax.jit(fwd)(state_sh, x))
    np.testing.assert_allclose(y_tp, y_ref, rtol=1e-6, atol=1e-6)

    # decode path: int8 KV cache decode under the same sharding
    kc, vc = twin.init_decode_cache(2, 16)
    y0, kc, vc = twin.decode_step(x[:, :1], kc, vc, 0)
    y1, _, _ = twin.decode_step(x[:, 1:2], kc, vc, 1)
    assert np.isfinite(np.asarray(y0)).all() and np.isfinite(np.asarray(y1)).all()
