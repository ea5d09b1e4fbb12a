"""Pipeline parallelism (parallel/pipeline.py): GPipe forward, 1F1B
training schedule, heterogeneous-stage padding — on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from brevitas_tpu.parallel.pipeline import (
    onef1b_schedule,
    pipeline_apply,
    pipeline_train_step,
    stack_stage_params,
    stack_stage_params_padded,
)

S = 4
D = 16


def _mesh():
    return Mesh(np.array(jax.devices()[:S]), ("stage",))


def _stage_fn(params, x):
    w, b = params["w"], params["b"]
    return jnp.tanh(x @ w + b)


def _make_params(key, widths=None):
    widths = widths or [D] * (S + 1)
    ks = jax.random.split(key, S)
    return [dict(w=jax.random.normal(ks[i], (widths[i], widths[i + 1])) * 0.5,
                 b=jnp.zeros((widths[i + 1],)))
            for i in range(S)]


def _sequential(params_list, x):
    for p in params_list:
        x = _stage_fn(p, x)
    return x


def _loss(y, labels):
    return jnp.mean((y - labels) ** 2)


def test_onef1b_schedule_is_valid():
    """Timetable sanity: no tick collisions, every dependency arrives a
    tick earlier, 1F1B in-flight bound of S microbatches."""
    M = 6
    units = onef1b_schedule(S, M)
    # one unit per (tick, stage)
    assert len(units) == len(set(units)) == 2 * M * S
    t_of = {(kind, k, s): t for (t, s), (kind, k) in units.items()}
    for k in range(M):
        for s in range(1, S):
            assert t_of[("F", k, s)] > t_of[("F", k, s - 1)]
            assert t_of[("B", k, s - 1)] > t_of[("B", k, s)]
        assert t_of[("B", k, S - 1)] == t_of[("F", k, S - 1)] + 1
    # in-flight bound at stage 0 (the worst case)
    max_ticks = max(t for t, _ in units)
    for t in range(max_ticks + 1):
        fwd_done = sum(1 for k in range(M) if t_of[("F", k, 0)] <= t)
        bwd_done = sum(1 for k in range(M) if t_of[("B", k, 0)] <= t)
        assert fwd_done - bwd_done <= S


def test_gpipe_forward_matches_sequential(rng):
    params = _make_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    y_seq = _sequential(params, x)
    y_pipe = pipeline_apply(_stage_fn, stack_stage_params(params), x,
                            n_micro=8, mesh=_mesh())
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_forward_is_differentiable(rng):
    """Grads flow through the scan/ppermute pipeline program itself."""
    params = _make_params(jax.random.PRNGKey(0))
    stacked = stack_stage_params(params)
    x = jnp.asarray(rng.standard_normal((16, D)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((16, D)).astype(np.float32))
    mesh = _mesh()

    def loss_pipe(stacked):
        return _loss(pipeline_apply(_stage_fn, stacked, x, 4, mesh), labels)

    def loss_seq(params_list):
        return _loss(_sequential(params_list, x), labels)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = stack_stage_params(
        list(jax.grad(loss_seq)(_make_params(jax.random.PRNGKey(0)))))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        g_pipe, g_seq)


@pytest.mark.parametrize("n_micro", [4, 8])
def test_1f1b_train_step_matches_sequential(n_micro, rng):
    """Loss AND parameter grads of the 1F1B step equal the sequential
    full-batch computation (mean loss ⇒ microbatch averaging matches)."""
    params = _make_params(jax.random.PRNGKey(1))
    stacked = stack_stage_params(params)
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    mesh = _mesh()

    loss_pipe, grads = jax.jit(
        lambda sp: pipeline_train_step(_stage_fn, sp, x, labels, _loss,
                                       n_micro, mesh))(stacked)

    def loss_seq(params_list):
        return _loss(_sequential(params_list, x), labels)

    loss_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(loss_pipe), float(loss_ref), rtol=1e-5)
    g_ref_stacked = stack_stage_params(list(g_ref))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        grads, g_ref_stacked)


def test_1f1b_heterogeneous_widths_via_padding(rng):
    """Stages with different true widths [D,24,8,12,D] run padded to the
    max width and match the unpadded sequential computation (zero-padded
    kernels keep padded lanes at zero through tanh)."""
    widths = [D, 24, 8, 12, D]
    d_max = max(widths)
    params = _make_params(jax.random.PRNGKey(2), widths)
    stacked = stack_stage_params_padded(params)
    x = jnp.asarray(rng.standard_normal((16, D)).astype(np.float32))
    x_pad = jnp.pad(x, ((0, 0), (0, d_max - D)))
    labels_true = jnp.asarray(
        rng.standard_normal((16, D)).astype(np.float32))
    labels = jnp.pad(labels_true, ((0, 0), (0, d_max - D)))

    mesh = _mesh()
    loss_pipe, grads = pipeline_train_step(
        _stage_fn, stacked, x_pad, labels, _loss, 4, mesh)

    def loss_seq(params_list):
        y = _sequential(params_list, x)
        # padded lanes are zero on both y_pad and labels beyond D, except
        # labels' first D columns match; the padded loss divides by d_max
        return jnp.sum((y - labels_true) ** 2) / (16 * d_max)

    loss_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(loss_pipe), float(loss_ref), rtol=1e-5)
    # gradients agree on the true (unpadded) regions
    g_ref_stacked = stack_stage_params_padded(list(g_ref))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        grads, g_ref_stacked)


def test_1f1b_quantized_stages_ste_grads(rng):
    """Fake-quant stages: STE custom-VJPs compose with the rematerialized
    backward micro-steps; grads match the sequential quantized model."""
    from brevitas_tpu.core import quant as Q
    from brevitas_tpu.core import stats as St

    def qstage(params, x):
        w = params["w"]
        thr = St.abs_max(w.reshape(1, -1)).reshape(())
        scale = Q.rescaling_scale(thr, jnp.asarray(4.0), signed=True,
                                  narrow_range=True)
        wq = Q.int_quant(w, scale, jnp.asarray(0.0), jnp.asarray(4.0),
                         signed=True, narrow_range=True)
        return jnp.tanh(x @ wq + params["b"])

    params = _make_params(jax.random.PRNGKey(3))
    stacked = stack_stage_params(params)
    x = jnp.asarray(rng.standard_normal((16, D)).astype(np.float32))
    labels = jnp.asarray(rng.standard_normal((16, D)).astype(np.float32))
    mesh = _mesh()

    loss_pipe, grads = pipeline_train_step(
        qstage, stacked, x, labels, _loss, 4, mesh)

    def loss_seq(params_list):
        y = x
        for p in params_list:
            y = qstage(p, y)
        return _loss(y, labels)

    loss_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(loss_pipe), float(loss_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        grads, stack_stage_params(list(g_ref)))
