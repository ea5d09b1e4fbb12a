"""Pipeline parallelism: GPipe forward and 1F1B training over a mesh axis.

Each device on the ``stage`` axis owns one stage's parameters; activations
flow stage-to-stage with ``jax.lax.ppermute`` (ICI neighbor exchange) while
every stage works on a different microbatch.

Two schedules:

- :func:`pipeline_apply` — GPipe forward (S-1 bubble ticks), now built on
  ``lax.scan`` so the whole pipeline is reverse-mode differentiable (grads
  flow through ``ppermute`` via its transpose).
- :func:`pipeline_train_step` — a REAL 1F1B training step: forward and
  backward micro-steps interleave so at most S microbatch activations are
  in flight per stage (vs M for GPipe), with per-stage parameter-gradient
  accumulation and microbatch loss averaging. The timetable is the
  alternating-parity schedule: stage ``s`` runs the forward of microbatch
  ``k`` at tick ``2k + s`` and its backward at tick ``2k + 2S - 1 - s``.
  Forward ticks have parity ``s`` and backward ticks parity ``s + 1``, so
  units never collide, every dependency arrives exactly one tick earlier
  (fwd activations hop ``s→s+1``, grads hop ``s+1→s``), and in-flight
  microbatches per stage are bounded by ``S`` — the 1F1B memory property.
  Total ticks: ``2M + 2S - 2``. Backward micro-steps REMATERIALIZE the
  stage forward from the stashed input (``jax.vjp``), the standard
  recompute-1F1B.

Heterogeneous stage widths: SPMD runs one program on every stage, so
communicated buffers share one shape; :func:`stack_stage_params_padded`
zero-pads per-stage parameter pytrees to common leaf shapes. Zero-padded
rows/columns of linear/conv kernels leave the padded activation lanes at
zero, so any stage stack whose elementwise ops fix 0 (relu, tanh, identity;
NOT bias-adds into padded lanes) computes exactly the unpadded composition.

Quantized stages work unchanged — quantizer state lives in the per-stage
parameter shard, and the STE custom-VJPs compose with ``jax.vjp`` inside
the backward micro-step.
"""

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jnp.ndarray


def pipeline_apply(stage_fn: Callable, stacked_params, x: Array,
                   n_micro: int, mesh: Mesh, axis: str = "stage") -> Array:
    """Run ``stage_fn(params_i, act)`` as an S-stage GPipe forward.

    - ``stacked_params``: pytree whose leaves have a leading stage axis S
      (stage i's parameters at index i), sharded over ``axis``.
    - ``x``: (batch, d) input, batch divisible by ``n_micro``.
    Returns stage_{S-1}(...stage_0(x)) for the full batch. Differentiable:
    the scan/ppermute graph transposes, so ``jax.grad`` through this is a
    valid (GPipe-scheduled) pipeline backward.
    """
    s = mesh.shape[axis]
    batch = x.shape[0]
    assert batch % n_micro == 0
    mb = batch // n_micro
    micro = x.reshape(n_micro, mb, *x.shape[1:])
    ticks = n_micro + s - 1

    def per_stage(params, micro_local):
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        act = jnp.zeros_like(micro_local[0])
        outs = jnp.zeros_like(micro_local)

        def body(carry, t):
            act, outs = carry
            feed = micro_local[jnp.minimum(t, n_micro - 1)]
            inp = jnp.where(stage == 0, feed, act)
            out = stage_fn(params, inp)
            out_idx = t - (s - 1)
            valid = (stage == s - 1) & (out_idx >= 0)
            outs = jax.lax.cond(
                valid,
                lambda o: o.at[jnp.maximum(out_idx, 0)].set(out),
                lambda o: o,
                outs)
            act = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % s) for i in range(s)])
            return (act, outs), None

        (_, outs), _ = jax.lax.scan(body, (act, outs), jnp.arange(ticks))
        outs = jax.lax.psum(
            jnp.where(stage == s - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    fn = shard_map(
        per_stage, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False)
    outs = fn(stacked_params, micro)
    return outs.reshape(batch, *x.shape[1:])


def pipeline_train_step(stage_fn: Callable, stacked_params, x: Array,
                        labels: Array, loss_fn: Callable, n_micro: int,
                        mesh: Mesh, axis: str = "stage"):
    """One 1F1B-scheduled training step.

    - ``stage_fn(params_i, act) -> act`` — one stage's forward; the
      inter-stage activation must have the same shape as the (padded)
      input microbatch.
    - ``loss_fn(y, labels_mb) -> scalar`` — applied at the LAST stage per
      microbatch; the returned loss (and the gradients) average over
      microbatches, matching the sequential ``loss_fn(model(x), labels)``
      with a mean-reducing loss.

    Returns ``(loss, grads)`` with ``grads`` shaped like ``stacked_params``
    (leading stage axis, sharded over ``axis``).
    """
    S = mesh.shape[axis]
    M = n_micro
    batch = x.shape[0]
    assert batch % M == 0
    mb = batch // M
    micro = x.reshape(M, mb, *x.shape[1:])
    micro_labels = labels.reshape(M, mb, *labels.shape[1:])
    ticks = 2 * M + 2 * S - 2

    def per_stage(params, micro_local, labels_local):
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        act_shape = jax.eval_shape(stage_fn, params, micro_local[0])
        assert act_shape.shape == micro_local[0].shape, (
            "1F1B requires stage outputs shaped like the (padded) input "
            f"microbatch; got {act_shape.shape} vs {micro_local[0].shape}")

        zeros_act = jnp.zeros_like(micro_local[0])
        state = dict(
            act_recv=zeros_act,          # forward activation from stage-1
            grad_recv=zeros_act,         # output gradient from stage+1
            stash=jnp.zeros((S,) + zeros_act.shape, zeros_act.dtype),
            gacc=jax.tree_util.tree_map(jnp.zeros_like, params),
            loss=jnp.zeros((), jnp.float32),
        )

        fwd_perm = [(i, (i + 1) % S) for i in range(S)]
        bwd_perm = [(i, (i - 1) % S) for i in range(S)]

        def do_fwd(state, k):
            inp = jnp.where(stage == 0, micro_local[jnp.minimum(k, M - 1)],
                            state["act_recv"])
            out = stage_fn(params, inp)
            state = dict(state, stash=state["stash"].at[k % S].set(inp))
            return state, out

        def do_bwd(state, k):
            primal_in = state["stash"][k % S]

            def last_stage(_):
                # loss seed + grads in one rematerialized pass
                def head(p, xin):
                    y = stage_fn(p, xin)
                    return loss_fn(y, labels_local[jnp.minimum(k, M - 1)]) / M

                loss_k, (gp, gi) = jax.value_and_grad(
                    head, argnums=(0, 1))(params, primal_in)
                return loss_k, gp, gi

            def mid_stage(_):
                _, vjp = jax.vjp(lambda p, xin: stage_fn(p, xin),
                                 params, primal_in)
                gp, gi = vjp(state["grad_recv"])
                return jnp.zeros((), jnp.float32), gp, gi

            loss_k, gp, gi = jax.lax.cond(stage == S - 1, last_stage,
                                          mid_stage, operand=None)
            state = dict(
                state,
                gacc=jax.tree_util.tree_map(jnp.add, state["gacc"], gp),
                loss=state["loss"] + loss_k)
            return state, gi

        def body(state, t):
            kf = (t - stage) // 2
            is_fwd = ((t - stage) % 2 == 0) & (kf >= 0) & (kf < M)
            kb = (t - (2 * S - 1 - stage)) // 2
            is_bwd = ((t - (2 * S - 1 - stage)) % 2 == 0) & (kb >= 0) & (kb < M)

            state, fwd_out = jax.lax.cond(
                is_fwd, do_fwd, lambda st, _k: (st, zeros_act), state, kf)
            state, bwd_out = jax.lax.cond(
                is_bwd, do_bwd, lambda st, _k: (st, zeros_act), state, kb)

            state = dict(
                state,
                act_recv=jax.lax.ppermute(fwd_out, axis, fwd_perm),
                grad_recv=jax.lax.ppermute(bwd_out, axis, bwd_perm))
            return state, None

        state, _ = jax.lax.scan(body, state, jnp.arange(ticks))
        loss = jax.lax.psum(state["loss"], axis)  # only last stage nonzero
        grads = jax.tree_util.tree_map(lambda g: g[None], state["gacc"])
        return loss, grads

    fn = shard_map(
        per_stage, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(axis)),
        check_vma=False)
    return fn(stacked_params, micro, micro_labels)


def onef1b_schedule(n_stages: int, n_micro: int):
    """The (tick → unit) timetable of :func:`pipeline_train_step`, exposed
    for testing: returns ``{(t, s): ('F'|'B', k)}``."""
    units = {}
    for s in range(n_stages):
        for k in range(n_micro):
            units[(2 * k + s, s)] = ("F", k)
            units[(2 * k + 2 * n_stages - 1 - s, s)] = ("B", k)
    return units


def stack_stage_params(params_list: Sequence):
    """Stack per-stage parameter pytrees along a new leading stage axis
    (leaves must agree in shape across stages — equal-width stages)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params_list)


def stack_stage_params_padded(params_list: Sequence):
    """Stack per-stage parameter pytrees with zero-padding to common leaf
    shapes — heterogeneous stage widths under the SPMD one-program
    constraint. Zero rows/columns keep padded activation lanes at zero
    through linear/conv + zero-fixing activations, so the padded pipeline
    computes exactly the unpadded stage composition."""
    leaves_list = [jax.tree_util.tree_leaves(p) for p in params_list]
    treedef = jax.tree_util.tree_structure(params_list[0])
    n = len(leaves_list[0])
    stacked = []
    for i in range(n):
        leaves = [ls[i] for ls in leaves_list]
        rank = {l.ndim for l in leaves}
        assert len(rank) == 1, "per-stage leaves must share rank"
        target = tuple(max(l.shape[d] for l in leaves)
                       for d in range(leaves[0].ndim))
        padded = [jnp.pad(l, [(0, t - s) for s, t in zip(l.shape, target)])
                  for l in leaves]
        stacked.append(jnp.stack(padded))
    return jax.tree_util.tree_unflatten(treedef, stacked)
