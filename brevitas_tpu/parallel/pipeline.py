"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Each device on the ``stage`` axis owns one stage's parameters; activations
flow stage-to-stage with ``jax.lax.ppermute`` (ICI neighbor exchange) while
every stage works on a different microbatch — the standard bubble-filled
schedule (cost: (S-1) bubble ticks for S stages on M microbatches).

Constraint of this minimal schedule: every stage maps activations of one
fixed shape to the same shape (equal-width stages), so the rotating buffer is
a single array. Quantized stages work unchanged — quantizer state lives in
the per-stage parameter shard.
"""

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray


def pipeline_apply(stage_fn: Callable, stacked_params, x: Array,
                   n_micro: int, mesh: Mesh, axis: str = "stage") -> Array:
    """Run ``stage_fn(params_i, act)`` as an S-stage pipeline.

    - ``stacked_params``: pytree whose leaves have a leading stage axis S
      (stage i's parameters at index i), sharded over ``axis``.
    - ``x``: (batch, d) input, batch divisible by ``n_micro``.
    Returns stage_{S-1}(...stage_0(x)) for the full batch.
    """
    s = mesh.shape[axis]
    batch = x.shape[0]
    assert batch % n_micro == 0
    mb = batch // n_micro
    micro = x.reshape(n_micro, mb, *x.shape[1:])
    ticks = n_micro + s - 1

    def per_stage(params, micro_local):
        # params: this stage's slice (leading axis 1) — unstack it
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        act = jnp.zeros_like(micro_local[0])
        outs = jnp.zeros_like(micro_local)

        def body(t, carry):
            act, outs = carry
            # stage 0 ingests microbatch t (when available)
            feed = micro_local[jnp.minimum(t, n_micro - 1)]
            inp = jnp.where(stage == 0, feed, act)
            out = stage_fn(params, inp)
            # last stage emits microbatch t-(S-1)
            out_idx = t - (s - 1)
            valid = (stage == s - 1) & (out_idx >= 0)
            outs = jax.lax.cond(
                valid,
                lambda o: o.at[jnp.maximum(out_idx, 0)].set(out),
                lambda o: o,
                outs)
            act = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % s) for i in range(s)])
            return act, outs

        _, outs = jax.lax.fori_loop(0, ticks, body, (act, outs))
        # deliver outputs from the last stage to every device
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


def stack_stage_params(params_list: Sequence):
    """Stack per-stage parameter pytrees along a new leading stage axis
    (leaves must agree in shape across stages — equal-width stages)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params_list)
