"""Rotation-based outlier smoothing (QuaRot/SpinQuant-family,
arXiv:2404.00456 / arXiv:2405.16406).

Beyond the reference snapshot (later Brevitas ships rotation equalization):
fuse a random orthogonal Hadamard rotation R into a LINEARLY-connected
(source, sink) weight pair — source output channels rotate by R, sink input
channels by Rᵀ — so the float function is exactly preserved while the
intermediate activation distribution becomes incoherent (outlier energy
spreads across channels), which per-tensor quantization handles far better.

The canonical exact site in a transformer is v_proj → out_proj: attention is
linear in V per head (softmax coefficients don't depend on V), so a
per-head block-diagonal rotation commutes through it. Paths with a
nonlinearity between source and sink (fc1 → relu → fc2) are NOT valid
rotation sites — use :func:`~brevitas_tpu.graph.apply_act_equalization`
there instead.
"""

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.graph.base import get_module

Array = jnp.ndarray


def hadamard_matrix(n: int) -> Array:
    """Orthonormal Sylvester-Hadamard matrix; n must be a power of two."""
    if n & (n - 1):
        raise ValueError(f"Hadamard size must be a power of two, got {n}")
    h = jnp.ones((1, 1), jnp.float32)
    while h.shape[0] < n:
        h = jnp.block([[h, h], [h, -h]])
    return h / math.sqrt(n)


def random_hadamard(n: int, key) -> Array:
    """Hadamard with random column sign flips — still orthogonal
    ((HD)ᵀ(HD) = D Hᵀ H D = I), randomized so fixed weight structure cannot
    align with the transform."""
    signs = jax.random.rademacher(key, (n,), dtype=jnp.float32)
    return hadamard_matrix(n) * signs[None, :]


def _kernel_ref(module):
    if hasattr(module, "weight"):
        return module.weight
    if hasattr(module, "kernel"):
        return module.kernel
    raise ValueError(f"no kernel on {type(module).__name__}")


def apply_rotation(
    model: nnx.Module,
    pairs: Sequence[Tuple[str, str]],
    *,
    block_size: Optional[int] = None,
    key=None,
) -> List[Array]:
    """Rotate each (src, sink) Linear pair in place; returns the per-pair
    block rotation matrices (needed only for inspection — the fusion is
    self-contained). ``block_size`` restricts R to block-diagonal with that
    block (e.g. head_dim when attention sits between src and sink)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    used = []
    for i, (src_path, sink_path) in enumerate(pairs):
        src = get_module(model, src_path)
        sink = get_module(model, sink_path)
        w_src = _kernel_ref(src)
        w_sink = _kernel_ref(sink)
        n = w_src[...].shape[-1]
        if w_sink[...].shape[0] != n:
            raise ValueError(
                f"{src_path}->{sink_path}: src out dim {n} != sink in dim "
                f"{w_sink[...].shape[0]}")
        bs = block_size or n
        if n % bs:
            raise ValueError(f"rotation dim {n} not divisible by block {bs}")
        r = random_hadamard(bs, jax.random.fold_in(key, i))
        used.append(r)

        ws = w_src[...]
        w_src[...] = (ws.reshape(*ws.shape[:-1], n // bs, bs) @ r).reshape(
            ws.shape)
        bias = getattr(src, "bias", None)
        if bias is not None and bias[...] is not None:
            b = bias[...]
            bias[...] = (b.reshape(n // bs, bs) @ r).reshape(b.shape)
        wk = w_sink[...]
        blocks = wk.reshape(n // bs, bs, -1)
        w_sink[...] = jnp.einsum("ji,bjo->bio", r, blocks).reshape(wk.shape)
    return used


def transformer_rotation_pairs(model) -> Tuple[List[Tuple[str, str]], int]:
    """The exact rotation sites of the quant transformer: each block's
    v_proj → out_proj, block-diagonal per attention head. Returns
    (pairs, block_size)."""
    pairs = [(f"blocks.{i}.attn.v_proj", f"blocks.{i}.attn.out_proj")
             for i in range(len(model.blocks))]
    return pairs, model.blocks[0].attn.head_dim
