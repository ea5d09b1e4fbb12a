"""Quantized multi-head attention.

Beyond reference parity: Brevitas has NO attention layer (SURVEY §2.4 — its
only sequence model is QuantLSTM). This layer applies the same WBIOL
quantization discipline to attention: quantized Q/K/V/O projections
(QuantLinear), activation quantizers on Q/K/V entering the score matmul, on
the post-softmax probabilities (unsigned — softmax output is [0,1]) and on
the attention output — so at inference every matmul including QK^T and PV can
run in the integer domain.

Layout (B, T, D); optional causal masking; cross-attention via separate kv
input.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    Int8WeightPerTensorFloat,
    Uint8ActPerTensorFloat,
)
from brevitas_tpu.quant.quantizers import ActQuantizer, TrainToggleMixin
from brevitas_tpu.quant_tensor import unpack

Array = jnp.ndarray


def apply_rope(x: Array, positions: Array, theta: float = 10000.0) -> Array:
    """Rotary position embedding, Llama rotate-half convention, on
    (B, T, H, D) with ``positions`` (T,) (traced scalars OK after reshape).
    Applied to Q/K BEFORE their activation quantizers, so the int8 serving
    codes are codes of the rotated values (rotation is a float epilogue of
    the projection GEMM)."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.reshape(-1, 1).astype(jnp.float32) * inv  # (T, D/2)
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


class QuantMultiheadAttention(nnx.Module, TrainToggleMixin):

    def __init__(
        self,
        embed_dim: int,
        num_heads: int,
        *,
        use_bias: bool = True,
        weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
        in_proj_input_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
        q_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
        k_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
        v_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
        attn_probs_quant: Optional[QuantConfig] = Uint8ActPerTensorFloat,
        out_proj_input_quant: Optional[QuantConfig] = Int8ActPerTensorFloat,
        use_rope: bool = False,
        rope_theta: float = 10000.0,
        num_kv_heads: Optional[int] = None,
        rngs: nnx.Rngs,
    ):
        assert embed_dim % num_heads == 0
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.use_rope = use_rope
        self.rope_theta = rope_theta
        # grouped-query attention: K/V project to fewer heads and each KV
        # head serves num_heads/num_kv_heads query heads — the KV cache
        # shrinks by that factor (net-new vs reference, like everything here)
        self.num_kv_heads = num_kv_heads or num_heads
        assert num_heads % self.num_kv_heads == 0
        kv_dim = self.num_kv_heads * self.head_dim

        def lin(out_dim=embed_dim):
            return QuantLinear(embed_dim, out_dim, use_bias=use_bias,
                               weight_quant=weight_quant,
                               input_quant=in_proj_input_quant, rngs=rngs)

        self.q_proj = lin()
        self.k_proj = lin(kv_dim)
        self.v_proj = lin(kv_dim)
        self.out_proj = QuantLinear(embed_dim, embed_dim, use_bias=use_bias,
                                    weight_quant=weight_quant,
                                    input_quant=out_proj_input_quant,
                                    rngs=rngs)
        from brevitas_tpu.quant.presets import NoneActQuant

        self.q_quant = ActQuantizer(q_quant or NoneActQuant)
        self.k_quant = ActQuantizer(k_quant or NoneActQuant)
        self.v_quant = ActQuantizer(v_quant or NoneActQuant)
        self.probs_quant = ActQuantizer(attn_probs_quant or NoneActQuant)
        self.compute_dtype = None  # einsum operand dtype; see __call__

    def _split_heads(self, x: Array) -> Array:
        b, t, _ = x.shape
        return x.reshape(b, t, -1, self.head_dim)

    def _expand_kv(self, x: Array) -> Array:
        """(B, T, KVH, D) → (B, T, H, D): each KV head repeats for its query
        group. Applied AFTER the K/V quantizers — repetition of quantized
        values is exact, and the serving cache stores only KVH heads."""
        groups = self.num_heads // self.num_kv_heads
        return jnp.repeat(x, groups, axis=2) if groups > 1 else x

    def __call__(self, x: Array, kv: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 causal: bool = False) -> Array:
        kv = x if kv is None else kv
        q_f = self._split_heads(self.q_proj(x))
        k_f = self._split_heads(self.k_proj(kv))
        if self.use_rope:
            q_f = apply_rope(q_f, jnp.arange(x.shape[1]), self.rope_theta)
            k_f = apply_rope(k_f, jnp.arange(kv.shape[1]), self.rope_theta)
        q = unpack(self.q_quant(q_f))
        k = self._expand_kv(unpack(self.k_quant(k_f)))
        v = self._expand_kv(self._split_heads(unpack(self.v_quant(
            self.v_proj(kv)))))
        if self.compute_dtype is not None:
            # MXU operand dtype for the attention einsums (accumulation and
            # softmax stay f32) — utils.set_compute_dtype sets this alongside
            # the WBIOL layers so bf16 baselines are bf16 end-to-end
            q = q.astype(self.compute_dtype)
            k = k.astype(self.compute_dtype)
            v = v.astype(self.compute_dtype)
        scale = 1.0 / math.sqrt(self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        # large-but-finite mask fill: an all-masked row softmaxes to uniform
        # instead of NaN (which would poison act-quant running stats)
        neg = jnp.finfo(scores.dtype).min / 2
        if causal:
            tq, tk = scores.shape[-2], scores.shape[-1]
            causal_mask = jnp.tril(jnp.ones((tq, tk), bool), tk - tq)
            scores = jnp.where(causal_mask, scores, neg)
        if mask is not None:
            scores = jnp.where(mask, scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = unpack(self.probs_quant(probs)).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(*x.shape[:2], self.embed_dim)
        return self.out_proj(out)

    # -- incremental decoding -------------------------------------------------

    def init_decode_cache(self, batch: int, max_len: int, dtype=None):
        """(k_cache, v_cache) of shape (B, max_len, KVH, D) holding fake-quant
        K/V values (the integer serving twin caches int8 instead). Under GQA
        the cache holds only the KV heads — H/KVH times smaller. Default
        dtype follows ``compute_dtype`` (bf16 models cache bf16 — half the
        decode bandwidth, like any production bf16 serving stack)."""
        dtype = dtype or self.compute_dtype or jnp.float32
        shape = (batch, max_len, self.num_kv_heads, self.head_dim)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    def decode_step(self, x_t: Array, k_cache: Array, v_cache: Array, pos):
        """Attend the single new token ``x_t`` (B, 1, E) against the cache;
        writes this step's K/V at index ``pos`` (traced OK). Returns
        (y_t, k_cache, v_cache). Numerics match the causal full-sequence
        forward at the same position."""
        q_f = self._split_heads(self.q_proj(x_t))
        k_f = self._split_heads(self.k_proj(x_t))
        if self.use_rope:
            pos_arr = jnp.asarray(pos).reshape(1)
            q_f = apply_rope(q_f, pos_arr, self.rope_theta)
            k_f = apply_rope(k_f, pos_arr, self.rope_theta)
        q = unpack(self.q_quant(q_f))
        k_t = unpack(self.k_quant(k_f)).astype(k_cache.dtype)
        v_t = self._split_heads(
            unpack(self.v_quant(self.v_proj(x_t)))).astype(v_cache.dtype)
        if self.compute_dtype is not None:
            q = q.astype(self.compute_dtype)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_t, (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_t, (0, pos, 0, 0))
        k_full = self._expand_kv(k_cache)
        v_full = self._expand_kv(v_cache)
        scale = 1.0 / math.sqrt(self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_full,
                            preferred_element_type=jnp.float32) * scale
        valid = jnp.arange(k_cache.shape[1])[None, None, None, :] <= pos
        scores = jnp.where(valid, scores, jnp.finfo(scores.dtype).min / 2)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = unpack(self.probs_quant(probs)).astype(v_full.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_full,
                         preferred_element_type=jnp.float32).astype(x_t.dtype)
        out = out.reshape(x_t.shape[0], 1, self.embed_dim)
        return self.out_proj(out), k_cache, v_cache
