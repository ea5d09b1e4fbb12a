"""Quantized Llama-style decoder (RMSNorm, RoPE, SwiGLU).

Net-new vs the reference snapshot (Brevitas has no attention model at all,
SURVEY §2.4) but the shape its later LLM entry point targets: a pre-norm
decoder with rotary position embeddings applied to Q/K before their
activation quantizers, an RMSNorm whose elementwise scale absorbs
SmoothQuant migration factors exactly, and a SwiGLU MLP with all three
projections quantized. Works with the full LLM PTQ menu (SmoothQuant, GPTQ/
GPFQ, rotation, dynamic acts, MX weights) and converts to integer serving
(int8 attention core incl. RoPE, int8/int4 KV cache).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.nn import QuantEmbedding, QuantIdentity, QuantLinear
from brevitas_tpu.nn.attention import QuantMultiheadAttention
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    Int8WeightPerTensorFloat,
    Uint8ActPerTensorFloat,
)
from brevitas_tpu.quant.quantizers import ActQuantizer, TrainToggleMixin

Array = jnp.ndarray


class QuantSwiGLU(nnx.Module):
    """gate/up/down projections with silu(gate) * up, all quantized; the
    elementwise product re-quantizes before the down projection via that
    layer's input quantizer."""

    def __init__(self, dim: int, hidden: int, *, weight_quant: QuantConfig,
                 act_quant: QuantConfig, rngs: nnx.Rngs):
        self.gate_proj = QuantLinear(dim, hidden, use_bias=False,
                                     weight_quant=weight_quant,
                                     input_quant=act_quant, rngs=rngs)
        self.up_proj = QuantLinear(dim, hidden, use_bias=False,
                                   weight_quant=weight_quant,
                                   input_quant=act_quant, rngs=rngs)
        self.down_proj = QuantLinear(hidden, dim, use_bias=False,
                                     weight_quant=weight_quant,
                                     input_quant=act_quant, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) * self.up_proj(x))


class QuantLlamaBlock(nnx.Module):
    """RMSNorm → rotary QuantMHA → residual; RMSNorm → QuantSwiGLU →
    residual. Residual adds run through shared scale-aligning quantizers
    (the flexml residual discipline)."""

    def __init__(self, dim: int, num_heads: int, hidden: int, *,
                 weight_quant: QuantConfig, act_quant: QuantConfig,
                 uact_quant: QuantConfig, rope_theta: float,
                 num_kv_heads: Optional[int] = None,
                 kv_quant: Optional[QuantConfig] = None, rngs: nnx.Rngs):
        kv_quant = kv_quant if kv_quant is not None else act_quant
        self.attn_norm = nnx.RMSNorm(dim, rngs=rngs)
        self.attn = QuantMultiheadAttention(
            dim, num_heads, use_bias=False, weight_quant=weight_quant,
            in_proj_input_quant=act_quant, q_quant=act_quant,
            k_quant=kv_quant, v_quant=kv_quant,
            attn_probs_quant=uact_quant, out_proj_input_quant=act_quant,
            use_rope=True, rope_theta=rope_theta,
            num_kv_heads=num_kv_heads, rngs=rngs)
        self.res1 = QuantIdentity(act_quant)
        self.mlp_norm = nnx.RMSNorm(dim, rngs=rngs)
        self.mlp = QuantSwiGLU(dim, hidden, weight_quant=weight_quant,
                               act_quant=act_quant, rngs=rngs)
        self.res2 = QuantIdentity(act_quant)

    def __call__(self, x: Array, causal: bool = True) -> Array:
        h = self.attn(self.attn_norm(x), causal=causal)
        x = self.res1(x) + self.res1(h)
        h = self.mlp(self.mlp_norm(x))
        return self.res2(x) + self.res2(h)

    def decode_step(self, x_t: Array, k_cache: Array, v_cache: Array, pos):
        h, k_cache, v_cache = self.attn.decode_step(
            self.attn_norm(x_t), k_cache, v_cache, pos)
        x = self.res1(x_t) + self.res1(h)
        h = self.mlp(self.mlp_norm(x))
        return self.res2(x) + self.res2(h), k_cache, v_cache


class QuantLlama(nnx.Module, TrainToggleMixin):
    """Decoder-only Llama-style LM. No learned position table — positions
    enter through RoPE inside attention, so the decode cache length is not
    bounded by a trained ``max_len``."""

    def __init__(self, *, vocab_size: int = 1000, dim: int = 256,
                 depth: int = 4, num_heads: int = 4,
                 num_kv_heads: Optional[int] = None,
                 hidden: Optional[int] = None, rope_theta: float = 10000.0,
                 bit_width: int = 8, weight_quant=None, act_quant=None,
                 uact_quant=None, kv_bit_width: Optional[int] = None,
                 rngs: nnx.Rngs):
        wq = weight_quant if weight_quant is not None \
            else Int8WeightPerTensorFloat.let(bit_width=float(bit_width))
        aq = act_quant if act_quant is not None \
            else Int8ActPerTensorFloat.let(bit_width=float(bit_width))
        uq = uact_quant if uact_quant is not None \
            else Uint8ActPerTensorFloat.let(bit_width=float(bit_width))
        # kv_bit_width=4 trains a nibble-sized K/V grid; the integer serving
        # twin then auto-packs the decode cache two-positions-per-byte
        # (kernels/int8_attention.py int4kv_decode_attention — 1.51x decode,
        # 2x smaller cache)
        kvq = (aq.let(bit_width=float(kv_bit_width))
               if kv_bit_width is not None else None)
        self._kv_pack_requested = (kv_bit_width is not None
                                   and kv_bit_width <= 4)
        # Llama-2 sizing: hidden = 8/3 * dim rounded up to a multiple of 32
        if hidden is None:
            hidden = -(-(8 * dim // 3) // 32) * 32
        self.embed = QuantEmbedding(vocab_size, dim, weight_quant=wq,
                                    rngs=rngs)
        self.blocks = nnx.List([
            QuantLlamaBlock(dim, num_heads, hidden, weight_quant=wq,
                            act_quant=aq, uact_quant=uq,
                            rope_theta=rope_theta,
                            num_kv_heads=num_kv_heads, kv_quant=kvq,
                            rngs=rngs)
            for _ in range(depth)])
        if self._kv_pack_requested:
            # an explicit kv_bit_width <= 4 is user intent for the PACKED
            # decode cache (capacity over speed); the serving conversion's
            # "auto" policy honors this over its head-dim boundary
            for blk in self.blocks:
                blk.attn.kv_pack_requested = True
        self.final_norm = nnx.RMSNorm(dim, rngs=rngs)
        self.head = QuantLinear(dim, vocab_size, use_bias=False,
                                weight_quant=wq, input_quant=aq, rngs=rngs)

    def __call__(self, ids: Array, causal: bool = True) -> Array:
        x = self.embed(ids)
        for blk in self.blocks:
            x = blk(x, causal=causal)
        return self.head(self.final_norm(x))

    # -- incremental decoding --------------------------------------------------

    def init_decode_caches(self, batch: int, max_len: int, dtype=None):
        return [blk.attn.init_decode_cache(batch, max_len, dtype)
                for blk in self.blocks]

    def decode_step(self, id_t: Array, caches, pos):
        x = self.embed(id_t)
        new_caches = []
        for blk, (kc, vc) in zip(self.blocks, caches):
            x, kc, vc = blk.decode_step(x, kc, vc, pos)
            new_caches.append((kc, vc))
        return self.head(self.final_norm(x)), new_caches

    def generate(self, prompt_ids: Array, num_tokens: int,
                 max_len: Optional[int] = None) -> Array:
        b, t0 = prompt_ids.shape
        max_len = max_len or (t0 + num_tokens)
        caches = self.init_decode_caches(b, max_len)
        logits = None
        for i in range(t0):
            logits, caches = self.decode_step(prompt_ids[:, i:i + 1], caches, i)
        outs = []
        tok = jnp.argmax(logits, axis=-1)
        for i in range(num_tokens):
            outs.append(tok[:, 0])
            if i + 1 == num_tokens:
                break
            logits, caches = self.decode_step(tok, caches, t0 + i)
            tok = jnp.argmax(logits, axis=-1)
        return jnp.stack(outs, axis=1)


def llama_smoothquant_regions(model: QuantLlama) -> list:
    """SmoothQuant migration sites: each block's attn RMSNorm feeds q/k/v;
    the mlp RMSNorm feeds BOTH gate and up projections (they share the input,
    so one scale migrates into both, keeping silu(gate)*up consistent). The
    RMSNorm elementwise scale absorbs 1/s exactly."""
    regions = []
    for i in range(len(model.blocks)):
        b = f"blocks.{i}"
        regions.append(([f"{b}.attn_norm"], [f"{b}.attn.q_proj",
                                             f"{b}.attn.k_proj",
                                             f"{b}.attn.v_proj"]))
        regions.append(([f"{b}.mlp_norm"], [f"{b}.mlp.gate_proj",
                                            f"{b}.mlp.up_proj"]))
    return regions


def quant_llama_tiny(bit_width: int = 8, **kw) -> QuantLlama:
    kw.setdefault("dim", 128)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 4)
    return QuantLlama(bit_width=bit_width, **kw)
