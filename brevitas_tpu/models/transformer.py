"""Quantized transformer encoder (net-new vs reference — Brevitas has no
attention-based model; this is the pod-scale serving shape the BASELINE
north-star targets).

Pre-norm blocks: LN → QuantMHA → residual, LN → QuantMLP → residual, with
residual adds through shared scale-aligning quantizers (the same discipline
as QuartzNet/ProxylessNAS residuals). Embedding + output head quantized.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.nn import (
    QuantEmbedding,
    QuantIdentity,
    QuantLinear,
    QuantMultiheadAttention,
    QuantReLU,
)
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    Int8WeightPerTensorFloat,
    Uint8ActPerTensorFloat,
)
from brevitas_tpu.quant.quantizers import TrainToggleMixin

Array = jnp.ndarray


class QuantTransformerBlock(nnx.Module):

    def __init__(self, dim: int, num_heads: int, mlp_ratio: int = 4, *,
                 weight_quant: QuantConfig, act_quant: QuantConfig,
                 uact_quant: QuantConfig, rngs: nnx.Rngs):
        self.ln1 = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = QuantMultiheadAttention(
            dim, num_heads, weight_quant=weight_quant,
            in_proj_input_quant=act_quant, q_quant=act_quant,
            k_quant=act_quant, v_quant=act_quant,
            attn_probs_quant=uact_quant, out_proj_input_quant=act_quant,
            rngs=rngs)
        self.res1 = QuantIdentity(act_quant)
        self.ln2 = nnx.LayerNorm(dim, rngs=rngs)
        self.fc1 = QuantLinear(dim, dim * mlp_ratio,
                               weight_quant=weight_quant,
                               input_quant=act_quant, rngs=rngs)
        self.act = QuantReLU(uact_quant)
        self.fc2 = QuantLinear(dim * mlp_ratio, dim,
                               weight_quant=weight_quant,
                               input_quant=act_quant, rngs=rngs)
        self.res2 = QuantIdentity(act_quant)

    def __call__(self, x: Array, causal: bool = False) -> Array:
        h = self.attn(self.ln1(x), causal=causal)
        x = self.res1(x) + self.res1(h)
        h = self.fc2(self.act(self.fc1(self.ln2(x))))
        return self.res2(x) + self.res2(h)

    def decode_step(self, x_t: Array, k_cache: Array, v_cache: Array, pos):
        """One-token step with KV cache; works for both the fake-quant
        attention and its int8 serving twin (same decode_step protocol)."""
        h, k_cache, v_cache = self.attn.decode_step(self.ln1(x_t), k_cache,
                                                    v_cache, pos)
        x = self.res1(x_t) + self.res1(h)
        h = self.fc2(self.act(self.fc1(self.ln2(x))))
        return self.res2(x) + self.res2(h), k_cache, v_cache


class QuantTransformer(nnx.Module, TrainToggleMixin):

    def __init__(self, *, vocab_size: int = 1000, dim: int = 256,
                 depth: int = 4, num_heads: int = 4, max_len: int = 512,
                 bit_width: int = 8, weight_quant=None, act_quant=None,
                 uact_quant=None, rngs: nnx.Rngs):
        """``weight_quant``/``act_quant``/``uact_quant`` override the default
        int-``bit_width`` quantizers (e.g. FP8 or dynamic-per-token configs);
        pass ``brevitas_tpu.quant.presets.None*Quant`` for a float model."""
        wq = weight_quant if weight_quant is not None \
            else Int8WeightPerTensorFloat.let(bit_width=float(bit_width))
        aq = act_quant if act_quant is not None \
            else Int8ActPerTensorFloat.let(bit_width=float(bit_width))
        uq = uact_quant if uact_quant is not None \
            else Uint8ActPerTensorFloat.let(bit_width=float(bit_width))
        self.embed = QuantEmbedding(vocab_size, dim, weight_quant=wq,
                                    rngs=rngs)
        self.pos = nnx.Param(
            0.02 * nnx.initializers.normal()(rngs.params(), (max_len, dim)))
        self.blocks = nnx.List([
            QuantTransformerBlock(dim, num_heads, weight_quant=wq,
                                  act_quant=aq, uact_quant=uq, rngs=rngs)
            for _ in range(depth)])
        self.ln_f = nnx.LayerNorm(dim, rngs=rngs)
        self.head = QuantLinear(dim, vocab_size, use_bias=False,
                                weight_quant=wq, input_quant=aq, rngs=rngs)

    def __call__(self, ids: Array, causal: bool = True) -> Array:
        x = self.embed(ids) + self.pos[...][: ids.shape[1]]
        for blk in self.blocks:
            x = blk(x, causal=causal)
        return self.head(self.ln_f(x))

    # -- incremental decoding --------------------------------------------------

    def init_decode_caches(self, batch: int, max_len: int):
        """Per-block (k_cache, v_cache) pairs. After
        ``convert_integer_inference`` the caches are int8 (2x less HBM than
        bf16); on the fake-quant model they are f32 fake-quant values."""
        return [blk.attn.init_decode_cache(batch, max_len)
                for blk in self.blocks]

    def decode_step(self, id_t: Array, caches, pos):
        """id_t: (B, 1) token ids; ``pos`` may be traced. Returns
        (logits_t (B, 1, V), caches). Matches the causal full-sequence
        forward at the same position."""
        x = self.embed(id_t) + jax.lax.dynamic_slice(
            self.pos[...], (pos, 0), (1, self.pos[...].shape[1]))
        new_caches = []
        for blk, (kc, vc) in zip(self.blocks, caches):
            x, kc, vc = blk.decode_step(x, kc, vc, pos)
            new_caches.append((kc, vc))
        return self.head(self.ln_f(x)), new_caches

    def generate(self, prompt_ids: Array, num_tokens: int,
                 max_len: Optional[int] = None) -> Array:
        """Greedy decoding: prefill the prompt through the cache one token at
        a time, then generate ``num_tokens`` more. Returns (B, num_tokens)."""
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


def transformer_smoothquant_regions(model) -> list:
    """The canonical SmoothQuant migration sites for any model carrying
    ``blocks`` of :class:`QuantTransformerBlock` (QuantTransformer, QuantViT):
    each block's LN1 feeds the attention in-projections, LN2 feeds the MLP
    up-projection — the LN elementwise affine absorbs ``1/s`` exactly."""
    regions = []
    for i in range(len(model.blocks)):
        b = f"blocks.{i}"
        regions.append(([f"{b}.ln1"], [f"{b}.attn.q_proj",
                                       f"{b}.attn.k_proj",
                                       f"{b}.attn.v_proj"]))
        regions.append(([f"{b}.ln2"], [f"{b}.fc1"]))
    return regions


def quant_transformer_tiny(bit_width: int = 8, **kw) -> QuantTransformer:
    kw.setdefault("dim", 128)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 4)
    return QuantTransformer(bit_width=bit_width, **kw)
