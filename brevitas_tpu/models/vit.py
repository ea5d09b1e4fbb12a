"""Quantized Vision Transformer (net-new vs reference — Brevitas's zoo is
conv/MLP-era: FC/CNV/MobileNetV1/ProxylessNAS/VGG, SURVEY §2.3 — and has no
attention at all, SURVEY §2.4; this extends the model zoo to the
attention-era vision shape on the same quant stack as the transformer LM).

Structure: quantized patch embedding (stride=patch conv, 8-bit first layer —
the same first-layer-wider discipline as the 4-bit MobileNetV1 recipe,
reference imagenet_classification/README.md:10), CLS token + learned
positional embeddings, pre-norm QuantTransformerBlocks (shared
residual-quantizer scale alignment), final LayerNorm, quantized classifier
head on the CLS token.

TPU notes: token count is static per image size, the whole forward is one
jit; patch conv + block GEMMs are the MXU path; serving converts through
``graph/convert_int.py`` like every other WBIOL stack.
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.models.transformer import QuantTransformerBlock
from brevitas_tpu.nn import QuantConv2d, QuantIdentity, QuantLinear
from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import (
    Int8ActPerTensorFloat,
    Int8WeightPerTensorFloat,
    Uint8ActPerTensorFloat,
)
from brevitas_tpu.quant.quantizers import TrainToggleMixin

Array = jnp.ndarray


class QuantViT(nnx.Module, TrainToggleMixin):

    def __init__(self, *, image_size: int = 32, patch_size: int = 4,
                 in_channels: int = 3, num_classes: int = 10, dim: int = 64,
                 depth: int = 4, num_heads: int = 4, mlp_ratio: int = 4,
                 weight_quant: QuantConfig = Int8WeightPerTensorFloat,
                 act_quant: QuantConfig = Int8ActPerTensorFloat,
                 uact_quant: QuantConfig = Uint8ActPerTensorFloat,
                 first_layer_weight_quant: Optional[QuantConfig] = None,
                 rngs: nnx.Rngs):
        assert image_size % patch_size == 0, "image must tile into patches"
        n_patches = (image_size // patch_size) ** 2
        if first_layer_weight_quant is None:
            # default: keep the stem at 8 bits whatever the body width
            first_layer_weight_quant = weight_quant.let(bit_width=8.0)
        self.patch = QuantConv2d(
            in_channels, dim, patch_size, stride=patch_size, padding="VALID",
            weight_quant=first_layer_weight_quant,
            input_quant=act_quant.let(bit_width=8.0), rngs=rngs)
        self.cls_token = nnx.Param(jnp.zeros((1, 1, dim)))
        self.pos_embed = nnx.Param(
            0.02 * nnx.initializers.normal(1.0)(
                rngs.params(), (1, n_patches + 1, dim)))
        # tokens re-quantize after cls/pos injection so the blocks see one scale
        self.token_quant = QuantIdentity(act_quant.let())
        self.blocks = nnx.List([
            QuantTransformerBlock(
                dim, num_heads, mlp_ratio, weight_quant=weight_quant,
                act_quant=act_quant, uact_quant=uact_quant, rngs=rngs)
            for _ in range(depth)])
        self.ln = nnx.LayerNorm(dim, rngs=rngs)
        self.head = QuantLinear(dim, num_classes, weight_quant=weight_quant.let(),
                                input_quant=act_quant.let(), rngs=rngs)
        self.dim = dim
        self.num_classes = num_classes

    def __call__(self, x: Array) -> Array:
        """x: (N, H, W, C) → logits (N, num_classes)."""
        p = self.patch(x)                                   # (N, h, w, dim)
        t = p.reshape(p.shape[0], -1, self.dim)             # (N, T, dim)
        cls = jnp.broadcast_to(self.cls_token[...],
                               (t.shape[0], 1, self.dim))
        t = jnp.concatenate([cls, t], axis=1) + self.pos_embed[...]
        t = self.token_quant(t)
        for blk in self.blocks:
            t = blk(t, causal=False)
        t = self.ln(t)
        return self.head(t[:, 0])


def vit_smoothquant_regions(model: QuantViT):
    """SmoothQuant migration sites — QuantViT carries the same blocks as the
    LM, so this is the shared transformer helper by another name."""
    from brevitas_tpu.models.transformer import transformer_smoothquant_regions

    return transformer_smoothquant_regions(model)


def vit_tiny(*, image_size: int = 28, patch_size: int = 7,
             in_channels: int = 1, num_classes: int = 10,
             bit_width: int = 8, rngs: nnx.Rngs, **kw) -> QuantViT:
    """Digits/MNIST-geometry ViT (4x4 grid of 7x7 patches + CLS)."""
    bw = float(bit_width)
    return QuantViT(
        image_size=image_size, patch_size=patch_size,
        in_channels=in_channels, num_classes=num_classes,
        dim=kw.pop("dim", 64), depth=kw.pop("depth", 2),
        num_heads=kw.pop("num_heads", 4),
        weight_quant=Int8WeightPerTensorFloat.let(bit_width=bw),
        act_quant=Int8ActPerTensorFloat.let(bit_width=bw),
        uact_quant=Uint8ActPerTensorFloat.let(bit_width=bw),
        rngs=rngs, **kw)
