"""QuantLinear (reference ``src/brevitas/nn/quant_linear.py:22``).

Kernel layout is flax-style (in_features, out_features): the output channel
is axis 1, so per-channel scales have shape (1, O) and broadcast against both
the kernel and the (N, O) output.
"""

from typing import Optional, Union

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig
from brevitas_tpu.quant.presets import Int8WeightPerTensorFloat
from brevitas_tpu.nn.quant_layer import QuantWBIOL

Array = jnp.ndarray


class QuantLinear(QuantWBIOL):

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        use_bias: bool = True,
        weight_quant: Optional[QuantConfig] = Int8WeightPerTensorFloat,
        bias_quant: Optional[QuantConfig] = None,
        input_quant: Optional[QuantConfig] = None,
        output_quant: Optional[QuantConfig] = None,
        return_quant_tensor: bool = False,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.in_features = in_features
        self.out_features = out_features
        k = 1.0 / in_features ** 0.5
        w = nnx.initializers.uniform(2 * k)(rngs.params(), (in_features, out_features), dtype) - k
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(jnp.zeros((out_features,), dtype)) if use_bias else None
        self.init_quant(weight_quant, bias_quant, input_quant, output_quant,
                        weight_init=w, channel_axis=1,
                        bias_init=jnp.zeros((out_features,), dtype),
                        return_quant_tensor=return_quant_tensor)

    @property
    def reduce_size(self) -> int:
        return self.in_features

    def __call__(self, x):
        def inner(xv, wv, bv):
            # compute_dtype (bf16) casts only the MXU operands: fake-quant
            # math and the f32 accumulator are untouched. Quantized values
            # are scale*int with few significant bits, so the cast is
            # (near-)lossless while the matmul runs at full MXU rate instead
            # of the fp32 multi-pass decomposition.
            cd = self.compute_dtype
            a, b = (xv.astype(cd), wv.astype(cd)) if cd is not None \
                else (xv, wv)
            y = jnp.dot(a, b, preferred_element_type=jnp.float32)
            if bv is not None:
                y = y + bv
            return y.astype(xv.dtype)

        return self.forward_quant(x, inner)
