"""Quant elementwise ops (reference ``src/brevitas/nn/quant_eltwise.py``:
QuantEltwiseAdd:15, QuantCat:55). A shared input quantizer aligns operand
scales before the op, matching the residual-scale-alignment role these layers
play in graph quantization (graph/target/flexml.py:296)."""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import nnx

from brevitas_tpu.quant.config import QuantConfig, QuantType
from brevitas_tpu.quant.quantizers import ActQuantizer
from brevitas_tpu.quant.presets import NoneActQuant
from brevitas_tpu.nn.quant_layer import QuantLayerMixin
from brevitas_tpu.quant_tensor import QuantTensor, cat


class QuantEltwiseAdd(nnx.Module, QuantLayerMixin):

    def __init__(self, input_quant: Optional[QuantConfig] = None,
                 output_quant: Optional[QuantConfig] = None,
                 return_quant_tensor: bool = False):
        self.input_quant = ActQuantizer(input_quant or NoneActQuant)
        self.output_quant = ActQuantizer(output_quant or NoneActQuant)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, a, b):
        qa, qb = self.unpack_input(a), self.unpack_input(b)
        if self.input_quant.quant_type != QuantType.NONE:
            qa = self.input_quant(qa.value)
            qb = self.input_quant(qb.value)
        out = qa + qb
        if self.output_quant.quant_type != QuantType.NONE:
            out = self.output_quant(out.value)
        return self.pack_output(out)


class QuantCat(nnx.Module, QuantLayerMixin):

    def __init__(self, input_quant: Optional[QuantConfig] = None,
                 output_quant: Optional[QuantConfig] = None,
                 return_quant_tensor: bool = False):
        self.input_quant = ActQuantizer(input_quant or NoneActQuant)
        self.output_quant = ActQuantizer(output_quant or NoneActQuant)
        self.return_quant_tensor = return_quant_tensor

    def __call__(self, tensors: Sequence, axis: int = -1):
        qts = [self.unpack_input(t) for t in tensors]
        if self.input_quant.quant_type != QuantType.NONE:
            qts = [self.input_quant(t.value) for t in qts]
        out = cat(qts, axis=axis)
        if self.output_quant.quant_type != QuantType.NONE:
            out = self.output_quant(out.value)
        return self.pack_output(out)
